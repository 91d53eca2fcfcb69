package graft.tgraph

import graft.SparkSpec
import graft.evaluation.Bank
import graft.tgraph.query.StateQueries

class StateQueriesSpec extends SparkSpec {

  test("query supplier samples deterministic key sets and prunes") {
    val snap = Bank.graph(spark, Sf0001).result
      .balances(Bank.NameSpace, IsolationLevel.PL3)
    val k1 = StateQueries.sampleKeys(snap, 5, seed = 7)
    val k2 = StateQueries.sampleKeys(snap, 5, seed = 7)
    assert(k1 == k2 && k1.size == 5)
    val k3 = StateQueries.sampleKeys(snap, 5, seed = 8)
    assert(k1 != k3) // different tick -> different key set (w.h.p.)
    val queries = StateQueries.querySupplier(snap, avgSize = 3, seed = 1)
    val first = queries.next()
    assert(first.count() <= 3)
  }

  test("batched point query (semi-join) == key-list point query") {
    import spark.implicits._
    val snap = Bank.graph(spark, Sf0001).result
      .balances(Bank.NameSpace, IsolationLevel.PL3)
    val keys = StateQueries.sampleKeys(snap, 20, seed = 3)
    val viaIn = StateQueries.pointQuery(snap, keys)
      .collect().map(_.toSeq).toSet
    val viaJoin = StateQueries.pointQueryBatch(snap, keys.toDF("key"))
      .collect().map(_.toSeq).toSet
    assert(viaIn == viaJoin && viaIn.nonEmpty)
  }
}
