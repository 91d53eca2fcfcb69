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

  test("portable sampleFrame: deterministic, top-k plan, subset of state") {
    import spark.implicits._
    val snap = Bank.graph(spark, Sf0001).result
      .balances(Bank.NameSpace, IsolationLevel.PL3)
    val s1 = StateQueries.sampleFrame(snap, 10, seed = 7)
    // global orderBy+limit plans as a top-k (TakeOrdered), not a full sort
    assert(s1.queryExecution.executedPlan.toString.contains("TakeOrdered"))
    val r1 = s1.select("key").as[Long].collect().toSeq
    val r2 = StateQueries.sampleFrame(snap, 10, seed = 7)
      .select("key").as[Long].collect().toSeq
    assert(r1 == r2 && r1.size == 10 && r1.distinct.size == 10)
    val r3 = StateQueries.sampleFrame(snap, 10, seed = 8)
      .select("key").as[Long].collect().toSeq
    assert(r1 != r3) // different seed -> different set (w.h.p.)
    val all = snap.select("key").as[Long].collect().toSet
    assert(r1.forall(all.contains))
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
