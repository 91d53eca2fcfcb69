package graft.tgraph

import graft.SparkSpec
import graft.evaluation.Bank
import org.apache.spark.sql.functions._

class TStreamSpec extends SparkSpec {
  import spark.implicits._

  private def opened = {
    val env = TransactionEnvironment()
    val df = Seq((1L, 10.0, "x"), (2L, 20.0, "y"), (3L, 30.0, "x"))
      .toDF("id", "amount", "tag")
    env.open(df, col("id"))
  }

  test("open assigns tid and branch 0") {
    val rows = opened.df.select("__tid", "__branch").as[(Long, Int)].collect().sorted
    assert(rows.toSeq == Seq((1L, 0), (2L, 0), (3L, 0)))
  }

  test("map adds derived columns, filter keeps metadata") {
    val s = opened
      .map("double_amount" -> (col("amount") * 2))
      .filter(col("tag") === "x")
    val rows = s.df.select("__tid", "double_amount").as[(Long, Double)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 20.0), (3L, 60.0)))
  }

  test("flatMap forks branches with positions") {
    val s = opened.flatMap(array(
      struct(col("amount").as("v"), lit("a").as("side")),
      struct((-col("amount")).as("v"), lit("b").as("side"))))
    val rows = s.df.select("__tid", "__branch", "v").as[(Long, Int, Double)]
      .collect().sortBy(r => (r._1, r._2))
    assert(rows.length == 6)
    assert(rows.take(2).toSeq == Seq((1L, 0, 10.0), (1L, 1, -10.0)))
  }

  test("chained flatMaps keep unique branch identities (nested BatchID)") {
    val s = opened
      .flatMap(array(struct(col("amount").as("v")), struct((-col("amount")).as("v"))))
      .flatMap(array(struct(col("v").as("w")), struct((col("v") * 2).as("w"))))
    val ids = s.df.select("__tid", "__branch").as[(Long, Int)].collect()
    assert(ids.length == 12) // 3 tx x 2 x 2 branches... per tid 4 unique
    assert(ids.distinct.length == 12)
    assert(ids.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(0, 1, 1000, 1001))
  }

  test("flatMap fan-out >= 1000 fails loudly instead of colliding branch ids") {
    val big = transform(sequence(lit(0), lit(1000)), i => struct(i.as("v")))
    val ex = intercept[Exception] {
      opened.flatMap(big).df.count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("fan-out")))
  }

  test("vote merge is worst-of (min) per transaction") {
    val env = TransactionEnvironment()
    val df = Seq((1L, 5.0), (2L, 500.0)).toDF("id", "amount")
    val s = env.open(df, col("id"))
      .flatMap(array(
        struct(col("amount").as("v")),
        struct((col("amount") * 2).as("v"))))
      .state("ns", lit(0L), col("v"), col("v") > 100, Seq())
    val votes = env.close(s).voteNames
      .select("tid", "vote").as[(Long, String)].collect().toMap
    assert(votes == Map(1L -> "COMMIT", 2L -> "ABORT"))
  }

  test("bank: PL0 sees aborted writes, PL3 does not; money conserved") {
    val g = Bank.graph(spark, Sf0001)
    val pl0 = Bank.balances(g, IsolationLevel.PL0)
      .select("acct", "balance_cents").as[(Long, Long)].collect().toMap
    val pl3Map = Bank.balances(g, IsolationLevel.PL3)
      .select("acct", "balance_cents").as[(Long, Long)].collect().toMap
    // both conserve the global total (every transfer applies both
    // branches), but dirty reads shift individual account balances
    assert(pl3Map.values.sum == 0L)
    assert(pl0 != pl3Map)
    val check = Bank.consistencyCheck(g)
      .select("n_tx", "n_commit", "n_abort", "net_cents")
      .as[(Long, Long, Long, Long)].head()
    assert(check._1 == check._2 + check._3)
    assert(check._4 == 0L)
  }

  test("state fold partitions on the state key (bounded shuffles)") {
    val g = Bank.graph(spark, Sf0001)
    val plan = Bank.balances(g, IsolationLevel.PL3).queryExecution.executedPlan.toString
    // the fold's aggregation clusters on the state key...
    assert(plan.contains("hashpartitioning(key"), plan)
    // ...and the whole pipeline needs at most 3 exchanges end-to-end
    // (votes by tid, vote join, fold by key) — never one per operator
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"$exchanges exchanges in:\n$plan")
  }

  test("version chains are dense per key and fold to the balance") {
    val g = Bank.graph(spark, Sf0001)
    val versions = g.result.versions(Bank.NameSpace)
      .select(col("key"), col("version"), col("value"))
      .as[(Long, Int, Long)].collect()
    val byKey = versions.groupBy(_._1)
    byKey.foreach { case (_, vs) =>
      assert(vs.map(_._2).sorted.toSeq == (1 to vs.length).toSeq)
    }
    val lastValues = byKey.map { case (k, vs) => k -> vs.maxBy(_._2)._3 }
    val balances = Bank.balances(g, IsolationLevel.PL3)
      .select("acct", "balance_cents").as[(Long, Long)].collect().toMap
    assert(lastValues == balances)
  }
}
