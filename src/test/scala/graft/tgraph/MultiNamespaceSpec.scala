package graft.tgraph

import graft.SparkSpec
import graft.evaluation.Purchases
import org.apache.spark.sql.functions._

/** Multi-namespace 2PC — two state operators voting in ONE transaction
  * (reference `evaluation/BuyProducts.java`, votes merged across state
  * operators by `tgraph/twopc/ReduceVotesFunction.java`).
  */
class MultiNamespaceSpec extends SparkSpec {
  import spark.implicits._

  // tid, customer, product, price_cents — chosen so every abort
  // combination occurs: tid 2 aborts on credit (bal branch), tid 3
  // aborts on the discontinued product 7 (inv branch), tid 4 on both.
  private def purchases = Seq(
    (1L, 10L, 1L, 5000L),
    (2L, 10L, 2L, 99000L),
    (3L, 11L, 7L, 1000L),
    (4L, 11L, 7L, 99000L),
    (5L, 11L, 2L, 2000L)
  ).toDF("tid", "customer", "product", "price_cents")
    .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))

  private def build() = {
    val env = TransactionEnvironment()
    val opened = env.open(purchases, col("tid"))
    val bal = opened.state("balances", col("customer"), -col("price_cents"),
      abortIf = col("price_cents") > 12000L, orderBy = Seq("ts"))
    val inv = opened.state("inventory", col("product"), lit(-1L),
      abortIf = col("product") === 7L, orderBy = Seq("ts"))
    (env, bal, inv)
  }

  test("joint close: either namespace's abort kills the whole transaction") {
    val (env, bal, inv) = build()
    val votes = env.close(bal, inv).voteNames
      .select("tid", "vote").as[(Long, String)].collect().toMap
    assert(votes == Map(
      1L -> "COMMIT", 2L -> "ABORT", 3L -> "ABORT", 4L -> "ABORT", 5L -> "COMMIT"))
  }

  test("a tx aborted by namespace A contributes nothing to namespace B") {
    val (env, bal, inv) = build()
    val result = env.close(bal, inv)
    // tid 3 aborts only on the inventory branch; its balance update
    // (customer 11, -1000) must NOT appear in the balances fold.
    val balances = result.balances("balances")
      .select(col("key"), col("value")).as[(Long, Long)].collect().toMap
    assert(balances == Map(10L -> -5000L, 11L -> -2000L))
    // tid 2 aborts only on the balance branch; product 2 keeps the unit.
    val stock = result.balances("inventory")
      .select(col("key"), col("value")).as[(Long, Long)].collect().toMap
    assert(stock == Map(1L -> -1L, 2L -> -1L))
  }

  test("solo close of one namespace differs — the coupling is real") {
    val (envJoint, balJ, invJ) = build()
    val joint = envJoint.close(balJ, invJ).balances("inventory")
      .select(col("key"), col("value")).as[(Long, Long)].collect().toMap
    val (envSolo, _, invS) = build()
    val solo = envSolo.close(invS).balances("inventory")
      .select(col("key"), col("value")).as[(Long, Long)].collect().toMap
    // solo: tid 2's inventory branch commits (its own vote is COMMIT);
    // joint: the balance veto kills it.
    assert(solo == Map(1L -> -1L, 2L -> -2L))
    assert(joint == Map(1L -> -1L, 2L -> -1L))
  }

  test("abortCoupling decomposition on the sf0.001 workload is consistent") {
    val g = Purchases.graph(spark, Sf0001)
    val row = Purchases.abortCoupling(g).collect().head
    val n = row.getAs[Long]("n_tx")
    val commit = row.getAs[Long]("n_commit")
    val balOnly = row.getAs[Long]("n_abort_bal_only")
    val invOnly = row.getAs[Long]("n_abort_inv_only")
    val both = row.getAs[Long]("n_abort_both")
    assert(n == commit + balOnly + invOnly + both)
    // the saved-update counters are exactly the cross-veto cases
    assert(row.getAs[Long]("inv_units_saved_by_bal_abort") == balOnly)
    assert(invOnly > 0 && balOnly > 0, "workload must exercise both veto directions")
  }
}
