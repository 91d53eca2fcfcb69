package graft.evaluation

import graft.tables.Tables
import graft.tgraph._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The multi-namespace use case — the reference's
  * `evaluation/BuyProducts.java` (and `Mixed.java` / `NewMixed.java`):
  * ONE transaction updates TWO state operators, `balances` (keyed by
  * customer) and `inventory` (keyed by product), and the 2PC close
  * merges votes ACROSS the namespaces into a single commit decision
  * (`tgraph/twopc/ReduceVotesFunction.java`). Either namespace's abort
  * kills the other namespace's update — the coupling that makes it a
  * distributed transaction rather than two independent folds.
  *
  * Workload derived deterministically from `events` (so the DuckDB
  * oracle replays it exactly): tid = event_id, customer = user_id,
  * product = k mod 50 (k from the props JSON), price = value.
  * Invariants:
  *  - balances branch aborts when the price exceeds the customer's
  *    credit limit (stateless credit check);
  *  - inventory branch aborts when the product is discontinued.
  *
  * Scale shape: the opened stream is narrow (no fork needed — each
  * state() projects its own key/delta/vote in codegen); each namespace
  * shuffles ONCE on its own key for the fold, and the vote reduce is a
  * map-side-combinable min over the union of the two vote streams.
  */
object Purchases {
  val BalancesNs = "balances"
  val InventoryNs = "inventory"
  val NumProducts = 50
  val CreditLimitCents = 12000L
  val DiscontinuedProduct = 7L

  final case class Graph(
      env: TransactionEnvironment,
      purchases: DataFrame,
      balances: StateStream,
      inventory: StateStream,
      result: TGraphResult)

  /** events → purchases (tid, ts, customer, product, price_cents). */
  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("tid"),
      col("ts"),
      col("user_id").cast("bigint").as("customer"),
      (regexp_extract(col("props"), "([0-9]+)", 1).cast("int") % NumProducts)
        .cast("bigint").as("product"),
      graft.tgraph.backed.Transfers.cents(col("value")).as("price_cents"))

  private val memo = GraphMemo[Graph]()

  /** Build the two-namespace transactional graph over `events` at `dir`.
    * Memoized per (session, dir); the vote table and both update logs
    * are persisted so every query over the graph reuses them.
    */
  def graph(spark: SparkSession, dir: String): Graph =
    memo.getOrElseUpdate(spark, dir, {
      val env = TransactionEnvironment()
      val purchases = fromEvents(Tables.load(spark, dir, "events"))
      val opened = env.open(purchases, col("tid"))
      // namespace 1: customer balance debited by the price
      val balances = opened
        .keyBy(col("customer"))
        .state(BalancesNs, col("customer"), -col("price_cents"),
          abortIf = col("price_cents") > CreditLimitCents, orderBy = Seq("ts"))
      // namespace 2: product stock decremented by one unit
      val inventory = opened
        .keyBy(col("product"))
        .state(InventoryNs, col("product"), lit(-1L),
          abortIf = col("product") === DiscontinuedProduct, orderBy = Seq("ts"))
      val result = env.close(balances, inventory)
      balances.updates.persist()
      inventory.updates.persist()
      result.finalVotes.persist()
      Graph(env, purchases, balances, inventory, result)
    }, g => {
      g.balances.updates.unpersist()
      g.inventory.updates.unpersist()
      g.result.finalVotes.unpersist()
    })

  def invalidate(spark: SparkSession): Unit = memo.invalidate(spark)

  /** Both namespaces' committed state under the JOINT vote, namespace-
    * tagged — the multi-state snapshot of the closed graph.
    */
  def committedState(g: Graph): DataFrame = {
    def ns(name: String) = g.result.balances(name, IsolationLevel.PL3)
      .select(lit(name).as("namespace"), col("key"), col("value"), col("n_updates"))
    ns(BalancesNs).unionAll(ns(InventoryNs))
  }

  /** The abort-coupling decomposition, derived entirely from the ENGINE
    * (per-namespace branch votes + the joint close decision, not from
    * the input predicates): per-transaction, which namespace vetoed, and
    * what the OTHER namespace kept because of it. The two `*_saved_*`
    * columns count updates whose OWN branch voted COMMIT but whose
    * transaction aborted because the other namespace vetoed — exactly
    * what a non-transactional engine would have applied wrongly; nonzero
    * proves the cross-namespace coupling.
    */
  def abortCoupling(g: Graph): DataFrame = {
    import TStream._
    val bal = g.balances.branchVotes
      .select(col(TidCol).as("tid"), (col(VoteCol) === Vote.Abort).as("bal_abort"))
    val inv = g.inventory.branchVotes
      .select(col(TidCol).as("tid"), (col(VoteCol) === Vote.Abort).as("inv_abort"))
    val price = g.purchases.select(col("tid"), col("price_cents"))
    val fin = g.result.voteNames.select(col("tid"), (col("vote") === "COMMIT").as("committed"))
    bal.join(inv, "tid").join(price, "tid").join(fin, "tid").agg(
      count(lit(1)).as("n_tx"),
      sum(when(col("committed"), 1L).otherwise(0L)).as("n_commit"),
      sum(when(col("bal_abort") && !col("inv_abort"), 1L).otherwise(0L)).as("n_abort_bal_only"),
      sum(when(!col("bal_abort") && col("inv_abort"), 1L).otherwise(0L)).as("n_abort_inv_only"),
      sum(when(col("bal_abort") && col("inv_abort"), 1L).otherwise(0L)).as("n_abort_both"),
      // stock units the inventory namespace kept because its tx aborted
      // even though its OWN branch voted COMMIT (the balance veto):
      sum(when(!col("inv_abort") && !col("committed"), 1L).otherwise(0L))
        .as("inv_units_saved_by_bal_abort"),
      // money the balance namespace kept for the symmetric case:
      sum(when(!col("bal_abort") && !col("committed"), col("price_cents")).otherwise(0L))
        .as("bal_cents_saved_by_inv_abort"))
  }
}
