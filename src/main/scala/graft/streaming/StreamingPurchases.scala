package graft.streaming

import graft.evaluation.Purchases
import graft.tgraph.state.{ObjectHandler, StateChange, StateFunction, StateOperator}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The multi-namespace purchase graph as a live Structured Streaming
  * job — the online analog of `evaluation/BuyProducts.java` /
  * `Mixed.java` (see [[graft.evaluation.Purchases]] for the batch
  * close).
  *
  * Online 2PC shape: BOTH branch invariants (credit limit, product
  * discontinued) are stateless predicates of the purchase row, so the
  * reference's cross-operator vote round-trip
  * (`tgraph/twopc/ReduceVotesFunction.java`) collapses into ONE
  * deterministic codegen'd expression — the joint commit decision —
  * evaluated identically wherever it runs. Each namespace then runs as
  * its own streaming query (Spark allows one flatMapGroupsWithState
  * per query) applying only jointly-committed purchases: the two
  * queries need NO coordination because they agree on every
  * transaction by construction, which is exactly the determinism
  * argument the batch `close(balances, inventory)` makes.
  */
object StreamingPurchases {

  final case class PurchaseRow(tid: Long, customer: Long, product: Long, price_cents: Long)
  final case class BalanceUpdate(customer: Long, tid: Long, delta: Long)
  final case class InventoryUpdate(product: Long, tid: Long, delta: Long)

  /** The joint 2PC decision (merge of both namespaces' stateless
    * votes) as one expression — ABORT if either branch vetoes.
    */
  def jointCommit(df: DataFrame): DataFrame =
    df.filter(
      !(col("price_cents") > Purchases.CreditLimitCents) &&
        !(col("product") === Purchases.DiscontinuedProduct))

  private class SumState[T](delta: T => Long) extends StateFunction[T, Long] {
    def defaultValue: Long = 0L
    def copyValue(v: Long): Long = v
    def invariant(v: Long): Boolean = true // the joint vote pre-filtered
    def apply(t: T, h: ObjectHandler[Long]): Unit = h.write(h.read() + delta(t))
  }

  /** Namespace 1: customer balances debited by the price. */
  def balances(spark: SparkSession, purchases: DataFrame): Dataset[StateChange[Long, Long]] = {
    import spark.implicits._
    val upd = jointCommit(purchases)
      .select(col("customer"), col("tid"), (-col("price_cents")).as("delta"))
      .as[BalanceUpdate]
    StateOperator.runStreaming[BalanceUpdate, Long, Long](
      upd, _.customer, _.tid, new SumState(_.delta))
  }

  /** Namespace 2: product stock decremented one unit per sale. */
  def inventory(spark: SparkSession, purchases: DataFrame): Dataset[StateChange[Long, Long]] = {
    import spark.implicits._
    val upd = jointCommit(purchases)
      .select(col("product"), col("tid"), lit(-1L).as("delta"))
      .as[InventoryUpdate]
    StateOperator.runStreaming[InventoryUpdate, Long, Long](
      upd, _.product, _.tid, new SumState(_.delta))
  }

  /** Both namespace queries run live off staged files (no row through
    * the driver): purchases are range-partitioned by tid into
    * contiguous micro-batch files, each namespace runs as its own
    * streaming query over the SAME input files (they need no
    * coordination — the joint vote is deterministic, see object doc),
    * and both StateChange histories land in exactly-once parquet file
    * sinks. Returns (balances history, inventory history) as batch
    * DataFrames.
    */
  def runFromFiles(
      spark: SparkSession,
      purchases: DataFrame,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): (DataFrame, DataFrame) = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    graft.sources.FileIO.stageRangeBatches(
      purchases, col("tid"), nBatches, new java.io.File(base, "stage"), inDir)
    // cloned session: state shard count sized for micro-batch state
    // (see StreamingDocs.ingestFromFiles), conf scoped to this query
    val ss = StreamSessions.scoped(spark, statePartitions)
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, purchases.schema, maxFilesPerTrigger = 1)
    def run(name: String, out: Dataset[StateChange[Long, Long]]) = {
      val q = graft.sources.FileIO.streamingParquetSink(
        out.toDF(),
        new java.io.File(base, s"out-$name").toString,
        new java.io.File(base, s"ckpt-$name").toString).start()
      q
    }
    val qBal = run("balances", balances(ss, stream))
    val qInv = run("inventory", inventory(ss, stream))
    qBal.awaitTermination()
    qInv.awaitTermination()
    // sink outputs outlive the run (the returned frames read them), and
    // so do the two checkpoints: a live QueryServer/MultiQueryServer can
    // front the drained stores' state (exit-swept, not deleted here)
    graft.sources.FileIO.deleteScratch(new java.io.File(base, "stage"), inDir)
    graft.sources.FileIO.deleteScratchOnExit(
      new java.io.File(base, "ckpt-balances"),
      new java.io.File(base, "ckpt-inventory"))
    (spark.read.parquet(new java.io.File(base, "out-balances").toString),
      spark.read.parquet(new java.io.File(base, "out-inventory").toString))
  }
}
