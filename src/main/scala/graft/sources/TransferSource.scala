package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Workload sources — the reference's `tgraph/backed/TransferSource.java`
  * and `TunableTransferSource.java` (rate-controlled random transfer
  * generators) on Spark's own sources:
  *
  *  - streaming: the `rate` source (rowsPerSecond = the reference's
  *    tunable input frequency) mapped deterministically to transfers;
  *  - batch: a `spark.range` of n transfers with the same mapping.
  *
  * Determinism: account/amount derive from murmur3 of the sequence
  * number, not an RNG — reproducible across runs, engines and
  * restarts (the property the reference gets from seeded Randoms in
  * `RandomProvider.java`).
  */
object TransferSource {

  /** Map a monotonically increasing `tid` column to a transfer. */
  private def mapToTransfer(df: DataFrame, keySpace: Int, maxAmount: Double): DataFrame = {
    val from = pmod(hash(col("tid"), lit(1)), lit(keySpace)).cast("bigint")
    val toRaw = pmod(hash(col("tid"), lit(2)), lit(keySpace)).cast("bigint")
    // reference draws `to` until it differs from `from`; one shifted
    // redraw keeps it deterministic and collision-free
    val to = when(toRaw === from, pmod(toRaw + 1, lit(keySpace)).cast("bigint")).otherwise(toRaw)
    df.select(
      col("tid"),
      col("ts"),
      from.as("from_acct"),
      to.as("to_acct"),
      (round(pmod(hash(col("tid"), lit(3)), lit(10000)) / 100.0, 2) * lit(maxAmount) / 100.0)
        .as("amount"))
  }

  /** Streaming source at `rowsPerSecond` (TunableTransferSource). */
  def streaming(
      spark: SparkSession, rowsPerSecond: Int,
      keySpace: Int = 100, maxAmount: Double = 200.0): DataFrame =
    mapToTransfer(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond.toString).load()
        .select(col("value").as("tid"), col("timestamp").as("ts")),
      keySpace, maxAmount)

  /** Batch source of `n` transfers (TransferSource with a count). */
  def batch(
      spark: SparkSession, n: Long,
      keySpace: Int = 100, maxAmount: Double = 200.0): DataFrame =
    mapToTransfer(
      spark.range(n).select(col("id").as("tid"),
        // 2024-01-01T00:00Z + one transfer per second
        timestamp_micros(lit(1704067200000000L) + col("id") * 1000000L).as("ts")),
      keySpace, maxAmount)

  /** [[batch]] with a PLANTED hot key — the reference's frozen-account
    * workload shape: `hotPerMille`‰ of transfers deposit into
    * `hotAcct` regardless of the hash draw, so one account absorbs a
    * constant fraction of the stream at any scale. This is the skew
    * fixture for the salted-fold path
    * ([[graft.tgraph.state.StateOperator.runBatchSaltedFinal]]): the
    * plain per-key fold caps at one core's rate on `hotAcct`.
    * Deterministic like everything else here (hash of tid, no RNG).
    */
  def batchSkewed(
      spark: SparkSession, n: Long,
      keySpace: Int = 100, maxAmount: Double = 200.0,
      hotAcct: Long = 13L, hotPerMille: Int = 50): DataFrame = {
    val base = batch(spark, n, keySpace, maxAmount)
    val isHot = pmod(hash(col("tid"), lit(7)), lit(1000)) < hotPerMille
    base.withColumn("to_acct",
      when(isHot && col("from_acct") =!= hotAcct, lit(hotAcct))
        .otherwise(col("to_acct")))
  }
}
