package graft.tgraph.durability

import graft.tgraph.{IsolationLevel, TGraphResult}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshots — the reference's `tgraph/durability/SnapshotService.java`:
  * a consistent state snapshot at a watermark, plus WAL replay of
  * everything after it. Recovery = snapshot ⊎ replay, proved equal to
  * the direct fold by the `t_snapshot_recovery` correctness entry.
  */
object Snapshots {

  /** State fold at the watermark (transactions with ts <= watermark). */
  def take(
      result: TGraphResult,
      nameSpace: String,
      timeCol: Column,
      watermark: Column): DataFrame =
    result
      .visibleUpdates(nameSpace, IsolationLevel.PL3)
      .filter(timeCol <= watermark)
      .groupBy(col("key"))
      .agg(sum(col("delta")).as("value"))

  /** The post-watermark tail of the commit log. */
  def tail(
      result: TGraphResult,
      nameSpace: String,
      timeCol: Column,
      watermark: Column): DataFrame =
    result
      .visibleUpdates(nameSpace, IsolationLevel.PL3)
      .filter(timeCol > watermark)
      .groupBy(col("key"))
      .agg(sum(col("delta")).as("value"))

  /** Recovery: snapshot + replayed tail → final state. Outer-union so
    * keys present only on one side survive. One shuffle per side plus
    * the final re-aggregation (AQE coalesces; both sides are already
    * keyed by `key`).
    */
  def recover(snapshot: DataFrame, tail: DataFrame): DataFrame =
    snapshot
      .unionByName(tail)
      .groupBy(col("key"))
      .agg(sum(col("value")).as("value"))

  /** Persist / load a snapshot. */
  def write(snapshot: DataFrame, path: String): Unit =
    snapshot.write.mode("overwrite").parquet(path)
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Snapshot of the ONLINE WAL ([[Wal.streamingSink]]) at `upToLsn`:
    * the state fold of entries 1..upToLsn. The lsn is the online log's
    * total order, so this is a consistent cut without any watermark
    * column.
    */
  def takeOnline(spark: SparkSession, walPath: String, upToLsn: Long): DataFrame =
    Wal.readOnline(spark, walPath)
      .filter(col("lsn") <= upToLsn)
      .groupBy(col("key"))
      .agg(sum(col("delta")).as("value"))

  /** Recovery from an online-WAL snapshot: snapshot ⊎ fold of entries
    * with lsn > `snapshotLsn` — the tail the snapshot has not absorbed.
    */
  def recoverOnline(
      spark: SparkSession, snapshot: DataFrame,
      walPath: String, snapshotLsn: Long): DataFrame =
    recover(
      snapshot,
      Wal.readOnline(spark, walPath)
        .filter(col("lsn") > snapshotLsn)
        .groupBy(col("key"))
        .agg(sum(col("delta")).as("value")))

  /** Compaction: physically drop every online-WAL data directory whose
    * ENTIRE lsn range is covered by a snapshot at `upToLsn` (the
    * reference's snapshot-then-truncate loop). Batch b covers lsns
    * (Σ n_{<b}, Σ n_{<=b}] — computed from the driver-size meta log —
    * so coverage is decided without scanning data. meta/ is never
    * touched: future appends still derive their offsets from it, and
    * partially-covered batches stay (their tail is still needed by
    * [[recoverOnline]]).
    */
  def truncateOnline(spark: SparkSession, walPath: String, upToLsn: Long): Seq[Long] = {
    val meta = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$walPath/meta")
      .select(col("batch_id").cast("long"), col("n").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val fs = new org.apache.hadoop.fs.Path(walPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var offset = 0L
    meta.flatMap { case (batchId, n) =>
      val fullyCovered = offset + n <= upToLsn
      offset += n
      if (fullyCovered && n > 0) {
        fs.delete(new org.apache.hadoop.fs.Path(s"$walPath/data/b$batchId"), true)
        Some(batchId)
      } else None
    }.toSeq
  }
}
