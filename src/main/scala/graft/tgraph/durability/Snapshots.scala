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

  /** The reference's snapshot-then-truncate loop in ONE safe call:
    * materialize the state at `upToLsn` to `snapshotPath` FIRST, then
    * physically drop every data directory whose entire lsn range the
    * snapshot covers. The write-before-delete order matters — a lazy
    * snapshot frame evaluated after truncation would scan deleted
    * files — which is why truncation is not exposed on its own.
    *
    * Compaction is INCREMENTAL: pass the previous (snapshotPath, lsn)
    * so the new snapshot = previous state ⊎ entries in
    * (prevLsn, upToLsn] — required once earlier entries have been
    * truncated away, and also what bounds each compaction's work to
    * the delta since the last one. Returns the batch ids dropped.
    * Restore state later with `recoverOnline(spark,
    * Snapshots.read(spark, snapshotPath), walPath, upToLsn)`.
    */
  def compactOnline(
      spark: SparkSession, walPath: String, upToLsn: Long,
      snapshotPath: String,
      prevSnapshot: Option[(String, Long)] = None): Seq[Long] = {
    // The new snapshot must not overwrite the one it reads from: the
    // overwrite deletes the old dir before the (lazy) fold job scans it,
    // and with earlier WAL entries already truncated that state would be
    // unrecoverable. Compare fs-qualified URIs so `/p/` vs `/p` or a
    // scheme alias can't sneak past the check.
    def qualified(s: String): java.net.URI = {
      val p = new org.apache.hadoop.fs.Path(s)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(p).toUri.normalize()
    }
    prevSnapshot.foreach { case (p, _) =>
      require(qualified(p) != qualified(snapshotPath),
        s"compactOnline: snapshotPath must differ from the previous " +
          s"snapshot's path ($p) — alternate between two locations")
    }
    val delta = prevSnapshot.map(_._2).getOrElse(0L)
    val deltaFold = Wal.readOnline(spark, walPath)
      .filter(col("lsn") > delta && col("lsn") <= upToLsn)
      .groupBy(col("key"))
      .agg(sum(col("delta")).as("value"))
    val state = prevSnapshot match {
      case None => deltaFold
      case Some((p, _)) => recover(read(spark, p), deltaFold)
    }
    write(state, snapshotPath)
    truncateOnline(spark, walPath, upToLsn)
  }

  /** Drop every online-WAL data directory whose ENTIRE lsn range is
    * ≤ `upToLsn`. Batch b covers lsns (Σ n_{<b}, Σ n_{<=b}] — computed
    * from the driver-size meta log, so coverage is decided without
    * scanning data. meta/ is never touched: future appends still
    * derive their offsets from it, and partially-covered batches stay
    * (their tail is still needed by [[recoverOnline]]). A WAL that has
    * not streamed yet (no meta) truncates to nothing. Private: callers
    * go through [[compactOnline]], which persists the snapshot before
    * any file is deleted.
    */
  private def truncateOnline(
      spark: SparkSession, walPath: String, upToLsn: Long): Seq[Long] = {
    if (!Wal.pathExists(spark, s"$walPath/meta")) return Seq.empty
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
