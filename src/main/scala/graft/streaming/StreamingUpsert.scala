package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming UPSERT sink — a keyed last-write-wins store maintained by
  * a stream (the CDC-apply / mutable-document-store pattern; Delta's
  * MERGE INTO, re-expressed on plain bucketed parquet): each
  * micro-batch merges into the store by key, newest (ts, tiebreak)
  * wins, and the store always reads as exactly one row per key.
  *
  * Scale mechanics — the whole design is "never touch the untouched":
  *  - The store is hash-bucketed into `nBuckets` partition dirs
  *    (`bucket=N/`). A micro-batch first collapses to its per-key
  *    LATEST (one `max_by` aggregate — map-side combinable), then
  *    computes the DISTINCT buckets it touches (≤ nBuckets scalars to
  *    the driver, never rows).
  *  - Only touched buckets are read back (partition pruning on the
  *    bucket column), merged (old ∪ batch, keep newest per key), and
  *    rewritten via DYNAMIC partition overwrite — untouched buckets
  *    are never opened. Per-batch cost is O(touched buckets + batch),
  *    independent of store size; at 100 TB, nBuckets scales the
  *    rewrite grain down (more buckets = smaller rewrites) with no
  *    change to the merge.
  *  - EXACTLY-ONCE from at-least-once: the merge is idempotent (a
  *    replayed batch re-asserts rows that already won or already
  *    lost — last-write-wins either way), so a crash between the
  *    bucket rewrite and the checkpoint commit costs one redundant,
  *    harmless re-merge. The spec drills this with injected
  *    redelivered batches.
  *
  * Reference analog: tspoon's queryable keyed state
  * (`tgraph/query/…`) exposes the LATEST committed value per key;
  * this operator materializes that contract as a table a batch
  * engine can scan, instead of an endpoint.
  */
object StreamingUpsert {

  /** Buckets rewritten per micro-batch of the last run (audit +
    * specs: must be ⊆ touched buckets, not the whole store).
    */
  @volatile private[streaming] var lastRewrites: Seq[Int] = Seq.empty

  /** Merge one micro-batch (any multiplicity per key) into the
    * bucketed store at `storeDir`, newest (tsm, tiebreak) per key
    * winning. Exposed for reuse and direct spec drills.
    */
  def mergeBatch(
      spark: SparkSession,
      batch: DataFrame, // (key, tsm, tiebreak, payload...)
      storeDir: String,
      nBuckets: Int): Int = {
    val ord = struct(col("tsm"), col("tiebreak"))
    val latest = batch
      .groupBy(col("key"))
      .agg(max_by(struct(batch.columns.map(col): _*), ord).as("r"))
      .select(col("r.*"))
      .withColumn("bucket", pmod(col("key"), lit(nBuckets.toLong)).cast("int"))
    latest.cache()
    try {
      val touched = latest.select("bucket").distinct()
        .collect().map(_.getInt(0)).sorted // <= nBuckets scalars
      if (touched.isEmpty) return 0
      val store = new java.io.File(storeDir)
      val existing = touched.filter(b => new java.io.File(store, s"bucket=$b").exists())
      val old =
        if (existing.isEmpty) None
        else Some(spark.read
          .schema(latest.schema) // bucket read back as a data column
          .option("basePath", storeDir)
          .parquet(existing.map(b => s"$storeDir/bucket=$b"): _*))
      val merged = old.map(_.unionByName(latest)).getOrElse(latest)
        .groupBy(col("key"))
        .agg(max_by(struct(latest.columns.map(col): _*), ord).as("r"))
        .select(col("r.*"))
      // materialization barrier: the merge reads the very partitions
      // the write below replaces. localCheckpoint TRUNCATES lineage,
      // so a lost block after the overwrite begins fails the job
      // (fail-stop) instead of silently recomputing from a
      // half-replaced bucket — a plain persist+count barrier would
      // recompute through the original lineage on cache loss.
      val sealed_ = merged.localCheckpoint(true)
      // dynamic overwrite: only partitions present in the batch (= the
      // touched buckets) are replaced; the rest of the store is unread.
      // Clustered by bucket so each rewrite leaves ≤1 file per dir —
      // the store stays O(buckets) files over any stream length.
      sealed_.repartition(col("bucket")).write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(storeDir)
      touched.length
    } finally latest.unpersist()
  }

  /** File-fed end-to-end run (the gate-query spelling): `events`
    * staged as ts-ordered micro-batch files (optionally with injected
    * redelivery), each batch merged into the store via [[mergeBatch]]
    * inside `foreachBatch`; returns the final store — one row per key,
    * the stream's newest (tsm, tiebreak) payload.
    */
  def upsertFromFiles(
      spark: SparkSession,
      events: DataFrame, // (user_id, ts: timestamp, event_id, value)
      nBuckets: Int,
      nBatches: Int,
      redeliver: Seq[Int],
      scratch: String,
      statePartitions: Int = 8): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val storeDir = new java.io.File(base, "store").toString
    val narrow = events.select(
      col("user_id").cast("long").as("key"),
      unix_micros(col("ts")).as("tsm"),
      col("event_id").cast("long").as("tiebreak"),
      round(col("value") * 100).cast("long").as("cents"))
    graft.sources.FileIO.stageRangeBatches(
      narrow, col("tsm"), nBatches, new java.io.File(base, "stage"), inDir)
    redeliver.foreach(graft.sources.FileIO.redeliverStagedFile(inDir, _))
    val ss = StreamSessions.scoped(spark, statePartitions)
    val rewrites = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = graft.sources.FileIO
      .streamParquet(ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        rewrites += mergeBatch(ss, df, storeDir, nBuckets)
        ()
      }
      .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    lastRewrites = rewrites.toSeq
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    graft.sources.FileIO.deleteScratchOnExit(base)
    spark.read.parquet(storeDir)
      .select(col("key").as("user_id"), col("tsm"),
        col("tiebreak").as("event_id"), col("cents"))
  }
}
