package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained AGGREGATE table — the materialized-view
  * pattern: a stream keeps a grouped rollup (counts + sums per key)
  * current by merging each micro-batch's partial aggregate into a
  * bucketed parquet store. The additive twin of [[StreamingUpsert]],
  * and the harder exactly-once problem: last-write-wins is idempotent
  * by nature, but `+=` applied twice is WRONG. Structured Streaming's
  * `foreachBatch` contract is the lever — a recovered query REPLAYS a
  * batch under the SAME batch id — so each bucket records the last
  * batch id merged into it (`last_batch`) and a replay is skipped PER
  * BUCKET. A crash between the bucket rewrite and the checkpoint
  * commit replays the batch; buckets that already absorbed it refuse
  * it, buckets that missed it (dynamic partition overwrite commits
  * per-partition, so a torn write can land some buckets and not
  * others) absorb it now — converging to exactly-once content either
  * way. (CONTENT-duplicated input — the transport re-sending rows
  * under a new epoch — is upstream dedup's job: compose
  * `dropDuplicatesWithinWatermark` in front, as in
  * [[StreamingWindows.dedupedWindowedTotalsFromFiles]].)
  *
  * Scale mechanics mirror the upsert sink: the batch collapses to its
  * per-key partial FIRST (map-side combinable), only touched buckets
  * are read back (partition pruning), merged additively, and
  * rewritten via dynamic overwrite; per-batch cost is O(touched
  * buckets + batch), independent of store size or stream length.
  */
object StreamingRollup {

  /** Merge one micro-batch's rows additively into the rollup store.
    * `batch` is RAW rows (key cols `day`, `etype`; measure `cents`);
    * the per-key partial is computed here. Returns buckets rewritten
    * (0 for a fully-replayed batch).
    */
  def mergeAdditive(
      spark: SparkSession,
      batch: DataFrame, // (day: date, etype, cents)
      storeDir: String,
      nBuckets: Int,
      batchId: Long): Int = {
    val delta = batch
      .groupBy(col("day"), col("etype"))
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("cents"))
      .withColumn("last_batch", lit(batchId))
      .withColumn("bucket",
        pmod(xxhash64(col("day")), lit(nBuckets.toLong)).cast("int"))
    delta.cache()
    try {
      val touched = delta.select("bucket").distinct()
        .collect().map(_.getInt(0)).sorted // <= nBuckets scalars
      if (touched.isEmpty) return 0
      val store = new java.io.File(storeDir)
      val existing = touched.filter(b => new java.io.File(store, s"bucket=$b").exists())
      val old =
        if (existing.isEmpty) None
        else Some(spark.read
          .schema(delta.schema)
          .option("basePath", storeDir)
          .parquet(existing.map(b => s"$storeDir/bucket=$b"): _*))
      // replay guard, per bucket: a bucket whose last_batch already
      // reached batchId absorbed this delta in a previous attempt —
      // drop the delta rows headed there, keep the bucket untouched
      val applied: Set[Int] = old
        .map(_.groupBy(col("bucket")).agg(max(col("last_batch")).as("lb"))
          .collect().filter(_.getLong(1) >= batchId).map(_.getInt(0)).toSet)
        .getOrElse(Set.empty)
      val rewrite = touched.filterNot(applied)
      if (rewrite.isEmpty) return 0
      val fresh = delta.filter(!col("bucket").isin(applied.toSeq: _*))
      val oldInRewrite = old.map(_.filter(!col("bucket").isin(applied.toSeq: _*)))
      val merged = oldInRewrite.map(_.unionByName(fresh)).getOrElse(fresh)
        .groupBy(col("day"), col("etype"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt"), sum(col("cents")).as("cents"),
          max(col("last_batch")).as("last_batch"))
        .select(delta.columns.map(col): _*)
      // materialization barrier: `merged` reads the very partitions
      // the write below replaces. localCheckpoint TRUNCATES lineage,
      // so a lost block after the overwrite begins fails the job
      // (fail-stop) instead of silently recomputing from a
      // half-replaced bucket — a plain persist+count barrier would
      // recompute through the original lineage on cache loss. A
      // multi-node deployment would stage to a temp dir + swap (or
      // reliable-checkpoint) for retry-through instead of fail-stop.
      val sealed_ = merged.localCheckpoint(true)
      // cluster by the partition column: each task writes whole bucket
      // dirs (≤1 file per dir per batch), so a long stream's store
      // stays O(buckets) files instead of O(batches × tasks)
      sealed_.repartition(col("bucket")).write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(storeDir)
      rewrite.length
    } finally delta.unpersist()
  }

  /** File-fed end-to-end run (the gate-query spelling): events staged
    * as ts-ordered micro-batch files, each batch's daily partial
    * merged additively via `foreachBatch`; returns the final rollup —
    * exactly the clean batch GROUP BY (day, type).
    */
  def rollupFromFiles(
      spark: SparkSession,
      events: DataFrame, // (ts: timestamp, event_type, value)
      nBuckets: Int,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val storeDir = new java.io.File(base, "store").toString
    val narrow = events.select(
      col("ts").cast("timestamp").as("ts"),
      col("event_type").cast("string").as("etype"),
      round(col("value") * 100).cast("long").as("cents"))
    graft.sources.FileIO.stageRangeBatches(
      narrow, col("ts"), nBatches, new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    val q = graft.sources.FileIO
      .streamParquet(ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        mergeAdditive(
          ss, df.select(to_date(col("ts")).as("day"), col("etype"), col("cents")),
          storeDir, nBuckets, id)
        ()
      }
      .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    graft.sources.FileIO.deleteScratchOnExit(base)
    spark.read.parquet(storeDir)
      .select(col("day"), col("etype").as("event_type"),
        col("cnt").as("n_events"), col("cents").as("sum_cents"))
  }
}
