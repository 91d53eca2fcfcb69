package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming LLM-data ingest: the document-pipeline operators
  * ([[graft.operators.TextAnalysis]] / [[graft.operators.Dedup]]) wired
  * as a live Structured Streaming job — `readStream` → stateless
  * feature projection → watermarked streaming dedup → append sink.
  *
  * Shape notes for scale:
  *  - every per-document feature (fingerprint, quality, language,
  *    token count) is a stateless codegen'd Column — no shuffle, no
  *    state, embarrassingly parallel across executors;
  *  - exact dedup becomes Spark's streaming `dropDuplicates` keyed on
  *    the content fingerprint: keyed state sharded by the fingerprint
  *    hash, bounded by the event-time watermark horizon (documents
  *    arriving within the horizon dedupe exactly; the state store
  *    evicts fingerprints older than the watermark). This is the
  *    online analog of [[graft.operators.Dedup.exact]]'s hash-groupBy.
  */
object StreamingDocs {

  /** Feature projection shared by the batch and streaming paths —
    * defining it once is what makes "streaming == batch" testable.
    */
  def features(docs: DataFrame, text: Column): DataFrame =
    docs
      .withColumn("fingerprint", TextAnalysis.fingerprintMd5(text))
      .withColumn("quality_milli", TextAnalysis.qualityMilli(text))
      .withColumn("predicted_lang", TextAnalysis.predictedLang(text))
      .withColumn("n_tokens", TextAnalysis.tokenCount(text).cast("bigint"))
      .withColumn("repetition_milli", TextAnalysis.repetitionMilli(text, 2))
      .withColumn("clean_text",
        TextAnalysis.redactPii(TextAnalysis.stripMarkup(text)))

  /** The streaming ingest: watermarked exact dedup FIRST (the cheap
    * fingerprint column is all the stateful stage needs), then the
    * expensive feature projection over survivors only — at a 30%-dup
    * corpus that's 30% less regex work, and the state rows stay
    * minimal. First-seen document per fingerprint survives.
    *
    * `projectionParallelism` > 0 re-spreads the survivors over that
    * many partitions BEFORE the feature projection (guide §2: the
    * regex-heavy projection otherwise inherits the stateful stage's
    * shard count, which is sized to per-batch STATE, not to CPU — on
    * a 32-core session with 4 state shards that leaves 7/8 of the
    * cores idle for the most expensive stage). The extra exchange
    * moves only the batch's survivors; features are stateless, so
    * results are partitioning-independent.
    */
  def ingest(
      docs: DataFrame,
      eventTimeCol: String,
      watermark: String = "10 minutes",
      projectionParallelism: Int = 0): DataFrame = {
    val survivors = docs
      .withColumn("fingerprint", TextAnalysis.fingerprintMd5(col("text")))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicates("fingerprint")
    val deduped =
      if (projectionParallelism > 0) survivors.repartition(projectionParallelism)
      else survivors
    deduped
      .withColumn("quality_milli", TextAnalysis.qualityMilli(col("text")))
      .withColumn("predicted_lang", TextAnalysis.predictedLang(col("text")))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("bigint"))
      .withColumn("repetition_milli", TextAnalysis.repetitionMilli(col("text"), 2))
      .withColumn("clean_text",
        TextAnalysis.redactPii(TextAnalysis.stripMarkup(col("text"))))
  }

  /** The full streaming ingest driven off staged files: documents are
    * range-partitioned by `orderCol` into contiguous micro-batch files
    * (distributed write, driver touches only file metadata), streamed
    * through [[ingest]], and appended to an exactly-once parquet file
    * sink. Returns the ingested (deduplicated, feature-projected)
    * corpus as a batch DataFrame.
    */
  def ingestFromFiles(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame,
      orderCol: Column,
      eventTimeCol: String,
      nBatches: Int,
      scratch: String,
      watermark: String = "10 minutes",
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    graft.sources.FileIO.stageRangeBatches(
      docs, orderCol, nBatches, new java.io.File(base, "stage"), inDir)
    // The stateful stage's shard count is pinned by shuffle.partitions
    // at first checkpoint; size it to the per-micro-batch state, not
    // the session's batch-join width — loading/committing W stores per
    // batch is the fixed cost that dominates small batches. The cloned
    // session scopes that + the RocksDB state store to this query (the
    // shared session's concurrent batch queries keep their own conf).
    // The regex projection is DECOUPLED from the shard count (it runs
    // at the session's core count via projectionParallelism), so the
    // state sizing no longer drags the projection down to 4-8 tasks —
    // formerly this helper pinned 8 shards as a compromise between
    // state fixed cost and projection parallelism.
    val ss = StreamSessions.scoped(spark, statePartitions)
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, docs.schema, maxFilesPerTrigger = 1)
    val q = graft.sources.FileIO.streamingParquetSink(
      ingest(stream, eventTimeCol, watermark,
        projectionParallelism = ss.sparkContext.defaultParallelism),
      outDir.toString, new java.io.File(base, "ckpt").toString).start()
    q.awaitTermination()
    // only the sink output outlives the run (the returned frame reads it)
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    spark.read.parquet(outDir.toString)
  }

  /** Online BPE encoding: documents replay as micro-batch files
    * through [[graft.operators.Bpe.encodeDocsStateless]] — the model
    * (a trained merge list) is a plan literal, the projection is
    * stateless (no watermark, no state store, no shuffle; every
    * micro-batch is embarrassingly parallel), and the append sink is
    * exactly-once. The batch [[graft.operators.Bpe.encodeDocs]] and
    * this stream produce identical rows, so they share one oracle.
    */
  def encodeBpeFromFiles(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame,
      orderCol: Column,
      merges: Seq[graft.operators.BpeMerge],
      nBatches: Int,
      scratch: String): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    graft.sources.FileIO.stageRangeBatches(
      docs, orderCol, nBatches, new java.io.File(base, "stage"), inDir)
    val stream = graft.sources.FileIO.streamParquet(
      spark, inDir.toString, docs.schema, maxFilesPerTrigger = 1)
    val q = graft.sources.FileIO.streamingParquetSink(
      graft.operators.Bpe.encodeDocsStateless(
        stream, org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"), merges),
      outDir.toString, new java.io.File(base, "ckpt").toString).start()
    q.awaitTermination()
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    spark.read.parquet(outDir.toString)
  }
}
