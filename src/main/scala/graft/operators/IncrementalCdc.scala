package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CONTINUOUS pipeline maintenance from a stream of document events —
  * the CDC composition on top of [[Incremental]]: the corpus itself
  * lives in a shard-partitioned parquet store, upsert/delete events
  * arrive in micro-batches, and each batch updates THREE materialized
  * artifacts touching only what the batch invalidates:
  *
  *  1. the CORPUS store — the batch's buckets rewrite via dynamic
  *     partition overwrite (old rows minus batch ids, plus upserts);
  *  2. the KEPT state (fingerprint → min kept id) — recomputed
  *     group-wise for the batch's touched fingerprints only;
  *  3. the PACKED store — shards holding a classified id or a
  *     possible kept-flip repack from a PARTITION-PRUNED corpus-store
  *     read and dynamic-overwrite their partitions.
  *
  * The batch IS the diff: no full-corpus fingerprint compare runs —
  * old fingerprints come from the batch buckets' own rows (read
  * anyway for the store rewrite). A text-unchanged upsert that flips
  * `lang`/`source` still classifies as changed (those columns drive
  * sampling and packing). The one full-corpus read per batch is the
  * NARROW fingerprint scan feeding the touched-group kept recompute
  * (at 100 TB, replaceable by a fingerprint→members index — the
  * standard dedup-index refinement).
  *
  * Equivalence contract (oracle-gated): after draining any split of
  * the event stream, the packed store is row-identical to a
  * from-scratch [[Incremental.pipelineSharded]] run on the final
  * corpus — the `stream_pipeline_cdc` gate shares the full-recompute
  * oracle verbatim.
  */
object IncrementalCdc {

  val CorpusSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("shard", LongType)))

  def writeCorpusStore(docs: DataFrame, nShards: Int, storeDir: String): Unit =
    docs.select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars").cast("long").as("n_chars"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard")
      .parquet(storeDir)

  /** Read the corpus store; `shards = Some(…)` prunes the read to
    * those partition directories (the touched-bucket read the CDC
    * step leans on — nothing else is opened).
    */
  def readCorpusStore(
      spark: SparkSession, storeDir: String,
      shards: Option[Seq[Long]] = None): DataFrame = shards match {
    case None =>
      spark.read.schema(CorpusSchema).option("basePath", storeDir).parquet(storeDir)
    case Some(ss) =>
      val dirs = ss.distinct
        .filter(s => new java.io.File(storeDir, s"shard=$s").exists())
        .map(s => s"$storeDir/shard=$s")
      if (dirs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], CorpusSchema)
      else
        spark.read.schema(CorpusSchema).option("basePath", storeDir)
          .parquet(dirs: _*)
  }

  /** Apply ONE micro-batch of document events. `events` columns:
    * (doc_id, text, lang, source, n_chars, is_delete, ev_seq) — the
    * highest `ev_seq` per id wins within the batch (at-least-once
    * redelivery of an identical event is absorbed by the unchanged
    * classification). Returns (kept', touchedShards); both stores are
    * updated in place. Feed kept' into the next batch.
    */
  def applyDocEvents(
      spark: SparkSession,
      events: DataFrame,
      corpusDir: String,
      priorKept: DataFrame,
      packedDir: String,
      nShards: Int, seqLen: Long,
      minQualityMilli: Long = 30L,
      ratesPerMille: Map[String, Int] = Map("en" -> 600),
      defaultPerMille: Int = 800): (DataFrame, DataFrame) = {
    val evCols = Seq("doc_id", "text", "lang", "source", "n_chars", "is_delete")
    val evs = events
      .groupBy(col("doc_id"))
      .agg(max_by(
        struct((evCols :+ "ev_seq").map(col): _*), col("ev_seq")).as("r"))
      .select(evCols.map(c => col(s"r.$c")): _*)
      .localCheckpoint(true) // batch-sized
    val batchShards = evs
      .select(pmod(col("doc_id"), lit(nShards.toLong)).as("shard"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val oldBuckets = readCorpusStore(spark, corpusDir, Some(batchShards))
    val oldOfIds = oldBuckets
      .join(evs.select("doc_id"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        TextAnalysis.fingerprintMd5(col("text")).as("old_fp"),
        col("lang").as("old_lang"), col("source").as("old_source"))
    // the batch IS the diff: classify against the batch buckets' rows
    val cls = evs
      .join(oldOfIds, Seq("doc_id"), "left")
      .select(col("doc_id"), col("old_fp"),
        when(col("is_delete"), lit(null).cast("string"))
          .otherwise(TextAnalysis.fingerprintMd5(col("text"))).as("new_fp"),
        when(col("is_delete") && col("old_fp").isNull, "noop")
          .when(col("is_delete"), "removed")
          .when(col("old_fp").isNull, "added")
          .when(col("old_fp") === col("new_fp")
            && col("old_lang") === col("lang")
            && col("old_source") === col("source"), "unchanged")
          .otherwise(lit("changed")).as("status"))
    val changed = cls.filter(!col("status").isin("noop", "unchanged"))
      .localCheckpoint(true) // edit-sized
    // 1. CORPUS store: batch buckets rewrite (old rows minus batch
    //    ids, plus live upserts), partitions not in the batch untouched
    val newBuckets = oldBuckets
      .join(evs.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(evs.filter(!col("is_delete")).drop("is_delete")
        .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong))))
    writeCorpusPartitions(newBuckets, batchShards, corpusDir)
    // 2. KEPT state: touched fingerprint groups recompute from the
    //    UPDATED corpus (one narrow fingerprint scan)
    val touchedFps = changed
      .select(explode(array(col("old_fp"), col("new_fp"))).as("fingerprint"))
      .filter(col("fingerprint").isNotNull)
      .distinct()
    val newCorpus = readCorpusStore(spark, corpusDir)
    val keptTouched = Dedup.exact(
      newCorpus.filter(TextAnalysis.qualityMilli(col("text")) >= minQualityMilli),
      col("text"), col("doc_id"))
      .join(touchedFps, Seq("fingerprint"), "left_semi")
      .localCheckpoint(true)
    val kept2 = priorKept
      .join(touchedFps, Seq("fingerprint"), "left_anti")
      .unionByName(keptTouched)
      .localCheckpoint(true) // feeds the next batch — cut lineage
    // 3. PACKED store: classified ids + possible kept-flips repack
    val flipIds = priorKept
      .join(touchedFps, Seq("fingerprint"), "left_semi")
      .select(col("keep_id").as("doc_id"))
      .unionByName(keptTouched.select(col("keep_id").as("doc_id")))
    val touchedShards = changed.select(col("doc_id"))
      .unionByName(flipIds)
      .select(pmod(col("doc_id"), lit(nShards.toLong)).as("shard"))
      .distinct()
      .localCheckpoint(true) // ≤ nShards rows
    val touchedIds = touchedShards.collect().map(_.getLong(0)).toSeq
    val slice = readCorpusStore(spark, corpusDir, Some(touchedIds)).drop("shard")
    val packedTouched = Incremental.packTouched(
      slice, kept2, nShards, seqLen, minQualityMilli,
      ratesPerMille, defaultPerMille)
    Incremental.overwriteTouchedPacked(packedTouched, touchedIds, packedDir)
    (kept2, touchedShards)
  }

  private def writeCorpusPartitions(
      rows: DataFrame, batchShards: Seq[Long], corpusDir: String): Unit = {
    rows.persist()
    try {
      // barrier: `rows` reads the very partitions the write below
      // replaces — materialize before the overwrite so no task can
      // observe a half-replaced bucket, whatever the commit protocol
      // (the mergeBatch discipline)
      rows.count()
      rows.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard")
        .parquet(corpusDir)
      val produced = rows.select(col("shard")).distinct()
        .collect().map(_.getLong(0)).toSet
      batchShards.filterNot(produced).foreach { sh =>
        graft.sources.FileIO.deleteScratch(
          new java.io.File(corpusDir, s"shard=$sh"))
      }
    } finally rows.unpersist()
  }

  /** File-fed end-to-end run (the gate-query spelling): doc events
    * stage as `ev_seq`-ordered micro-batch files; stores initialize
    * from `initialDocs`; each micro-batch applies through
    * [[applyDocEvents]] inside `foreachBatch` (the kept state threads
    * through on the driver); returns the drained packed store.
    */
  def pipelineFromDocEventsFromFiles(
      spark: SparkSession,
      events: DataFrame, // (doc_id, text, lang, source, n_chars, is_delete, ev_seq)
      initialDocs: DataFrame,
      nBatches: Int,
      scratch: String,
      nShards: Int, seqLen: Long,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val corpusDir = new java.io.File(base, "corpus").toString
    val packedDir = new java.io.File(base, "packed").toString
    graft.sources.FileIO.stageRangeBatches(
      events, col("ev_seq"), nBatches, new java.io.File(base, "stage"), inDir)
    writeCorpusStore(initialDocs, nShards, corpusDir)
    Incremental.writeShardStore(
      Incremental.pipelineSharded(initialDocs, nShards, seqLen), packedDir)
    var kept = Incremental.keptState(
      initialDocs, col("doc_id"), col("text"), minQualityMilli = 30L)
      .localCheckpoint(true)
    val ss = graft.streaming.StreamSessions.scoped(spark, statePartitions)
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, events.schema, maxFilesPerTrigger = 1)
    val q = stream.writeStream
      .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (k2, _) = applyDocEvents(
          spark, batch, corpusDir, kept, packedDir, nShards, seqLen)
        kept = k2
      }
      .start()
    q.awaitTermination()
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    graft.sources.FileIO.deleteScratchOnExit(base)
    Incremental.readShardStore(spark, packedDir)
  }
}
