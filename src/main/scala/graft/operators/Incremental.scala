package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental recompute of the pretraining-prep pipeline — the
  * composition VERDICT row 86 (corpusDiff) was built for: given a new
  * corpus snapshot, the previous snapshot, and the PREVIOUS run's
  * outputs, reprocess only the slice the diff actually touches and
  * merge with the prior outputs. At 100 TB this is the difference
  * between a nightly full reprocess and an incremental one whose cost
  * scales with the edit volume.
  *
  * The pipeline is the `pipeline_pretrain` chain with one structural
  * change that makes shard-level invalidation sound: sequence packing
  * groups by SHARD (`pmod(doc_id, nShards)`) instead of by language,
  * so an edit perturbs only its own shard's positional layout (the
  * language-grouped packing makes every edit global: offsets of all
  * later docs in the stratum shift). Corpus storage partitioned by
  * the same shard key turns the touched-shard recompute into partition
  * pruning at the scan.
  *
  * Invalidation is exact, not heuristic:
  *  - the diff classifies every id on fingerprint PLUS the
  *    sampling-relevant metadata (`lang` keys the stratified sample
  *    rates and hash, `source` for symmetry with the CDC classifier)
  *    — a metadata-only flip with unchanged text still invalidates
  *    its shard, exactly as [[IncrementalCdc]] classifies it; the
  *    compare moves 32-byte digests + two small strings through one
  *    full-outer equi-join;
  *  - a fingerprint GROUP is touched iff a member was added, removed
  *    or changed; keep-first dedup state (`fingerprint → min kept id`)
  *    is recomputed for touched groups only and merged with the prior
  *    state by anti-join;
  *  - a SHARD is touched iff it holds a diff-classified id or an id
  *    whose kept flag could flip (old/new kept ids of touched groups —
  *    a removed duplicate promotes a copy that may live in an
  *    untouched-by-the-diff shard);
  *  - touched shards re-run the quality → dedup(kept state) → sample →
  *    pack chain on the NEW corpus restricted to those shards; prior
  *    packed rows of untouched shards carry over verbatim.
  *
  * Equivalence contract (oracle-gated): the merged output is
  * row-identical to a from-scratch [[pipelineSharded]] run on the new
  * corpus — the `pipeline_incremental` DuckDB oracle IS the full
  * recompute, so the gate proves incremental == full on every run.
  */
object Incremental {

  /** Maintain a keyed (count, sum) VIEW from a change feed
    * ([[graft.sources.ManifestStore.readChanges]]): associative
    * aggregates update by SIGNED deltas — inserts add, deletes
    * subtract — so an edit-sized feed updates the view with
    * edit-sized work, never re-reading the snapshot. `view` carries
    * (keyCols..., countCol, sumCol); `changes` carries the feed's
    * rows + `change`. Keys whose count reaches zero drop out
    * (matching a fresh aggregate over the new snapshot exactly).
    */
  def viewApplyChanges(
      view: DataFrame, changes: DataFrame, keyCols: Seq[String],
      valueCol: String, countCol: String, sumCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, sum, when}
    val sgn = when(col("change") === "insert", 1L).otherwise(-1L)
    val delta = changes
      .groupBy(keyCols.map(col): _*)
      .agg(sum(sgn).as("__dn"), sum(sgn * col(valueCol)).as("__dv"))
    // NULL-SAFE key match (<=>): a fresh groupBy puts all null keys in
    // ONE group, so the view row and the delta group for a null key
    // must merge — plain equality would keep them apart and the view
    // would diverge from the fresh aggregate on null-keyed data
    val d = keyCols.foldLeft(delta)(
      (df, k) => df.withColumnRenamed(k, s"__k_$k"))
    val cond = keyCols.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _)
    view.join(d, cond, "full")
      .select(keyCols.map(k => coalesce(col(k), col(s"__k_$k")).as(k)) ++ Seq(
        (coalesce(col(countCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(countCol),
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("__dv"), lit(0L)))
          .as(sumCol)): _*)
      .filter(col(countCol) > 0L)
  }

  /** Keep-first dedup state over the quality-passing corpus:
    * (fingerprint, keep_id, n_dups) — [[Dedup.exact]] on the gated
    * docs. Model of the corpus' duplicate structure; the incremental
    * path updates it group-wise instead of recomputing it.
    */
  def keptState(
      docs: DataFrame, id: Column, text: Column,
      minQualityMilli: Long): DataFrame =
    Dedup.exact(
      docs.filter(TextAnalysis.qualityMilli(text) >= minQualityMilli),
      text, id)

  /** The full sharded pipeline (the from-scratch reference): quality
    * gate → keep-first dedup → deterministic stratified sample →
    * position-level packing grouped by `pmod(doc_id, nShards)`.
    * Output: [[Corpus.packSequences]] rows, `grp` = shard.
    */
  def pipelineSharded(
      docs: DataFrame, nShards: Int, seqLen: Long,
      minQualityMilli: Long = 30L,
      ratesPerMille: Map[String, Int] = Map("en" -> 600),
      defaultPerMille: Int = 800): DataFrame =
    packStage(
      docs,
      keptState(docs, col("doc_id"), col("text"), minQualityMilli),
      nShards, seqLen, minQualityMilli, ratesPerMille, defaultPerMille)

  /** [[pipelineSharded]] against an EXPLICIT kept state — for callers
    * that already hold (or seal) `keptState(docs)`: the incremental
    * gates otherwise pay the corpus-sized fingerprint aggregate once
    * for the bootstrap pack and again for the prior state (guide §6
    * read-once). Value-identical to [[pipelineSharded]] when `kept` =
    * `keptState(docs)`.
    */
  def pipelineShardedWith(
      docs: DataFrame, kept: DataFrame, nShards: Int, seqLen: Long,
      minQualityMilli: Long = 30L,
      ratesPerMille: Map[String, Int] = Map("en" -> 600),
      defaultPerMille: Int = 800): DataFrame =
    packStage(
      docs, kept, nShards, seqLen, minQualityMilli, ratesPerMille,
      defaultPerMille)

  /** quality → kept-semi-join → sample → shard-pack over `docs`,
    * against an EXPLICIT kept state (the full path passes its own;
    * the incremental path passes the merged state while scanning only
    * touched shards).
    */
  private def packStage(
      docs: DataFrame, kept: DataFrame, nShards: Int, seqLen: Long,
      minQualityMilli: Long, ratesPerMille: Map[String, Int],
      defaultPerMille: Int): DataFrame = {
    val quality = docs.filter(
      TextAnalysis.qualityMilli(col("text")) >= minQualityMilli)
    val deduped = quality.join(
      kept.select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    val sampled = Corpus.stratifiedSample(
      deduped, col("doc_id"), col("lang"), ratesPerMille, defaultPerMille)
    Corpus.packSequences(
      sampled, col("doc_id"), pmod(col("doc_id"), lit(nShards.toLong)),
      TextAnalysis.tokenCount(col("text")).cast("bigint"), seqLen)
  }

  /** Write packed rows into the shard-partitioned parquet store with
    * DYNAMIC partition overwrite: only the shards present in `packed`
    * replace their directories; every other partition is neither read
    * nor rewritten — the [[graft.streaming.StreamingUpsert.mergeBatch]]
    * sink discipline applied to the pipeline output.
    */
  def writeShardStore(packed: DataFrame, storeDir: String): Unit =
    // cluster by the partition column: each task writes whole shard
    // dirs (≤1 file per dir) instead of every task touching every dir
    // — file count (and the commit's rename count) stays O(shards)
    packed.repartition(col("grp")).write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("grp")
      .parquet(storeDir)

  /** Read the shard store back with the packed schema (the explicit
    * schema + basePath trick keeps the `grp` partition column typed
    * bigint, exactly as [[Corpus.packSequences]] emits it).
    */
  /** The packed rows' schema ([[Corpus.packSequences]] output + the
    * `grp` partition column, kept bigint).
    */
  val PackedSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("grp", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seq_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("begin_in_seq", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("end_in_seq", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("doc_begin", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_piece", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("starts_doc", org.apache.spark.sql.types.BooleanType)))

  def readShardStore(
      spark: org.apache.spark.sql.SparkSession, storeDir: String): DataFrame =
    spark.read.schema(PackedSchema).option("basePath", storeDir).parquet(storeDir)

  /** The MATERIALIZED-STORE incremental step — the 100 TB shape: the
    * packed output lives as a parquet store partitioned by shard; a
    * run recomputes only the touched shards and dynamic-overwrites
    * exactly those partitions. Unlike [[pipelineIncremental]]'s
    * frame-level anti-join merge (which still reads and rewrites the
    * prior rows), untouched partitions here are NEVER read or
    * rewritten — prior-merge cost scales with the edit volume, not
    * the corpus. Returns (kept', touchedShards); the store at
    * `storeDir` is the packed output.
    */
  def pipelineIncrementalToStore(
      oldDocs: DataFrame, newDocs: DataFrame,
      priorKept: DataFrame, storeDir: String,
      nShards: Int, seqLen: Long,
      minQualityMilli: Long = 30L,
      ratesPerMille: Map[String, Int] = Map("en" -> 600),
      defaultPerMille: Int = 800): (DataFrame, DataFrame) = {
    val (keptMerged, _, touchedShards) = incrementalParts(
      oldDocs, newDocs, priorKept, nShards, minQualityMilli)
    val slice = newDocs.join(
      broadcast(touchedShards),
      pmod(col("doc_id"), lit(nShards.toLong)) === col("shard"), "left_semi")
    val packedTouched = packStage(
      slice, keptMerged, nShards, seqLen, minQualityMilli,
      ratesPerMille, defaultPerMille)
    overwritePartitions(
      packedTouched, "grp", touchedShards.collect().map(_.getLong(0)),
      storeDir, writeShardStore(_, storeDir))
    (keptMerged, touchedShards)
  }

  /** [[packStage]] for sibling composers (the CDC layer). */
  private[operators] def packTouched(
      docs: DataFrame, kept: DataFrame, nShards: Int, seqLen: Long,
      minQualityMilli: Long, ratesPerMille: Map[String, Int],
      defaultPerMille: Int): DataFrame =
    packStage(docs, kept, nShards, seqLen, minQualityMilli,
      ratesPerMille, defaultPerMille)

  /** [[overwritePartitions]] against the packed shard store. */
  private[operators] def overwriteTouchedPacked(
      packed: DataFrame, touched: Seq[Long], storeDir: String): Unit =
    overwritePartitions(packed, "grp", touched, storeDir,
      writeShardStore(_, storeDir))

  /** Dynamic-overwrite `rows` (which must hold ONLY partitions of
    * `touched` values of `partCol`) into `storeDir` via `write`, then
    * drop the partition directory of every touched value the rows do
    * NOT cover — dynamic overwrite alone leaves an emptied partition
    * stale. `touched` is model-sized (≤ nShards scalars).
    */
  private def overwritePartitions(
      rows: DataFrame, partCol: String, touched: Seq[Long],
      storeDir: String, write: DataFrame => Unit): Unit = {
    rows.persist()
    try {
      write(rows)
      val produced = rows.select(col(partCol)).distinct()
        .collect().map(_.getLong(0)).toSet
      touched.filterNot(produced).foreach { sh =>
        graft.sources.FileIO.deleteScratch(
          new java.io.File(storeDir, s"$partCol=$sh"))
      }
    } finally rows.unpersist()
  }

  /** The incremental step. Returns (kept', packed', touchedShards) —
    * feed kept'/packed' back in as the priors of the next run.
    * `touchedShards` is a ≤ nShards-row frame (shard) for the
    * recompute-fraction assertion and for partition pruning.
    */
  def pipelineIncremental(
      oldDocs: DataFrame, newDocs: DataFrame,
      priorKept: DataFrame, priorPacked: DataFrame,
      nShards: Int, seqLen: Long,
      minQualityMilli: Long = 30L,
      ratesPerMille: Map[String, Int] = Map("en" -> 600),
      defaultPerMille: Int = 800): (DataFrame, DataFrame, DataFrame) = {
    val (keptMerged, _, touchedShards) = incrementalParts(
      oldDocs, newDocs, priorKept, nShards, minQualityMilli)
    val slice = newDocs.join(
      broadcast(touchedShards),
      pmod(col("doc_id"), lit(nShards.toLong)) === col("shard"), "left_semi")
    val packedTouched = packStage(
      slice, keptMerged, nShards, seqLen, minQualityMilli,
      ratesPerMille, defaultPerMille)
    val packedMerged = priorPacked
      .join(broadcast(touchedShards), priorPacked("grp") === col("shard"), "left_anti")
      .unionByName(packedTouched)
    (keptMerged, packedMerged, touchedShards)
  }

  /** The shared invalidation core: diff → touched fingerprint groups →
    * merged kept state → touched shards. Returns (kept', touchedFps,
    * touchedShards).
    */
  private def incrementalParts(
      oldDocs: DataFrame, newDocs: DataFrame,
      priorKept: DataFrame, nShards: Int,
      minQualityMilli: Long = 30L): (DataFrame, DataFrame, DataFrame) = {
    val changed = metaDiff(oldDocs, newDocs)
      .filter(col("status") =!= "unchanged")
      .localCheckpoint(true) // edit-sized; cut so the 3 consumers don't re-diff
    val touchedFps = changed
      .select(explode(array(col("old_fp"), col("new_fp"))).as("fingerprint"))
      .filter(col("fingerprint").isNotNull)
      .distinct()
    // kept state of the touched groups, from the NEW corpus (narrow
    // fingerprint scan + semi-join on the touched digests)
    val keptTouched = Dedup.exact(
      newDocs.filter(TextAnalysis.qualityMilli(col("text")) >= minQualityMilli),
      col("text"), col("doc_id"))
      .join(touchedFps, Seq("fingerprint"), "left_semi")
      .localCheckpoint(true)
    val keptMerged = priorKept
      .join(touchedFps, Seq("fingerprint"), "left_anti")
      .unionByName(keptTouched)
    // shards needing a repack: diff-classified ids + any id whose kept
    // flag could flip (old/new kept ids of the touched groups)
    val flipIds = priorKept
      .join(touchedFps, Seq("fingerprint"), "left_semi")
      .select(col("keep_id").as("doc_id"))
      .unionByName(keptTouched.select(col("keep_id").as("doc_id")))
    val touchedShards = changed.select(col("doc_id"))
      .unionByName(flipIds)
      .select(pmod(col("doc_id"), lit(nShards.toLong)).as("shard"))
      .distinct()
      .localCheckpoint(true) // ≤ nShards rows
    (keptMerged, touchedFps, touchedShards)
  }

  /** [[Corpus.corpusDiff]] widened by the sampling-relevant metadata:
    * an id whose text fingerprint matches but whose `lang` or
    * `source` differs classifies `changed` — `lang` keys the
    * stratified-sample rate AND the keep-hash in [[packStage]], so a
    * metadata-only flip changes the merged output and MUST invalidate
    * its shard (the [[IncrementalCdc.applyDocEvents]] classification,
    * mirrored for the batch path). Null-safe compare: a null↔null
    * metadata pair is equal, null↔value is a change.
    */
  private def metaDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"),
      TextAnalysis.fingerprintMd5(col("text")).as("old_fp"),
      col("lang").as("old_lang"), col("source").as("old_source"))
    val n = newDocs.select(col("doc_id"),
      TextAnalysis.fingerprintMd5(col("text")).as("new_fp"),
      col("lang").as("new_lang"), col("source").as("new_source"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") === col("new_fp")
            && (col("old_lang") <=> col("new_lang"))
            && (col("old_source") <=> col("new_source")), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_fp"), col("new_fp"))
  }
}
