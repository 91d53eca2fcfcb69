package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a real LLM data
  * pipeline runs — quality gate → exact dedup → semantic dedup — as ONE
  * declarative Spark plan, so Catalyst sees (and optimizes) the whole
  * flow: the quality filter prunes before any shuffle, the fingerprint
  * group-by and the semi/anti joins each shuffle once on their natural
  * key, and the semantic stage reuses the bucketed-LSH machinery
  * ([[Dedup.embeddingNearDups]] — never all-pairs).
  *
  * Survivor rules (deterministic, oracle-checkable):
  *  1. quality gate: stopword-ratio `quality_milli >= minQualityMilli`
  *     (drops the 'low' band of [[TextAnalysis.qualityBand]]);
  *  2. exact dedup: of each identical-normal-form group, the smallest
  *     `doc_id` survives;
  *  3. semantic dedup: a doc is dropped iff it has a SMALLER-id
  *     near-duplicate (quantized cosine ≥ threshold) among the docs
  *     that reached this stage and have an embedding. Docs without an
  *     embedding pass through unexamined.
  */
object Curation {

  def curate(
      docs: DataFrame,
      embeddings: DataFrame, // (vec_id, embedding)
      minQualityMilli: Long = 30,
      minCosineMilli: Long = 350,
      bits: Int = 6,
      tables: Int = 8): DataFrame =
    build(docs, embeddings, minQualityMilli, minCosineMilli, bits, tables)._1

  /** (curated result, the internally-persisted survivor frame). */
  private def build(
      docs: DataFrame,
      embeddings: DataFrame,
      minQualityMilli: Long,
      minCosineMilli: Long,
      bits: Int,
      tables: Int): (DataFrame, DataFrame) = {
    val featured = docs.select(
      col("doc_id"),
      TextAnalysis.fingerprintMd5(col("text")).as("fingerprint"),
      TextAnalysis.qualityMilli(col("text")).as("quality_milli"),
      TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens"))
      .filter(col("quality_milli") >= minQualityMilli)
    // exact dedup as ONE shuffle: rank within the fingerprint group
    // instead of groupBy-min + semi-join (which would shuffle twice AND
    // re-derive `featured` — i.e. re-run the regex/md5 feature pass —
    // on both sides)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fingerprint")).orderBy(col("doc_id"))
    val kept = featured
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
      // `kept` feeds three scans (both sides of the LSH self-join and
      // the final anti-join); without materialization each would re-run
      // the full regex/md5 feature pass over the corpus. Its schema is
      // the narrow survivor projection (id + fingerprint + two ints),
      // so materializing it is O(ids), not O(text). localCheckpoint
      // (not persist): blocks live on the executors with lineage
      // truncated and are reclaimed by the ContextCleaner once the
      // result frame is unreachable — a long-lived session curating
      // many DISTINCT corpora leaks nothing, unlike a CacheManager
      // entry, which is keyed by analyzed plan and pinned for the JVM
      // lifetime. The trade: curate() runs the survivor computation
      // eagerly at call time. [[curateScoped]] additionally frees the
      // blocks deterministically on scope exit instead of at GC.
      .localCheckpoint()
    val withVec = kept.select("doc_id").join(
      embeddings.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
    val nearDropped = Dedup.embeddingNearDups(
      withVec, col("doc_id"), col("embedding"), minCosineMilli, bits, tables)
      .select(col("id_b").as("doc_id")).distinct()
    (kept.join(nearDropped, Seq("doc_id"), "left_anti"), kept)
  }

  /** Round-7 curation pipeline: MODEL-based quality gate → corpus-wide
    * LINE-level boilerplate dedup → exact dedup of the CLEANED text —
    * the composition that turns a raw crawl column into training
    * candidates, as one declarative plan over the round-7 operators
    * ([[CorpusStats.classifierScore]], [[Corpus.lineDedup]]). Note the
    * order matters and is the production order: dedup runs on the
    * post-boilerplate text, so two pages differing only in chrome
    * collapse to one.
    *
    * Emits ONE row per input document (curation must be auditable —
    * what was dropped and at which stage): (doc_id, passed_quality,
    * n_kept_lines, clean_md5, kept) where kept = passed the gate AND
    * non-empty after line dedup AND the smallest-id owner of its
    * cleaned fingerprint.
    */
  /** Cluster-aware KEEP-BEST dedup — fuzzy dedup that keeps the
    * best-quality REPRESENTATIVE instead of an arbitrary first-seen
    * survivor (what production corpus dedup actually wants: near-dup
    * clusters collapse to their highest-quality member). Pipeline:
    * the banded minhash candidate graph ([[Dedup
    * .nearDuplicateCandidatesPortable]]) → threshold-bounded
    * connected components ([[Clusters.duplicateClusters]], min-label
    * contract) → per-cluster argmax of (quality, then smallest id) as
    * ONE `max_by` aggregate (map-side combinable, never a window over
    * raw docs) joined back on the model-sized cluster key. Docs in no
    * pair are their own singleton cluster and always survive.
    * Returns (doc_id, cluster, quality_milli, kept).
    */
  def keepBestPerCluster(
      docs: DataFrame, id: Column, text: Column): DataFrame = {
    val pairs = Dedup.nearDuplicateCandidatesPortable(docs, text, id)
    val cl = Clusters.duplicateClusters(pairs, col("doc_a"), col("doc_b"))
      .select(col("id").as("doc_id"), col("cluster"))
    val lab = docs
      .select(id.as("doc_id"), TextAnalysis.qualityMilli(text).as("quality_milli"))
      .join(cl, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
    val best = lab.groupBy(col("cluster"))
      .agg(max_by(col("doc_id"),
        struct(col("quality_milli"), -col("doc_id"))).as("keep_id"))
    lab.join(best, "cluster")
      .select(col("doc_id"), col("cluster"), col("quality_milli"),
        (col("doc_id") === col("keep_id")).as("kept"))
  }

  def curateV2(
      docs: DataFrame, id: Column, text: Column,
      weights: DataFrame, buckets: Int,
      minLineChars: Int = 10): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("text"))
    // (doc_id, passed) is consumed by the line-dedup branch AND the
    // final audit join — checkpoint the narrow verdict frame so the
    // classifier pass over the corpus runs ONCE (same lineage-cut
    // discipline as curate's survivor frame; the big text column is
    // not in it)
    val scored = CorpusStats
      .classifierScore(base, col("doc_id"), col("text"), weights, buckets)
      .select(col("doc_id"), (col("score_sum") >= 0).as("passed"))
      .localCheckpoint(true)
    val gated = base.join(scored, Seq("doc_id"))
    // likewise: the cleaned-fingerprint frame feeds the dedup winners
    // AND the audit join — reduce it to fixed-width columns (md5, not
    // the rebuilt text) before the checkpoint
    val cleaned = Corpus
      .lineDedup(gated.filter(col("passed")), col("doc_id"), col("text"), minLineChars)
      .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
        col("n_kept"), (col("clean_text") =!= "").as("nonempty"))
      .localCheckpoint(true)
    val firsts = cleaned.filter(col("nonempty"))
      .groupBy(col("clean_md5")).agg(min(col("doc_id")).as("first_id"))
    scored
      .join(cleaned.select(col("doc_id"), col("clean_md5"), col("n_kept")),
        Seq("doc_id"), "left")
      .join(firsts, Seq("clean_md5"), "left")
      .select(col("doc_id"),
        col("passed").cast("bigint").as("passed_quality"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept_lines"),
        coalesce(col("clean_md5"), lit("")).as("clean_md5"),
        (col("passed") && col("first_id").isNotNull &&
          col("doc_id") === col("first_id")).cast("bigint").as("kept"))
  }

  /** Deterministic-lifecycle variant: the caller consumes the curated
    * frame inside `use` (collect / write / count — anything that
    * materializes), and the survivor frame's checkpoint blocks are
    * freed on the way out instead of waiting for the ContextCleaner to
    * notice the frame is unreachable ([[curate]]'s default).
    */
  def curateScoped[T](
      docs: DataFrame,
      embeddings: DataFrame,
      minQualityMilli: Long = 30,
      minCosineMilli: Long = 350,
      bits: Int = 6,
      tables: Int = 8)(use: DataFrame => T): T = {
    val (out, kept) =
      build(docs, embeddings, minQualityMilli, minCosineMilli, bits, tables)
    try use(out)
    finally { kept.unpersist(); () }
  }
}
