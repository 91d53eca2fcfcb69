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
      bits: Int = 4,
      tables: Int = 8): DataFrame = {
    val featured = docs.select(
      col("doc_id"),
      TextAnalysis.fingerprintMd5(col("text")).as("fingerprint"),
      TextAnalysis.qualityMilli(col("text")).as("quality_milli"),
      TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens"))
      .filter(col("quality_milli") >= minQualityMilli)
    val keepIds = featured
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val kept = featured.join(keepIds, Seq("doc_id"), "left_semi")
    val withVec = kept.join(
      embeddings.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
    val nearDropped = Dedup.embeddingNearDups(
      withVec, col("doc_id"), col("embedding"), minCosineMilli, bits, tables)
      .select(col("id_b").as("doc_id")).distinct()
    kept.join(nearDropped, Seq("doc_id"), "left_anti")
  }
}
