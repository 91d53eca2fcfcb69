package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("metadata over binary payloads is deterministic and exact") {
    val docs = Seq((1L, "a" * 300), (2L, "xy")).toDF("doc_id", "text")
    val out = Multimodal.metadata(
      Multimodal.asMedia(docs, col("doc_id"), col("text"), "text/plain"))
      .select("doc_id", "n_bytes", "chunk_count")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 300L, 2L), (2L, 2L, 1L)))
  }

  test("stub decoder produces deterministic features with a stable schema") {
    val docs = Tables.load(spark, Sf0001, "documents").limit(20)
    val media = Multimodal.asMedia(docs, col("doc_id"), col("text"), "image/fake")
    val feats = Multimodal.decodeFeatures(spark, media)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("doc_id", "mime", "n_bytes", "width", "height", "feature"))
    val a = feats.collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(a.map(_.width).toSeq == b.map(_.width).toSeq)
    assert(a.forall(f => f.feature.length == 8 && f.width >= 16 && f.height >= 16))
  }
}
