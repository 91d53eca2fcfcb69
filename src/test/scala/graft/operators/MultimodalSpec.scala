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

  test("resize caps the longest side, frame sampling strides frames") {
    val docs = Seq((1L, "x" * 1000), (2L, "y" * 100)).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs, col("doc_id"), col("text"), "video/fake")
    val feats = Multimodal.decodeFeatures(spark, media)
    val resized = Multimodal.resize(spark, feats, maxSide = 32).collect()
    assert(resized.forall(f => math.max(f.width, f.height) <= 32))
    assert(resized.forall(f => f.width >= 1 && f.height >= 1))
    val frames = Multimodal.frameSample(spark, media, everyNth = 3).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc(1L).length == math.ceil((1000 / 64).toDouble / 3).toInt)
    assert(byDoc(1L).map(_.frame_idx).sorted.toSeq == (0 until 1000 / 64 by 3).toSeq)
    assert(byDoc(2L).length == 1) // 100/64 = 1 fake frame
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
