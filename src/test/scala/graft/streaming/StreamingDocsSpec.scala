package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)

class StreamingDocsSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, sec: Int, text: String) =
    Doc(id, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + sec)), text)

  test("streaming ingest dedupes across micro-batches and matches the batch features") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      doc(0, 0, "the quick brown fox"),
      doc(1, 1, "a completely different document"),
      doc(2, 2, "the quick brown fox")) // in-batch dup of 0
    val batch2 = Seq(
      doc(3, 3, "the quick brown fox"), // cross-batch dup of 0
      doc(4, 4, "a third unique text here"))

    val input = MemoryStream[Doc]
    val q = StreamingDocs.ingest(input.toDF(), "ts").writeStream
      .format("memory").queryName("doc_stream")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()

      val out = spark.table("doc_stream")
        .select("doc_id", "fingerprint", "quality_milli", "predicted_lang", "n_tokens")
        .as[(Long, String, Long, String, Long)].collect()

      // one survivor per distinct text; the first-seen doc wins
      assert(out.map(_._1).sorted.toSeq == Seq(0L, 1L, 4L))

      // streaming features == batch features for the surviving docs
      val batchFeatures = StreamingDocs
        .features((batch1 ++ batch2).toDF(), col("text"))
        .select("doc_id", "fingerprint", "quality_milli", "predicted_lang", "n_tokens")
        .as[(Long, String, Long, String, Long)].collect()
        .filter(r => Set(0L, 1L, 4L)(r._1)).toSet
      assert(out.toSet == batchFeatures)
    } finally q.stop()
  }

  test("dedup state is keyed on fingerprint, not doc_id (plan has the stateful dedupe)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val plan = StreamingDocs.ingest(input.toDF(), "ts").queryExecution.analyzed.toString
    assert(plan.contains("Deduplicate"), plan)
    assert(plan.contains("fingerprint"), plan)
  }
}
