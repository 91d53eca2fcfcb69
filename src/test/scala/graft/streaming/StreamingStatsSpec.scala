package graft.streaming

import graft.SparkSpec
import graft.operators.CorpusStats
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingStatsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = (1 to n).map { i =>
    (i.toLong, (0 to 8).map(j => s"w${(i * 5 + j * 3) % 17}").mkString(" "))
  }.toDF("doc_id", "text")

  test("streamed n-gram counts equal the batch operator under any batch split") {
    val docs = corpus(120)
    val batch = CorpusStats.heavyNgrams(docs, col("text"), n = 3, k = 20)
      .as[(Long, String, Long)].collect().toSeq
    for (nBatches <- Seq(1, 3, 7)) {
      val scratch = Files.createTempDirectory(s"graft-sstats-$nBatches").toString
      val streamed = StreamingStats.heavyNgramsFromFiles(
        spark, docs, "text", "doc_id", n = 3, k = 20,
        nBatches = nBatches, scratch, statePartitions = 4)
        .as[(Long, String, Long)].collect().toSeq
      assert(streamed == batch, s"split into $nBatches batches diverged")
      graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    }
  }

  test("streamed count-min sketch equals the batch sketch; state bounded by depth x width") {
    val docs = corpus(120)
    val grams = docs.select(explode(
      CorpusStats.ngramStrings(
        graft.operators.TextAnalysis.tokens(col("text")), 3)).as("ngram"))
    val batch = CorpusStats.countMinSketch(grams, col("ngram"), depth = 3, width = 64)
      .as[(Int, Long, Long)].collect().toSet
    for (nBatches <- Seq(1, 4)) {
      val scratch = Files.createTempDirectory(s"graft-scm-$nBatches").toString
      val streamed = StreamingStats.cmSketchFromFiles(
        spark, docs, "text", "doc_id", n = 3, depth = 3, width = 64,
        nBatches = nBatches, scratch, statePartitions = 4)
        .as[(Int, Long, Long)].collect().toSet
      assert(streamed == batch, s"split into $nBatches batches diverged")
      // the sketch (= the stateful agg's whole key space) is bounded
      // by construction, never the vocabulary
      assert(streamed.size <= 3 * 64)
      graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    }
  }

  test("streamed KMV estimate equals the batch estimate under any batch split") {
    val docs = corpus(120)
    val batch = CorpusStats.distinctKmv(
      docs.select(explode(
        graft.operators.TextAnalysis.tokens(col("text"))).as("tok")),
      col("tok"), k = 8)
      .as[(Long, Long, Long)].head()
    for (nBatches <- Seq(1, 4)) {
      val scratch = Files.createTempDirectory(s"graft-skmv-$nBatches").toString
      val streamed = StreamingStats.kmvFromFiles(
        spark, docs, "text", "doc_id", k = 8, salts = 4,
        nBatches = nBatches, scratch, statePartitions = 4)
        .as[(Long, Long, Long)].head()
      assert(streamed == batch, s"split into $nBatches batches diverged")
      graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    }
  }
}
