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

  test("heavy-hitter per-batch output is batch-sized, never the vocabulary") {
    // one shared heavy 3-gram plus four UNIQUE 3-grams per doc: the
    // maintained count table grows to ~481 n-grams while any single
    // 20-doc batch touches at most 100 — a complete-mode spelling
    // would re-emit the whole table every batch; update mode must
    // emit only the keys the batch touched
    val docs = (1 to 120).map { i =>
      (i.toLong, s"hot head gram u${i}a u${i}b u${i}c u${i}d")
    }.toDF("doc_id", "text")
    val vocabulary = docs
      .select(explode(CorpusStats.ngramStrings(
        graft.operators.TextAnalysis.tokens(col("text")), 3)).as("g"))
      .distinct().count()
    val emitted = scala.collection.mutable.Map[Long, Long]()
    val scratch = Files.createTempDirectory("graft-sstats-bounded").toString
    val streamed = StreamingStats.heavyNgramsFromFiles(
      spark, docs, "text", "doc_id", n = 3, k = 20,
      nBatches = 6, scratch, statePartitions = 4,
      onBatchRows = Some((bid, rows) => emitted.synchronized {
        emitted(bid) = rows; ()
      }))
      .as[(Long, String, Long)].collect().toSeq
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    assert(streamed == CorpusStats.heavyNgrams(docs, col("text"), n = 3, k = 20)
      .as[(Long, String, Long)].collect().toSeq)
    assert(emitted.size >= 6, s"expected >=6 micro-batches, saw $emitted")
    assert(vocabulary > 400L, s"fixture vocabulary too small: $vocabulary")
    emitted.foreach { case (bid, rows) =>
      // each batch of 20 docs holds at most 20*5=100 3-gram slots;
      // the batch's update set can never approach the full vocabulary
      assert(rows < vocabulary,
        s"batch $bid emitted $rows rows >= vocabulary $vocabulary")
      assert(rows <= 100L, s"batch $bid emitted $rows > its own content")
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

  test("streamed quantile sketch equals the batch answers under any batch split") {
    val events = spark.read.parquet(s"$Sf0001/events.parquet")
    val batch = graft.operators.Quantiles.quantiles(
      events, col("event_type"), col("value"), permille = Seq(500, 900))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    for (nBatches <- Seq(1, 4)) {
      val scratch = Files.createTempDirectory(s"graft-sqk-$nBatches").toString
      val streamed = StreamingStats.quantileSketchFromFiles(
        spark, events, "event_type", "value", "event_id",
        permille = Seq(500, 900), nBatches = nBatches, scratch,
        statePartitions = 4)
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"split into $nBatches batches diverged")
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

  test("streamed per-stratum totals equal the batch aggregate under any " +
    "split; BOTH curation rate derivations match batch on the drained frame") {
    import graft.operators.Corpus
    val docs = corpus(90).withColumn("lang",
      element_at(lit(Array("en", "fr", "zh")), (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
    val tokens = graft.operators.TextAnalysis.tokenCount(col("text")).cast("bigint")
    val batchTotals = docs.select(col("lang").as("stratum"), tokens.as("n_tokens"))
      .groupBy("stratum").agg(sum("n_tokens").as("total_tokens"))
      .as[(String, Long)].collect().toSet
    val targets = Map("en" -> 500, "fr" -> 300, "zh" -> 200)
    val batchMix = Corpus.mixtureRates(docs, col("lang"), tokens, targets)
      .as[(String, Long, Long)].collect().toSet
    val batchTemp = Corpus.temperatureRates(docs, col("lang"), tokens)
      .as[(String, Long, Long, Long)].collect().toSet
    for (nBatches <- Seq(1, 4)) {
      val scratch = Files.createTempDirectory(s"graft-stot-$nBatches").toString
      val totals = StreamingStats.stratumTotalsFromFiles(
        spark, docs, "lang", "text", "doc_id",
        nBatches = nBatches, scratch, statePartitions = 4)
      assert(totals.as[(String, Long)].collect().toSet == batchTotals,
        s"split into $nBatches batches diverged")
      val mix = Corpus.mixtureRatesFromTotals(totals, targets)
        .as[(String, Long, Long)].collect().toSet
      assert(mix == batchMix, "mixture rates diverged from batch")
      val temp = Corpus.temperatureRatesFromTotals(
        totals.select(col("stratum"), col("total_tokens").as("t")))
        .as[(String, Long, Long, Long)].collect().toSet
      assert(temp == batchTemp, "temperature rates diverged from batch")
      graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    }
  }
}
