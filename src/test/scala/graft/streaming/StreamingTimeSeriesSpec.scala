package graft.streaming

import graft.SparkSpec
import graft.operators.TimeSeries
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingTimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(5)
    val motif = Seq(100L, 900L, 300L, 700L, 50L, 450L, 600L, 20L)
    (1L to 6L).flatMap { k =>
      val vs = Seq.fill(rnd.nextInt(10) + 4)(rnd.nextInt(1000).toLong) ++
        (if (k % 2 == 0) motif.map(_ + k * 100) else Seq.empty) ++
        Seq.fill(5)(rnd.nextInt(1000).toLong)
      vs.zipWithIndex.map { case (v, i) => (k, i.toLong * 10, k * 1000 + i, v) }
    }.toDF("k", "ts", "tb", "v")
  }

  test("streamed pattern matches equal the batch filter under any split") {
    val pattern = Array(100L, 900L, 300L, 700L, 50L, 450L, 600L, 20L)
    val maxDist = 1000000L
    val df = fixture
    val batch = TimeSeries.slidingWindows(
      df, col("k"), col("ts"), col("tb"), col("v"), 8)
      .select(col("k"), col("idx").cast("bigint").as("idx"),
        TimeSeries.centeredDistance(col("win"), pattern).as("dist"))
      .filter(col("dist") <= maxDist)
      .as[(Long, Long, Long)].collect().toSet
    // the planted (offset-shifted) motifs in the even series must match
    assert(batch.nonEmpty && batch.forall(_._3 == 0L))
    for (nBatches <- Seq(1, 3, 5)) {
      val scratch = Files.createTempDirectory(s"graft-sts-$nBatches").toString
      val streamed = StreamingTimeSeries.matchPatternFromFiles(
        spark, df, pattern, maxDist, nBatches, scratch, statePartitions = 4)
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"split $nBatches diverged")
      graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    }
  }

  test("per-key state stays O(w) however long the series") {
    val long = (0 until 500).map(i => (1L, i.toLong, i.toLong, (i % 7).toLong))
      .toDF("k", "ts", "tb", "v")
    val out = StreamingTimeSeries.matchPattern(
      long, Array(0L, 1L, 2L, 3L), maxDist = 0L)
      .collect()
    // periodic 0..6 series: ANY step-1 ascending 4-run matches at
    // distance zero (the metric is offset-invariant), i.e. windows
    // starting at idx mod 7 in {0,1,2,3}; runs crossing the 6->0
    // wrap do not
    assert(out.nonEmpty && out.forall(_.dist == 0L))
    assert(out.map(_.idx % 7).toSet == Set(0L, 1L, 2L, 3L))
    assert(out.length == (0 until 497).count(i => i % 7 <= 3))
  }
}
