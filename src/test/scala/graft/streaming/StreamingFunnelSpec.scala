package graft.streaming

import graft.SparkSpec
import graft.operators.Funnel
import graft.tables.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val Steps = Seq("view", "click", "purchase")
  private val HorizonUs = 12L * 3600L * 1000000L

  test("streamed funnel report equals the batch kernel under any batch split") {
    val events = Tables.load(spark, Sf0001, "events")
    val batch = Funnel.funnelCounts(
      events, col("user_id"), col("ts"), col("event_type"), Steps, HorizonUs)
      .as[(Long, String, Long)].collect().toSet
    assert(batch.nonEmpty)
    for (nBatches <- Seq(1, 4)) {
      val scratch = Files.createTempDirectory(s"graft-sfun-$nBatches").toString
      val streamed = StreamingFunnel.funnelCountsFromFiles(
        spark,
        events.select(col("user_id"), col("ts"),
          col("event_id").as("tb"), col("event_type")),
        Steps, HorizonUs, nBatches = nBatches, scratch, statePartitions = 4)
        .as[(Long, String, Long)].collect().toSet
      assert(streamed == batch, s"split into $nBatches batches diverged")
      graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    }
  }

  test("depth advances across batches through carried slots, updates emit only on increase") {
    // one user whose chain spans all four batches: view in batch 1,
    // click in batch 2 (within horizon), noise in batch 3 (no emit),
    // purchase in batch 4 — the sink must hold exactly depths 1, 2, 3
    val base = 1704067200L * 1000000L
    val h = 3600L * 1000000L
    val rows = Seq(
      (1L, base, 1L, "view"),
      (1L, base + h / 4, 2L, "click"),
      (1L, base + h / 2, 3L, "view"), // no depth change -> no emission
      (1L, base + 3 * h / 4, 4L, "purchase"))
    val df = rows.toDF("user_id", "tsu", "tb", "event_type")
      .select(col("user_id"), timestamp_micros(col("tsu")).as("ts"),
        col("tb"), col("event_type"))
    val scratch = Files.createTempDirectory("graft-sfun-carry").toString
    val report = StreamingFunnel.funnelCountsFromFiles(
      spark, df, Steps, h, nBatches = 4, scratch, statePartitions = 2)
      .as[(Long, String, Long)].collect().toSet
    assert(report == Set((1L, "view", 1L), (2L, "click", 1L), (3L, "purchase", 1L)))
    // the RAW sink shows the emission discipline: exactly one row per
    // depth increase — the no-change batch emitted nothing
    val raw = spark.read.parquet(s"$scratch/out")
      .as[(Long, Long)].collect().toSeq
    assert(raw.sorted == Seq((1L, 1L), (1L, 2L), (1L, 3L)))
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
  }
}
