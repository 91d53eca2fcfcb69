package graft.streaming

import graft.SparkSpec
import graft.analytics.Analytics
import graft.tables.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  test("streamed sessions equal the batch sessionizer under any batch split") {
    val events = Tables.load(spark, Sf0001, "events")
    val batch = Analytics.sessionize(
      events, col("user_id"), col("ts"), col("event_id"), 1800L)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("session_cents"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    for (nBatches <- Seq(1, 4)) {
      val scratch = Files.createTempDirectory(s"graft-sess-$nBatches").toString
      val streamed = StreamingSessions.sessionizeFromFiles(
        spark,
        events.select(col("user_id"), col("ts"),
          col("event_id").as("tb"), cents(col("value")).as("cents")),
        gapUs = 1800L * 1000000L, nBatches = nBatches, scratch,
        statePartitions = 4)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"split into $nBatches batches diverged")
      graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    }
  }

  // epoch-0 event times coincide with Spark's INITIAL watermark and are
  // dropped as late — start synthetic clocks at a real date instead
  private val BaseUs = 1704067200L * 1000000L // 2024-01-01T00:00:00Z

  test("gap boundary: exactly-gap extends the session, gap+1us breaks it") {
    // key 1: events +0s, +1800s (== gap: extends), +3600s (== gap again)
    // key 2: events +0s, +1800.000001s (> gap: breaks)
    val gapUs = 1800L * 1000000L
    val rows = Seq(
      (1L, BaseUs, 1L, 10L), (1L, BaseUs + gapUs, 2L, 20L),
      (1L, BaseUs + 2 * gapUs, 3L, 30L),
      (2L, BaseUs, 1L, 10L), (2L, BaseUs + gapUs + 1L, 2L, 20L))
    val df = rows.toDF("user_id", "tsu", "tb", "cents")
      .select(col("user_id"), timestamp_micros(col("tsu")).as("ts"),
        col("tb"), col("cents"))
    val expected = Set(
      (1L, 1L, 3L, 60L), // one session of all three events
      (2L, 1L, 1L, 10L), (2L, 2L, 1L, 20L)) // split at gap+1us
    val batch = Analytics.sessionize(
      df.withColumn("value", col("cents") / 100.0),
      col("user_id"), col("ts"), col("tb"), 1800L)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("session_cents"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch == expected, "batch operator boundary semantics")
    val scratch = Files.createTempDirectory("graft-sess-edge").toString
    val streamed = StreamingSessions.sessionizeFromFiles(
      spark, df, gapUs = gapUs, nBatches = 2, scratch, statePartitions = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == expected, "streaming operator boundary semantics")
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
  }

  test("every event its own session: gap crossings and timeout re-arming across batches") {
    // eight singleton sessions spread over four ts-ordered batches:
    // each batch both closes sessions by gap-crossing AND re-arms the
    // open session's timeout; the final two flush by watermark timeout
    val gapUs = 60L * 1000000L
    val rows = (0 until 8).map { i =>
      (1L, BaseUs + i.toLong * 2 * gapUs, i.toLong, 1L) // every event its own session
    }
    val df = rows.toDF("user_id", "tsu", "tb", "cents")
      .select(col("user_id"), timestamp_micros(col("tsu")).as("ts"),
        col("tb"), col("cents"))
    val scratch = Files.createTempDirectory("graft-sess-mid").toString
    val out = StreamingSessions.sessionizeFromFiles(
      spark, df, gapUs = gapUs, nBatches = 4, scratch, statePartitions = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == (1 to 8).map(i => (1L, i.toLong, 1L, 1L)).toSet)
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
  }
}
