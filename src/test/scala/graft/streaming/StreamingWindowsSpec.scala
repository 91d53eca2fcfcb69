package graft.streaming

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def batchTotals(events: org.apache.spark.sql.DataFrame) =
    events
      .select(col("ts"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
      .select(unix_micros(col("window.start")).as("win_us"),
        col("event_type"), col("n_events"), col("sum_cents"))

  test("streamed windowed totals equal the batch rollup under any batch split") {
    val events = Tables.load(spark, Sf0001, "events")
    val batch = batchTotals(events)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    for (nBatches <- Seq(1, 4)) {
      val scratch = Files.createTempDirectory(s"graft-swin-$nBatches").toString
      val streamed = StreamingWindows.windowedTotalsFromFiles(
        spark, events.select(col("ts"), col("event_type"), col("value")),
        windowDur = "1 hour", delay = "0 seconds",
        nBatches = nBatches, scratch, statePartitions = 4)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(streamed == batch, s"split into $nBatches batches diverged")
    }
  }

  test("watermark evicts closed windows: zero state rows after a sentinel-flushed drain") {
    val events = Tables.load(spark, Sf0001, "events")
    val scratch = Files.createTempDirectory("graft-swin-evict").toString
    StreamingWindows.windowedTotalsFromFiles(
      spark, events.select(col("ts"), col("event_type"), col("value")),
      windowDur = "1 hour", delay = "0 seconds",
      nBatches = 4, scratch, statePartitions = 4)
      .collect()
    // every window closed by the sentinel -> the aggregation operator
    // holds NO state at termination; stream-length-proportional state
    // would show up here as open-window rows
    assert(StreamingWindows.lastStateRows == 0L,
      s"expected fully evicted state, got ${StreamingWindows.lastStateRows}")
  }

  test("at-least-once redelivery dedupes to the clean rollup; agg drains, dedup keeps only its delay tail") {
    val events = Tables.load(spark, Sf0001, "events")
    val batch = batchTotals(events)
      .as[(Long, String, Long, Long)].collect().toSet
    val scratch = Files.createTempDirectory("graft-swin-dedup").toString
    val streamed = StreamingWindows.dedupedWindowedTotalsFromFiles(
      spark,
      events.select(col("event_id"), col("ts"), col("event_type"), col("value")),
      windowDur = "1 hour", delay = "3 hours",
      nBatches = 4, redeliver = Seq(0, 3), scratch, statePartitions = 4)
      .as[(Long, String, Long, Long)].collect().toSet
    // redelivered batches 0 (arrives late -> dropped by lateness) and
    // 3 (within the delay -> dropped by the dedup store) must both
    // vanish: any survivor inflates a window's count
    assert(streamed == batch, "redelivered rows leaked into the rollup")
    val byOp = StreamingWindows.lastStateRowsByOp
    val aggRows = byOp.collect { case (op, n) if op.contains("Aggregate") || op.contains("stateStoreSave") => n }.sum
    val dedupRows = byOp.collect { case (op, n) if op.toLowerCase.contains("dedup") => n }.sum
    assert(byOp.size == 2, s"expected 2 stateful operators, got $byOp")
    assert(aggRows == 0L, s"aggregate state not drained: $byOp")
    // dedup retains exactly the keys within the watermark delay of the
    // sentinel-advanced watermark -- a bounded tail, far below input
    assert(dedupRows < 500L, s"dedup state unbounded: $byOp")
  }

  test("sliding windows: every event lands in dur/slide windows, streamed equals batch") {
    val events = Tables.load(spark, Sf0001, "events")
    val batch = events
      .select(col("ts"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
      .select(unix_micros(col("window.start")).as("win_us"),
        col("event_type"), col("n_events"), col("sum_cents"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    val scratch = Files.createTempDirectory("graft-swin-slide").toString
    val streamed = StreamingWindows.slidingTotalsFromFiles(
      spark, events.select(col("ts"), col("event_type"), col("value")),
      windowDur = "2 hours", slide = "1 hour", delay = "0 seconds",
      nBatches = 4, scratch, statePartitions = 4)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(streamed == batch, "sliding rollup diverged")
    assert(StreamingWindows.lastStateRows == 0L,
      s"expected fully evicted state, got ${StreamingWindows.lastStateRows}")
  }

  test("session windows: streamed per-session rollup equals batch, sessions close by watermark") {
    val events = Tables.load(spark, Sf0001, "events")
    val batch = events
      .select(col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("s"),
        unix_micros(col("session_window.end")).as("e"),
        col("n_events"), col("sum_cents"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    val scratch = Files.createTempDirectory("graft-swin-sess").toString
    val streamed = StreamingWindows.sessionTotalsFromFiles(
      spark, events.select(col("user_id"), col("ts"), col("value")),
      gap = "30 minutes", delay = "0 seconds",
      nBatches = 4, scratch, statePartitions = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch, "session rollup diverged")
    assert(StreamingWindows.lastStateRows == 0L,
      s"expected fully evicted state, got ${StreamingWindows.lastStateRows}")
  }

  test("session merging across micro-batches: one session spanning batches emits once, merged") {
    // one user, three events 10 min apart (gap 30 min -> ONE session),
    // each in its own micro-batch; a fourth event 40 min later starts
    // a second session
    val base = 1704067200L * 1000000L
    val m = 60L * 1000000L
    val rows = Seq(
      (7L, base, 1.0), (7L, base + 10 * m, 2.0),
      (7L, base + 20 * m, 3.0), (7L, base + 60 * m, 4.0))
    val df = rows.toDF("user_id", "tsu", "value")
      .select(col("user_id"), timestamp_micros(col("tsu")).as("ts"),
        col("value"))
    val scratch = Files.createTempDirectory("graft-swin-merge").toString
    val got = StreamingWindows.sessionTotalsFromFiles(
      spark, df, gap = "30 minutes", delay = "0 seconds",
      nBatches = 4, scratch, statePartitions = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (7L, base, base + 20 * m + 30 * m, 3L, 600L),
      (7L, base + 60 * m, base + 60 * m + 30 * m, 1L, 400L)), s"got $got")
  }

  test("checkpoint resume: stop after half the stream, restart on the same checkpoint, equals batch") {
    val events = Tables.load(spark, Sf0001, "events")
    val batch = batchTotals(events)
      .as[(Long, String, Long, Long)].collect().toSet
    val scratch = Files.createTempDirectory("graft-swin-resume").toString
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    val ckpt = new java.io.File(base, "ckpt").toString
    val narrow = events.select(
      col("ts"), col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    // phase 1: only the first half of the staged files exist; the
    // query drains them and STOPS (windows still open in state)
    graft.sources.FileIO.stageRangeBatches(
      narrow, col("ts"), 4, new java.io.File(base, "stage"), inDir)
    val held = Option(inDir.listFiles()).get.filter(_.getName >= "b00002")
    val stash = new java.io.File(base, "stash")
    stash.mkdirs()
    val mtimes = held.map(f => f.getName -> f.lastModified()).toMap
    held.foreach { f =>
      java.nio.file.Files.move(
        f.toPath, new java.io.File(stash, f.getName).toPath)
    }
    val ss = StreamSessions.scoped(spark, 4)
    def run(): Unit = {
      val stream = graft.sources.FileIO
        .streamParquet(ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
        .withWatermark("ts", "0 seconds")
      val q = graft.sources.FileIO.streamingParquetSink(
        StreamingWindows.windowedTotals(stream, "1 hour"),
        outDir.toString, ckpt).start()
      q.awaitTermination()
    }
    run()
    val afterPhase1 = spark.read.parquet(outDir.toString).count()
    assert(afterPhase1 < batch.size, "phase 1 unexpectedly complete")
    // phase 2: the rest of the files + the flush sentinel appear; a NEW
    // query on the SAME checkpoint must resume the open state, not
    // re-emit or drop phase-1 windows
    Option(stash.listFiles()).get.foreach { f =>
      val dst = new java.io.File(inDir, f.getName)
      java.nio.file.Files.move(f.toPath, dst.toPath)
      dst.setLastModified(mtimes(f.getName))
    }
    val maxTs = narrow.agg(max(col("ts"))).head().getTimestamp(0)
    graft.sources.FileIO.appendSentinelFile(
      spark, inDir,
      Seq((maxTs.getTime * 1000L + 2L * 3600L * 1000000L,
        StreamingWindows.FlushSentinel, 0L))
        .toDF("tsu", "event_type", "cents")
        .select(timestamp_micros(col("tsu")).as("ts"),
          col("event_type"), col("cents")))
    val stream2 = graft.sources.FileIO
      .streamParquet(ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
      .withWatermark("ts", "0 seconds")
      .filter(col("ts") <= lit(maxTs))
    val q2 = graft.sources.FileIO.streamingParquetSink(
      StreamingWindows.windowedTotals(stream2, "1 hour"),
      outDir.toString, ckpt).start()
    q2.awaitTermination()
    val got = spark.read.parquet(outDir.toString)
      .as[(Long, String, Long, Long)].collect()
    assert(got.length == got.toSet.size, "a window emitted twice across the restart")
    assert(got.toSet == batch, "resumed stream diverged from batch")
    graft.sources.FileIO.deleteScratch(base)
  }

  test("rows behind the watermark are dropped, not misaggregated") {
    // batch files arrive ts-ordered except one LATE row: it lands two
    // files later, 3 hours behind the stream's max seen ts, while the
    // watermark delay allows only 1 hour -> append mode must drop it
    val h = 3600L * 1000000L
    val base = 1704067200L * 1000000L
    val inRows = Seq(
      (base + h / 2, "a", 1.0), // window 0, batch file 0
      (base + 2 * h, "a", 1.0), // window 2, batch file 1
      (base + 4 * h, "a", 1.0)) // window 4, batch file 2
    val scratch = Files.createTempDirectory("graft-swin-late").toString
    val base_ = new java.io.File(scratch)
    val inDir = new java.io.File(base_, "in")
    val narrow = inRows.toDF("tsu", "event_type", "value")
      .select(timestamp_micros(col("tsu")).as("ts"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    graft.sources.FileIO.stageRangeBatches(
      narrow, col("ts"), 3, new java.io.File(base_, "stage"), inDir)
    // filler batch: late-event filtering in batch N uses batch N-1's
    // watermark (Spark's late-events/eviction watermark split), so the
    // lagged watermark must pass the late row's window BEFORE the late
    // batch -- one more in-order file gives it that batch to catch up
    graft.sources.FileIO.appendSentinelFile(
      spark, inDir,
      Seq((base + 4 * h, "a", 100L)).toDF("tsu", "event_type", "cents")
        .select(timestamp_micros(col("tsu")).as("ts"),
          col("event_type"), col("cents")),
      name = "c00000.parquet")
    // the late row: window 1, arriving with the lagged watermark at
    // base+3h > window-1 end base+2h -> dropped before the aggregate
    graft.sources.FileIO.appendSentinelFile(
      spark, inDir,
      Seq((base + h + 1L, "late", 100L)).toDF("tsu", "event_type", "cents")
        .select(timestamp_micros(col("tsu")).as("ts"),
          col("event_type"), col("cents")),
      name = "c00001.parquet")
    // flush: past every window
    graft.sources.FileIO.appendSentinelFile(
      spark, inDir,
      Seq((base + 10 * h, StreamingWindows.FlushSentinel, 0L))
        .toDF("tsu", "event_type", "cents")
        .select(timestamp_micros(col("tsu")).as("ts"),
          col("event_type"), col("cents")),
      name = "d00000.parquet")
    val ss = StreamSessions.scoped(spark, 2)
    val stream = graft.sources.FileIO
      .streamParquet(ss, inDir.toString,
        narrow.schema, maxFilesPerTrigger = 1)
      .withWatermark("ts", "1 hour")
      .filter(col("ts") <= timestamp_micros(lit(base + 4 * h)))
    val outDir = new java.io.File(base_, "out")
    val q = graft.sources.FileIO.streamingParquetSink(
      StreamingWindows.windowedTotals(stream, "1 hour"),
      outDir.toString, new java.io.File(base_, "ckpt").toString).start()
    q.awaitTermination()
    val got = spark.read.parquet(outDir.toString)
      .as[(Long, String, Long, Long)].collect().toSet
    val wins = got.map(_._1 - base).toSeq.sorted
    // windows 0, 2, 4 present; the late row's window 1 row ("late",
    // 100 cents) must NOT appear anywhere
    assert(wins == Seq(0L, 2 * h, 4 * h), s"windows: $wins")
    assert(!got.exists(_._2 == "late"), s"late row leaked: $got")
    graft.sources.FileIO.deleteScratch(base_)
  }
}
