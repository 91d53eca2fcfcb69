package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing for a file-replay streaming gate (guide §1:
  * measure first). Replays stream_window_agg's exact shape with
  * timers around each phase and dumps per-micro-batch durationMs
  * from the streaming progress events, so the fixed cost of a gate
  * (staging write / stream startup / per-batch planning / state
  * store / sink commit / final read) is attributable before any
  * optimization is attempted.
  *
  * `sbt "runMain graft.tools.StreamPhaseProbe [sfDir] [reps]"`
  */
object StreamPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", graft.LocalDir.scratch)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.tables.Tables.load(spark, dir, "events").count()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ===")
      val scratch = graft.LocalDir.runDir("phase-probe")
      val base = new java.io.File(scratch)
      val inDir = new java.io.File(base, "in")
      val outDir = new java.io.File(base, "out")
      val events = graft.tables.Tables.load(spark, dir, "events")
        .select(col("ts"), col("event_type"), col("value"))
      val narrow = events.select(
        col("ts").cast("timestamp").as("ts"),
        col("event_type").cast("string").as("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      // sentinel folded into the last staged file, mirroring
      // StreamingWindows.windowedTotalsFromFiles' current shape
      val maxTs = t("maxTs") { narrow.agg(max(col("ts"))).head().getTimestamp(0) }
      t("stageRangeBatches") {
        graft.sources.FileIO.stageRangeBatches(
          narrow.unionByName(spark.createDataFrame(
            java.util.List.of(org.apache.spark.sql.Row(
              new java.sql.Timestamp(maxTs.getTime + 7200000L),
              graft.streaming.StreamingWindows.FlushSentinel, 0L)),
            narrow.schema)),
          col("ts"), 4, new java.io.File(base, "stage"), inDir)
      }
      val ss = t("scoped session") {
        graft.streaming.StreamSessions.scoped(spark, 4)
      }
      val q = t("stream run") {
        val stream = graft.sources.FileIO
          .streamParquet(ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
          .withWatermark("ts", "0 seconds")
          .filter(col("ts") <= lit(maxTs))
        val q = graft.sources.FileIO.streamingParquetSink(
          graft.streaming.StreamingWindows.windowedTotals(stream, "1 hour"),
          outDir.toString, new java.io.File(base, "ckpt").toString).start()
        q.awaitTermination()
        q
      }
      q.recentProgress.foreach { p =>
        println(s"[batch ${p.batchId}] rows=${p.numInputRows} durationMs=${p.durationMs}")
        p.stateOperators.foreach { so =>
          println(s"  state: commitMs=${so.commitTimeMs} rows=${so.numRowsTotal} mem=${so.memoryUsedBytes} custom=${so.customMetrics}")
        }
      }
      t("final read+count") {
        println("rows=" + spark.read.parquet(outDir.toString).count())
      }
      graft.sources.FileIO.deleteScratch(base)
    }
    spark.stop()
  }
}
