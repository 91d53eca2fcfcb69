package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drain-cost probe for the stream-stream attribution gates (guide
  * §1 measure first): wall seconds + micro-batch count per run, so a
  * batch-count optimization is verifiable as "batch count drops",
  * not just a wall-time delta.
  *
  * `sbt "runMain graft.tools.JoinPhaseProbe [sfDir] [reps]"`
  */
object JoinPhaseProbe {
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
    val events = graft.tables.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id").as("tb"),
        col("event_type"))
    events.count()
    (1 to reps).foreach { rep =>
      for (outer <- Seq(false, true)) {
        val scratch = graft.LocalDir.runDir(
          if (outer) "join-probe-outer" else "join-probe-inner")
        val t0 = System.nanoTime()
        val out =
          if (outer) graft.streaming.StreamingJoin.attributionOuterFromFiles(
            spark, events, "view", "purchase",
            horizonUs = 12L * 3600L * 1000000L, nBatches = 4, scratch,
            statePartitions = 4)
          else graft.streaming.StreamingJoin.attributionFromFiles(
            spark, events, "view", "purchase",
            horizonUs = 12L * 3600L * 1000000L, nBatches = 4, scratch)
        val n = out.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val kind = if (outer) "outer" else "inner"
        println(f"[join-probe] rep $rep $kind%-5s $sec%.2f s, " +
          f"batches=${graft.streaming.StreamingJoin.lastBatchId + 1}, $n rows")
      }
    }
    spark.stop()
  }
}
