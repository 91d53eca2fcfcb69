package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JIT/codegen + file listing so the first timed query isn't
    // charged the session's one-time costs.
    try {
      graft.tables.Tables.All.foreach { t =>
        graft.tables.Tables.load(spark, sfDir, t).count()
      }
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // per-micro-batch latency percentiles for the streaming
    // transactional pipeline (LatencyTracker analog)
    val latency =
      try graft.streaming.StreamingBank.latencyProbe(spark).toJsonFragment
      catch { case _: Throwable => """"stream_latency_ms":{}""" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,$latency,"sf":"$sfDir"}""")
    spark.stop()
  }
}
