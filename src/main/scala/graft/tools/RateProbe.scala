package graft.tools

import graft.streaming.StreamingBank
import org.apache.spark.sql.SparkSession

/** Rate-seeking evaluation — the reference's `evaluation/TunableSource
  * .java` feedback loop (ramp the input rate until the pipeline stops
  * keeping up; report the max sustainable rate).
  *
  * Trial semantics: feed micro-batches of `rate × trigger` transfers
  * through the full streaming transactional pipeline (votes → fork →
  * flatMapGroupsWithState fold on a noop sink); the rate is SUSTAINABLE
  * iff the median batch duration fits inside the trigger interval —
  * i.e. the backlog would not grow. Exponential ramp to bracket, then
  * bisection to a 10% relative tolerance. Run:
  *   sbt "runMain graft.tools.RateProbe [startRate] [triggerSecs]"
  */
object RateProbe {
  def main(args: Array[String]): Unit = {
    val startRate = args.headOption.map(_.toLong).getOrElse(100000L)
    val triggerSecs = args.drop(1).headOption.map(_.toDouble).getOrElse(1.0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", graft.LocalDir.scratch)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.stateStore.providerClass",
        graft.streaming.StreamSessions.providerClassFromEnv)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val budgetMs = (triggerSecs * 1000).toLong
    def sustainable(rate: Long): Boolean = {
      val rows = math.max(1L, (rate * triggerSecs).toLong).toInt
      val s = StreamingBank.microBatchProbe(spark, batches = 4, rowsPerBatch = rows)
      val ok = s.p50Ms <= budgetMs
      println(f"[rate-probe] rate=$rate%,d rows/s p50=${s.p50Ms}ms " +
        f"budget=${budgetMs}ms -> ${if (ok) "SUSTAINABLE" else "OVERLOADED"}")
      ok
    }

    // warm-up (codegen/JIT for the stateful pipeline)
    StreamingBank.microBatchProbe(spark, batches = 2, rowsPerBatch = 1000)

    // exponential ramp until the pipeline falls behind
    var lo = 0L
    var hi = startRate
    while (sustainable(hi) && hi < 512L * 1000 * 1000) { lo = hi; hi *= 2 }
    // bisect to 10% relative tolerance
    while (hi - lo > math.max(1L, lo / 10)) {
      val mid = lo + (hi - lo) / 2
      if (sustainable(mid)) lo = mid else hi = mid
    }
    println(s"""{"name":"max_sustainable_rate","rows_per_second":$lo,""" +
      s""""trigger_secs":$triggerSecs,"tolerance_pct":10}""")
    spark.stop()
  }
}
