package graft.tools

import graft.metrics.Metrics
import graft.sources.TransferSource
import graft.streaming.StreamingBank
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Data-dominated throughput probe: run the full bank pipeline
  * (vote → commit filter → fork → keyed fold) over N synthetic
  * transfers from [[TransferSource]] — unlike the sf0.1 bench, at
  * N=10M the wall time is actual work, not session overhead. Run:
  *   sbt "runMain graft.tools.ScaleProbe 10000000"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
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

    val transfers = TransferSource.batch(spark, n, keySpace = 100000)
    // warm-up (codegen + JIT) on a small slice
    StreamingBank.balances(spark, transfers.limit(1000)).count()
    StreamingBank.balancesNoT(spark, transfers.limit(1000)).count()

    val t = Metrics.measure {
      StreamingBank.balances(spark, transfers).count()
    }
    println(Metrics.reportJson(s"bank_pipeline_${n}_transfers", t))
    println(f"${n / t.seconds}%.0f transfers/s end-to-end (votes+fork+keyed fold)")

    // the reference's BankUseCaseNoT baseline: same topology, no
    // votes/2PC/state — the delta is the measured transaction overhead
    val tNoT = Metrics.measure {
      StreamingBank.balancesNoT(spark, transfers).count()
      n
    }
    println(Metrics.reportJson(s"bank_pipeline_noT_${n}_transfers", tNoT))
    println(f"${n / tNoT.seconds}%.0f transfers/s without transactions; " +
      f"transaction overhead ${(t.seconds / tNoT.seconds - 1) * 100}%.1f%% " +
      f"(${t.seconds}%.2fs vs ${tNoT.seconds}%.2fs)")
    spark.stop()
  }
}
