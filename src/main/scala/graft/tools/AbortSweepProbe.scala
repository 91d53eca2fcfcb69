package graft.tools

import graft.metrics.Metrics
import graft.sources.TransferSource
import graft.streaming.StreamingBank
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Abort-rate sweep — the reference's `evaluation/IncreaseAborts.java`:
  * run the full transactional bank pipeline while a tunable percentage
  * of transactions is forced to vote ABORT (on top of the workload's
  * organic aborts), and report throughput at each setting. The
  * reference uses this to show how 2PC cost responds to the abort mix;
  * here the abort decision is a deterministic hash of the tid (Spark's
  * murmur3 — same selection on every run of this probe; swap in
  * `TextAnalysis.portableHash32` if cross-engine reproduction of the
  * exact abort set matters more than hash cost in the timed region).
  * Run:
  *   sbt "runMain graft.tools.AbortSweepProbe [nTransfers]"
  */
object AbortSweepProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
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
    // warm-up (codegen + JIT) outside the timed region
    StreamingBank.balances(spark, transfers.limit(1000)).count()

    Seq(0, 25, 50, 75).foreach { pct =>
      val injected = pmod(hash(col("tid"), lit(99)), lit(100)) < pct
      val t = Metrics.measure {
        StreamingBank.balances(spark, transfers, injected).count()
      }
      println(Metrics.reportJson(s"bank_aborts_${pct}pct_${n}_transfers", t))
      println(f"[abort-sweep] $pct%% forced aborts: ${n / t.seconds}%,.0f transfers/s (${t.seconds}%.2f s)")
    }
    spark.stop()
  }
}
