package graft.tools

import graft.evaluation.Bank
import graft.metrics.Metrics
import graft.sources.TransferSource
import graft.tgraph.IsolationLevel
import org.apache.spark.sql.SparkSession

/** Isolation-level throughput sweep — the reference's headline
  * `Evaluation`/`BankUseCase` matrix: the SAME transfer workload folded
  * at each isolation level, reporting transfers/s. The reference's
  * published curve degrades from PL0/PL1 toward PL4 (dependency
  * tracking); this measures graft's shape on the full transactional
  * graph (open → fork → vote → close → fold) at data-dominated scale.
  * Run: `sbt "runMain graft.tools.IsolationSweepProbe [nTransfers]"`
  */
object IsolationSweepProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", graft.LocalDir.scratch)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val transfers = TransferSource.batch(spark, n, keySpace = 100000).cache()
    transfers.count()
    // warm-up: codegen + JIT outside the timed region
    Bank.release {
      val w = Bank.graphFromTransfers(transfers.limit(1000))
      Bank.balances(w, IsolationLevel.PL3).count(); w
    }

    Seq(IsolationLevel.PL0, IsolationLevel.PL1,
        IsolationLevel.PL3, IsolationLevel.PL4).foreach { level =>
      // fresh un-persisted pipeline per rep so every level pays the
      // same end-to-end cost; best-of-2 damps JIT/GC ordering noise
      val t = (1 to 2).map { _ =>
        val g = Bank.graphFromTransfers(transfers, level)
        val m = Metrics.measure { Bank.balances(g, level).count() }
        Bank.release(g)
        m
      }.minBy(_.seconds)
      println(Metrics.reportJson(s"bank_${level}_${n}_transfers", t))
      println(f"[isolation-sweep] $level: ${n / t.seconds}%,.0f transfers/s (${t.seconds}%.2f s)")
    }
    transfers.unpersist()
    spark.stop()
  }
}
