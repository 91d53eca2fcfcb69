package graft.tools

import graft.metrics.Metrics
import graft.sources.TransferSource
import graft.streaming.StreamingBank
import graft.streaming.StreamingBank.{CentsBalance, StreamMovement}
import graft.tgraph.state.StateOperator
import org.apache.spark.sql.SparkSession

/** Hot-key ceiling probe for the salted state fold: the frozen-account
  * workload shape (a constant fraction of all deposits into ONE
  * account) folded two ways —
  *
  *  - plain [[StateOperator.runBatch]]: `groupByKey` has no partial
  *    aggregation, so every update of the hot account serializes
  *    through one task; past the point where that task dominates,
  *    adding cores buys nothing (the ceiling);
  *  - [[StateOperator.runBatchSaltedFinal]]: the hot account's updates
  *    fold in `salts` parallel subgroups, merged by one bounded
  *    per-key combine — the ceiling lifts to `salts` cores.
  *
  * Run: `sbt "runMain graft.tools.SaltedFoldProbe [nTransfers] [hotPerMille] [salts]"`
  * Prints one JSON metrics line per variant plus a human summary, and
  * asserts the two folds agree bit-exactly (the commutative contract).
  *
  * Measured at 4M transfers / local[32] / 100k keys (r8): hot share
  * 90% → salted 2.05× plain; 30% → 1.30×; 5% → 0.45× (the hot key is
  * only ~13× the average task there, under the salted path's fixed
  * costs — one counting pass + one extra bounded exchange). The
  * crossover moves with cluster size: at 1000 executors a 5%-share key
  * is ~50 executors' worth of updates in ONE task, firmly past it —
  * which is what the `hotThreshold` knob expresses (salt keys whose
  * update count exceeds what one task should own).
  */
object SaltedFoldProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val hotPerMille = if (args.length > 1) args(1).toInt else 300
    val salts = if (args.length > 2) args(2).toInt else 32
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
    import spark.implicits._

    // committing hot account (deposits into the frozen acct 13 abort
    // at the vote and never reach the fold)
    val transfers = TransferSource
      .batchSkewed(spark, n, keySpace = 100000, hotAcct = 17L,
        hotPerMille = hotPerMille)
      .cache()
    transfers.count()
    val moves = StreamingBank.committedMovements(spark, transfers)

    // warm-up: codegen + JIT outside the timed region
    StateOperator.runBatchSaltedFinal[StreamMovement, Long, Long](
      StreamingBank.committedMovements(spark, transfers.limit(1000)),
      _.acct, _.tid, new CentsBalance, _ + _, salts, hotThreshold = 100L).count()

    def finalOfPlain() = StateOperator
      .runBatch[StreamMovement, Long, Long](
        moves, _.acct, _.tid, new CentsBalance)
      .groupByKey(_.key)
      .mapGroups((k, it) => (k, it.maxBy(_.version).value))

    val tPlain = (1 to 2).map(_ =>
      Metrics.measure { finalOfPlain().count() }).minBy(_.seconds)
    val tSalted = (1 to 2).map(_ => Metrics.measure {
      StateOperator.runBatchSaltedFinal[StreamMovement, Long, Long](
        moves, _.acct, _.tid, new CentsBalance, _ + _, salts,
        hotThreshold = 100000L).count()
    }).minBy(_.seconds)

    println(Metrics.reportJson(s"salted_fold_plain_${n}_${hotPerMille}pm", tPlain))
    println(Metrics.reportJson(s"salted_fold_salted${salts}_${n}_${hotPerMille}pm", tSalted))
    println(f"[salted-fold] hot ${hotPerMille / 10.0}%.1f%% of deposits: " +
      f"plain ${n / tPlain.seconds}%,.0f transfers/s, " +
      f"salted($salts) ${n / tSalted.seconds}%,.0f transfers/s " +
      f"(${tPlain.seconds / tSalted.seconds}%.2fx)")

    // bit-exact agreement (the commutative soundness contract)
    val a = finalOfPlain().collect().toMap
    val b = StateOperator.runBatchSaltedFinal[StreamMovement, Long, Long](
      moves, _.acct, _.tid, new CentsBalance, _ + _, salts,
      hotThreshold = 100000L)
      .collect().map(t => t._1 -> t._2).toMap
    require(a == b, "salted fold diverged from the plain fold")
    println(s"[salted-fold] agreement: ${a.size} keys bit-identical")
    spark.stop()
  }
}
