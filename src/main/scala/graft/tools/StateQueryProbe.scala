package graft.tools

import graft.metrics.Metrics
import graft.sources.TransferSource
import graft.streaming.StreamingBank
import graft.tgraph.query.StateQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Queryable-state throughput — the reference's `QueryEvaluation`
  * (point/predicate queries against the live balances state, served by
  * its state server). Spark's equivalent of the state server is a
  * cached snapshot DataFrame; the idiomatic way to serve a point-query
  * WORKLOAD is to batch it (one key-set filter answers thousands of
  * point queries in a single pruned pass), so both shapes are measured:
  *
  *  - batched: 10k point queries answered by one `pointQuery` call —
  *    the throughput shape, comparable to the reference's queries/s;
  *  - sequential: single-key queries in a loop — the latency shape,
  *    bounded by Spark's per-job scheduling (honest: Spark is not a
  *    millisecond key-value server; a real deployment fronts the
  *    snapshot with the driver-side `statestore` reader or batches).
  *
  * Run: `sbt "runMain graft.tools.StateQueryProbe [nTransfers]"`
  */
object StateQueryProbe {
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
    // final balance per key = the value at the key's max version (the
    // per-version change log is the WAL shape, not the snapshot shape)
    val snapshot = StreamingBank.balances(spark, transfers)
      .toDF().groupBy(col("key"))
      .agg(max_by(col("value"), col("version")).as("value")).cache()
    val nKeys = snapshot.count()
    println(s"[state-query] snapshot: $nKeys keys from $n transfers (cached)")

    val keys = (0 until 10000).map(i => (i * 7919L) % 100000L).distinct
    (1 to 3).foreach { run =>
      val batched = Metrics.measure {
        import spark.implicits._
        StateQueries.pointQueryBatch(snapshot, keys.toDF("key")).count()
      }
      println(Metrics.reportJson(s"point_query_batched_${keys.size}_run$run", batched))
      println(f"[state-query] batched run$run: ${keys.size} point queries in ${batched.seconds}%.2f s = ${keys.size / batched.seconds}%,.0f queries/s")
    }

    val seqN = 50
    val sequential = Metrics.measure {
      (0 until seqN).foreach { i =>
        StateQueries.pointQuery(snapshot, Seq((i * 104729L) % 100000L)).count()
      }
      seqN.toLong
    }
    println(Metrics.reportJson(s"point_query_sequential_$seqN", sequential))
    println(f"[state-query] sequential: $seqN single-key jobs in ${sequential.seconds}%.2f s = ${seqN / sequential.seconds}%,.0f queries/s (job-scheduling bound)")

    val pred = Metrics.measure {
      StateQueries.predicateQuery(snapshot, col("value") < 0).count()
      nKeys
    }
    println(Metrics.reportJson(s"predicate_query_${nKeys}_keys", pred))
    println(f"[state-query] predicate scan: $nKeys%,d keys in ${pred.seconds}%.2f s = ${nKeys / pred.seconds}%,.0f keys/s")
    spark.stop()
  }
}
