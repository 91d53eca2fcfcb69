package graft.tools

import org.apache.spark.sql.SparkSession

/** Long-running stability soak — the reference's
  * `evaluation/NeverLastingBank.java` analog: hundreds of micro-batches
  * of the streaming transactional bank under key churn with the state
  * TTL on. Healthy = state size and per-batch latency stay FLAT while
  * the set of keys ever touched grows without bound — the operational
  * claim that separates "runs for a demo" from "runs forever".
  *
  * `sbt "runMain graft.tools.SoakProbe [batches] [rowsPerBatch]
  *   [keyWindow] [churnStep] [ttlMs]"`
  */
object SoakProbe {
  def main(args: Array[String]): Unit = {
    val batches = if (args.length > 0) args(0).toInt else 300
    val rowsPerBatch = if (args.length > 1) args(1).toInt else 1000
    val keyWindow = if (args.length > 2) args(2).toInt else 4000
    val churnStep = if (args.length > 3) args(3).toInt else 400
    val ttlMs = if (args.length > 4) args(4).toLong else 2000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", graft.LocalDir.scratch)
      // tiny batches want few state shards (see Bench's probe notes)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.streaming.stateStore.providerClass",
        graft.streaming.StreamSessions.providerClassFromEnv)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the query-load refresher re-reads the statestore
    // every 100 ms and each pinned read logs checkpoint-checksum WARNs —
    // tens of MB of noise over a 300-batch soak
    spark.sparkContext.setLogLevel("ERROR")
    val r = graft.streaming.StreamingBank.soak(
      spark, batches, rowsPerBatch, keyWindow, churnStep, ttlMs,
      queryLoad = true)
    println(r.toJson)
    val flatState = r.lastThirdStateRows <= r.firstThirdStateRows * 3
    val flatMs = r.lastThirdBatchMs <= r.firstThirdBatchMs * 3
    val queriesOk = r.queriesServed > 0 && r.queryErrors == 0
    println(s"[soak] state flat=$flatState (median ${r.firstThirdStateRows} -> " +
      s"${r.lastThirdStateRows} rows, max ${r.maxStateRows}, " +
      s"${r.totalKeysTouched} keys touched); " +
      s"latency flat=$flatMs (median ${r.firstThirdBatchMs} -> ${r.lastThirdBatchMs} ms); " +
      s"query load ok=$queriesOk (${r.queriesServed} served, " +
      s"${r.queryErrors} errors, ~${math.round(r.queryPerSec)} q/s live)")
    spark.stop()
    if (!(flatState && flatMs && queriesOk)) System.exit(1)
  }
}
