package graft.tools

import graft.evaluation.Bank
import graft.streaming.StreamingBank
import graft.tgraph.query.{QueryClient, QueryServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Query-rate feedback sweep — the reference's
  * `tgraph/backed/TunableQuerySource.java`: ramp the POINT-query rate
  * against the out-of-process endpoint of a RUNNING transactional
  * pipeline until answers stop keeping up, and report the max
  * sustainable queries/s. The transfer-side twin is [[RateProbe]]
  * (`evaluation/TunableSource.java`); together they reproduce the
  * reference's two tunable-load axes.
  *
  * Trial semantics: `clients` socket connections issue paced POINT
  * queries (10 keys each) for a fixed window while a feeder thread
  * keeps micro-batches flowing through the pipeline (the served
  * snapshot keeps advancing — queries compete with state refresh, as
  * in the reference). A rate is SUSTAINABLE iff the clients achieved
  * ≥95% of it and the p50 round-trip stayed under `targetP50Ms`.
  * Exponential ramp to bracket, then bisection to 10%.
  *
  * Run: sbt "runMain graft.tools.QueryRateProbe [startRate] [targetP50Ms]"
  */
object QueryRateProbe {
  def main(args: Array[String]): Unit = {
    val startRate = args.headOption.map(_.toLong).getOrElse(200L)
    val targetP50Ms = args.drop(1).headOption.map(_.toLong).getOrElse(5L)
    val clients = sys.env.getOrElse("SPARK_GRAFT_QPROBE_CLIENTS", "4").toInt
    val windowMs = 2000L
    val keySpace = 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", graft.LocalDir.scratch)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.streaming.stateStore.providerClass",
        graft.streaming.StreamSessions.providerClassFromEnv)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = new java.io.File(graft.LocalDir.scratch, "qrate")
    base.mkdirs()
    val ckpt = java.nio.file.Files
      .createTempDirectory(base.toPath, "ckpt").toString
    val input = MemoryStream[Bank.AcctDelta]
    val q = StreamingBank.sequentialBalancesOnline(spark, input.toDS())
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    def deltas(from: Long, n: Int): Seq[Bank.AcctDelta] =
      (from until from + n).map(i =>
        Bank.AcctDelta(i % keySpace, i, 100L))
    var nextTid = 0L
    input.addData(deltas(nextTid, 10000)); nextTid += 10000
    q.processAllAvailable()

    val server = new QueryServer(spark, ckpt, refreshMillis = 50)
    val deadline0 = System.nanoTime() + 30L * 1_000_000_000L
    while (server.servedBatchId < 0 && System.nanoTime() < deadline0)
      Thread.sleep(25)
    require(server.servedBatchId >= 0, "server never pinned a batch")

    // the pipeline stays LIVE during the sweep: the served snapshot
    // advances under the clients, as in the reference
    @volatile var feeding = true
    val feeder = new Thread(() => {
      while (feeding) {
        input.addData(deltas(nextTid, 2000)); nextTid += 2000
        try q.processAllAvailable() catch { case _: Throwable => () }
        Thread.sleep(200)
      }
    }, "qrate-feeder")
    feeder.setDaemon(true)
    feeder.start()

    def trial(rate: Long): Boolean = {
      val perClient = math.max(1L, rate / clients)
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val threads = (0 until clients).map { c =>
        val t = new Thread(() => {
          val cl = new QueryClient("localhost", server.boundPort)
          try {
            val intervalNs = 1_000_000_000L / perClient
            val end = System.nanoTime() + windowMs * 1_000_000L
            var next = System.nanoTime()
            var i = c.toLong
            while (System.nanoTime() < end) {
              if (System.nanoTime() < next)
                Thread.sleep(math.max(0L, (next - System.nanoTime()) / 1_000_000L))
              val keys = (0 until 10).map(j =>
                scala.util.hashing.MurmurHash3.productHash((i, j)).abs.toLong % keySpace)
              val t0 = System.nanoTime()
              cl.point(keys)
              results.add(System.nanoTime() - t0)
              next += intervalNs
              i += clients
            }
          } catch { case _: Throwable => () }
          finally cl.close()
        }, s"qrate-client-$c")
        t.start(); t
      }
      threads.foreach(_.join())
      val lat = results.toArray(Array.empty[java.lang.Long]).map(_.longValue()).sorted
      if (lat.isEmpty) false
      else {
        val achieved = lat.length * 1000.0 / windowMs
        val p50Ms = lat(lat.length / 2) / 1e6
        val ok = achieved >= 0.95 * rate && p50Ms <= targetP50Ms
        println(f"[query-rate] target=$rate%,d q/s achieved=$achieved%.0f " +
          f"p50=${p50Ms}%.2fms -> ${if (ok) "SUSTAINABLE" else "OVERLOADED"}")
        ok
      }
    }

    trial(startRate / 2) // warm-up

    var lo = 0L
    var hi = startRate
    while (trial(hi) && hi < 4L * 1000 * 1000) { lo = hi; hi *= 2 }
    while (hi - lo > math.max(1L, lo / 10)) {
      val mid = lo + (hi - lo) / 2
      if (trial(mid)) lo = mid else hi = mid
    }
    println(s"""{"name":"max_sustainable_query_rate","queries_per_second":$lo,""" +
      s""""clients":$clients,"target_p50_ms":$targetP50Ms,"tolerance_pct":10}""")
    feeding = false
    feeder.join(3000)
    server.close()
    q.stop()
    spark.stop()
    System.exit(0)
  }
}
