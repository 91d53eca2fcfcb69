package graft.metrics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryProgress

/** Metrics — the reference's `metrics/` package (`Throughput.java`,
  * `TimeDelta.java`, `Report.java`) re-expressed for Spark:
  * batch throughput from wall-clock timers, streaming
  * throughput/latency straight from Structured Streaming's
  * QueryProgress (Spark already meters every micro-batch; no
  * hand-rolled accumulators needed).
  */
object Metrics {

  final case class Throughput(records: Long, seconds: Double) {
    def perSecond: Double = if (seconds > 0) records / seconds else 0.0
  }

  final case class TimeDelta(label: String, nanos: Long) {
    def millis: Double = nanos / 1e6
  }

  /** Time a thunk returning a record count → Throughput. */
  def measure(thunk: => Long): Throughput = {
    val t0 = System.nanoTime()
    val n = thunk
    Throughput(n, (System.nanoTime() - t0) / 1e9)
  }

  def timed[A](label: String)(thunk: => A): (A, TimeDelta) = {
    val t0 = System.nanoTime()
    val a = thunk
    (a, TimeDelta(label, System.nanoTime() - t0))
  }

  /** Streaming report from the engine's own progress events —
    * the analog of the reference's Report server collecting
    * throughput/latency from tracker sinks.
    */
  final case class StreamReport(
      batchId: Long, inputRows: Long, processedPerSecond: Double,
      batchDurationMs: Long)

  def fromProgress(p: StreamingQueryProgress): StreamReport =
    StreamReport(
      p.batchId,
      p.numInputRows,
      p.processedRowsPerSecond,
      p.batchDuration)

  /** One-line JSON report (the reference's Report.toJson analog). */
  def reportJson(name: String, t: Throughput): String =
    s"""{"name":"$name","records":${t.records},"seconds":${t.seconds},"per_second":${t.perSecond}}"""
}
