package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation — the canonical Structured
  * Streaming surface (reference analog: the windowing axis of
  * tspoon's `tgraph/TStream.java` window operators, here applied to a
  * classic per-window rollup rather than per-key buffers): events
  * bucket into fixed event-time windows, each window's aggregate is
  * emitted EXACTLY ONCE, when the watermark proves no more rows can
  * reach it (append mode), and the window's state row is evicted at
  * the same moment — so state at any instant is O(open windows ×
  * group cardinality), independent of stream length. That eviction
  * contract is the whole point: an unwatermarked groupBy over a
  * stream accumulates every window forever.
  *
  * Spark-first mechanics: `withWatermark(ts, delay)` +
  * `groupBy(window(ts, dur), event_type).agg(...)` — the built-in
  * StateStoreSave operator in append mode, no custom state code. The
  * aggregate is map-side combinable (count + sum), so each
  * micro-batch shuffles one partial row per (window, type, input
  * partition), never raw events.
  *
  * Drain completeness: append mode only emits a window once the
  * watermark passes its end, and the watermark trails the max seen
  * event time — so the stream's LAST windows would stay open forever
  * on a finite replay. The file-fed runner closes them with a flush
  * SENTINEL: one trailing row stamped past `max(ts) + 2·window +
  * delay`. The sentinel must reach the EventTimeWatermark collector
  * but never the aggregate, and the exclusion must be a predicate ON
  * THE EVENT-TIME COLUMN (`ts <= max real ts`): a predicate on any
  * other column (e.g. `event_type != sentinel`) is pushed below the
  * watermark node into the scan by Catalyst — the sentinel would be
  * pruned before the collector ever saw it and the last windows would
  * never close (measured, not hypothetical). Once the sentinel batch
  * advances the watermark, the engine's no-data micro-batch flushes
  * and evicts every remaining window; equivalence with the batch
  * rollup is exact and oracle-gated.
  */
object StreamingWindows {

  /** Event type stamped on the watermark-advancing flush row (never
    * reaches the aggregate; kept for sink-side debuggability).
    */
  val FlushSentinel = "__flush"

  /** Per (tumbling window, event_type) totals over a WATERMARKED
    * streaming frame of (ts, event_type, cents). Pure declarative
    * shape — callers that feed a flush sentinel must bound `ts`
    * upstream (see the class doc's pushdown caveat).
    */
  def windowedTotals(events: DataFrame, windowDur: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"))
      .select(
        unix_micros(col("window.start")).as("win_us"),
        col("event_type"),
        col("n_events"),
        col("sum_cents"))

  /** Per (SLIDING window, event_type) totals — every event lands in
    * `windowDur / slide` overlapping windows; Spark expands the
    * row-to-windows mapping inline (a generator, no self-join) and the
    * same append-mode close/evict contract applies per window.
    */
  def slidingTotals(
      events: DataFrame, windowDur: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur, slide), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"))
      .select(
        unix_micros(col("window.start")).as("win_us"),
        col("event_type"),
        col("n_events"),
        col("sum_cents"))

  /** State rows left in the aggregation operator when the last run
    * terminated, for specs asserting watermark eviction (0 after a
    * sentinel-flushed drain: every window closed and was evicted).
    */
  @volatile private[streaming] var lastStateRows: Long = -1L

  /** Per-operator state rows at termination of the last run (operator
    * name → rows), for specs on MULTI-stateful-operator queries where
    * the aggregate must drain to 0 while the dedup store legitimately
    * retains its watermark-delay tail.
    */
  @volatile private[streaming] var lastStateRowsByOp: Map[String, Long] = Map.empty

  /** File-fed end-to-end run (the gate-query spelling): events staged
    * as ts-ordered micro-batch files plus one flush-sentinel file,
    * streamed through [[windowedTotals]] under a watermark, each
    * window landed exactly-once on close. Returns
    * (win_us, event_type, n_events, sum_cents).
    */
  def windowedTotalsFromFiles(
      spark: SparkSession,
      events: DataFrame, // (ts: timestamp, event_type, value: double)
      windowDur: String,
      delay: String,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    val narrow = events.select(
      col("ts").cast("timestamp").as("ts"),
      col("event_type").cast("string").as("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    // flush sentinel: one row past every real window's close point — a
    // single scalar (max ts) crosses the driver, never data rows. It
    // rides INSIDE the last staged file (it carries the max ts, so
    // range staging lands it there): the watermark advances at the end
    // of the last DATA batch and the engine's no-data batch flushes —
    // a trailing sentinel-only file was one extra micro-batch of pure
    // fixed cost (measured 0.3-0.8 s/batch at gate scale).
    val maxTs = narrow.agg(max(col("ts"))).head().getTimestamp(0)
    val margin = 2L * windowMicros(windowDur) + windowMicros(delay)
    graft.sources.FileIO.stageRangeBatches(
      narrow.unionByName(spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          new java.sql.Timestamp(maxTs.getTime + margin / 1000L),
          FlushSentinel, 0L)),
        narrow.schema)),
      col("ts"), nBatches, new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    val stream = graft.sources.FileIO
      .streamParquet(ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
      .withWatermark("ts", delay)
      // event-time bound: stays ABOVE the watermark node (references
      // the watermark column), so the sentinel is counted for the
      // watermark, then dropped before the aggregate
      .filter(col("ts") <= lit(maxTs))
    val q = graft.sources.FileIO.streamingParquetSink(
      windowedTotals(stream, windowDur),
      outDir.toString, new java.io.File(base, "ckpt").toString).start()
    q.awaitTermination()
    recordState(q)
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    graft.sources.FileIO.deleteScratchOnExit(base)
    spark.read.parquet(outDir.toString)
  }

  /** EXACTLY-ONCE windowed totals from an AT-LEAST-ONCE stream — two
    * stateful operators chained in one streaming plan:
    * `dropDuplicatesWithinWatermark(event_id)` feeding the append-mode
    * windowed aggregate. The dedup store holds one row per key only
    * until the watermark passes `ts + delay` (a redelivery can't be
    * later than the delivery guarantee's lag bound = the watermark
    * delay), so its state is O(keys per delay window), not O(stream);
    * duplicates arriving later still die, as LATE rows, before either
    * operator. `redeliver` injects the duplicate batches (the file
    * source is exactly-once by itself): each listed staged batch is
    * re-appended verbatim after the originals — the downstream rollup
    * must equal the clean batch rollup anyway, which is the
    * oracle-gated claim.
    */
  def dedupedWindowedTotalsFromFiles(
      spark: SparkSession,
      events: DataFrame, // (event_id, ts: timestamp, event_type, value)
      windowDur: String,
      delay: String,
      nBatches: Int,
      redeliver: Seq[Int],
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    val narrow = events.select(
      col("event_id").cast("long").as("event_id"),
      col("ts").cast("timestamp").as("ts"),
      col("event_type").cast("string").as("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    graft.sources.FileIO.stageRangeBatches(
      narrow, col("ts"), nBatches, new java.io.File(base, "stage"), inDir)
    redeliver.foreach(graft.sources.FileIO.redeliverStagedFile(inDir, _))
    val maxTs = narrow.agg(max(col("ts"))).head().getTimestamp(0)
    val margin = 2L * windowMicros(windowDur) + windowMicros(delay)
    graft.sources.FileIO.appendSentinelFile(
      spark, inDir,
      spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          -1L, new java.sql.Timestamp(maxTs.getTime + margin / 1000L),
          FlushSentinel, 0L)),
        narrow.schema))
    val ss = StreamSessions.scoped(spark, statePartitions)
    val stream = graft.sources.FileIO
      .streamParquet(ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
      .withWatermark("ts", delay)
      .filter(col("ts") <= lit(maxTs)) // event-time bound, see class doc
      .dropDuplicatesWithinWatermark("event_id")
    val q = graft.sources.FileIO.streamingParquetSink(
      windowedTotals(stream, windowDur),
      outDir.toString, new java.io.File(base, "ckpt").toString).start()
    q.awaitTermination()
    recordState(q)
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    graft.sources.FileIO.deleteScratchOnExit(base)
    spark.read.parquet(outDir.toString)
  }

  /** File-fed SLIDING-window run — [[windowedTotalsFromFiles]] with
    * overlapping windows of `windowDur` every `slide`.
    */
  def slidingTotalsFromFiles(
      spark: SparkSession,
      events: DataFrame, // (ts: timestamp, event_type, value: double)
      windowDur: String,
      slide: String,
      delay: String,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    val narrow = events.select(
      col("ts").cast("timestamp").as("ts"),
      col("event_type").cast("string").as("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    // sentinel folded into the last staged file — see
    // [[windowedTotalsFromFiles]]: one fewer micro-batch per drain
    val maxTs = narrow.agg(max(col("ts"))).head().getTimestamp(0)
    val margin = 2L * windowMicros(windowDur) + windowMicros(delay)
    graft.sources.FileIO.stageRangeBatches(
      narrow.unionByName(spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          new java.sql.Timestamp(maxTs.getTime + margin / 1000L),
          FlushSentinel, 0L)),
        narrow.schema)),
      col("ts"), nBatches, new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    val stream = graft.sources.FileIO
      .streamParquet(ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
      .withWatermark("ts", delay)
      .filter(col("ts") <= lit(maxTs)) // event-time bound, see class doc
    val q = graft.sources.FileIO.streamingParquetSink(
      slidingTotals(stream, windowDur, slide),
      outDir.toString, new java.io.File(base, "ckpt").toString).start()
    q.awaitTermination()
    recordState(q)
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    graft.sources.FileIO.deleteScratchOnExit(base)
    spark.read.parquet(outDir.toString)
  }

  /** Per (user, SESSION window) totals — Spark's native dynamic-gap
    * windows: a session spans events of a key whose gaps are < `gap`,
    * and its window is `[first, last + gap)`. Contrast with the
    * library's `flatMapGroupsWithState` sessionizer
    * ([[StreamingSessions]]): that one streams per-EVENT session ids
    * with O(1) state; this one is the declarative per-SESSION rollup —
    * the engine merges partial sessions across micro-batches in the
    * state store and emits a session exactly once, when the watermark
    * passes `last + gap` (no later event can extend it). State is
    * O(open sessions), one row per key-session still inside its gap.
    */
  def sessionTotals(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("sess_start_us"),
        unix_micros(col("session_window.end")).as("sess_end_us"),
        col("n_events"),
        col("sum_cents"))

  /** File-fed session-window run (the gate-query spelling); sentinel
    * margin covers `2·gap` so the final open sessions provably close.
    */
  def sessionTotalsFromFiles(
      spark: SparkSession,
      events: DataFrame, // (user_id, ts: timestamp, value: double)
      gap: String,
      delay: String,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    val narrow = events.select(
      col("user_id").cast("long").as("user_id"),
      col("ts").cast("timestamp").as("ts"),
      round(col("value") * 100).cast("long").as("cents"))
    // sentinel folded into the last staged file — see
    // [[windowedTotalsFromFiles]]: one fewer micro-batch per drain
    val maxTs = narrow.agg(max(col("ts"))).head().getTimestamp(0)
    val margin = 2L * windowMicros(gap) + windowMicros(delay)
    graft.sources.FileIO.stageRangeBatches(
      narrow.unionByName(spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          -1L, new java.sql.Timestamp(maxTs.getTime + margin / 1000L), 0L)),
        narrow.schema)),
      col("ts"), nBatches, new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    val stream = graft.sources.FileIO
      .streamParquet(ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
      .withWatermark("ts", delay)
      .filter(col("ts") <= lit(maxTs)) // event-time bound, see class doc
    val q = graft.sources.FileIO.streamingParquetSink(
      sessionTotals(stream, gap),
      outDir.toString, new java.io.File(base, "ckpt").toString).start()
    q.awaitTermination()
    recordState(q)
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    graft.sources.FileIO.deleteScratchOnExit(base)
    spark.read.parquet(outDir.toString)
  }

  private def recordState(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    lastStateRows = Option(q.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
    lastStateRowsByOp = Option(q.lastProgress)
      .map(_.stateOperators.map(op => op.operatorName -> op.numRowsTotal).toMap)
      .getOrElse(Map.empty)
  }

  /** "N hours"/"N minutes"/"N seconds" → microseconds, for sentinel
    * placement (mirrors CalendarInterval's fixed-duration forms; the
    * runner only ever passes fixed durations).
    */
  private[streaming] def windowMicros(dur: String): Long = {
    val parts = dur.trim.toLowerCase.split("\\s+")
    require(parts.length == 2, s"expected '<n> <unit>', got '$dur'")
    val n = parts(0).toLong
    val unitUs = parts(1).stripSuffix("s") match {
      case "hour" => 3600000000L
      case "minute" => 60000000L
      case "second" => 1000000L
      case "millisecond" => 1000L
      case u => throw new IllegalArgumentException(s"unsupported unit '$u'")
    }
    n * unitUs
  }
}
