package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ONLINE gap-based sessionization — the streaming sibling of
  * [[graft.analytics.Analytics.sessionize]]: per-key sessions assemble
  * as events arrive, a session EMITS the moment it closes (the next
  * event of its key lands more than `gap` past its last event), and
  * sessions left open when the key goes quiet are finalized by the
  * WATERMARK through an event-time timeout — Spark's native mechanism
  * for "this key has been silent past the gap", and the piece a batch
  * rerun cannot give you (a batch job only sees a session after the
  * fact; this emits it the instant it is decidable).
  *
  * Spark-first mechanics: `flatMapGroupsWithState` in append mode with
  * `GroupStateTimeout.EventTimeTimeout`. State per key is O(1) — the
  * OPEN session's running aggregate (seq, start, last, n, cents) and
  * nothing else; closed sessions leave the store immediately as output
  * rows. Each update re-arms the timeout at `last + gap`, so when the
  * watermark (fed by the event-time column, delay 0 over an in-order
  * source) passes that point the open session is provably complete —
  * no event can extend it any more — and the timeout branch emits it
  * and removes the state. This is the unbounded-stream shape: state
  * never outlives its session by more than the gap, whatever the
  * stream length or key cardinality.
  *
  * Equivalence contract (oracle-gated): fed the corpus in (ts)
  * order — any micro-batch partitioning — the emitted session set is
  * EXACTLY the batch `sessionize → groupBy(key, session_seq)` result,
  * because (a) within a batch events apply in the batch operator's
  * (ts, tiebreak) order, (b) across batches range staging keeps ts
  * globally ordered, so the watermark can only pass `last + gap` when
  * every remaining event is itself `> gap` past `last` — the timeout
  * closes precisely the sessions the gap rule would close. The gap
  * comparison is the batch operator's, bit-for-bit: strictly-greater
  * (an event exactly `gap` after the last one EXTENDS the session).
  */
object StreamingSessions {

  /** `ts` is the watermark-tagged event-time column — it must reach
    * the stateful operator for EventTimeTimeout to resolve; `tsm` is
    * its exact integer (micros) twin the session arithmetic uses.
    */
  final case class SessEvent(
      user_id: Long, tsm: Long, tb: Long, cents: Long,
      ts: java.sql.Timestamp)
  final case class SessState(
      session_seq: Long, start: Long, last: Long, n: Long, cents: Long)
  final case class Session(
      user_id: Long, session_seq: Long, n_events: Long, session_cents: Long)

  /** Sessions of a streaming (ts-watermarked) frame of
    * (user_id, tsm, tb, cents) rows; gap in microseconds. Each output
    * row is one CLOSED session (the batch aggregate row shape).
    */
  def sessionize(
      events: Dataset[SessEvent], gapUs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new data for this
            // key: the open session is complete — emit and clear
            val st = state.get
            state.remove()
            Iterator.single(Session(uid, st.session_seq, st.n, st.cents))
          } else {
            val out = scala.collection.mutable.ArrayBuffer[Session]()
            var st = state.getOption.orNull
            // within-batch order: (tsm, tb) — the same total order the
            // batch operator sorts by
            it.toIndexedSeq.sortBy(e => (e.tsm, e.tb)).foreach { e =>
              if (st == null)
                st = SessState(1L, e.tsm, e.tsm, 1L, e.cents)
              else if (e.tsm - st.last > gapUs) {
                out += Session(uid, st.session_seq, st.n, st.cents)
                st = SessState(st.session_seq + 1L, e.tsm, e.tsm, 1L, e.cents)
              } else
                st = st.copy(
                  last = e.tsm, n = st.n + 1L, cents = st.cents + e.cents)
            }
            state.update(st)
            // re-arm: the session is decidably closed once the
            // watermark passes last + gap (ms granularity, +1 so a
            // truncated microsecond can't fire early)
            state.setTimeoutTimestamp(st.last / 1000L + gapUs / 1000L + 1L)
            out.iterator
          }
      }
  }

  /** File-fed end-to-end run (the gate-query spelling): events staged
    * as ts-ordered micro-batch files, streamed through [[sessionize]],
    * landed exactly-once, returned as a batch frame of
    * (user_id, session_seq, n_events, session_cents).
    *
    * The trailing open sessions are flushed by the watermark itself:
    * two sentinel rows (key −1, ts far past every real event + gap)
    * are staged as the final two micro-batch files — the first
    * advances the watermark past every possible real timeout, the
    * second gives the engine a data batch in which those timeouts
    * fire, so the flush does not depend on no-data-batch scheduling.
    * (Degenerate caveat: rows AT epoch 0 coincide with Spark's initial
    * watermark and are filtered as late before the stateful operator —
    * any real event-time column is far past that.)
    * The sentinel's own never-closed state is dropped with the scoped
    * query; sentinel rows never reach the sink.
    */
  def sessionizeFromFiles(
      spark: SparkSession,
      events: DataFrame, // (user_id, ts: timestamp, tb, cents)
      gapUs: Long,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    val narrow = events.select(
      col("user_id").cast("long").as("user_id"),
      col("ts").cast("timestamp").as("ts"),
      col("tb").cast("long").as("tb"),
      col("cents").cast("long").as("cents"))
    // sentinel staging: far-future rows that only drive the watermark.
    // The FIRST sentinel rides INSIDE the last staged data file (it
    // carries the max ts, so range staging lands it there) — the
    // watermark then advances past every real timeout at the end of
    // the last DATA batch; the SECOND stays a trailing file so the
    // timeouts fire in a real data batch (the flush still does not
    // depend on no-data-batch scheduling). One fewer micro-batch per
    // drain than the former two trailing sentinel-only files.
    val maxTsm = narrow.agg(max(unix_micros(col("ts")))).head().getLong(0)
    def sentinelRow(tsm: Long) = spark
      .range(1)
      .select(
        lit(-1L).as("user_id"),
        timestamp_micros(lit(tsm)).as("ts"),
        lit(0L).as("tb"), lit(0L).as("cents"))
    graft.sources.FileIO.stageRangeBatches(
      narrow.unionByName(sentinelRow(maxTsm + 3L * gapUs)),
      col("ts"), nBatches, new java.io.File(base, "stage"), inDir)
    graft.sources.FileIO.appendSentinelFile(
      spark, inDir, sentinelRow(maxTsm + 3L * gapUs + 1000000L),
      name = f"b$nBatches%05d.parquet")
    val ss = StreamSessions.scoped(spark, statePartitions)
    import ss.implicits._
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
    val sessions = sessionize(
      stream
        .withWatermark("ts", "0 seconds")
        .select(
          col("user_id"), unix_micros(col("ts")).as("tsm"),
          col("tb"), col("cents"), col("ts"))
        .as[SessEvent],
      gapUs)
    val q = graft.sources.FileIO.streamingParquetSink(
      sessions.toDF(), outDir.toString,
      new java.io.File(base, "ckpt").toString).start()
    q.awaitTermination()
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir,
      new java.io.File(base, "ckpt"))
    spark.read.parquet(outDir.toString).filter(col("user_id") >= 0L)
  }
}
