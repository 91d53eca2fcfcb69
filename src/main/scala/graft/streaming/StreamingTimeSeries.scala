package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Real-time time-series pattern matching — the streaming sibling of
  * [[graft.operators.TimeSeries.motifSearch]]: every arriving value
  * extends its key's series, every completed w-window is scored
  * against the query pattern with the same exact-integer
  * offset-invariant distance, and matches (dist ≤ maxDist) emit AS
  * THE DATA ARRIVES — the alerting shape ("tell me when this shape
  * happens") instead of the batch search.
  *
  * Spark-first mechanics: `flatMapGroupsWithState` keyed by series
  * key; state = the last w−1 values + the running position (O(w) per
  * key — bounded regardless of stream length). Values are applied in
  * (ts, tiebreak) order within each micro-batch, so a source that
  * stages batches in ts order (the file-fed gate spelling) replays
  * the exact batch series.
  *
  * Equivalence contract (oracle-gated): fed the corpus in ts order —
  * any micro-batch partitioning — the emitted match set is EXACTLY
  * the batch windows with dist ≤ maxDist, because the window stream
  * is a pure function of the per-key value sequence.
  */
object StreamingTimeSeries {

  final case class TsEvent(k: Long, ts: Long, tb: Long, v: Long)
  final case class TsState(seen: Long, buf: Seq[Long])
  final case class TsMatch(k: Long, idx: Long, dist: Long)

  private def centeredSsd(win: Seq[Long], pat: Array[Long], w: Int): Long = {
    var sa = 0L; var sb = 0L
    var i = 0
    while (i < w) { sa += win(i); sb += pat(i); i += 1 }
    var acc = 0L
    i = 0
    while (i < w) {
      val d = win(i) * w - sa - (pat(i) * w - sb)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Matches of `pattern` (dist ≤ maxDist) over a streaming (or
    * batch) frame of (k, ts, tb, v) rows; idx is the window's 0-based
    * start position in its key's series.
    */
  def matchPattern(
      events: DataFrame,
      pattern: Array[Long],
      maxDist: Long): Dataset[TsMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = pattern.length
    events.select(col("k").cast("long"), col("ts").cast("long"),
        col("tb").cast("long"), col("v").cast("long"))
      .as[TsEvent]
      .groupByKey(_.k)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: Long, it: Iterator[TsEvent],
         state: org.apache.spark.sql.streaming.GroupState[TsState]) =>
          val st = state.getOption.getOrElse(TsState(0L, Seq.empty))
          var seen = st.seen
          val buf = scala.collection.mutable.ArrayBuffer[Long](st.buf: _*)
          val out = scala.collection.mutable.ArrayBuffer[TsMatch]()
          // within-batch order: (ts, tb) — the same total order the
          // batch operator sorts by
          it.toIndexedSeq.sortBy(e => (e.ts, e.tb)).foreach { e =>
            seen += 1
            buf += e.v
            if (buf.length > w) buf.remove(0)
            if (buf.length == w) {
              val d = centeredSsd(buf.toSeq, pattern, w)
              if (d <= maxDist) out += TsMatch(k, seen - w, d)
            }
          }
          state.update(TsState(seen, buf.toSeq))
          out.iterator
      }
  }

  /** File-fed end-to-end run (the gate-query spelling): events staged
    * as ts-ordered micro-batch files (same-ts rows never split across
    * batches — range partitioning keeps equal keys together), streamed
    * through [[matchPattern]], landed exactly-once, returned as a
    * batch frame.
    */
  def matchPatternFromFiles(
      spark: org.apache.spark.sql.SparkSession,
      events: DataFrame, // (k, ts, tb, v)
      pattern: Array[Long],
      maxDist: Long,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    graft.sources.FileIO.stageRangeBatches(
      events.select(col("k"), col("ts"), col("tb"), col("v")),
      col("ts"), nBatches, new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString,
      events.select(col("k"), col("ts"), col("tb"), col("v")).schema,
      maxFilesPerTrigger = 1)
    val q = graft.sources.FileIO.streamingParquetSink(
      matchPattern(stream, pattern, maxDist).toDF(),
      outDir.toString, new java.io.File(base, "ckpt").toString).start()
    q.awaitTermination()
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    spark.read.parquet(outDir.toString)
  }
}
