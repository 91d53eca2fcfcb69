package graft.streaming

import graft.functions.FunnelKernel
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE windowed-funnel tracking — the streaming sibling of
  * [[graft.operators.Funnel]]: each user's funnel depth updates as
  * their events arrive, and a depth INCREASE emits immediately ("this
  * user just converted"), which is the alerting shape a batch rerun
  * cannot give.
  *
  * Spark-first mechanics: `flatMapGroupsWithState`, state = the
  * kernel's k chain-start slots per user (O(k) longs, fixed forever —
  * nothing event-sized is ever stored). The fold is resumable by
  * construction ([[FunnelKernel.advance]]): per batch the user's new
  * events apply in (tsm, tiebreak) order against the carried slots,
  * and range staging never splits an equal-tsm group across batches,
  * so the slots after any prefix of batches equal one batch fold of
  * the prefix. Depth is monotone nondecreasing, so the sink needs no
  * versioning — the final per-user depth is `max(depth)` over the
  * emitted rows.
  *
  * Equivalence contract (oracle-gated): fed the corpus in ts order,
  * the per-user max emitted depth EQUALS the batch
  * [[graft.operators.Funnel.userDepths]] depth, so the funnel report
  * built from the sink shares `q_funnel`'s EXISTS oracle verbatim.
  */
object StreamingFunnel {

  final case class FunEvent(user_id: Long, tsm: Long, tb: Long, ti: Long)
  final case class FunState(times: Seq[Long])
  final case class FunDepth(user_id: Long, depth: Long)

  /** Per-user depth increases of a streaming (ts-ordered) frame of
    * (user_id, tsm, tb, ti) rows; emits one row per user per batch in
    * which their depth grew.
    *
    * `ttl`: optional idle-user eviction (the `runStreaming(ttl=…)`
    * pattern, SURVEY §2 row 12b) — per-user state is a fixed k longs,
    * but with NoTimeout the store still grows with users-EVER-seen,
    * so at an unbounded user space set `ttl` to bound it by users
    * active within the window. An evicted user who returns restarts
    * from fresh slots; their depth re-grows from 1, and because the
    * sink report takes max(depth) per user, earlier (higher) depths
    * already emitted keep the report correct — eviction only forgets
    * in-flight chains older than the idle window, which for
    * `ttl >> horizon` are chains that could no longer extend anyway.
    */
  def depthUpdates(
      events: Dataset[FunEvent], k: Int, horizonUs: Long,
      ttl: Option[scala.concurrent.duration.FiniteDuration] = None): Dataset[FunDepth] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (uid: Long, it: Iterator[FunEvent], state: GroupState[FunState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val times = state.getOption
              .map(_.times.toArray).getOrElse(FunnelKernel.freshTimes(k))
            val before = FunnelKernel.depth(times)
            val sorted = it.toIndexedSeq.sortBy(e => (e.tsm, e.tb))
            FunnelKernel.advance(
              times, sorted.map(_.tsm).toArray, sorted.map(_.ti).toArray,
              horizonUs)
            state.update(FunState(times.toSeq))
            ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
            val after = FunnelKernel.depth(times)
            if (after > before) Iterator.single(FunDepth(uid, after))
            else Iterator.empty
          }
      }
  }

  /** File-fed end-to-end run (the gate-query spelling): events staged
    * as ts-ordered micro-batch files, streamed through
    * [[depthUpdates]], landed exactly-once; the funnel report
    * (step, event_type, n_users reaching ≥ step) is built from the
    * sink's per-user max depth.
    */
  def funnelCountsFromFiles(
      spark: SparkSession,
      events: DataFrame, // (user_id, ts: timestamp, tb, event_type)
      steps: Seq[String],
      horizonUs: Long,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1L)) {
      case (acc, (s, i)) =>
        when(col("event_type") === s, lit(i.toLong)).otherwise(acc)
    }
    val narrow = events
      .filter(col("event_type").isin(steps: _*))
      .select(
        col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("tsm"),
        col("tb").cast("long").as("tb"),
        stepIdx.as("ti"))
    graft.sources.FileIO.stageRangeBatches(
      narrow, col("tsm"), nBatches, new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    import ss.implicits._
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
    val q = graft.sources.FileIO.streamingParquetSink(
      depthUpdates(stream.as[FunEvent], steps.length, horizonUs).toDF(),
      outDir.toString, new java.io.File(base, "ckpt").toString).start()
    q.awaitTermination()
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    spark.read.parquet(outDir.toString)
      .groupBy(col("user_id"))
      .agg(max(col("depth")).as("depth"))
      .select(explode(sequence(lit(1L), col("depth"))).as("step"))
      .groupBy(col("step"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("event_type",
        element_at(lit(steps.toArray), col("step").cast("int")))
      .select(col("step"), col("event_type"), col("n_users"))
  }
}
