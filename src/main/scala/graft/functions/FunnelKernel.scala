package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native windowed-funnel fold (the event-analytics "did the user
  * view → click → purchase within the horizon" operator, ClickHouse's
  * `windowFunnel` shape with STRICT event ordering).
  *
  * Semantics (the oracle's EXISTS spelling, exactly): a user reaches
  * depth d iff there exist events e₁ < e₂ < … < e_d (strictly
  * increasing event time) whose types are steps 1…d in order, with
  * every chain event within `horizonUs` of the CHAIN'S FIRST event.
  *
  * The fold is one pass over the user's time-sorted events with k
  * long slots: slot j holds the maximum chain-start time over all
  * valid chains of depth j+1 seen so far. Max-start is the exact
  * dominant representative — a future event extends SOME depth-j
  * chain iff it extends the latest-starting one, because the only
  * extension constraints are `t ≤ start + horizon` (loosest for the
  * largest start) and strict time order (automatic: every kept
  * chain's events precede the current time group). Equal-time events
  * commit as one group against the pre-group slots, so no chain ever
  * uses two events at the same timestamp — strictness holds even on
  * tied timestamps, with no last-event bookkeeping.
  *
  * O(n·k) time, O(k) state per user; the per-user event array is the
  * same retention-bounded collect the batch sessionizer's window
  * shuffle carries. Reference scope: graft's own event-analytics
  * surface (the t-spoon reference has no funnel operator; this is
  * part of the beyond-reference pipeline set).
  */
object FunnelKernel {
  /** Empty slot marker; [[freshTimes]] starts every slot here. */
  val Min: Long = Long.MinValue

  def freshTimes(k: Int): Array[Long] = Array.fill(k)(Min)

  /** Advance the k chain-start slots over time-sorted (tsm, ti)
    * events, in place. Resumable: feeding a sorted event sequence in
    * any number of chunks gives the same final slots as one call,
    * PROVIDED equal-tsm events never split across chunks (a split
    * group would let same-time events chain, which one call forbids).
    * This is what the streaming operator's per-batch replay leans on.
    */
  def advance(
      times: Array[Long], tsm: Array[Long], ti: Array[Long],
      horizonUs: Long): Unit = {
    val k = times.length
    val upd = new Array[Long](k)
    val n = tsm.length
    var i = 0
    while (i < n) {
      val t = tsm(i)
      System.arraycopy(times, 0, upd, 0, k)
      var j = i
      while (j < n && tsm(j) == t) {
        val s = ti(j).toInt
        if (s == 0) {
          if (t > upd(0)) upd(0) = t
        } else if (s > 0 && s < k && times(s - 1) != Min &&
          t <= times(s - 1) + horizonUs) {
          if (times(s - 1) > upd(s)) upd(s) = times(s - 1)
        }
        j += 1
      }
      System.arraycopy(upd, 0, times, 0, k)
      i = j
    }
  }

  /** Depth = highest filled slot, 0..k. */
  def depth(times: Array[Long]): Long = {
    var d = times.length
    while (d > 0 && times(d - 1) == Min) d -= 1
    d.toLong
  }

  /** Max strict-chain depth (0..k) over `events`: a time-sorted
    * array<struct<tsm:long, ti:long>> where ti is the 0-based step
    * index of the event's type.
    */
  def windowFunnelDepth(events: ArrayData, k: Int, horizonUs: Long): Long = {
    val n = events.numElements()
    val tsm = new Array[Long](n)
    val ti = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = events.getStruct(i, 2)
      tsm(i) = row.getLong(0)
      ti(i) = row.getLong(1)
      i += 1
    }
    val times = freshTimes(k)
    advance(times, tsm, ti, horizonUs)
    depth(times)
  }
}

/** `array<struct<tsm,ti>>` (time-sorted) → funnel depth 0..steps. */
case class WindowFunnelDepth(child: Expression, steps: Int, horizonUs: Long)
    extends UnaryExpression {
  require(steps >= 1, s"steps=$steps must be >= 1")
  require(horizonUs >= 0, s"horizonUs=$horizonUs must be >= 0")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(f0, f1)), _)
        if f0.dataType == LongType && f1.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_funnel_depth expects array<struct<bigint,bigint>>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "window_funnel_depth"
  override def nullSafeEval(arr: Any): Any =
    FunnelKernel.windowFunnelDepth(arr.asInstanceOf[ArrayData], steps, horizonUs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helperRef = FunnelKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $helperRef.windowFunnelDepth($in, $steps, ${horizonUs}L);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowFunnelDepth {
  def apply(events: Column, steps: Int, horizonUs: Long): Column =
    Bridge.column(WindowFunnelDepth(Bridge.expression(events), steps, horizonUs))
}
