package graft.operators

import graft.functions.WindowFunnelDepth
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed funnel analysis — "how many users viewed, then clicked,
  * then purchased, all within the horizon" — over an event stream
  * table. The depth semantics are the strict-chain EXISTS definition
  * (see [[graft.functions.FunnelKernel]]); this file is the
  * distributed spelling around the kernel.
  *
  * Scale shape: ONE shuffle of the (filtered, 3-column) events on the
  * user key. The step filter `type IN steps` and the 3-column
  * projection both push into the parquet scan; what shuffles is
  * (user, tsm, step_idx) — 24 bytes per qualifying event. Per user the
  * fold is the retention-bounded sorted event array (the same bound
  * every funnel engine carries — a user's event history), folded in
  * O(n·k) by the codegen'd kernel; no window function, no self-join.
  * The oracle's EXISTS spelling is an O(n^k) per-user join — the
  * kernel computes the identical answer in one linear pass, which is
  * the entire point at 100 TB.
  */
object Funnel {

  /** Per-user funnel depth 0..k: (user_id, depth). */
  def userDepths(
      df: DataFrame, user: Column, ts: Column, typeCol: Column,
      steps: Seq[String], horizonUs: Long): DataFrame = {
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1L)) {
      case (acc, (s, i)) => when(typeCol === s, lit(i.toLong)).otherwise(acc)
    }
    df.filter(typeCol.isin(steps: _*))
      .select(
        user.as("user_id"), unix_micros(ts).as("tsm"), stepIdx.as("ti"))
      .groupBy(col("user_id"))
      .agg(WindowFunnelDepth(
        sort_array(collect_list(struct(col("tsm"), col("ti")))),
        steps.length, horizonUs).as("depth"))
  }

  /** The funnel report: one row per step some user reached —
    * (step, event_type, n_users with depth ≥ step), steps 1-based.
    */
  def funnelCounts(
      df: DataFrame, user: Column, ts: Column, typeCol: Column,
      steps: Seq[String], horizonUs: Long): DataFrame =
    userDepths(df, user, ts, typeCol, steps, horizonUs)
      .filter(col("depth") >= 1L)
      .select(explode(sequence(lit(1L), col("depth"))).as("step"))
      .groupBy(col("step"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("event_type",
        element_at(lit(steps.toArray), col("step").cast("int")))
      .select(col("step"), col("event_type"), col("n_users"))
}
