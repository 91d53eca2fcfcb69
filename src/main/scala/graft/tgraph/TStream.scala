package graft.tgraph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Transactional stream — the Spark-native analog of the reference's
  * `tgraph/TStream.java:16-32` (map / flatMap / window / filter / keyBy /
  * state).
  *
  * A TStream is a DataFrame enriched with two metadata columns:
  * `__tid` (transaction id, assigned by [[TransactionEnvironment.open]],
  * the analog of `twopc/OpenOperator` enriching records) and `__branch`
  * (the update branch within a transaction, produced by [[flatMap]] —
  * the reference forks a transaction into N enriched tuples the same
  * way).
  *
  * All transforms are Column-based so the whole pipeline stays inside
  * Catalyst: predicate pushdown, column pruning and whole-stage codegen
  * apply end-to-end, and nothing here forces a shuffle — only
  * [[state]] (groupBy on the state key) and vote reduction do.
  * Reference-parity lambda variants live in
  * [[graft.tgraph.state.StateOperator]] (typed executors).
  */
final class TStream private[tgraph] (
    val env: TransactionEnvironment,
    val df: DataFrame,
    val keys: Seq[Column]) {

  import TStream._

  private def copy(df: DataFrame, keys: Seq[Column] = keys) =
    new TStream(env, df, keys)

  /** `TStream.map` — add/replace derived columns (narrow, codegen'd). */
  def map(cols: (String, Column)*): TStream =
    copy(df.withColumns(cols.toMap))

  /** Projection that always preserves the transaction metadata. */
  def select(cols: Column*): TStream =
    copy(df.select(cols :+ col(TidCol) :+ col(BranchCol): _*))

  /** `TStream.filter` — narrow, pushdown-friendly. */
  def filter(cond: Column): TStream = copy(df.filter(cond))

  /** `TStream.flatMap` — `gen` must be an `array<struct<...>>` column;
    * each element becomes one record of the same transaction, `__branch`
    * numbering the fork (mirrors `Enriched` tuple forking in the
    * reference's flatMap at `tgraph/TStream.java:18`).
    */
  def flatMap(gen: Column): TStream = {
    val out = df
      // the documented fan-out limit fails LOUDLY: a fork of >= 1000
      // at any level would silently collide (tid, __branch) identities
      // in the radix-1000 branch path, corrupting vote reduction
      .withColumn("__gen",
        when(size(gen) >= 1000, raise_error(concat(
          lit("TStream.flatMap fan-out "), size(gen).cast("string"),
          lit(" exceeds the per-level limit of 999"))))
          .otherwise(gen))
      .select(col(TidCol), col(BranchCol), posexplode(col("__gen")).as(Seq("__pos", "__elem")))
      // compose the branch path (the reference's nested BatchID,
      // `tgraph/BatchID.java`): chained flatMaps keep unique
      // (tid, branch) identities for fan-outs < 1000 per level.
      // Level 1 (branch 0) stays = pos, so flat pipelines are unchanged.
      .select(col(TidCol),
        (col(BranchCol) * 1000 + col("__pos")).cast("int").as(BranchCol),
        col("__elem.*"))
    copy(out, keys = Nil)
  }

  /** `TStream.keyBy` — records the partitioning key for downstream
    * stateful ops. Deliberately does NOT eagerly `repartition`: the
    * groupBy/window in [[state]] already shuffles on this key once, and
    * an eager repartition would double the shuffle.
    */
  def keyBy(keyCols: Column*): TStream = copy(df, keys = keyCols)

  /** Tumbling event-time window aggregate (the reference's
    * `TWindowFunction`, `tgraph/TStream.java:20`). Grouping keys =
    * `keyBy` keys (if any) + the window bucket. One shuffle; partial
    * aggregation happens map-side.
    */
  def window(time: Column, bucket: String, aggs: Column*): DataFrame = {
    val b = bucket match {
      case "day"  => to_date(time).as("day")
      case "hour" => date_trunc("hour", time).as("hour")
      case other  => org.apache.spark.sql.functions.window(time, other).as("window")
    }
    df.groupBy(keys :+ b: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Transactional keyed state — the analog of
    * `TStream.state(nameSpace, ks, stateFunction, partitioning)`
    * (`tgraph/TStream.java:26` + `state/StateOperator.java`).
    *
    * Declarative form: `delta` is the state update contributed by this
    * record, `abortIf` the per-branch invariant violation (the
    * reference's `StateFunction.invariant` turned into a Column so the
    * vote is computed without leaving codegen). `orderBy` names columns
    * of this stream fixing the deterministic serial order per key
    * (PL3 timestamp ordering).
    */
  def state(
      nameSpace: String,
      key: Column,
      delta: Column,
      abortIf: Column,
      orderBy: Seq[String],
      replayIf: Column = lit(false)): StateStream = {
    val updates = df.select(
      Seq(
        col(TidCol),
        col(BranchCol),
        key.as("key"),
        delta.as("delta"),
        when(abortIf, lit(Vote.Abort))
          .when(replayIf, lit(Vote.Replay))
          .otherwise(lit(Vote.Commit)).as("__branch_vote")
      ) ++ orderBy.map(col): _*)
    new StateStream(env, nameSpace, updates, orderBy)
  }

  def getEnclosingStream: DataFrame = df
}

object TStream {
  val TidCol = "__tid"
  val BranchCol = "__branch"
  val VoteCol = "__vote"
}
