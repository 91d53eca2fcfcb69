package graft.streaming

import graft.operators.Incremental
import graft.sources.ManifestStore
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, sum}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** FOLLOW a manifest store's versions, maintaining a keyed
  * (count, sum) view INCREMENTALLY — the change-data-feed consumed as
  * a live subscription: each [[tick]] compares the store's latest
  * manifest version against the last one applied and
  *
  *  - unchanged → ZERO Spark jobs (one metadata listing);
  *  - moved → applies ONE change feed spanning every missed version
  *    ([[ManifestStore.readChanges]] reads only the files that
  *    changed between the endpoints — an idle-but-churned span still
  *    costs its net edit, not a snapshot) through
  *    [[Incremental.viewApplyChanges]]'s signed deltas;
  *  - fallen PAST RETENTION (the follower slept too long — the
  *    last-applied manifest aged out) → rebuilds the view from the
  *    current snapshot, the only correct option left, and keeps
  *    following from there.
  *
  * The view after any tick equals a fresh aggregate over the version
  * it reports — the follower invariant the spec pins under churn.
  * Lineage is truncated per application (localCheckpoint), so a
  * long-lived follower's plan never grows with tick count.
  */
final class StoreViewFollower(
    spark: SparkSession, storeDir: String, schema: StructType,
    partCol: String, keyCols: Seq[String], valueCol: String,
    countCol: String = "n_rows", sumCol: String = "sum_val") {

  private var applied: Long = -1L
  private var view: DataFrame = emptyView()

  private def emptyView(): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(
      keyCols.map(k => schema(k)) ++ Seq(
        StructField(countCol, LongType), StructField(sumCol, LongType))))

  private def aggregateSnapshot(v: Long): DataFrame =
    ManifestStore.read(spark, storeDir, schema, partCol,
        version = Some(v))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(countCol), sum(col(valueCol)).as(sumCol))

  /** The version the current view reflects (-1 before the first
    * applied tick).
    */
  def appliedVersion: Long = applied

  /** The maintained view (keyCols..., countCol, sumCol). */
  def current: DataFrame = view

  /** One follow step; returns the version the view now reflects. */
  def tick(): Long = {
    val latest = ManifestStore.latestVersion(storeDir).getOrElse(
      return applied)
    if (latest == applied) return applied // nothing new: zero jobs
    view =
      if (applied < 0L)
        aggregateSnapshot(latest).localCheckpoint(true)
      else
        try {
          val feed = ManifestStore.readChanges(
            spark, storeDir, schema, partCol, applied, latest)
          Incremental.viewApplyChanges(
              view, feed, keyCols, valueCol, countCol, sumCol)
            .localCheckpoint(true)
        } catch {
          case _: graft.sources.RetentionException =>
            // slept past the window: the diff base is gone — rebuild.
            // Typed dispatch: readChanges' OTHER IllegalArgumentExceptions
            // (bad version order) stay fatal, and a reworded retention
            // message cannot silently turn a rebuild into a crash.
            aggregateSnapshot(latest).localCheckpoint(true)
        }
    applied = latest
    applied
  }
}
