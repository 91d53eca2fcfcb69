package graft.tgraph.durability

import graft.tgraph.{IsolationLevel, TGraphResult}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshots — the reference's `tgraph/durability/SnapshotService.java`:
  * a consistent state snapshot at a watermark, plus WAL replay of
  * everything after it. Recovery = snapshot ⊎ replay, proved equal to
  * the direct fold by the `t_snapshot_recovery` correctness entry.
  */
object Snapshots {

  /** State fold at the watermark (transactions with ts <= watermark). */
  def take(
      result: TGraphResult,
      nameSpace: String,
      timeCol: Column,
      watermark: Column): DataFrame =
    result
      .visibleUpdates(nameSpace, IsolationLevel.PL3)
      .filter(timeCol <= watermark)
      .groupBy(col("key"))
      .agg(sum(col("delta")).as("value"))

  /** The post-watermark tail of the commit log. */
  def tail(
      result: TGraphResult,
      nameSpace: String,
      timeCol: Column,
      watermark: Column): DataFrame =
    result
      .visibleUpdates(nameSpace, IsolationLevel.PL3)
      .filter(timeCol > watermark)
      .groupBy(col("key"))
      .agg(sum(col("delta")).as("value"))

  /** Recovery: snapshot + replayed tail → final state. Outer-union so
    * keys present only on one side survive. One shuffle per side plus
    * the final re-aggregation (AQE coalesces; both sides are already
    * keyed by `key`).
    */
  def recover(snapshot: DataFrame, tail: DataFrame): DataFrame =
    snapshot
      .unionByName(tail)
      .groupBy(col("key"))
      .agg(sum(col("value")).as("value"))

  /** Persist / load a snapshot. */
  def write(snapshot: DataFrame, path: String): Unit =
    snapshot.write.mode("overwrite").parquet(path)
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
