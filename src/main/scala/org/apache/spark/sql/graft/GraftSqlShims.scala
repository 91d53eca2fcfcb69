package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The internal-access shims the library needs, isolated in the
  * `org.apache.spark.sql` namespace the `private[sql]` members require
  * (the established connector pattern — Spark's own kafka module and
  * Delta's source do exactly this).
  *
  * Why they exist: a V1 streaming `Source.getBatch` must return a
  * DataFrame whose plan is marked `isStreaming = true`
  * (MicroBatchExecution asserts it), and the only way to mark a
  * file-relation plan is the `LogicalRelation(isStreaming = ...)`
  * constructor Spark's own `FileStreamSource` uses; symmetrically a V1
  * streaming `Sink.addBatch` receives a DataFrame whose plan IS the
  * streaming-incremental plan — re-running it through a batch writer
  * needs the already-executing RDD re-wrapped as a batch frame (the
  * `internalCreateDataFrame` pattern Delta's V1 sink uses). All of
  * `Dataset.ofRows`, `internalCreateDataFrame` and the marked
  * constructor are `private[sql]`.
  */
object GraftSqlShims {

  /** A DataFrame over an already-analyzed logical plan — what a
    * resolution rule holds when it needs to hand a subtree back to the
    * public DataFrame API (the [[graft.plans.GraftInsertRule]] rewrite
    * runs the INSERT's source query through the store's own write
    * path).
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** Re-wrap a streaming micro-batch frame as a BATCH frame over the
    * same physical rows: `Sink.addBatch`'s input plan is owned by the
    * `IncrementalExecution` and cannot be spliced into a batch write
    * directly — `queryExecution.toRdd` pins the executed rows and
    * `internalCreateDataFrame(isStreaming = false)` gives them a batch
    * identity (the V1-sink idiom; the extra serialization boundary is
    * one narrow row pass per micro-batch).
    */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[CSparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Re-plan `df` with its file-relation leaves marked streaming — what
    * [[graft.streaming.StoreChangesSource]]'s getBatch hands to the
    * micro-batch executor. Only safe for SCAN-SHAPED plans
    * (projections/filters over file relations): stateful-rewritable
    * operators (aggregates, set ops) inside a streaming-marked batch
    * plan would be re-planned as stateful streaming operators — the
    * source materializes diff feeds to parquet first for exactly that
    * reason.
    */
  def markScanStreaming(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming =>
        lr.copy(isStreaming = true)
    }
    require(plan.isStreaming,
      "markScanStreaming wants a plan with a file-relation leaf")
    CDataset.ofRows(df.sparkSession.asInstanceOf[CSparkSession], plan)
  }
}
