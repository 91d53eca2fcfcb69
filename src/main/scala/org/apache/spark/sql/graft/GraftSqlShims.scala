package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The one internal-access shim the library needs, isolated in the
  * `org.apache.spark.sql` namespace the `private[sql]` members require
  * (the established connector pattern — Spark's own kafka module and
  * Delta's source do exactly this).
  *
  * Why it exists: a V1 streaming `Source.getBatch` must return a
  * DataFrame whose plan is marked `isStreaming = true`
  * (MicroBatchExecution asserts it), and the only way to mark a
  * file-relation plan is the `LogicalRelation(isStreaming = ...)`
  * constructor Spark's own `FileStreamSource` uses — both it and
  * `Dataset.ofRows` are `private[sql]`.
  */
object GraftSqlShims {

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
