package graft.tgraph.durability

import graft.tgraph.{IsolationLevel, TGraphResult, TStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Write-ahead log — the reference's `tgraph/durability/FileWAL.java` /
  * `ProxyWALServer.java` re-expressed as a parquet commit log.
  *
  * Entries are the committed updates in total (tid, branch) order with a
  * log sequence number. `(tid, branch)` is already a total order, so at
  * scale the log can be written partitioned by tid-range with no global
  * window; the dense `lsn` column (a single-partition row_number) is
  * only materialized for oracle-checkable output and bounded batches —
  * callers at 100 TB should rely on (tid, branch) ordering instead.
  */
object Wal {
  /** Committed updates as WAL entries (lsn, tid, branch, key, delta). */
  def entries(result: TGraphResult, nameSpace: String): DataFrame = {
    val committed = result.visibleUpdates(nameSpace, IsolationLevel.PL3)
    val w = Window.orderBy(col(TStream.TidCol), col(TStream.BranchCol))
    committed
      .withColumn("lsn", row_number().over(w))
      .select(
        col("lsn"),
        col(TStream.TidCol).as("tid"),
        col(TStream.BranchCol).as("branch"),
        col("key"),
        col("delta"))
  }

  /** Persist the log (append-only, replayable). */
  def write(result: TGraphResult, nameSpace: String, path: String): Unit =
    entries(result, nameSpace).write.mode("append").parquet(path)

  /** Read the log back for replay. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
