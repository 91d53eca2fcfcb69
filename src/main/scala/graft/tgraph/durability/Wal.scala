package graft.tgraph.durability

import graft.tgraph.{IsolationLevel, TGraphResult, TStream}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Write-ahead log — the reference's `tgraph/durability/FileWAL.java` /
  * `ProxyWALServer.java` re-expressed as a parquet commit log.
  *
  * Entries are the committed updates in total (tid, branch) order with a
  * dense log sequence number. The lsn is computed scale-safely: a range
  * repartition on (tid, branch) + per-partition sort gives the global
  * order across ALL partitions (the same exchange a global orderBy
  * uses), and `zipWithIndex` numbers it with the classic two-pass
  * scheme — count rows per partition, prefix-sum the counts into
  * per-partition offsets, then number each partition independently.
  * No single-partition window anywhere; the log scales with the
  * cluster.
  */
object Wal {

  /** Dense global numbering of `df` in (tid, branch) order, starting at
    * `offset + 1`. Two jobs (zipWithIndex's count pass + the write),
    * never a single-partition stage.
    */
  private def numbered(df: DataFrame, offset: Long): DataFrame = {
    // The within-partition sort includes EVERY column so the order is
    // total even when (tid, branch) ties exist: repartitionByRange's
    // sampling seed varies with the RDD id, so a re-executed batch could
    // otherwise bind lsns to tied rows differently than the original
    // attempt and break appendBatch's idempotent-retry story.
    val sorted = df
      .repartitionByRange(col(TStream.TidCol), col(TStream.BranchCol))
      .sortWithinPartitions(df.columns.map(col).toIndexedSeq: _*)
    val schema = sorted.schema.add("lsn", LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (offset + i + 1L))
    }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /** Committed updates as WAL entries (lsn, tid, branch, key, delta). */
  def entries(result: TGraphResult, nameSpace: String, offset: Long = 0L): DataFrame =
    numbered(
      result.visibleUpdates(nameSpace, IsolationLevel.PL3)
        .select(col(TStream.TidCol), col(TStream.BranchCol), col("key"), col("delta")),
      offset)
      .select(
        col("lsn"),
        col(TStream.TidCol).as("tid"),
        col(TStream.BranchCol).as("branch"),
        col("key"),
        col("delta"))

  /** Persist the log (append-only, replayable): new entries continue
    * the existing log's lsn sequence, so the dense total order holds
    * ACROSS writes, not just within one.
    */
  def write(result: TGraphResult, nameSpace: String, path: String): Unit = {
    val spark = result.finalVotes.sparkSession
    val offset =
      try
        spark.read.parquet(path)
          .agg(coalesce(max(col("lsn").cast("bigint")), lit(0L)))
          .head.getLong(0)
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    entries(result, nameSpace, offset).write.mode("append").parquet(path)
  }

  /** Read the log back for replay. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** One micro-batch append for the ONLINE WAL, idempotent under
    * re-execution: batch `id`'s entries land in `data/b<id>` and its
    * row count in `meta/b<id>`, both with overwrite — a failed batch
    * that re-runs (replayable source ⇒ identical content) overwrites
    * its own directories instead of appending duplicates, which is
    * what makes `foreachBatch` exactly-once here. The batch's lsn
    * range continues the sequence: offset = Σ counts of all earlier
    * batches (read from the tiny meta log, never the data).
    */
  def appendBatch(updates: DataFrame, path: String, batchId: Long): Unit = {
    val spark = updates.sparkSession
    // The online log's schema is fixed at (lsn, tid, branch, key, delta)
    // all-long — readOnline's empty-log branch returns exactly that, so
    // enforcing it at WRITE time keeps empty and non-empty logs
    // union-compatible. Integral-only (widening) casts: a double delta
    // would truncate silently, so it must fail loudly here instead.
    Seq(TStream.TidCol, TStream.BranchCol, "key", "delta").foreach { c =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
      val dt = updates.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"online WAL column '$c' must be integral (got $dt); " +
          "store amounts as exact integer units (e.g. cents)")
    }
    // Missing meta dir = first batch, offset 0. Any OTHER failure must
    // propagate: silently defaulting the offset would renumber this
    // batch from 1 and corrupt the dense-lsn invariant, which is the
    // log's whole correctness story.
    val offset =
      if (!pathExists(spark, s"$path/meta")) 0L
      else
        // recursiveFileLookup: the per-batch b<id> subdirs are plain
        // directories, not key=value partitions
        spark.read.option("recursiveFileLookup", "true").parquet(s"$path/meta")
          .filter(col("batch_id") < batchId)
          .agg(coalesce(sum(col("n")), lit(0L))).head.getLong(0)
    val entries = numbered(
      updates.select(col(TStream.TidCol).cast(LongType),
        col(TStream.BranchCol).cast(LongType),
        col("key").cast(LongType), col("delta").cast(LongType)),
      offset)
      .select(col("lsn"), col(TStream.TidCol).as("tid"),
        col(TStream.BranchCol).as("branch"), col("key"), col("delta"))
      // count + write below would otherwise each recompute the batch
      // (and zipWithIndex's own count pass a third time)
      .persist()
    try {
      val n = entries.count()
      // an empty batch would write a schema-less (marker-only) parquet
      // dir that breaks later schema inference — record it in meta only
      if (n > 0)
        entries.write.mode("overwrite").parquet(s"$path/data/b$batchId")
      import spark.implicits._
      Seq((batchId, n)).toDF("batch_id", "n")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta/b$batchId")
    } finally entries.unpersist()
  }

  /** The online WAL: committed updates of a STREAMING transactional
    * pipeline appended per micro-batch via [[appendBatch]] —
    * checkpointed `foreachBatch` + idempotent per-batch directories =
    * exactly-once, with the dense lsn order continuing across batches
    * and restarts (the reference's `ProxyWALServer`/`FileWAL` online
    * path, re-expressed as a commit log on object storage).
    */
  def streamingSink(
      updates: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     id: Long) => appendBatch(batch.toDF(), path, id))
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())

  private[durability] def pathExists(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Does `p` contain any file (recursively)? An existing-but-empty
    * data dir (e.g. after full compaction deleted every batch subdir)
    * must read as an empty log, not a schema-inference error.
    */
  private def hasAnyFile(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(hp) && fs.listFiles(hp, true).hasNext
  }

  /** Read the online log (same schema as [[read]], data dirs only).
    * A log whose every batch was empty — or whose batches were all
    * compacted away — has meta but no data files; that is a legal
    * state and reads as an empty frame.
    */
  def readOnline(spark: SparkSession, path: String): DataFrame =
    if (!hasAnyFile(spark, s"$path/data"))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("lsn", LongType),
          org.apache.spark.sql.types.StructField("tid", LongType),
          org.apache.spark.sql.types.StructField("branch", LongType),
          org.apache.spark.sql.types.StructField("key", LongType),
          org.apache.spark.sql.types.StructField("delta", LongType))))
    else
      spark.read.option("recursiveFileLookup", "true").parquet(s"$path/data")
}
