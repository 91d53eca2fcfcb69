package graft.streaming

import graft.operators.DataQuality
import graft.operators.DataQuality.{Check, Unique}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CONTINUOUS data-quality monitoring — the streaming sibling of
  * [[DataQuality.audit]] (SURVEY §2 row 118): the corpus replays as
  * micro-batch files and the audit maintains itself online:
  *
  *  - every ROW-LEVEL check (NotNull / InRange / AcceptedValues /
  *    Satisfies) keeps its one-aggregate spelling — each batch runs
  *    the SAME codegen'd conditional-sum aggregate and lands a
  *    1-row partial in the partials sink; counters are associative,
  *    so the drained sum equals the batch audit exactly (and the
  *    sink doubles as the restart log: partials are per-batch files);
  *  - UNIQUE checks cannot partial-sum (a duplicate can span
  *    batches): each runs a stateful `dropDuplicates` whose appended
  *    first-seen rows count the exact distincts — violations =
  *    n_rows − first-seens. Null-keyed rows are excluded from the
  *    first-seen stream (batch `count_distinct` ignores null keys, so
  *    a null key row counts as a violation on both sides — the
  *    row-identical contract holds with nulls present). State is one
  *    row per distinct key: the honest cost of EXACT streaming
  *    uniqueness (the bounded alternative is the KMV estimate,
  *    row 82).
  *
  * The drained report is row-identical to [[DataQuality.audit]] on
  * the same data — the gate shares `dq_events`' oracle verbatim.
  */
object StreamingQuality {

  def auditFromFiles(
      spark: SparkSession,
      df: DataFrame,
      checks: Seq[Check],
      stageCol: String,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    graft.sources.FileIO.stageRangeBatches(
      df, col(stageCol), nBatches, new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    def stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, df.schema, maxFilesPerTrigger = 1)

    val rowChecks = checks.filterNot(_.isInstanceOf[Unique])
    val uniqueChecks = checks.collect { case u: Unique => u }

    // per-batch 1-row partials of the row-level conditional sums
    val partialsDir = new java.io.File(base, "partials")
    if (rowChecks.nonEmpty || uniqueChecks.nonEmpty) {
      val aggs = count(lit(1)).as("__n") +:
        rowChecks.zipWithIndex.map { case (c, i) =>
          coalesce(c.violations, lit(0L)).cast("long").as(s"__v$i")
        }
      val q = stream.writeStream
        .option("checkpointLocation", new java.io.File(base, "ckpt-rows").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.agg(aggs.head, aggs.tail: _*)
            .write.mode("overwrite") // exactly-once per batch id on replay
            .parquet(new java.io.File(partialsDir, f"batch-$id%05d").toString)
        }
        .start()
      q.awaitTermination()
    }

    // exact distinct counting per Unique check: stateful first-seen
    // emission (append mode), duplicates never re-emit
    val uniqueCounts: Seq[(String, Long)] = uniqueChecks.zipWithIndex.map {
      case (u, i) =>
        val outDir = new java.io.File(base, s"uniq-$i")
        val q = stream
          .select(u.cs.map(col): _*)
          // count_distinct (the batch audit) skips rows with any null
          // key component; drop them here too so first-seens == the
          // batch distinct count exactly
          .filter(u.cs.map(c => col(c).isNotNull).reduce(_ && _))
          .dropDuplicates(u.cs)
          .writeStream
          .format("parquet")
          .option("path", outDir.toString)
          .option("checkpointLocation",
            new java.io.File(base, s"ckpt-uniq-$i").toString)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        u.name -> spark.read.parquet(outDir.toString).count()
    }.toSeq

    graft.sources.FileIO.deleteScratch(new java.io.File(base, "stage"), inDir)
    graft.sources.FileIO.deleteScratchOnExit(base)

    // assemble the batch-audit report from the drained pieces
    val partials = spark.read
      .option("recursiveFileLookup", "true").parquet(partialsDir.toString)
    val sumAggs = sum(col("__n")).as("__n") +:
      rowChecks.indices.map(i => sum(col(s"__v$i")).as(s"__v$i"))
    val sums = partials.agg(sumAggs.head, sumAggs.tail: _*).collect().head
    val nRows = sums.getLong(0)
    val rowViolations = rowChecks.zipWithIndex.map { case (c, i) =>
      c.name -> sums.getLong(i + 1)
    }
    val uniqViolations = uniqueCounts.map { case (name, distinct) =>
      name -> (nRows - distinct)
    }
    import spark.implicits._
    (rowViolations ++ uniqViolations)
      .map { case (name, v) => (name, nRows, v, v == 0L) }
      .toDF("check", "n_rows", "n_violations", "passed")
      .orderBy("check")
  }
}

/** DSIR importance scoring maintained ONLINE: the weight table is
  * trained once (batch — target + corpus bucket counts) and FROZEN;
  * new documents stream through as micro-batch files and score
  * statelessly against it (broadcast-sized table pinned on the scoped
  * session). Stateless per doc → any batch split lands identical
  * scores, so the `stream_domain_importance` gate shares the batch
  * oracle VERBATIM; exactly-once via per-batch-id output dirs.
  */
object StreamingImportance {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions.col

  def scoreFromFiles(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, // (doc_id, text)
      weights: DataFrame, // (bucket, w_milli) — the frozen table
      buckets: Int,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    val narrow = docs.select(col("doc_id"), col("text"))
    graft.sources.FileIO.stageRangeBatches(
      narrow, col("doc_id"), nBatches, new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    // the frozen weights, re-pinned on the scoped session (frames from
    // different sessions must not meet in one plan)
    val wLocal = ss.createDataFrame(
      ss.sparkContext.parallelize(weights.collect().toSeq, 1),
      weights.schema).localCheckpoint(true)
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
    val q = stream.writeStream
      .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.operators.CorpusStats.scoreWithImportanceWeights(
          batch, col("doc_id"), col("text"), wLocal, buckets)
          .write.mode("overwrite") // exactly-once per batch id on replay
          .parquet(new java.io.File(outDir, f"batch-$id%05d").toString)
      }
      .start()
    q.awaitTermination()
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    graft.sources.FileIO.deleteScratchOnExit(base)
    spark.read.option("recursiveFileLookup", "true").parquet(outDir.toString)
  }
}
