package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** File-format ingestion/egress beyond parquet — the library's
  * source/sink surface for batch and streaming.
  *
  * Scale rules baked in:
  *  - schemas are ALWAYS explicit: `inferSchema` is a second full scan
  *    of the data (a non-starter at 100 TB) and can silently change
  *    types between runs;
  *  - CSV/JSON readers run in PERMISSIVE mode with a corrupt-record
  *    column, so bad rows surface as data (filterable, countable)
  *    instead of killing a 1000-executor job;
  *  - the streaming readers cap per-batch file intake
  *    (`maxFilesPerTrigger`) so backfills of millions of files don't
  *    produce one giant micro-batch.
  */
object FileIO {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, org.apache.spark.sql.types.StringType, nullable = true)

  /** CSV with explicit schema; malformed rows land in `_corrupt_record`. */
  def csv(
      spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** JSON Lines with explicit schema; malformed rows land in
    * `_corrupt_record`.
    */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Split a PERMISSIVE read into (clean rows, corrupt rows). The
    * corrupt side carries the raw line plus whatever fields did parse.
    *
    * Spark restriction: a raw-file scan whose PRUNED schema is only
    * `_corrupt_record` is rejected (SPARK-26208) — so aggregate-only
    * queries over the corrupt side (e.g. a bare `count()`, which prunes
    * the parsed columns away) must either materialize the rows or
    * count over a projection that keeps a parsed column referenced.
    */
  def partitionCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val dataCols = df.columns.filterNot(_ == CorruptCol).map(df.col)
    (
      df.filter(df.col(CorruptCol).isNull).drop(CorruptCol),
      df.filter(df.col(CorruptCol).isNotNull)
        .select(df.col(CorruptCol).as("raw") +:
          dataCols.map(c => c.as(s"parsed_${c.toString}")): _*))
  }

  /** Streaming file source (new files under `path` become micro-
    * batches), bounded intake per trigger.
    */
  def streamJsonLines(
      spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  /** Stage a batch DataFrame as `nBatches` parquet files of contiguous
    * `orderCol` ranges under `inDir`, named and mtime-stamped in range
    * order so [[streamParquet]] (modification-time ordering) replays
    * them as ordered micro-batches. The data write is DISTRIBUTED
    * (`repartitionByRange`); the driver touches only file metadata
    * (rename + timestamp), never rows.
    */
  def stageRangeBatches(
      df: DataFrame, orderCol: org.apache.spark.sql.Column,
      nBatches: Int, stageDir: java.io.File, inDir: java.io.File): Unit = {
    df.repartitionByRange(nBatches, orderCol)
      .write.mode("overwrite").parquet(stageDir.toString)
    inDir.mkdirs()
    // part-NNNNN index = range-partition index = orderCol order
    val parts = Option(stageDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val t0 = (System.currentTimeMillis() / 1000L) * 1000L - parts.length * 2000L
    parts.zipWithIndex.foreach { case (f, i) =>
      val dst = new java.io.File(inDir, f"b$i%05d.parquet")
      java.nio.file.Files.move(f.toPath, dst.toPath)
      dst.setLastModified(t0 + i * 2000L)
    }
  }

  /** Append one more micro-batch file AFTER everything staged by
    * [[stageRangeBatches]] — mtime-stamped strictly last so
    * [[streamParquet]] replays it as the final batch. Used for flush
    * sentinels (a watermark-advancing row that closes the stream's
    * open windows); `rows` is expected to be tiny (typically 1).
    */
  def appendSentinelFile(
      spark: org.apache.spark.sql.SparkSession,
      inDir: java.io.File, rows: DataFrame,
      name: String = "b99999.parquet"): Unit = {
    val stage = new java.io.File(inDir.getParentFile, "sentinel-stage")
    rows.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Option(stage.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .head
    val last = Option(inDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(_.lastModified()).foldLeft(0L)(math.max)
    val dst = new java.io.File(inDir, name)
    java.nio.file.Files.move(part.toPath, dst.toPath)
    dst.setLastModified(math.max(last + 2000L, System.currentTimeMillis()))
    deleteScratch(stage)
  }

  /** Inject AT-LEAST-ONCE redelivery: re-append a copy of staged
    * micro-batch file `index` (so its rows arrive a second time, in a
    * later batch) under a fresh name with a strictly-later mtime.
    * Drills for exactly-once operators (`dropDuplicatesWithinWatermark`
    * etc.) — a file source is exactly-once by itself, so duplicates
    * must be injected to prove the dedup path.
    */
  def redeliverStagedFile(inDir: java.io.File, index: Int): Unit = {
    val src = new java.io.File(inDir, f"b$index%05d.parquet")
    require(src.exists(), s"no staged file $src")
    val last = Option(inDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(_.lastModified()).foldLeft(0L)(math.max)
    val dst = new java.io.File(inDir, f"r$index%05d.parquet")
    java.nio.file.Files.copy(src.toPath, dst.toPath)
    dst.setLastModified(math.max(last + 2000L, System.currentTimeMillis()))
  }

  /** Best-effort recursive delete for run-scoped scratch (staged
    * inputs, checkpoints) once a streaming run has terminated — the
    * scratch lives on tmpfs, so leaks cost RAM, not disk.
    */
  def deleteScratch(dirs: java.io.File*): Unit =
    dirs.foreach { d =>
      if (d.exists()) {
        import scala.jdk.CollectionConverters._
        try java.nio.file.Files.walk(d.toPath).iterator().asScala.toSeq
          .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
        catch { case _: Throwable => () }
      }
    }

  private val exitScratch =
    new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  private lazy val exitHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      deleteScratch(exitScratch.asScala.toSeq: _*)
    }))
  }

  /** Deferred [[deleteScratch]]: for run-scoped dirs that must OUTLIVE
    * the producing call (e.g. a sink directory backing a lazily-read
    * DataFrame the caller still holds) — registered once, swept by a
    * single JVM shutdown hook so repeated gate runs don't accumulate
    * scratch for the life of the process.
    */
  def deleteScratchOnExit(dirs: java.io.File*): Unit = {
    exitHook
    dirs.foreach(exitScratch.add)
  }

  /** Streaming parquet source: new files under `path` become micro-
    * batches, bounded intake per trigger. Schema is explicit (no
    * inference scan); file order within the log is modification-time
    * ascending, so a producer that stamps files in sequence gets
    * deterministic batch order.
    */
  def streamParquet(
      spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Small-file compaction — the table-maintenance pass every
    * long-running ingest needs: streaming sinks and fine-grained
    * partitions leave thousands of KB-sized parquet files whose
    * per-file open/footer cost dominates scans at 100 TB (and whose
    * listing alone stalls drivers). Rewrite the directory into
    * ⌈rows/targetRowsPerFile⌉ evenly-sized files: one count, one
    * round-robin repartition (balanced by construction — no skew
    * concern because no key), one write. Contents are preserved
    * bit-for-bit (oracle-gated); only the file layout changes.
    * Returns (rows, filesBefore, filesAfter).
    */
  def compactParquet(
      spark: SparkSession, inDir: String, outDir: String,
      targetRowsPerFile: Long): (Long, Int, Int) = {
    def parts(d: String): Int =
      Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
        .count(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
    val df = spark.read.parquet(inDir)
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartition(files).write.mode("overwrite").parquet(outDir)
    (n, parts(inDir), parts(outDir))
  }

  /** Exactly-once streaming parquet sink: the file-sink commit log +
    * checkpoint give end-to-end exactly-once for replayable sources.
    */
  def streamingParquetSink(
      df: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
}
