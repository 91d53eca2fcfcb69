package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The compressed embedding index maintained ONLINE: vectors arrive
  * as micro-batch files and PQ-encode against a FROZEN sample-trained
  * codebook — the FAISS operating model (a codebook is a model:
  * train once on a sample, encode forever) as a streaming query.
  * The encode is a STATELESS codegen projection
  * ([[Similarity.pqEncodeWith]]'s `PqAssign` kernel — the codebook
  * rides as a reference object), so any micro-batch split lands
  * row-identical codes to the batch encode, exactly-once through the
  * file sink; nothing about the stream is approximate.
  *
  * This is the ingest half of a live ANN service: the drained (or
  * continuously growing) codes table is exactly what [[Similarity.pqTopK]]
  * / [[Similarity.pqTopKRerank]] scan.
  *
  * DIAGNOSTIC TRAIL: one driver-run of the round-11 gate recorded a
  * hash mismatch on this query that five re-runs (including a full
  * concurrent gate) could not reproduce. Each drained run therefore
  * writes a small JSON digest — order-independent hashes of the
  * training sample, the trained codebook, the staged input manifest,
  * the sink's COMMITTED file list (read from `_spark_metadata`), and
  * the final codes — under `target/diag/stream_pq_codes/`, so any
  * future mismatch localizes to train vs encode vs sink without a
  * repro. The sink read-back goes through the commit log explicitly:
  * only files the streaming commit protocol recorded are read, never
  * a raw directory listing that could race a loaded scheduler.
  */
object StreamingAnn {

  def pqEncodeFromFiles(
      spark: SparkSession,
      embs: DataFrame, // (vec_id, embedding)
      m: Int, subDim: Int, iters: Int, sampleN: Int,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    val narrow = embs.select(col("vec_id"), col("embedding"))
    // train on the md5 sample of the FULL corpus (the model is frozen
    // before the stream starts — the production shape)
    val (codebook, _) = Similarity.pqTrainSampleEncode(
      narrow, col("vec_id"), col("embedding"), m, subDim, iters, sampleN)
    graft.sources.FileIO.stageRangeBatches(
      narrow, col("vec_id"), nBatches, new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
    val codes = Similarity.pqEncodeWith(
      stream, col("vec_id"), col("embedding"), codebook, m, subDim)
    val q = graft.sources.FileIO.streamingParquetSink(
      codes, outDir.toString, new java.io.File(base, "ckpt").toString).start()
    q.awaitTermination()
    val committed = committedSinkFiles(outDir)
    require(committed.nonEmpty, s"sink commit log at $outDir lists no files")
    val drained = spark.read
      .schema("cid BIGINT, sub INT, cell BIGINT")
      .parquet(committed: _*)
    writeDigest(spark, narrow, codebook, sampleN, inDir, committed, drained)
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    graft.sources.FileIO.deleteScratchOnExit(base)
    drained
  }

  /** The sink's COMMITTED data files, parsed from the FileStreamSink
    * `_spark_metadata` log (v1 line-JSON; a `.compact` file supersedes
    * everything before it). This is the explicit spelling of the read
    * path Spark's MetadataLogFileIndex takes — materialized here so
    * the digest can record it and the read can't fall back to a
    * directory listing.
    */
  private[graft] def committedSinkFiles(outDir: java.io.File): Seq[String] =
    committedSinkFiles(outDir.toString)

  /** Hadoop-FS spelling: runs unchanged against `file:`/HDFS/object-
    * store sink dirs, and every log read closes its stream (this
    * parses per refresh tick on serving hot loops — a leaked reader
    * per tick is an EMFILE time bomb).
    */
  private[graft] def committedSinkFiles(outDir: String): Seq[String] = {
    val logDir = new org.apache.hadoop.fs.Path(outDir, "_spark_metadata")
    val logs = graft.sources.StoreFs.list(logDir)
      .filter(s => s.isFile && !s.getPath.getName.endsWith(".crc"))
      .sortBy(s => (batchIdOf(s.getPath.getName), s.getPath.getName))
    val PathRe = """"path":"([^"]+)"""".r
    val ActionRe = """"action":"([a-z]+)"""".r
    val files = scala.collection.mutable.LinkedHashSet.empty[String]
    logs.foreach { s =>
      if (s.getPath.getName.endsWith(".compact")) files.clear()
      graft.sources.StoreFs.readLines(s.getPath).foreach { line =>
        if (line.startsWith("{")) {
          val path = PathRe.findFirstMatchIn(line).map(_.group(1))
          val action = ActionRe.findFirstMatchIn(line).map(_.group(1))
          (path, action) match {
            case (Some(p), Some("delete")) => files.remove(p)
            case (Some(p), _) => files.add(p) // v1 sink entries are adds
            case _ => ()
          }
        }
      }
    }
    files.toSeq
  }

  private def batchIdOf(name: String): Long =
    name.stripSuffix(".compact").takeWhile(_.isDigit) match {
      case "" => Long.MaxValue
      case d => d.toLong
    }

  /** Order-independent digest of each pipeline stage, written as one
    * JSON line under `target/diag/stream_pq_codes/`. Hashes are
    * modular sums of per-row xxhash64 — commutative, so concurrent
    * schedulers can't perturb them — computed distributed (no
    * collect beyond one row per stage).
    */
  private def writeDigest(
      spark: SparkSession, narrow: DataFrame, codebook: DataFrame,
      sampleN: Int, inDir: java.io.File, committed: Seq[String],
      drained: DataFrame): Unit = {
    def hashOf(df: DataFrame, cols: Seq[String]): Long =
      df.agg(sum(pmod(xxhash64(cols.map(col): _*), lit(1000000007L))))
        .collect().head.getLong(0)
    val nVectors = narrow.count() // disambiguates corpora whose id
    // sets (and so sample_hash, which hashes ids) coincide
    val sampleHash = hashOf(
      Similarity.pqSample(
        narrow, col("vec_id"), col("embedding"), sampleN, "pq")
        .select(col("__sid")), Seq("__sid"))
    val cbHash = hashOf(codebook, Seq("sub", "cell", "pos", "mean_milli"))
    val codesHash = hashOf(drained, Seq("cid", "sub", "cell"))
    // same value Verify's dump-digest pass records for the published
    // parquet (columns in sorted-name order) — engine content vs dumped
    // content becomes a one-line diff
    val codesHashSorted = hashOf(drained, drained.columns.sorted.toSeq)
    val staged = Option(inDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map(f => s"""{"name":"${f.getName}","bytes":${f.length()}}""")
    val dir = new java.io.File("target/diag/stream_pq_codes")
    dir.mkdirs()
    val out = new java.io.File(
      dir, f"run-${System.currentTimeMillis()}%d-${sys.env.getOrElse("SPARK_GRAFT_CPUS", "na")}.json")
    val json =
      s"""{"n_vectors":$nVectors,"sample_hash":$sampleHash,"codebook_hash":$cbHash,""" +
        s""""codes_hash":$codesHash,"codes_hash_sorted":$codesHashSorted,""" +
        s""""n_committed":${committed.size},""" +
        s""""committed":[${committed.map(p => s""""$p"""").mkString(",")}],""" +
        s""""staged":[${staged.mkString(",")}]}"""
    java.nio.file.Files.write(out.toPath, json.getBytes("UTF-8"))
  }
}
