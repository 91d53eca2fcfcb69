package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The WRITE half of the SQL surface: df.write.format("graft"),
  * INSERT INTO / INSERT OVERWRITE on USING-graft views, and the
  * writeStream sink — every one a manifest commit (atomic, versioned,
  * time-travelable), never a raw file dump.
  */
class GraftWriterSpec extends SparkSpec {
  import spark.implicits._

  private def ev(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(
      col("id").as("event_id"),
      pmod(col("id") * 7L, lit(4L)).as("p"),
      (col("id") * 3L).as("val"))

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-w$tag").toString

  private def readStore(dir: String): DataFrame =
    spark.read.format("graft").option("path", dir).load()

  test("df.write.format(\"graft\"): a fresh path initializes v0; " +
    "append mode publishes a NEW version on top; the result is a " +
    "normal store (zone-map pruning works on the written stats)") {
    val dir = freshDir("a")
    ev(0, 200).write.format("graft")
      .option("partCol", "p").option("statsCols", "event_id")
      .mode("append").save(dir)
    assert(ManifestStore.latestVersion(dir).contains(0L))
    ev(200, 400).write.format("graft")
      .option("statsCols", "event_id") // partCol inferred from manifest
      .mode("append").save(dir)
    assert(ManifestStore.latestVersion(dir).contains(1L))
    val df = readStore(dir)
    assert(df.count() == 400)
    assert(df.agg(sum("event_id")).head.getLong(0) == 399L * 400 / 2)
    // the appended files carry zone-map stats: a high-range read
    // must not open every file
    val total = ManifestStore.files(dir, 1L).size
    val high = df.filter(col("event_id") >= 200)
    val scan = high.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }.head
    high.collect()
    assert(scan.metrics("numFiles").value <= total / 2,
      s"zone maps must halve: ${scan.metrics("numFiles").value} of $total")
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("overwrite mode is a NEW VERSION replacing the content — " +
    "never a directory wipe: the previous version stays readable " +
    "via versionAsOf, and partitions absent from the batch DROP") {
    val dir = freshDir("o")
    ev(0, 400).write.format("graft").option("partCol", "p")
      .mode("append").save(dir)
    // overwrite with p=0 rows only: partitions 1..3 must drop
    ev(0, 400).filter(col("p") === 0).write.format("graft")
      .option("partCol", "p").mode("overwrite").save(dir)
    val now = readStore(dir)
    assert(now.select("p").distinct().collect().map(_.getLong(0)).toSet
      == Set(0L))
    assert(now.count() == 100)
    // history intact: v0 still answers the full content
    val v0 = spark.read.format("graft").option("path", dir)
      .option("versionAsOf", "0").load()
    assert(v0.count() == 400)
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("errorIfExists refuses an existing store typed; ignore leaves " +
    "it untouched; the exactly-once tag dedups a replayed append") {
    val dir = freshDir("m")
    ev(0, 100).write.format("graft").option("partCol", "p")
      .mode("errorifexists").save(dir)
    intercept[IllegalStateException] {
      ev(0, 100).write.format("graft").option("partCol", "p")
        .mode("errorifexists").save(dir)
    }
    ev(100, 200).write.format("graft").option("partCol", "p")
      .mode("ignore").save(dir)
    assert(ManifestStore.latestVersion(dir).contains(0L))
    assert(readStore(dir).count() == 100)
    // tagged append: the second delivery of the same logical batch
    // finds its tag in the ledger and is a no-op
    ev(100, 200).write.format("graft").option("partCol", "p")
      .option("tag", "batch7").mode("append").save(dir)
    ev(100, 200).write.format("graft").option("partCol", "p")
      .option("tag", "batch7").mode("append").save(dir)
    assert(ManifestStore.latestVersion(dir).contains(1L))
    assert(readStore(dir).count() == 200)
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("INSERT INTO a USING-graft view is a manifest APPEND; INSERT " +
    "OVERWRITE is a whole-content commit with history intact — and a " +
    "self-referential INSERT reads the pinned snapshot it writes on " +
    "top of") {
    val dir = freshDir("i")
    ev(0, 200).write.format("graft").option("partCol", "p")
      .option("statsCols", "event_id").mode("append").save(dir)
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW graft_ins USING graft " +
        s"OPTIONS (path '$dir', partCol 'p', statsCols 'event_id')")
    // the view's schema orders the partition column LAST (the
    // HadoopFsRelation convention) — INSERT maps positionally
    spark.sql(
      "INSERT INTO graft_ins " +
        "SELECT event_id + 200, val + 600, p FROM graft_ins")
    // the view was resolved BEFORE the insert — re-resolve to see v1
    val after = readStore(dir)
    assert(ManifestStore.latestVersion(dir).contains(1L),
      "INSERT INTO must publish one new manifest version")
    assert(after.count() == 400)
    assert(after.agg(sum("event_id")).head.getLong(0) == 399L * 400 / 2)
    // no unmanifested litter: every parquet under the store dir is in
    // the manifest (a raw InsertIntoHadoopFsRelation write would dump
    // part-files outside it)
    val manifested = ManifestStore.files(dir, 1L).toSet
    val onDisk = new java.io.File(dir).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("p="))
      .flatMap(d => d.listFiles.filter(_.getName.endsWith(".parquet"))
        .map(f => s"${d.getName}/${f.getName}")).toSet
    assert(onDisk == manifested,
      s"unmanifested files: ${(onDisk -- manifested).take(3)}")
    // INSERT OVERWRITE from a separate source (Spark's analyzer guard
    // conservatively refuses overwriting a path the query also reads —
    // it runs before the graft rule and cannot know the store is
    // MVCC-safe; self-referential INSERT INTO above is fine)
    ev(0, 400).filter(col("p") === 2)
      .createOrReplaceTempView("graft_ins_src")
    spark.sql(
      "INSERT OVERWRITE graft_ins " +
        "SELECT event_id, val + 600, p FROM graft_ins_src")
    assert(ManifestStore.latestVersion(dir).contains(2L))
    val now = readStore(dir)
    assert(now.select("p").distinct().collect().map(_.getLong(0)).toSet
      == Set(2L))
    // history: the pre-overwrite content still answers
    assert(spark.read.format("graft").option("path", dir)
      .option("versionAsOf", "1").load().count() == 400)
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("an INSERT aimed at the store DIRECTORY through a plain " +
    "parquet relation is intercepted: it lands as a manifest commit, " +
    "not a raw file dump that would corrupt the store") {
    val dir = freshDir("g")
    ev(0, 100).write.format("graft").option("partCol", "p")
      .mode("append").save(dir)
    // a user (or BI tool) names the store dir as ordinary parquet —
    // partition discovery resolves it (the _manifests dir is
    // underscore-hidden); an un-intercepted INSERT here would dump
    // part-files invisible to the manifest, and an INSERT OVERWRITE
    // would recursively DELETE store content
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW graft_raw USING parquet " +
        s"OPTIONS (path '$dir')")
    // discovered schema: (event_id, val) data cols + p partition col LAST
    spark.sql(
      "INSERT INTO graft_raw " +
        "SELECT event_id + 100, val + 300, p FROM graft_raw")
    assert(ManifestStore.latestVersion(dir).contains(1L),
      "the intercepted INSERT must publish one manifest version")
    assert(readStore(dir).count() == 200)
    val manifested = ManifestStore.files(dir, 1L).toSet
    val onDisk = new java.io.File(dir).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("p="))
      .flatMap(d => d.listFiles.filter(_.getName.endsWith(".parquet"))
        .map(f => s"${d.getName}/${f.getName}")).toSet
    assert(onDisk == manifested,
      s"raw part-files leaked past the manifest: " +
        s"${(onDisk -- manifested).take(3)}")
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("writeStream.format(\"graft\"): micro-batches land as " +
    "exactly-once tagged appends; a replayed batch dedups; " +
    "compactEvery folds crowded partitions; append-only is enforced") {
    val dir = freshDir("s")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val ckpt = freshDir("sc")
    def run(): Unit = {
      val q = input.toDF()
        .select(col("_1").as("event_id"), col("_2").as("p"),
          col("_3").as("val"))
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .option("path", dir)
        .option("partCol", "p")
        .option("statsCols", "event_id")
        .option("compactEvery", "1")
        .option("maxFilesPerPartition", "1")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    input.addData((0 until 100).map(i => (i.toLong, i.toLong % 4, i * 3L)): _*)
    run()
    assert(readStore(dir).count() == 100)
    input.addData((100 until 200).map(i => (i.toLong, i.toLong % 4, i * 3L)): _*)
    run()
    val df = readStore(dir)
    assert(df.count() == 200)
    assert(df.agg(sum("event_id")).head.getLong(0) == 199L * 200 / 2)
    // exactly-once under replay: re-deliver batch 1's content with the
    // same batch id straight into a fresh sink instance (the crash-
    // replay shape: the ledger, not sink state, must dedup)
    val sink = new graft.streaming.GraftSink(
      GraftWriter.parse(Map("path" -> dir)), "p")
    val vBefore = ManifestStore.latestVersion(dir).get
    sink.addBatch(1L,
      (100 until 200).map(i => (i.toLong, i.toLong % 4, i * 3L))
        .toDF("event_id", "p", "val"))
    assert(ManifestStore.latestVersion(dir).contains(vBefore),
      "a replayed batch id must be a ledger-dedup'd no-op")
    assert(readStore(dir).count() == 200)
    // compaction bounded the per-partition file count — and the
    // replay dedup above proved the tag ledger SURVIVED the
    // compaction's filename rewrite (the embedded-ledger guarantee)
    val byPart = ManifestStore.files(dir, vBefore)
      .groupBy(_.takeWhile(_ != '/'))
    assert(byPart.values.forall(_.size <= 1),
      s"compactEvery must bound files/partition: " +
        s"${byPart.view.mapValues(_.size).toMap}")
    // update/complete modes refuse typed
    val err = intercept[Exception] {
      input.toDF().groupBy("_2").count()
        .writeStream.format("graft")
        .option("checkpointLocation", freshDir("sc2"))
        .option("path", dir).option("partCol", "_2")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(err.getMessage.contains("append-only")
      || Option(err.getCause).exists(_.getMessage.contains("append-only")))
    FileIO.deleteScratch(new java.io.File(dir), new java.io.File(ckpt))
  }
}
