package graft.streaming

import graft.SparkSpec
import graft.sources.ManifestStore
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The change feed as an ordinary Structured Streaming source: initial
  * snapshot as inserts, net-diff batches per polled span, checkpointed
  * restart resuming at the right version, startingVersion subscribe.
  */
class StoreChangesSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType),
    StructField("p", LongType)))

  private def buildStore(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdfsrc").toString
    ManifestStore.init(
      Seq((1L, 10L, 0L), (2L, 20L, 0L), (3L, 30L, 1L)).toDF("k", "v", "p"),
      "p", dir, statsCols = Seq("k"), bloomCols = Seq("k"))
    dir
  }

  /** Collected (batchId, rows) pairs via foreachBatch. */
  private final class Sink {
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Row])]()
    def add(df: DataFrame, id: Long): Unit = {
      batches.add(id -> df.collect().toSeq); ()
    }
    def all: Seq[(Long, Seq[Row])] = {
      import scala.jdk.CollectionConverters._
      batches.asScala.toSeq.sortBy(_._1)
    }
  }

  private def subscribe(
      dir: String, ckpt: String, sink: Sink,
      startingVersion: Option[Long] = None) = {
    val reader = spark.readStream.format("graft-cdf")
      .schema(schema).option("path", dir).option("partCol", "p")
    val withStart = startingVersion.fold(reader)(v =>
      reader.option("startingVersion", v.toString))
    withStart.load().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch((df: DataFrame, id: Long) => sink.add(df, id))
      .start()
  }

  test("the first batch is the starting snapshot AS INSERTS; later " +
    "batches are the net diff of the polled span with " +
    "_commit_version = span end") {
    val dir = buildStore()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdfck").toString
    val sink = new Sink
    val q = subscribe(dir, ckpt, sink)
    q.processAllAvailable()
    val seed = sink.all
    assert(seed.size == 1)
    assert(seed.head._2.map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .toSet == Set((1L, 10L, "insert"), (2L, 20L, "insert"),
        (3L, 30L, "insert")))
    assert(seed.head._2.forall(_.getLong(4) == 0L)) // _commit_version = v0
    // one merge -> one edit-sized feed batch
    ManifestStore.merge(spark, dir, schema, "p", "k",
      Seq((2L, 21L, 0L)).toDF("k", "v", "p"), deleteKeys = Seq(3L),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    q.processAllAvailable()
    q.stop()
    val feed = sink.all.drop(1)
    assert(feed.size == 1)
    val rows = feed.head._2
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getLong(4)))
    assert(rows.toSet == Set(
      (2L, 20L, "delete", 1L), (2L, 21L, "insert", 1L),
      (3L, 30L, "delete", 1L)))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
    graft.sources.FileIO.deleteScratch(new java.io.File(ckpt))
  }

  test("restart from checkpoint resumes at the committed version: the " +
    "snapshot is NOT re-delivered, and two missed commits arrive as " +
    "ONE net-diff span") {
    val dir = buildStore()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdfck2").toString
    val sink1 = new Sink
    val q1 = subscribe(dir, ckpt, sink1)
    q1.processAllAvailable()
    q1.stop()
    assert(sink1.all.size == 1) // seeded from v0 and checkpointed there
    // two commits land while nobody listens
    ManifestStore.merge(spark, dir, schema, "p", "k",
      Seq((1L, 11L, 0L)).toDF("k", "v", "p"),
      statsCols = Seq("k"), bloomCols = Seq("k"))                     // v1
    ManifestStore.merge(spark, dir, schema, "p", "k",
      Seq((1L, 12L, 0L), (4L, 40L, 1L)).toDF("k", "v", "p"),
      statsCols = Seq("k"), bloomCols = Seq("k"))                     // v2
    val sink2 = new Sink
    val q2 = subscribe(dir, ckpt, sink2)
    q2.processAllAvailable()
    q2.stop()
    // exactly one span (v0, v2] — the v1 intermediate cancels out of
    // the net diff (k=1 went 10 -> 12 in one delete+insert pair)
    assert(sink2.all.size == 1)
    val rows = sink2.all.head._2
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getLong(4)))
    assert(rows.toSet == Set(
      (1L, 10L, "delete", 2L), (1L, 12L, "insert", 2L),
      (4L, 40L, "insert", 2L)))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
    graft.sources.FileIO.deleteScratch(new java.io.File(ckpt))
  }

  test("a MID-SCHEMA partition column keeps its position: the batch " +
    "plan is spliced positionally, and a partitioned scan emits " +
    "partition columns last — the source must re-project the " +
    "declared order or neighbors swap values") {
    val midSchema = StructType(Seq(
      StructField("k", LongType), StructField("p", LongType),
      StructField("v", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-cdfmid").toString
    ManifestStore.init(
      Seq((1L, 0L, 10L), (2L, 1L, 20L)).toDF("k", "p", "v"), "p", dir)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdfckm").toString
    val sink = new Sink
    val q = spark.readStream.format("graft-cdf")
      .schema(midSchema).option("path", dir).option("partCol", "p").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch((df: DataFrame, id: Long) => sink.add(df, id))
      .start()
    q.processAllAvailable()
    ManifestStore.merge(spark, dir, midSchema, "p", "k",
      Seq((2L, 1L, 21L)).toDF("k", "p", "v"))
    q.processAllAvailable()
    q.stop()
    val all = sink.all.flatMap(_._2)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(all.toSet == Set(
      (1L, 0L, 10L, "insert"), (2L, 1L, 20L, "insert"),
      (2L, 1L, 20L, "delete"), (2L, 1L, 21L, "insert")))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
    graft.sources.FileIO.deleteScratch(new java.io.File(ckpt))
  }

  test("startingVersion skips the initial snapshot (subscribe-from-" +
    "here); a feed-maintained view from an EMPTY seed then needs the " +
    "snapshot only through the feed — and equals the fresh aggregate") {
    val dir = buildStore()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdfck3").toString
    val sink = new Sink
    val q = subscribe(dir, ckpt, sink, startingVersion = Some(0L))
    q.processAllAvailable()
    assert(sink.all.isEmpty ||
      sink.all.forall(_._2.isEmpty)) // nothing after v0 yet
    ManifestStore.merge(spark, dir, schema, "p", "k",
      Seq((5L, 50L, 1L)).toDF("k", "v", "p"),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    q.processAllAvailable()
    q.stop()
    val rows = sink.all.flatMap(_._2)
      .map(r => (r.getLong(0), r.getString(3)))
    assert(rows.toSet == Set((5L, "insert")))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
    graft.sources.FileIO.deleteScratch(new java.io.File(ckpt))
  }
}
