package graft.plans

import graft.SparkSpec
import graft.sources.{FileIO, ManifestStore}
import org.apache.spark.sql.functions._

/** Maintenance DDL: OPTIMIZE / VACUUM / RESTORE as SQL statements over
  * paths and names, returning their result rows; zone maps survive
  * path-target optimizes (statsCols re-derived from the sidecar).
  */
class GraftMaintenanceSpec extends SparkSpec {

  private def build(tag: String, batches: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-mx$tag").toString
    (0 until batches).foreach { b =>
      spark.range(b * 100, (b + 1) * 100).select(
        col("id").as("event_id"), pmod(col("id"), lit(4L)).as("p"),
        (col("id") * 3L).as("val"))
        .write.format("graft").option("partCol", "p")
        .option("statsCols", "event_id").mode("append").save(dir)
    }
    dir
  }

  private def content(dir: String): Set[(Long, Long, Long)] =
    spark.read.format("graft").option("path", dir).load()
      .collect().map(r => (r.getAs[Long]("event_id"),
        r.getAs[Long]("p"), r.getAs[Long]("val"))).toSet

  test("OPTIMIZE '<path>' folds crowded partitions, keeps content " +
    "byte-identical, RE-DERIVES statsCols from the sidecar (zone " +
    "maps survive), and returns the published version") {
    val dir = build("o", 6)
    val before = content(dir)
    val filesBefore = ManifestStore.files(dir, 5L)
      .groupBy(_.takeWhile(_ != '/'))
    assert(filesBefore.values.exists(_.size > 4), "fixture must be crowded")
    val out = spark.sql(s"OPTIMIZE '$dir'").collect()
    assert(out.length == 1 && out.head.getLong(0) == 6L,
      s"OPTIMIZE must return the published version, got ${out.toSeq}")
    val after = ManifestStore.files(dir, 6L).groupBy(_.takeWhile(_ != '/'))
    assert(after.values.forall(_.size <= 4))
    assert(content(dir) == before)
    // the compacted files carry zone-map stats although the statement
    // named only the path
    val stats = ManifestStore.stats(dir, 6L)
    assert(ManifestStore.files(dir, 6L).forall(f =>
      stats.get(f).exists(_.contains("event_id"))),
      "path-target OPTIMIZE must not drop the zone maps")
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("OPTIMIZE <view> ZORDER BY / HILBERT BY cluster through the " +
    "named relation; content identical") {
    val dir = build("z", 3)
    val before = content(dir)
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW mx_z USING graft " +
        s"OPTIONS (path '$dir', partCol 'p', statsCols 'event_id')")
    spark.sql("OPTIMIZE mx_z ZORDER BY (event_id, val)")
    assert(content(dir) == before)
    spark.sql("OPTIMIZE mx_z HILBERT BY (event_id, val)")
    assert(content(dir) == before)
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("VACUUM reclaims unmanifested crash litter and reports the " +
    "count; live content untouched") {
    val dir = build("v", 2)
    val before = content(dir)
    val orphan = new java.io.File(s"$dir/p=0/c-orphan-000.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    val reclaimed = spark.sql(s"VACUUM '$dir'").head.getLong(0)
    assert(reclaimed >= 1L, s"expected the orphan swept, got $reclaimed")
    assert(!orphan.exists)
    assert(content(dir) == before)
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("RESTORE TO VERSION AS OF / TIMESTAMP AS OF roll the store " +
    "back metadata-only and return the new version") {
    val dir = build("r", 3)
    val v0Content = spark.read.format("graft").option("path", dir)
      .option("versionAsOf", "0").load().count()
    assert(v0Content == 100)
    val newV = spark.sql(s"RESTORE '$dir' TO VERSION AS OF 0")
      .head.getLong(0)
    assert(newV == 3L)
    assert(content(dir).size == 100)
    // roll forward again via the commit timestamp of v1
    val ts1 = ManifestStore.commitTs(dir, 1L).get
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    spark.sql(
      s"RESTORE '$dir' TO TIMESTAMP AS OF '${fmt.format(new java.util.Date(ts1))}'")
    assert(content(dir).size == 200)
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("a non-graft name refuses typed; unmatched statements fall " +
    "through to Spark's parser untouched") {
    intercept[IllegalArgumentException] {
      spark.sql("OPTIMIZE definitely_not_a_graft_view")
    }
    // ordinary SQL still parses through the wrapper
    assert(spark.sql("SELECT 1 AS x").head.getInt(0) == 1)
  }
}
