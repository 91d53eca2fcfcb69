package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The SQL surface of the manifest store: spark.read.format("graft"),
  * USING graft views, time travel options, and — the point — that the
  * ManifestFileIndex PRUNES at the manifest: zone-map file skipping
  * and partition pruning happen before Spark plans a task, and the
  * scan keeps the native parquet pushdown.
  */
class GraftDataSourceSpec extends SparkSpec {
  import spark.implicits._

  /** A store whose every partition holds one LOW-id and one HIGH-id
    * file (init + append, id-clustered) — partition pruning alone
    * cannot separate them; only the zone maps can.
    */
  private def buildStore(): (String, Long) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsv").toString
    val ev = spark.range(0, 400).select(
      col("id").as("event_id"),
      pmod(col("id") * 7L, lit(4L)).as("p"),
      (col("id") * 3L).as("val"))
    ManifestStore.init(ev.filter(col("event_id") < 200), "p", dir,
      statsCols = Seq("event_id"))
    ManifestStore.append(ev.filter(col("event_id") >= 200), "p", dir,
      statsCols = Seq("event_id"))
    (dir, 400L)
  }

  private def scanOf(df: DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head

  private def filesScanned(df: DataFrame): Long = {
    val scan = scanOf(df)
    df.collect()
    scan.metrics("numFiles").value
  }

  test("spark.read.format(\"graft\") reads the snapshot; a range " +
    "filter prunes files AT THE MANIFEST (zone maps) and still " +
    "reaches the parquet scan as a pushed filter") {
    val (dir, n) = buildStore()
    val df = spark.read.format("graft").option("path", dir).load()
    assert(df.columns.toSet == Set("event_id", "val", "p"))
    assert(df.count() == n)
    val total = ManifestStore.files(dir,
      ManifestStore.latestVersion(dir).get).size
    // high-range read: the low (init) files never reach the scan
    val high = df.filter(col("event_id") >= 200)
    assert(high.count() == 200)
    val scanned = filesScanned(high)
    assert(scanned < total && scanned <= total / 2,
      s"zone maps must halve the file list: $scanned of $total")
    // the exact predicate ALSO pushed into the parquet scan
    val pushed = scanOf(high).metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(event_id,200)"),
      s"expected the range pushed into parquet, got $pushed")
    // full read opens everything (no bogus pruning)
    assert(filesScanned(df) == total)
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("partition filters prune whole partition dirs from the " +
    "manifest listing; combined with zone maps both cuts compose") {
    val (dir, _) = buildStore()
    val df = spark.read.format("graft").option("path", dir).load()
    val total = ManifestStore.files(dir,
      ManifestStore.latestVersion(dir).get).size
    val one = df.filter(col("p") === 1)
    val oneScanned = filesScanned(one)
    assert(oneScanned <= total / 4,
      s"one of four partitions: $oneScanned of $total files")
    assert(one.count() == 100)
    val both = df.filter(col("p") === 1 && col("event_id") < 200)
    assert(filesScanned(both) < oneScanned,
      "zone maps must cut further within the pruned partition")
    assert(both.count() == 50)
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("time travel options: versionAsOf pins a retained snapshot, " +
    "timestampAsOf resolves through commit timestamps, an aged-out " +
    "pin is the typed retention error") {
    val (dir, _) = buildStore()
    val df0 = spark.read.format("graft").option("path", dir)
      .option("versionAsOf", "0").load()
    assert(df0.count() == 200) // the init-only half
    val ts0 = ManifestStore.commitTs(dir, 0L).get
    val dfTs = spark.read.format("graft").option("path", dir)
      .option("timestampAsOf", ts0.toString).load()
    assert(dfTs.count() == 200)
    intercept[RetentionException] {
      spark.read.format("graft").option("path", dir)
        .option("timestampAsOf", (ts0 - 10).toString).load()
    }
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("bloomProbe: an equality lookup on a HASHED key (zone maps " +
    "useless — every file spans the domain) opens only the " +
    "bloom-located files; rows identical with and without the probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsvb").toString
    val ev = spark.range(0, 400).select(
      col("id").as("event_id"),
      pmod(col("id") * 7L, lit(4L)).as("p"),
      (col("id") * 7919L % 101L).as("u"))
    ManifestStore.init(ev.filter(col("event_id") < 200), "p", dir,
      statsCols = Seq("event_id", "u"), bloomCols = Seq("u"))
    ManifestStore.append(ev.filter(col("event_id") >= 200), "p", dir,
      statsCols = Seq("event_id", "u"), bloomCols = Seq("u"))
    val total = ManifestStore.files(dir,
      ManifestStore.latestVersion(dir).get).size
    def read(probe: Boolean) = spark.read.format("graft")
      .option("path", dir).option("bloomProbe", probe.toString).load()
      .filter(col("u") === 55L)
    // fresh DataFrame per measurement: re-executing one plan RESETS
    // its SQLMetrics without re-setting numFiles (inputRDD is cached)
    assert(read(true).collect().map(_.getLong(0)).sorted.sameElements(
      read(false).collect().map(_.getLong(0)).sorted))
    assert(filesScanned(read(false)) == total,
      "zone maps cannot prune a hashed key — every file spans the domain")
    assert(filesScanned(read(true)) < total,
      s"the bloom probe must drop files ($total scanned)")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("USING graft: the store is a NAMED table for plain spark.sql — " +
    "views, aggregates, joins, user-supplied schema all through SQL") {
    val (dir, _) = buildStore()
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW graft_sql_spec USING graft " +
        s"OPTIONS (path '$dir')")
    val out = spark.sql(
      "SELECT p, count(*) AS n, sum(val) AS s FROM graft_sql_spec " +
        "GROUP BY p ORDER BY p").collect()
    assert(out.length == 4 && out.map(_.getLong(1)).sum == 400)
    // explicit schema read (the evolution-era contract): declared
    // columns only, partCol from the dir names
    val declared = spark.read.format("graft").option("path", dir)
      .schema(StructType(Seq(
        StructField("event_id", LongType), StructField("p", LongType))))
      .load()
    assert(declared.columns.toSet == Set("event_id", "p"))
    assert(declared.count() == 400)
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }
}
