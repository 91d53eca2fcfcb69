package graft.functions

import graft.SparkSpec
import graft.sources.FileIO
import org.apache.spark.sql.functions._

/** The metadata-tier SQL surface: graft_history / graft_files table
  * functions answer from manifests + sidecars alone.
  */
class GraftTableFunctionsSpec extends SparkSpec {

  test("graft_history lists the retained commit log — versions, " +
    "commit times, ops, exact row counts, append tags; graft_files " +
    "shows the snapshot's entries with zone-map bounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf").toString
    val ev = spark.range(0, 200).select(
      col("id").as("event_id"), pmod(col("id"), lit(4L)).as("p"))
    ev.filter(col("event_id") < 100).write.format("graft")
      .option("partCol", "p").option("statsCols", "event_id")
      .mode("append").save(dir)
    ev.filter(col("event_id") >= 100).write.format("graft")
      .option("statsCols", "event_id").option("tag", "b7")
      .mode("append").save(dir)
    val h = spark.sql(s"SELECT * FROM graft_history('$dir')").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(h.forall(!_.isNullAt(1)), "commit_ts must be recorded")
    assert(h.map(r => Option(r.getAs[Long]("n_rows"))).toSeq
      == Seq(Some(100L), Some(200L)),
      "row counts come exact off the stats sidecar")
    assert(h(1).getAs[String]("tags") == "b7")
    // ordering and filtering compose like any table
    val latest = spark.sql(
      s"SELECT version FROM graft_history('$dir') " +
        "ORDER BY version DESC LIMIT 1").head.getLong(0)
    assert(latest == 1L)
    val f = spark.sql(s"SELECT * FROM graft_files('$dir')").collect()
    assert(f.length == graft.sources.ManifestStore.files(dir, 1L).size)
    assert(f.forall(_.getAs[String]("bounds").contains("event_id=[")),
      "per-file zone-map bounds render")
    // pinned version: v0 lists only the first batch's files
    val f0 = spark.sql(s"SELECT * FROM graft_files('$dir', 0)").collect()
    assert(f0.length == graft.sources.ManifestStore.files(dir, 0L).size)
    assert(f0.length < f.length)
    FileIO.deleteScratch(new java.io.File(dir))
  }
}
