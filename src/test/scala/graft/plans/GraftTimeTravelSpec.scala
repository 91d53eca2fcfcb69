package graft.plans

import graft.SparkSpec
import graft.sources.{FileIO, ManifestStore, RetentionException}
import org.apache.spark.sql.functions._

/** SQL time travel over graft relations: VERSION AS OF / FOR
  * SYSTEM_TIME AS OF through plain spark.sql, on temp views AND
  * persistent catalog tables; typed retention errors; pass-through
  * for non-graft relations.
  */
class GraftTimeTravelSpec extends SparkSpec {

  private def build(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-tt$tag").toString
    val ev = spark.range(0, 200).select(
      col("id").as("event_id"), pmod(col("id"), lit(4L)).as("p"))
    ev.filter(col("event_id") < 100).write.format("graft")
      .option("partCol", "p").mode("append").save(dir)
    ev.filter(col("event_id") >= 100).write.format("graft")
      .mode("append").save(dir)
    dir
  }

  test("VERSION AS OF and FOR SYSTEM_TIME AS OF pin retained " +
    "snapshots of a temp view; the clause OVERRIDES a version pinned " +
    "in the view's own options; an aged-out pin answers typed") {
    val dir = build("a")
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW tt_v USING graft " +
        s"OPTIONS (path '$dir', partCol 'p')")
    assert(spark.sql("SELECT count(*) FROM tt_v").head.getLong(0) == 200)
    assert(spark.sql("SELECT count(*) FROM tt_v VERSION AS OF 0")
      .head.getLong(0) == 100)
    val ts0 = ManifestStore.commitTs(dir, 0L).get
    // timestamp arithmetic folds: the pin lands between v0 and v1
    val r = spark.sql(
      s"SELECT count(*) FROM tt_v FOR SYSTEM_TIME AS OF " +
        s"timestamp_millis(${ts0})").head.getLong(0)
    assert(r == 100)
    intercept[RetentionException] {
      spark.sql(
        s"SELECT count(*) FROM tt_v FOR SYSTEM_TIME AS OF " +
          s"timestamp_millis(${ts0 - 10})").collect()
    }
    // a view already pinned to v1 still answers v0 under the clause
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW tt_v1 USING graft " +
        s"OPTIONS (path '$dir', partCol 'p', versionAsOf '1')")
    assert(spark.sql("SELECT count(*) FROM tt_v1 VERSION AS OF 0")
      .head.getLong(0) == 100)
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("a PERSISTENT catalog table (CREATE TABLE ... USING graft) " +
    "answers plain SELECT, time travel, and row-level DML") {
    val dir = build("p")
    spark.sql("DROP TABLE IF EXISTS tt_cat")
    spark.sql(
      s"CREATE TABLE tt_cat USING graft " +
        s"OPTIONS (path '$dir', partCol 'p')")
    try {
      assert(spark.sql("SELECT count(*) FROM tt_cat").head.getLong(0) == 200)
      assert(spark.sql("SELECT count(*) FROM tt_cat VERSION AS OF 0")
        .head.getLong(0) == 100)
      // DML through the catalog-table name: same rerouting as views
      spark.sql("DELETE FROM tt_cat WHERE event_id >= 150")
      assert(ManifestStore.latestVersion(dir).contains(2L))
      assert(spark.sql("SELECT count(*) FROM tt_cat").head.getLong(0) == 150)
      // time travel still reaches the pre-delete snapshot
      assert(spark.sql("SELECT count(*) FROM tt_cat VERSION AS OF 1")
        .head.getLong(0) == 200)
    } finally {
      spark.sql("DROP TABLE IF EXISTS tt_cat")
      FileIO.deleteScratch(new java.io.File(dir))
    }
  }

  test("non-graft relations pass through: time travel on a parquet " +
    "view keeps Spark's own typed rejection") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ttnp").toString
    spark.range(0, 10).write.mode("overwrite").parquet(s"$dir/t")
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW tt_np USING parquet " +
        s"OPTIONS (path '$dir/t')")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT count(*) FROM tt_np VERSION AS OF 0").collect()
    }
    assert(e.getMessage.contains("TIME_TRAVEL")
      || e.getMessage.toLowerCase.contains("time travel"))
    FileIO.deleteScratch(new java.io.File(dir))
  }
}
