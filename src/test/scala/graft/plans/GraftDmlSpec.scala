package graft.plans

import graft.SparkSpec
import graft.sources.{FileIO, ManifestStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level SQL DML over USING-graft views: DELETE / UPDATE / MERGE
  * as copy-on-write partition rewrites in one atomic manifest commit —
  * untouched partitions carry byte-identical, history stays readable,
  * the merge contract (ordered clauses, multi-match error, BY SOURCE
  * clauses, moving updates) holds.
  */
class GraftDmlSpec extends SparkSpec {
  import spark.implicits._

  private def ev(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(
      col("id").as("event_id"),
      pmod(col("id"), lit(4L)).as("p"),
      (col("id") * 3L).as("val"))

  private def build(tag: String): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-dml$tag").toString
    ev(0, 200).write.format("graft").option("partCol", "p")
      .option("statsCols", "event_id").mode("append").save(dir)
    val view = s"dml_${tag}_v"
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW $view USING graft " +
        s"OPTIONS (path '$dir', partCol 'p', statsCols 'event_id')")
    (dir, view)
  }

  private def readStore(dir: String): DataFrame =
    spark.read.format("graft").option("path", dir).load()

  test("DELETE FROM: predicate-true rows leave in one commit; " +
    "partitions with no matching row carry their files VERBATIM; a " +
    "no-match predicate is a version-stable no-op; history readable") {
    val (dir, view) = build("d")
    val before = ManifestStore.files(dir, 0L)
    // p = event_id % 4: deleting p=3 rows under event_id<100 touches
    // only partition 3
    spark.sql(s"DELETE FROM $view WHERE p = 3 AND event_id < 100")
    assert(ManifestStore.latestVersion(dir).contains(1L))
    val after = ManifestStore.files(dir, 1L)
    assert(before.filterNot(_.startsWith("p=3")).toSet
      == after.filterNot(_.startsWith("p=3")).toSet,
      "untouched partitions must carry byte-identical entries")
    val now = readStore(dir)
    assert(now.count() == 200 - 25)
    assert(now.filter(col("p") === 3 && col("event_id") < 100).count() == 0)
    // history: v0 still full
    assert(spark.read.format("graft").option("path", dir)
      .option("versionAsOf", "0").load().count() == 200)
    // no-op: nothing matches, no version published
    spark.sql(s"DELETE FROM $view WHERE event_id > 10000")
    assert(ManifestStore.latestVersion(dir).contains(1L))
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("UPDATE: assignments apply to predicate-true rows of touched " +
    "partitions only; an update assigning the PARTITION column moves " +
    "rows — destination partitions rewrite too") {
    val (dir, view) = build("u")
    spark.sql(s"UPDATE $view SET val = val + 1000000 WHERE event_id < 8")
    val now = readStore(dir)
    assert(now.filter(col("event_id") < 8)
      .agg(sum("val")).head.getLong(0) == (0 until 8).map(_ * 3L + 1000000).sum)
    assert(now.filter(col("event_id") >= 8)
      .agg(sum("val")).head.getLong(0) == (8 until 200).map(_ * 3L).sum)
    // moving update: row 0 (p=0) moves to partition 9
    spark.sql(s"UPDATE $view SET p = 9 WHERE event_id = 0")
    val moved = readStore(dir)
    assert(moved.filter(col("p") === 9).select("event_id")
      .collect().map(_.getLong(0)).toSeq == Seq(0L))
    assert(moved.filter(col("p") === 0 && col("event_id") === 0).count() == 0)
    assert(moved.count() == 200)
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("MERGE INTO: ordered WHEN MATCHED clauses (first true wins), " +
    "NOT MATCHED inserts, NOT MATCHED BY SOURCE, and the " +
    "multiple-match typed error") {
    val (dir, view) = build("m")
    Seq((1L, 1L, 777L, false), (2L, 2L, 888L, true), (500L, 0L, 999L, false))
      .toDF("event_id", "p", "val", "del")
      .createOrReplaceTempView("dml_m_src")
    // clause order: the DELETE guard fires before the catch-all UPDATE
    spark.sql(
      s"""MERGE INTO $view t USING dml_m_src s
         |ON t.event_id = s.event_id
         |WHEN MATCHED AND s.del THEN DELETE
         |WHEN MATCHED THEN UPDATE SET val = s.val
         |WHEN NOT MATCHED AND NOT s.del THEN
         |  INSERT (event_id, p, val) VALUES (s.event_id, s.p, s.val)
         |""".stripMargin)
    val now = readStore(dir)
    assert(now.count() == 200L - 1 + 1) // one delete, one insert
    assert(now.filter(col("event_id") === 1).head.getAs[Long]("val") == 777L)
    assert(now.filter(col("event_id") === 2).count() == 0)
    assert(now.filter(col("event_id") === 500).head.getAs[Long]("val") == 999L)
    // NOT MATCHED BY SOURCE: scrub a band of target rows the source
    // does not name
    spark.sql(
      s"""MERGE INTO $view t USING dml_m_src s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET val = t.val
         |WHEN NOT MATCHED BY SOURCE AND t.event_id BETWEEN 10 AND 13
         |  THEN DELETE
         |""".stripMargin)
    assert(readStore(dir).filter(col("event_id").between(10, 13)).count() == 0)
    // multiple source matches for one target row: typed error, store
    // untouched
    val vBefore = ManifestStore.latestVersion(dir).get
    Seq((1L, 1L, 1L), (1L, 1L, 2L)).toDF("event_id", "p", "val")
      .createOrReplaceTempView("dml_m_dup")
    val err = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $view t USING dml_m_dup s
           |ON t.event_id = s.event_id
           |WHEN MATCHED THEN UPDATE SET val = s.val
           |""".stripMargin)
    }
    assert(err.getMessage.contains("more than one source row")
      || Option(err.getCause).exists(_.getMessage.contains("more than one source row")),
      s"got: ${err.getMessage}")
    assert(ManifestStore.latestVersion(dir).contains(vBefore))
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("MERGE with colliding source column NAMES (a self-shaped " +
    "source) stays unambiguous — attributes, not names, drive the " +
    "rewrite; and a merge touching nothing is a no-op") {
    val (dir, view) = build("c")
    // source shares every column name with the target
    readStore(dir).filter(col("event_id") < 3)
      .withColumn("val", col("val") + 7L)
      .createOrReplaceTempView("dml_c_src")
    spark.sql(
      s"""MERGE INTO $view t USING dml_c_src s
         |ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET val = s.val
         |""".stripMargin)
    val now = readStore(dir)
    assert(now.filter(col("event_id") < 3).agg(sum("val")).head.getLong(0)
      == (0 until 3).map(_ * 3L + 7).sum)
    assert(now.count() == 200)
    val v = ManifestStore.latestVersion(dir).get
    spark.sql(
      s"""MERGE INTO $view t USING dml_c_src s
         |ON t.event_id = s.event_id + 10000
         |WHEN MATCHED THEN UPDATE SET val = s.val
         |""".stripMargin)
    assert(ManifestStore.latestVersion(dir).contains(v),
      "a merge matching nothing must publish nothing")
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("SQL DML inherits the store's OCC: concurrent statements on " +
    "DISJOINT partitions all land (publish rebase), and racing " +
    "same-partition updates never lose an edit — each either lands " +
    "or fails typed") {
    val (dir, view) = build("o")
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // disjoint: four concurrent per-partition updates all land
      val fs = (0 until 4).map { pv => Future {
        spark.sql(s"UPDATE $view SET val = val + 1 WHERE p = $pv")
      }}
      Await.result(Future.sequence(fs), 120.seconds)
      assert(readStore(dir).agg(sum("val")).head.getLong(0)
        == (0 until 200).map(_ * 3L).sum + 200,
        "every partition's edit must land")
      // overlapping: racing updates of the SAME partition — count the
      // typed conflicts; landed edits and conflicts must account for
      // every attempt (no silent lost update)
      val results = (0 until 4).map { _ => Future {
        try { spark.sql(s"UPDATE $view SET val = val + 1 WHERE p = 0"); 1L }
        catch {
          case _: graft.sources.ConcurrentCommitException => 0L
          case e: Exception
              if e.getCause.isInstanceOf[graft.sources.ConcurrentCommitException] => 0L
        }
      }}
      val landed = Await.result(Future.sequence(results), 120.seconds).sum
      val expected = (0 until 200).filter(_ % 4 == 0).map(_ * 3L + 1).sum +
        landed * 50
      assert(readStore(dir).filter(col("p") === 0)
        .agg(sum("val")).head.getLong(0) == expected,
        s"content must reflect exactly the $landed landed updates")
    } finally pool.shutdown()
    FileIO.deleteScratch(new java.io.File(dir))
  }

  test("CTAS: CREATE TABLE ... USING graft AS SELECT initializes the " +
    "store through the write surface") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ctas").toString
    FileIO.deleteScratch(new java.io.File(dir)) // CTAS wants a fresh path
    spark.sql("DROP TABLE IF EXISTS graft_ctas")
    spark.sql(
      s"CREATE TABLE graft_ctas USING graft " +
        s"OPTIONS (path '$dir', partCol 'p') " +
        "AS SELECT id AS event_id, id % 4 AS p, id * 3 AS val " +
        "FROM range(100)")
    try {
      assert(ManifestStore.latestVersion(dir).contains(0L),
        "CTAS must publish manifest v0")
      assert(spark.sql("SELECT count(*) FROM graft_ctas").head.getLong(0) == 100)
      assert(readStore(dir).count() == 100)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ctas")
      FileIO.deleteScratch(new java.io.File(dir))
    }
  }

  test("DELETE null semantics: a NULL predicate keeps its row (SQL " +
    "three-valued logic), exactly like the Scala deleteWhere path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dmln").toString
    Seq((1L, 0L, Some(5L)), (2L, 0L, None), (3L, 1L, Some(50L)))
      .toDF("event_id", "p", "val")
      .write.format("graft").option("partCol", "p").mode("append").save(dir)
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW dml_n_v USING graft " +
        s"OPTIONS (path '$dir', partCol 'p')")
    spark.sql("DELETE FROM dml_n_v WHERE val < 10")
    val left = readStore(dir).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(left == Set(2L, 3L), s"the NULL-val row must survive: $left")
    FileIO.deleteScratch(new java.io.File(dir))
  }
}
