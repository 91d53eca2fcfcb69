package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._
  import DataQuality._

  test("every check counts its exact violations in one pass; nulls routed per contract") {
    val df = Seq(
      (Some(1L), Some(10.0), "a", 1L),
      (Some(2L), Some(-5.0), "b", 2L), // range violation
      (None, Some(3.0), "a", 3L), // null key
      (Some(4L), None, "zz", 4L), // null value (not a range violation), bad vocab
      (Some(5L), Some(999.0), "a", 4L)) // range violation, dup id
      .toDF("k", "v", "cat", "id")
    val got = audit(df, Seq(
      NotNull("k"),
      InRange("v", 0.0, 100.0),
      AcceptedValues("cat", Seq("a", "b")),
      Unique(Seq("id")),
      Satisfies("v_set_when_a", !(col("cat") === "a") || col("v").isNotNull)))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got("not_null(k)") == ((5L, 1L, false)))
    assert(got("in_range(v,0.0,100.0)") == ((5L, 2L, false)), s"$got")
    assert(got("accepted_values(cat)") == ((5L, 1L, false)))
    assert(got("unique(id)") == ((5L, 1L, false)))
    assert(got("satisfies(v_set_when_a)") == ((5L, 0L, true)))
  }

  test("audit plans as ONE scan (single aggregate, no per-check rescans)") {
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v")
    val plan = audit(df, Seq(
      NotNull("k"), InRange("v", 0.0, 10.0), Unique(Seq("k"))))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan, got $scans:\n$plan")
  }

  test("streamed audit equals the batch report under any split — " +
    "including duplicates that SPAN batch boundaries") {
    import graft.streaming.StreamingQuality
    // ids ascend so range staging puts the planted duplicate pair
    // (rows 10 and 110, same dup_key) in DIFFERENT micro-batches —
    // the case per-batch partials alone cannot count
    val rows = (0 until 160).map { i =>
      val dupKey = if (i == 110) 10L else i.toLong
      (i.toLong, dupKey,
        if (i % 17 == 0) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf((i % 50) * 10.0),
        if (i % 13 == 0) "weird" else "a")
    }
    val df = rows.toDF("stage_id", "dup_key", "v", "cat")
    val checks = Seq(
      DataQuality.NotNull("v"),
      DataQuality.InRange("v", 0.0, 400.0),
      DataQuality.AcceptedValues("cat", Seq("a", "b")),
      DataQuality.Unique(Seq("dup_key")),
      DataQuality.Satisfies("nonneg", coalesce(col("v"), lit(0.0)) >= 0))
    val batch = DataQuality.audit(df, checks)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(batch.exists(r => r._1.startsWith("unique") && r._3 == 1L),
      "fixture must plant exactly one cross-batch duplicate")
    for (nBatches <- Seq(1, 4)) {
      val scratch = java.nio.file.Files
        .createTempDirectory(s"graft-sdq-$nBatches").toString
      val streamed = StreamingQuality.auditFromFiles(
        spark, df, checks, stageCol = "stage_id",
        nBatches = nBatches, scratch)
        .as[(String, Long, Long, Boolean)].collect().toSeq
      assert(streamed == batch, s"split into $nBatches batches diverged")
      graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    }
  }

  test("streamed Unique matches batch semantics when the key column " +
    "holds NULLs (count_distinct ignores null keys; the first-seen " +
    "stream must too)") {
    import graft.streaming.StreamingQuality
    // three null-keyed rows: batch count_distinct skips them all, so
    // each counts as a violation; a dropDuplicates that kept the null
    // group as one first-seen would under-count by one
    val rows = (0 until 40).map { i =>
      val k = if (i % 10 == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(i.toLong)
      (i.toLong, k)
    }
    val df = rows.toDF("stage_id", "k")
    val checks = Seq(DataQuality.Unique(Seq("k")))
    val batch = DataQuality.audit(df, checks)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(batch.head._3 == 4L, s"4 null keys must all violate: $batch")
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-sdq-null").toString
    val streamed = StreamingQuality.auditFromFiles(
      spark, df, checks, stageCol = "stage_id", nBatches = 3, scratch)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(streamed == batch,
      s"null-keyed Unique diverged: streamed=$streamed batch=$batch")
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
  }

  test("route: first failing check (caller order) wins; clean rows pass; " +
    "quarantine + continuation split the same scan") {
    val df = Seq(
      (1L, Some(10.0), "a"),          // clean
      (2L, Some(-5.0), "zz"),         // fails range BEFORE vocab
      (3L, None, "a"),                // fails only satisfies (null value)
      (4L, Some(0.0), "b"))           // fails satisfies (not > 0)
      .toDF("id", "v", "cat")
    val routed = DataQuality.route(df, Seq(
      DataQuality.InRange("v", 0.0, 100.0),
      DataQuality.AcceptedValues("cat", Seq("a", "b")),
      DataQuality.Satisfies("pos", col("v") > 0)))
    val got = routed.select("id", "dq_passed", "dq_reason")
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((true, None)))
    assert(got(2L) == ((false, Some("in_range(v,0.0,100.0)"))),
      "first failing check in caller order must win")
    assert(got(3L) == ((false, Some("satisfies(pos)"))))
    assert(got(4L) == ((false, Some("satisfies(pos)"))))
    assert(routed.filter(col("dq_passed")).count() +
      routed.filter(!col("dq_passed")).count() == 4L)
  }
}
