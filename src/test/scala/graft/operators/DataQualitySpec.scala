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
}
