package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("rangeJoin matches the naive inequality join, without a cartesian plan") {
    val points = (0L until 500L).map(i => (i, i * 7 % 1000)).toDF("pid", "t")
    val intervals = Seq(
      (1L, 0L, 10L), // narrow
      (2L, 95L, 305L), // spans 3+ buckets at width 100
      (3L, 990L, 2000L), // runs past the data
      (4L, 400L, 400L)) // degenerate single point
      .toDF("iid", "lo", "hi")
    val got = Analytics.rangeJoin(
      points, col("t"), intervals, col("lo"), col("hi"), bucketWidth = 100L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, col("t") >= col("lo") && col("t") <= col("hi"))
      .select("iid", "pid").as[(Long, Long)].collect()
    assert(naive.length == naive.toSet.size) // sanity: naive emits no dups
    assert(got == naive.toSet)
    // and each pair exactly once from the bucketed path too
    val list = Analytics.rangeJoin(
      points, col("t"), intervals, col("lo"), col("hi"), bucketWidth = 100L)
      .select("iid", "pid").as[(Long, Long)].collect()
    assert(list.length == list.toSet.size)
    val plan = Analytics.rangeJoin(
      points, col("t"), intervals, col("lo"), col("hi"), bucketWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join fell back to a product plan:\n$plan")
  }

  test("filter pushdown + column pruning reach the parquet scan through ts normalization") {
    // Tables.load rewrites timestamp columns (NTZ cast / nanos div) —
    // if that ever stops being unwrap-able, date filters silently stop
    // reaching the scan and a 100 TB query reads every row group. Pin
    // the property on the flagship pricing query.
    val explained = graft.SparkEntry.queries("q1_pricing")(spark, Sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed to the parquet scan:\n$explained")
    // unused lineitem columns must be pruned out of the read schema
    assert(!explained.contains("l_partkey"),
      s"column pruning lost — l_partkey read but unused:\n$explained")
  }

  test("retentionMatrix: per-user week offsets from own cohort day, distinct per cell") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      // user 1: cohort Jan 1; active Jan 1 (x2 events, one cell),
      // Jan 2 (same week 0), Jan 8 (week 1)
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"),
      (1L, "2024-01-02 09:00:00"), (1L, "2024-01-08 09:00:00"),
      // user 2: cohort Jan 8; active Jan 8 (week 0), Jan 22 (week 2)
      (2L, "2024-01-08 12:00:00"), (2L, "2024-01-22 12:00:00"))
      .toDF("user_id", "s")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val got = Analytics.retentionMatrix(df, col("user_id"), col("ts"))
      .select(col("cohort_day").cast("string"), col("offset_week"),
        col("n_users"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 2L, 1L)))
  }

  test("resampleDailyFfill: dense per-key calendar, gaps carry the last observed value") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      // user 1: observed Jan 1 (two events -> summed) and Jan 4;
      // Jan 2-3 must appear, carrying Jan 1's total
      (1L, "2024-01-01 08:00:00", 10L), (1L, "2024-01-01 18:00:00", 5L),
      (1L, "2024-01-04 12:00:00", 7L),
      // user 2: a single day -> exactly one row, no padding
      (2L, "2024-02-10 00:00:00", 3L))
      .toDF("user_id", "s", "c")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("c"))
    val got = Analytics.resampleDailyFfill(df, col("user_id"), col("ts"), col("c"))
      .select(col("user_id"), col("day").cast("string"), col("cents"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "2024-01-01", 15L), (1L, "2024-01-02", 15L),
      (1L, "2024-01-03", 15L), (1L, "2024-01-04", 7L),
      (2L, "2024-02-10", 3L)), s"got $got")
  }

  test("outliersMad: robust to the outliers themselves; boundary value is NOT flagged") {
    import org.apache.spark.sql.functions._
    // group a (n=9): median 10, deviations 0,0,1,1,2,2,6,60,90 ->
    // MAD 2, cut 3 -> threshold 6; flags exactly the wild 100 and -50.
    // The value 16 sits EXACTLY on the boundary (dev 6 = 3*MAD) and
    // must NOT be flagged (strict >)
    val df = Seq(
      ("a", 8.0), ("a", 9.0), ("a", 10.0), ("a", 10.0), ("a", 11.0),
      ("a", 12.0), ("a", 16.0), ("a", 100.0), ("a", -50.0),
      // group b: constant -> MAD 0, every deviation > 0 flagged
      ("b", 5.0), ("b", 5.0), ("b", 6.0))
      .toDF("g0", "v0")
    val got = Analytics.outliersMad(df, col("g0"), col("v0"), cut = 3.0)
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a")._2 == 9L)
    assert(got("a")._3 == 2L, s"want exactly the 2 wild points: ${got("a")}")
    assert(got("a")._4.contains(-50.0) && got("a")._5.contains(100.0))
    assert(got("b")._3 == 1L, s"MAD-0 group must flag any deviation: ${got("b")}")
  }

  test("cube / grouping sets / unpivot plan as ONE scan through Expand, not unioned rescans") {
    import org.apache.spark.sql.functions._
    val dir = Sf0001
    for (name <- Seq("q_cube", "q_grouping_sets", "q_unpivot")) {
      val df = graft.queries.AnalyticsQueries.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Expand"), s"$name: no Expand node:\n$plan")
      val scans = "Scan parquet|FileScan".r.findAllIn(plan).length
      assert(scans <= 3, // cube/gsets read 3 tables once each; unpivot 1
        s"$name: lattice expanded as rescans ($scans scans):\n$plan")
      assert(!plan.contains("Union"), s"$name: unioned rescans:\n$plan")
    }
  }
}
