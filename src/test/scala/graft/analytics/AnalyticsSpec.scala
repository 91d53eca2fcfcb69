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
}
