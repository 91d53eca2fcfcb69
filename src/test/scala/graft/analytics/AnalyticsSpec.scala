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
}
