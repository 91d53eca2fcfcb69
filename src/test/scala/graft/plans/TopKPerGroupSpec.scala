package graft.plans

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  test("custom physical operator matches window top-k and bounds the sort") {
    val part = Tables.load(spark, Sf0001, "part")
    val viaOperator = TopK.perGroup(
      part, Seq(col("p_brand")), col("p_retailprice"), k = 3)
      .select("p_brand", "p_partkey").as[(String, Long)].collect().toSet
    val viaWindow = graft.analytics.Analytics
      .topKPerGroup(part, col("p_brand"), col("p_retailprice"), col("p_partkey"), 3)
      .select("p_brand", "p_partkey").as[(String, Long)].collect().toSet
    // ties on price could differ in tiebreak; compare per-group price sets
    val pricesOp = TopK.perGroup(part, Seq(col("p_brand")), col("p_retailprice"), 3)
      .groupBy("p_brand").agg(sort_array(collect_list("p_retailprice")).as("ps"))
      .as[(String, Seq[Double])].collect().toMap
    val pricesWin = graft.analytics.Analytics
      .topKPerGroup(part, col("p_brand"), col("p_retailprice"), col("p_partkey"), 3)
      .groupBy("p_brand").agg(sort_array(collect_list("p_retailprice")).as("ps"))
      .as[(String, Seq[Double])].collect().toMap
    assert(pricesOp == pricesWin)
    assert(viaOperator.size == viaWindow.size)

    // the physical plan contains our exec and exactly one exchange
    val plan = TopK.perGroup(part, Seq(col("p_brand")), col("p_retailprice"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan) // physical node name strips "Exec"
    assert(plan.contains("Exchange hashpartitioning")) // exactly the declared clustering
    assert(!plan.contains("Window"))
    assert(!plan.contains("Sort")) // no per-group sort anywhere
  }

  test("operator handles groups smaller than k and a hot key") {
    val skewed = ((1L to 900L).map(i => ("hot", i)) ++ Seq(("cold", 1L)))
      .toDF("g", "v")
    val out = TopK.perGroup(skewed, Seq(col("g")), col("v"), 5)
      .as[(String, Long)].collect().groupBy(_._1)
    assert(out("hot").map(_._2).sorted.toSeq == Seq(896L, 897L, 898L, 899L, 900L))
    assert(out("cold").map(_._2).toSeq == Seq(1L))
  }

  test("null order values are excluded; array order keys don't alias the projection buffer") {
    val withNulls = Seq(("a", Some(3L)), ("a", None), ("a", Some(1L)), ("b", None))
      .toDF("g", "v")
    val out = TopK.perGroup(withNulls, Seq(col("g")), col("v"), 2)
      .select("g", "v").as[(String, Option[Long])].collect()
    assert(out.toSet == Set(("a", Some(3L)), ("a", Some(1L)))) // no NPE, nulls dropped
    // array-typed order key: per-element copy must be real, not an
    // alias of the reused UnsafeProjection buffer
    val arr = Seq(("g", 1L), ("g", 3L), ("g", 2L)).toDF("g", "v")
    val topByArray = TopK.perGroup(arr, Seq(col("g")), array(col("v"), -col("v")), 2)
      .select("v").as[Long].collect().toSet
    assert(topByArray == Set(3L, 2L)) // lexicographic array order = order by v
  }
}
