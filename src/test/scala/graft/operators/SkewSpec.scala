package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    // hot key 0 holds 90% of rows
    val rows = (1L to 1000L).map(i => (if (i <= 900) 0L else i % 7, i))
    rows.toDF("k", "v")
  }

  test("salted sum is exact vs direct aggregation") {
    val direct = skewed.groupBy(col("k")).agg(sum("v"), count(lit(1)))
      .as[(Long, Long, Long)].collect().map { case (k, s, n) => k -> ((s, n)) }.toMap
    val salted = Skew.saltedSum(skewed, col("k"), col("v"), salts = 8)
      .as[(Long, Long, Long)].collect().map { case (k, s, n) => k -> ((s, n)) }.toMap
    assert(salted == direct)
  }

  test("salted top-k equals direct window top-k") {
    val direct = graft.analytics.Analytics
      .topKPerGroup(skewed, col("k"), col("v"), col("v"), 3)
      .select("k", "rnk", "v").as[(Long, Long, Long)].collect().toSet
    val salted = Skew.saltedTopK(skewed, col("k"), col("v"), col("v"), 3, salts = 4)
      .select("k", "rnk", "v").as[(Long, Long, Long)].collect().toSet
    assert(salted == direct)
  }
}
