package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloom membership has no false negatives over the build keys") {
    val dim = spark.range(5000).select((col("id") * 7).as("k"))
    val bytes = BloomPrune.bloomOf(dim, col("k"), expectedItems = 5000, fpp = 0.01)
    val misses = dim.filter(!BloomPrune.mightContain(bytes, col("k"))).count()
    assert(misses == 0L)
  }

  test("bloom prefilter prunes most non-matching fact rows") {
    // 1% of fact keys match the dim
    val fact = spark.range(100000).select(col("id").as("fk"))
    val dim = spark.range(1000).select((col("id") * 100).as("dk"))
    val bytes = BloomPrune.bloomOf(dim, col("dk"), expectedItems = 1000, fpp = 0.01)
    val survivors = fact.filter(BloomPrune.mightContain(bytes, col("fk"))).count()
    // >= the 1000 true matches, << the 100k scanned (fpp-bounded)
    assert(survivors >= 1000L, s"survivors $survivors")
    assert(survivors <= 1000L + 3000L, s"survivors $survivors — fpp blowout")
  }

  test("the bloom predicate filters the fact side BELOW the join") {
    val fact = spark.range(10000).select(col("id").as("fk"), (col("id") * 2).as("v"))
    val dim = spark.range(100).select((col("id") * 50).as("dk"))
    val joined = BloomPrune.prunedJoin(
      fact, col("fk"), dim, col("dk"), expectedItems = 100L)
    val plan = joined.queryExecution.executedPlan.toString
    // the might_contain filter must appear in the plan, and the plan
    // must not have degenerated into a cartesian product
    assert(plan.contains("might_contain"), plan.take(500))
    assert(!plan.contains("CartesianProduct"))
    // the filter is on the fact branch: scanning the filtered fact
    // alone (no join) already prunes
    val pruned = fact.filter(BloomPrune.mightContain(
      BloomPrune.bloomOf(dim, col("dk"), 100L, 0.01), col("fk"))).count()
    assert(pruned < 1000, s"prefilter kept $pruned of 10000")
  }

  test("string join keys work — no silent cast-to-null empty join") {
    // regression: cast('long') on string keys yielded null on both
    // sides, so the filter dropped every fact row; the hashed-key
    // filter must keep the true matches
    val fact = Seq(("alpha", 1L), ("beta", 2L), ("gamma", 3L), ("delta", 4L))
      .toDF("fk", "v")
    val dim = Seq("beta", "delta").toDF("dk")
    val joined = BloomPrune.prunedJoin(fact, col("fk"), dim, col("dk"), 10L)
      .select("fk", "v").as[(String, Long)].collect().toSet
    assert(joined == Set(("beta", 2L), ("delta", 4L)))
  }

  test("mixed integral widths join via the widened hash; other mismatches fail fast") {
    val fact = spark.range(100).select(col("id").cast("int").as("fk"))
    val dim = spark.range(10).select((col("id") * 5).as("dk")) // bigint
    val n = BloomPrune.prunedJoin(fact, col("fk"), dim, col("dk"), 10L).count()
    assert(n == 10L)
    val sdim = Seq("3", "7").toDF("dk")
    intercept[IllegalArgumentException] {
      BloomPrune.prunedJoin(fact, col("fk"), sdim, col("dk"), 10L)
    }
  }

  test("pruned join result equals the plain join on real tables") {
    val o = Tables.load(spark, Sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.load(spark, Sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val pruned = BloomPrune.prunedJoin(
      li, col("l_orderkey"), o, col("o_orderkey"), expectedItems = 10000L)
      .groupBy("o_custkey").agg(sum("l_quantity").cast("long").as("q"))
      .as[(Long, Long)].collect().toMap
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(sum("l_quantity").cast("long").as("q"))
      .as[(Long, Long)].collect().toMap
    assert(pruned == plain)
  }
}
