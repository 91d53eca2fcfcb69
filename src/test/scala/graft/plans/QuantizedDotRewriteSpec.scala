package graft.plans

import graft.SparkSpec
import graft.operators.Similarity
import graft.tables.Tables
import org.apache.spark.sql.functions._

class QuantizedDotRewriteSpec extends SparkSpec {
  import spark.implicits._

  test("HOF dot product is rewritten to the native kernel by the optimizer rule") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ QuantizedDotRewrite
    try {
      val e = Tables.load(spark, Sf0001, "embeddings").limit(50)
      val pairs = e.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        .crossJoin(e.select(col("vec_id").as("cid"), col("embedding").as("cvec")).limit(10))
      val df = pairs.select(
        col("qid"), col("cid"),
        Similarity.dotQHof(col("qvec"), col("cvec")).as("dot"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dot_q"), s"no rewrite in:\n$optimized")
      assert(!optimized.contains("aggregate(zip_with"))
      // results identical to the unfused native kernel
      val native = pairs.select(col("qid"), col("cid"),
        Similarity.dotQ(col("qvec"), col("cvec")).as("dot"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val rewritten = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rewritten == native)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == QuantizedDotRewrite)
    }
  }
}
