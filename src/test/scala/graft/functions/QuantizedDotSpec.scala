package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import graft.tables.Tables
import org.apache.spark.sql.functions._

class QuantizedDotSpec extends SparkSpec {
  import spark.implicits._

  test("native kernel equals the higher-order-function definition on real embeddings") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    val pairs = e.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .filter(col("qid") < 10)
      .crossJoin(e.select(col("vec_id").as("cid"), col("embedding").as("cvec")).limit(100))
    val diff = pairs.select(
      Similarity.dotQ(col("qvec"), col("cvec")).as("native"),
      Similarity.dotQHof(col("qvec"), col("cvec")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0L)
  }

  test("negative-half rounding matches functions.round (half away from zero)") {
    assert(QuantizedDot.q(-0.0025f) == -3L || QuantizedDot.q(-0.0025f) == -2L)
    // exact representable halves
    assert(QuantizedDot.q(0.0625f) == 63L)   // 62.5 -> 63
    assert(QuantizedDot.q(-0.0625f) == -63L) // -62.5 -> -63
    val df = Seq((0.0625f, -0.0625f)).toDF("a", "b")
    val viaRound = df.select(
      round(col("a").cast("double") * 1000).cast("bigint"),
      round(col("b").cast("double") * 1000).cast("bigint"))
      .as[(Long, Long)].head()
    assert(viaRound == ((63L, -63L)))
  }

  test("runtime registration exposes dot_q to SQL") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT dot_q(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
      .as[Long].head()
    assert(out == 1000L * 2000L)
  }
}
