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

  test("dot_long equals the zip_with/aggregate fold on quantized vectors") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    val q = e.select(col("vec_id"), Similarity.quantize(col("embedding")).as("qa"))
    val pairs = q.filter(col("vec_id") < 10)
      .crossJoin(q.select(col("qa").as("qb")).limit(100))
    val diff = pairs.select(
      DotLong(col("qa"), col("qb")).as("native"),
      aggregate(zip_with(col("qa"), col("qb"), (a, b) => a * b),
        lit(0L), (a, x) => a + x).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0L)
    // length mismatch folds over the shorter prefix in both spellings?
    // no — the HOF nulls; the kernel prefixes. Pin the kernel's own
    // contract instead: equal-length inputs only in this engine's call
    // sites (qsub vs cvec are both subDim-long by construction).
  }

  test("cos_q_ge predicate equals the declarative decimal threshold") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val pairs = a.join(b, col("id_a") < col("id_b") && col("id_b") < col("id_a") + 40)
      .withColumn("nq_a", QuantizedDot(col("v_a"), col("v_a")))
      .withColumn("nq_b", QuantizedDot(col("v_b"), col("v_b")))
      .withColumn("dot_q", QuantizedDot(col("v_a"), col("v_b")))
    val m = 350L
    val declarative =
      col("dot_q") > 0 &&
        col("dot_q").cast("decimal(38,0)") * col("dot_q") * lit(1000000L) >=
          lit(m * m).cast("decimal(38,0)") * col("nq_a") * col("nq_b")
    val mismatches = pairs.select(
      QuantizedCosineGe(col("v_a"), col("v_b"), col("nq_a"), col("nq_b"), m).as("native"),
      declarative.as("decl"))
      .filter(col("native") =!= col("decl")).count()
    assert(mismatches == 0L)
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

  test("runtime registration exposes the round-7 kernels to SQL") {
    GraftFunctions.register(spark)
    // hilbert2d: order-1 curve corner (1,0) -> 3
    assert(spark.sql("SELECT hilbert2d(CAST(1 AS BIGINT), CAST(0 AS BIGINT), 1)")
      .as[Long].head() == 3L)
    // pq_cells: one positive 2-dim subspace -> cell 3
    assert(spark.sql(
      "SELECT pq_cells(array(CAST(0.5 AS FLOAT), CAST(0.5 AS FLOAT)), 1, 2)")
      .as[Seq[Long]].head() == Seq(3L))
    // sq8_dot: q=1.0 (1000 milli), code 255 with maxabs 500 decodes to
    // 255*1000/255 - 500 = +500
    assert(spark.sql(
      "SELECT sq8_dot(array(CAST(1.0 AS FLOAT)), array(CAST(255 AS BIGINT)), CAST(500 AS BIGINT))")
      .as[Long].head() == 1000L * 500L)
  }

  test("malformed SQL arguments fail loud, not silently wrong") {
    GraftFunctions.register(spark)
    // pq_cells on a too-short array: out-of-bounds read would return
    // garbage cells on the unsafe path — must throw instead
    val short = intercept[Exception] {
      spark.sql("SELECT pq_cells(array(CAST(0.5 AS FLOAT)), 2, 2)").collect()
    }
    assert(short.getMessage.contains("pq_cells") ||
      short.getCause != null && short.getCause.getMessage.contains("pq_cells"))
    // hilbert2d with bits outside [1,31]: analysis-time failure, not
    // an all-zeros (bits<=0) or wrapped-negative (bits>31) key column
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hilbert2d(CAST(1 AS BIGINT), CAST(0 AS BIGINT), 0)").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hilbert2d(CAST(1 AS BIGINT), CAST(0 AS BIGINT), 32)").collect()
    }
  }

  test("centered_ssd nulls on length-mismatched windows like the declarative form") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)), // exact length: a value
      (Array(1L, 2L), Array(4L, 5L, 6L)), // short left: null
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L, 7L)) // long right: null
    ).toDF("a", "b")
    val out = df.select(
      graft.functions.CenteredSsd(col("a"), col("b"), 3).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out(0).isDefined && out(1).isEmpty && out(2).isEmpty)
  }
}
