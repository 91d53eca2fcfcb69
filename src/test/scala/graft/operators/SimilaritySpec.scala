package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine and quantized dot agree with manual math") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 2L, Array(1.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f), 4L, Array(0.0f, 1.0f))
    ).toDF("qid", "qvec", "cid", "cvec")
    val out = df.select(
      col("qid"),
      Similarity.cosine(col("qvec"), col("cvec")).as("cos"),
      Similarity.dotQ(col("qvec"), col("cvec")).as("dot"))
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(math.abs(out(0)._2 - 1.0) < 1e-9 && out(0)._3 == 1000L * 1000L)
    assert(math.abs(out(1)._2) < 1e-9 && out(1)._3 == 0L)
  }

  test("LSH top-k achieves useful recall vs brute force on real embeddings") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val brute = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(q, c, 5, bits = 4, tables = 8)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    // 8 tables of 4-bit sign-LSH: ~16x per-table pruning, unioned
    assert(recall > 0.3, s"recall=$recall")
    assert(lsh.nonEmpty)
  }

  test("IVF search finds neighbors within the query's cell") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    val codebook = Similarity.centroids(e, col("label"), col("embedding"))
    assert(codebook.count() == 10 * 64) // 10 cells x 64 dims
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val ivf = Similarity.ivfTopK(q, c, codebook, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    val brute = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    // 10-cell coarse quantizer ~ 10x pruning; must beat random (0.1)
    assert(recall > 0.2, s"recall=$recall")
  }

  test("no cartesian product in either ANN plan") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val lshPlan = Similarity.lshTopK(q, c, 5).queryExecution.executedPlan.toString
    assert(!lshPlan.contains("CartesianProduct"))
  }

  test("hot-bucket cap drops the degenerate bucket, keeps the rest") {
    // 30 identical all-positive vectors = one hot bucket in EVERY
    // table; 2 near-identical negative vectors = a small legit bucket;
    // 2 vectors sharing the HOT bucket in table 0 but their own small
    // bucket in table 1 — must be recovered from table 1 under capping
    val hot = (0L until 30L).map(i => (i, Array.fill(8)(1.0f)))
    val pairDup = Seq(
      (100L, Array.fill(8)(-1.0f)),
      (101L, Array.fill(8)(-0.99f)))
    val straddlers = Seq(
      (200L, Array(1f, 1f, 1f, 1f, -1f, -1f, -1f, -1f)),
      (201L, Array(0.9f, 0.9f, 0.9f, 0.9f, -0.9f, -0.9f, -0.9f, -0.9f)))
    val df = (hot ++ pairDup ++ straddlers).toDF("vec_id", "embedding")
    val capped = graft.operators.Dedup.embeddingNearDups(
      df, col("vec_id"), col("embedding"), minCosineMilli = 900,
      bits = 4, tables = 2, maxBucketSize = Some(10))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the hot bucket emits nothing; the legit pair survives; the
    // straddler pair (first-agreeing table 0 is capped) is recovered
    // through its surviving table-1 bucket
    assert(capped == Set((100L, 101L), (200L, 201L)))
    val uncapped = graft.operators.Dedup.embeddingNearDups(
      df, col("vec_id"), col("embedding"), minCosineMilli = 900,
      bits = 4, tables = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // all hot pairs + legit pair + straddler pair (hot vectors and
    // straddlers differ in the table-1 half, cos < 0.9)
    assert(uncapped.size == 30 * 29 / 2 + 2)
  }

  test("sq8 codes decode within one quantization step of the original") {
    val e = Tables.load(spark, Sf0001, "embeddings").limit(200)
    val enc = Similarity.sq8Encode(e, col("vec_id"), col("embedding"))
    val err = enc
      .join(e.select(col("vec_id").as("cid"),
        Similarity.quantize(col("embedding")).as("m")), Seq("cid"))
      .select(array_max(zip_with(col("codes"), col("m"), (c, mv) =>
        abs(floor((c * 2 * col("maxabs")).cast("double") / 255).cast("bigint")
          - col("maxabs") - mv))).as("max_err"),
        col("maxabs"))
      .as[(Long, Long)].collect()
    // one 8-bit step is 2*maxabs/255; decode error stays within a step
    err.foreach { case (maxErr, maxabs) =>
      assert(maxErr <= 2 * maxabs / 255 + 1, s"err $maxErr scale $maxabs")
    }
  }

  test("sq8 ADC top-k recalls the exact scan's neighbors") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Similarity.bruteForceTopK(
      q, e.select(col("vec_id").as("cid"), col("embedding").as("cvec")), 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val sq = Similarity.sq8TopK(
      q, Similarity.sq8Encode(e, col("vec_id"), col("embedding")), 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = (brute & sq).size.toDouble / brute.size
    assert(recall >= 0.85, s"sq8 recall $recall")
  }
}
