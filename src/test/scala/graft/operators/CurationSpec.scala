package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation drops low-quality, exact-dup and semantic-dup docs; keeps the rest") {
    val goodText = "the cat and a dog walked over the bridge near a quiet river today"
    val docs = Seq(
      (0L, goodText), // survives (and wins its exact-dup group)
      (1L, goodText), // exact dup of 0 -> dropped
      (2L, "xyz qrs ttw uvq plm nop"), // no stopwords: low quality -> dropped
      (3L, "the engine scans a million rows and the optimizer prunes partitions"), // survives
      (4L, "a second unique document with the usual stopword density in the mix") // semantic dup of 3 below
    ).toDF("doc_id", "text")
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val v3 = vec()
    val embs = Seq(
      (0L, vec()), (3L, v3),
      (4L, v3.map(x => x + 0.005f)) // cos ~1 with doc 3 -> doc 4 dropped
    ).toDF("vec_id", "embedding")

    val out = Curation.curate(docs, embs)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(0L, 3L))

    // no cartesian product anywhere in the composed plan
    val plan = Curation.curate(docs, embs).queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
  }

  test("docs without an embedding skip the semantic stage but pass the others") {
    val docs = Seq((7L, "the quick brown fox and a lazy dog in the sun")).toDF("doc_id", "text")
    val embs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Curation.curate(docs, embs).select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(7L))
  }

  test("curate leaves no JVM-lifetime cache entries (distinct corpora don't accumulate)") {
    val embs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    // the session is shared across suites and others legitimately
    // persist (Bank's graph memo) — start this lifecycle check from a
    // clean cache (unpersisting only costs those suites a recompute)
    spark.catalog.clearCache()
    assert(spark.sharedState.cacheManager.isEmpty, "precondition: clean cache")
    // distinct inputs per call — a CacheManager-based survivor cache
    // would pin one entry per corpus for the JVM lifetime
    (0 until 3).foreach { i =>
      val docs = Seq((i.toLong, s"corpus $i with the usual stopword density in the text"))
        .toDF("doc_id", "text")
      Curation.curate(docs, embs).count()
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "curate must not register CacheManager entries")
    // the scoped variant frees its checkpoint blocks deterministically
    val docs = Seq((9L, "one more corpus with a stopword here and there in it"))
      .toDF("doc_id", "text")
    val n = Curation.curateScoped(docs, embs)(_.count())
    assert(n == 1L)
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
