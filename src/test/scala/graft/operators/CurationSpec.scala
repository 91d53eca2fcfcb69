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

  test("curateV2 stages: gate drops, boilerplate collapses dups, first id wins") {
    val boiler = "subscribe to our newsletter for updates every single day now"
    val body = "a genuinely informative paragraph about rivers and such stuff"
    val docs = Seq(
      (1L, s"$body\n$boiler"), // keeps body (first boiler owner too)
      // 2/3: all-SHORT lines (line dedup passes them through
      // untouched) -> identical cleans -> stage 3 decides
      (2L, "ok go\nhm"),
      (3L, "ok go\nhm"),
      (4L, boiler) // all lines stripped -> empty -> not kept
    ).toDF("doc_id", "text")
    // all-positive weights: every doc passes the gate
    val w = spark.range(64).select(col("id").as("bucket"), lit(1L).as("w_milli"))
    val out = Curation.curateV2(docs, col("doc_id"), col("text"), w, 64)
      .as[(Long, Long, Long, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.values.forall(_._2 == 1L)) // all passed the gate
    assert(out(1L)._5 == 1L && out(1L)._3 == 2L) // body + first boiler copy
    assert(out(2L)._5 == 1L && out(2L)._3 == 2L) // first owner of its clean
    assert(out(3L)._5 == 0L) // clean == doc 2's -> exact-dup dropped
    assert(out(3L)._4 == out(2L)._4) // same cleaned fingerprint
    assert(out(4L)._5 == 0L && out(4L)._3 == 0L) // emptied by line dedup
    // a failing gate zeroes everything downstream
    val wNeg = spark.range(64).select(col("id").as("bucket"), lit(-1L).as("w_milli"))
    val gated = Curation.curateV2(docs, col("doc_id"), col("text"), wNeg, 64)
      .as[(Long, Long, Long, String, Long)].collect()
    assert(gated.forall(r => r._2 == 0L && r._5 == 0L && r._3 == 0L))
  }

  test("keepBestPerCluster: the highest-quality near-dup survives, singletons always kept") {
    // docs 1-3: identical text (one minhash cluster) except doc 2
    // carries more stopwords -> higher quality_milli -> doc 2 kept,
    // 1 and 3 dropped. doc 9: unrelated singleton -> kept.
    val shared = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val docs = Seq(
      (1L, shared + "iota kappa"),
      (2L, shared + "the a the"), // same shingle mass + stopword tail
      (3L, shared + "iota kappa"),
      (9L, "totally different words nothing shared here at all " * 5))
      .toDF("doc_id", "text")
    val got = Curation.keepBestPerCluster(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 4)
    val cluster = got(1L)._2
    assert(got(2L)._2 == cluster && got(3L)._2 == cluster,
      s"near-dups not clustered together: $got")
    assert(got(9L)._2 != cluster && got(9L)._4, "singleton must survive")
    assert(got(2L)._4, s"highest-quality member not kept: $got")
    assert(!got(1L)._4 && !got(3L)._4, s"losers kept: $got")
  }
}
