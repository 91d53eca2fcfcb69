package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // two near-duplicate pairs + unrelated docs
  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    (2L, "completely different content about spark catalyst optimizer internals here"),
    (3L, "completely different content about spark catalyst optimizer internals there"),
    (4L, "nothing in common with any other document in this tiny corpus at all"),
    (5L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup groups identical normal forms") {
    val out = Dedup.exact(docs, col("text"), col("doc_id"))
      .filter(col("n_dups") > 1)
      .select("keep_id", "n_dups").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 2L)))
  }

  test("LSH candidates find near-dup pairs without a cartesian join") {
    val cands = Dedup.nearDuplicateCandidates(docs, col("text"), col("doc_id"))
    assert(!cands.queryExecution.executedPlan.toString.contains("Cartesian"))
    val pairs = cands.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) || pairs.contains((0L, 5L))) // high-sim pair bucketed
    assert(pairs.contains((0L, 5L))) // exact dup always collides
  }

  test("minhash estimate tracks exact jaccard for verified candidates") {
    val cands = Dedup.nearDuplicateCandidates(docs, col("text"), col("doc_id"))
    val verified = Dedup.jaccardVerify(cands, docs, col("text"), col("doc_id"))
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    val exactDup = verified.find(p => p._1 == 0L && p._2 == 5L)
    assert(exactDup.exists(_._3 == 1.0))
    verified.foreach { case (_, _, j) => assert(j >= 0.0 && j <= 1.0) }
  }

  test("portable banding == hashed banding, exactly-once without distinct") {
    val hashed = Dedup.nearDuplicateCandidates(docs, col("text"), col("doc_id"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val portable = Dedup.nearDuplicateCandidatesPortable(
      docs, col("text"), col("doc_id"))
    assert(!portable.queryExecution.executedPlan.toString.contains("Cartesian"))
    val rows = portable
      .select("doc_a", "doc_b", "est_jaccard_milli")
      .as[(Long, Long, Long)].collect().toSeq
    // first-agreeing-band emission: each pair exactly once, no distinct
    val pairs = rows.map(p => (p._1, p._2))
    assert(pairs.size == pairs.distinct.size)
    // same candidate set as the hashed variant (a murmur band collision
    // could only ADD pairs there; none on this fixture)
    assert(pairs.toSet == hashed)
    // exact dup -> all 16 positions agree
    assert(rows.find(p => p._1 == 0L && p._2 == 5L).exists(_._3 == 1000L))
  }

  test("inverted-index ngram jaccard == candidate-set verify, no cartesian") {
    val out = Dedup.ngramJaccard(
      docs, col("text"), col("doc_id"), minJaccardMilli = 0)
    assert(!out.queryExecution.executedPlan.toString.contains("Cartesian"))
    val got = out.select("doc_a", "doc_b", "jaccard_milli")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.forall(p => p._1 < p._2)) // canonical orientation only
    val byPair = got.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair((0L, 5L)) == 1000L) // exact dup
    assert(byPair((0L, 1L)) >= 500L) // one-token edit of a 13-token doc
    assert(!byPair.contains((4L, 5L))) // no shared shingle, no pair
    // the inverted-index spelling must agree with the candidate-set
    // array-intersect spelling pair by pair
    val cands = got.map(p => (p._1, p._2)).toDF("doc_a", "doc_b")
    val verify = Dedup.jaccardVerify(cands, docs, col("text"), col("doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("jaccard") * 1000).cast("long").as("jm"))
      .as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair == verify)
    // threshold prunes: only the two planted near-dup families survive
    val strict = Dedup.ngramJaccard(
      docs, col("text"), col("doc_id"), minJaccardMilli = 500)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(strict == Set((0L, 1L), (0L, 5L), (1L, 5L), (2L, 3L)))
  }

  test("simhash: near-dups are closer in hamming distance than unrelated docs") {
    val sigs = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sigs(0L) == sigs(5L)) // identical text, identical simhash
    assert(hamming(sigs(0L), sigs(1L)) < hamming(sigs(0L), sigs(4L)))
  }

  test("simhash pigeonhole banding finds low-hamming pairs without all-pairs") {
    val pairs = Dedup.simhashNearDups(docs, col("text"), col("doc_id"), maxHamming = 3)
    assert(!pairs.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val found = pairs.select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect()
    // exact dup pair (0,5) has hamming 0 and must be found
    assert(found.exists(p => p._1 == 0L && p._2 == 5L && p._3 == 0L))
    assert(found.forall(_._3 <= 3))
  }

  test("embedding-cosine near-dups find planted duplicates, not noise") {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = vec()
    val nearDup = base.map(x => x + 0.01f) // ~cos 1.0
    val rows = Seq((0L, base), (1L, nearDup)) ++ (2L to 40L).map(i => (i, vec()))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(
      df, col("vec_id"), col("embedding"), minCosineMilli = 950)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.size < 5) // random gaussians almost never collide at 0.95
  }

  test("semantic decontamination flags corpus vectors near a planted " +
    "eval member; distant vectors stay clean; every corpus row reports") {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val evalVec = vec()
    val leaked = evalVec.map(x => x + 0.01f) // ~cos 1.0 to the eval member
    // corpus: one leaked copy + random noise; eval: the planted vector
    val corpus = (Seq((100L, leaked)) ++ (101L to 140L).map(i => (i, vec())))
      .toDF("vec_id", "embedding")
    val evalSet = Seq((0L, evalVec), (1L, vec())).toDF("vec_id", "embedding")
    val got = Dedup.semanticContamination(
      corpus, col("vec_id"), col("embedding"),
      evalSet, col("vec_id"), col("embedding"),
      minCosineMilli = 950)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size == 41, "one row per corpus member, flagged or not")
    assert(got(100L) == ((1L, 1L)), s"leaked copy not flagged: ${got(100L)}")
    val flagged = got.filter(_._2._2 == 1L)
    assert(flagged.size <= 2, s"noise flagged as contaminated: $flagged")
  }

  test("embedding near-dup (driver-query params) tiered recall vs brute-force cosine") {
    val e = graft.tables.Tables.load(spark, Sf0001, "embeddings")
    val lsh = Dedup.embeddingNearDups(
      e, col("vec_id"), col("embedding"), minCosineMilli = 350, bits = 6, tables = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // exact baseline WITH each pair's cosine: all-pairs with the
    // operator's own quantized criterion (tiny SF only — the test
    // corpus), keeping cos² in milli² for tiering
    import graft.functions.QuantizedDot
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val exact = a.join(b, col("id_a") < col("id_b"))
      .withColumn("dot_q", QuantizedDot(col("v_a"), col("v_b")))
      .withColumn("nq_a", QuantizedDot(col("v_a"), col("v_a")))
      .withColumn("nq_b", QuantizedDot(col("v_b"), col("v_b")))
      .filter(col("dot_q") > 0 &&
        col("dot_q").cast("decimal(38,0)") * col("dot_q") * lit(1000000L) >=
          lit(122500L).cast("decimal(38,0)") * col("nq_a") * col("nq_b"))
      .withColumn("cos2_micro",
        (col("dot_q").cast("decimal(38,0)") * col("dot_q") * lit(1000000L) /
          (col("nq_a").cast("decimal(38,0)") * col("nq_b"))).cast("long"))
      .select("id_a", "id_b", "cos2_micro")
      .as[(Long, Long, Long)].collect()
    val exactPairs = exact.map(t => (t._1, t._2)).toSet
    assert(lsh.nonEmpty && lsh.subsetOf(exactPairs)) // exact rerank => precision 1.0
    // The LSH contract is cosine-TIERED: true near-duplicates (the
    // pairs semantic dedup exists for) collide in some table almost
    // surely, while borderline-threshold pairs are probabilistic —
    // recall there is bought with more tables, not more bits. At
    // bits=6 (the production sizing rule at this n), theory for
    // random hyperplanes: cos ~1.0 -> ~1.0, cos at the 0.35
    // threshold -> ~0.36. The fixture's exact pairs are ALL
    // borderline (cos in [0.35, 0.5)), so the high tier is checked
    // on planted near-identical pairs and the fixture checks the
    // borderline floor.
    val overall = lsh.size.toDouble / exactPairs.size
    info(f"borderline-tier recall $overall%.2f (${lsh.size}/${exactPairs.size})")
    assert(overall >= 0.3, s"overall recall $overall")

    // high tier: 20 planted near-identical pairs among the real corpus
    import org.apache.spark.sql.functions.{lit, transform => sqlTransform}
    val base = e.select(col("vec_id"), col("embedding"))
    val planted = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        sqlTransform(col("embedding"), x => x + lit(0.005f)).as("embedding"))
    val lshPlanted = Dedup.embeddingNearDups(
      base.unionByName(planted), col("vec_id"), col("embedding"),
      minCosineMilli = 350, bits = 6, tables = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = (0L until 20L).count(i => lshPlanted.contains((i, i + 1000000L)))
    assert(found >= 18, s"planted near-identical recall $found/20")
  }

  test("rolling hash is order-sensitive, bag-of-words hash is not") {
    val pair = Seq((0L, "alpha beta gamma"), (1L, "gamma beta alpha")).toDF("doc_id", "text")
    val rh = pair.select(TextAnalysis.rollingHash(col("text"))).as[Long].collect()
    assert(rh(0) != rh(1))
  }
}
