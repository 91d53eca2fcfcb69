package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate lands within the sketch's error band; exact below k") {
    // 10k distinct values, k=64 -> standard error ~1/sqrt(62) ~ 13%
    val big = spark.range(10000).select(concat(lit("val"), col("id")).as("v"))
    val row = CorpusStats.distinctKmv(big, col("v"), k = 64)
      .as[(Long, Long, Long)].head()
    assert(row._1 == 64L)
    val err = math.abs(row._3 - 10000L).toDouble / 10000
    assert(err < 0.5, s"estimate ${row._3} off by $err") // 3.8 sigma
    // below k distinct: the answer is exact
    val small = spark.range(10).select(concat(lit("v"), col("id")).as("v"))
      .union(spark.range(10).select(concat(lit("v"), col("id")).as("v")))
    val exact = CorpusStats.distinctKmv(small, col("v"), k = 64)
      .as[(Long, Long, Long)].head()
    assert(exact._1 == 10L && exact._3 == 10L)
  }

  test("grouped KMV: per-group answers equal the global operator run per group") {
    // three groups of very different cardinality, values shared across
    // groups (per-group TreeSets must not bleed into each other)
    def card(id: org.apache.spark.sql.Column) =
      when(pmod(id, lit(3L)) === 0, 40L) // group g0: 40 distinct (< k, exact)
        .when(pmod(id, lit(3L)) === 1, 900L) // g1: ~900 distinct
        .otherwise(1700L) // g2: ~1700 distinct
    val df = spark.range(6000).repartition(8)
      .select(
        concat(lit("g"), pmod(col("id"), lit(3L))).as("g"),
        concat(lit("x"), pmod(col("id") * 7L, card(col("id")))).as("v"))
    val grouped = CorpusStats.distinctKmvByGroup(df, col("g"), col("v"), k = 64)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(grouped.keySet == Set("g0", "g1", "g2"))
    for (g <- Seq("g0", "g1", "g2")) {
      val global = CorpusStats.distinctKmv(
        df.filter(col("g") === g), col("v"), k = 64)
        .as[(Long, Long, Long)].head()
      assert(grouped(g) == global,
        s"group $g diverged: ${grouped(g)} vs global-per-group $global")
    }
    // the < k group answers exactly
    assert(grouped("g0")._3 == 40L, s"g0 not exact: ${grouped("g0")}")
  }

  test("count-min estimates are one-sided: est >= exact for every probed value") {
    // Zipf-ish: value i appears (100 / (i+1)) + 1 times
    val df = spark.range(500)
      .select(explode(sequence(lit(0L), expr("100 div (id + 1)"))).as("rep"),
        concat(lit("w"), col("id")).as("v"))
      .select("v")
    val exact = df.groupBy("v").count()
    val sketch = CorpusStats.countMinSketch(df, col("v"), depth = 3, width = 256)
    val est = CorpusStats.cmEstimate(
      sketch, exact.select(col("v")), col("v"), depth = 3, width = 256)
    val joined = exact.join(est, "v")
      .select(col("count"), col("est_cnt")).as[(Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (ex, es) => assert(es >= ex, s"CM bound violated: $es < $ex") }
    // and the sketch is model-sized: depth x width rows max
    assert(sketch.count() <= 3L * 256L)
  }

  test("KMV per-partition pre-truncation equals the full-shuffle spelling") {
    // many partitions, duplicated values across them — the bounded
    // mapPartitions k-min must agree with distinct-then-TakeOrdered
    val df = spark.range(5000).repartition(16)
      .select(concat(lit("x"), pmod(col("id"), lit(1700L))).as("v"))
    val fast = CorpusStats.distinctKmv(df, col("v"), k = 64)
      .as[(Long, Long, Long)].head()
    val reference = {
      val smallest = df
        .select(TextAnalysis.portableHash56(col("v")).as("h"))
        .filter(col("h").isNotNull).distinct().orderBy(col("h")).limit(64)
      smallest.agg(count(lit(1)), max(col("h"))).as[(Long, Long)].head()
    }
    assert(fast._1 == reference._1 && fast._2 == reference._2,
      s"pre-truncated sketch diverged: $fast vs $reference")
  }

  test("cmEstimate returns 0 for values whose buckets were never hit") {
    val df = Seq("a", "a", "b").toDF("v")
    val sketch = CorpusStats.countMinSketch(df, col("v"), depth = 3, width = 4096)
    // probe a value absent from the stream: with width 4096 and 2
    // distinct stream values, its buckets are (almost surely) empty —
    // the estimate must be a defined 0, not a dropped row
    val probes = Seq("a", "zzz-never-seen").toDF("v")
    val est = CorpusStats.cmEstimate(sketch, probes, col("v"), depth = 3, width = 4096)
      .as[(String, Long)].collect().toMap
    assert(est.keySet == Set("a", "zzz-never-seen"), s"probe rows dropped: $est")
    assert(est("a") >= 2L)
    assert(est("zzz-never-seen") == 0L, s"absent value over-estimated: $est")
  }

  test("heavyNgrams counts occurrences (not docs) and ranks deterministically") {
    val docs = Seq(
      (1L, "a b c a b c x y z"), // "a b c" twice (overlap-free), "b c a"/"c a b" once
      (2L, "a b c only once more"),
      (3L, "zz")                 // sub-n doc contributes nothing
    ).toDF("doc_id", "text")
    val out = CorpusStats.heavyNgrams(docs, col("text"), n = 3, k = 3)
      .as[(Long, String, Long)].collect()
    assert(out.head == ((1L, "a b c", 3L)))
    // all remaining 3-grams have cnt 1 -> rank 2/3 go to the two
    // lexicographically LAST ngrams (tiebreak = ngram DESC)
    val singles = out.tail
    assert(singles.map(_._3).forall(_ == 1L))
    assert(singles.map(_._2).toSeq == singles.map(_._2).sorted(Ordering[String].reverse).toSeq)
  }

  test("heavyNgrams top-k equals the full-sort reference") {
    val docs = (1 to 200).map { i =>
      (i.toLong, (0 to 6).map(j => s"tok${(i * 7 + j * 13) % 23}").mkString(" "))
    }.toDF("doc_id", "text")
    val fast = CorpusStats.heavyNgrams(docs, col("text"), n = 2, k = 10)
      .as[(Long, String, Long)].collect().toSeq
    val ref = docs
      .select(explode(expr(
        "transform(sequence(0, size(split(trim(text), '\\\\s+')) - 2), " +
          "i -> concat_ws(' ', slice(split(trim(text), '\\\\s+'), i + 1, 2)))")).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").desc).limit(10)
      .as[(String, Long)].collect().toSeq
    assert(fast.map(r => (r._2, r._3)) == ref)
    assert(fast.map(_._1) == (1L to 10L))
  }

  test("familiarity scores repeated text high and unique text rare") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),
      (3L, "the quick brown fox"),
      (4L, "completely unrelated singleton gibberish"),
      (5L, "x") // fewer than 2 tokens -> all zeros
    ).toDF("doc_id", "text")
    val out = CorpusStats.familiarity(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // docs 1-3: each of the 3 bigrams occurs 3x corpus-wide
    for (d <- 1L to 3L) assert(out(d) == ((d, 3L, 3L, 0L)))
    // doc 4: 3 bigrams, each unique -> avg freq 1, 1000 permille rare
    assert(out(4L) == ((4L, 3L, 1L, 1000L)))
    assert(out(5L) == ((5L, 0L, 0L, 0L)))
  }

  test("capPerSource keeps the top-n per source by the given order") {
    val docs = (1 to 30).map { i =>
      (i.toLong, s"src${i % 3}", (i * 7 % 13).toLong)
    }.toDF("doc_id", "source", "quality")
    val out = CorpusStats.capPerSource(
      docs, col("source"), struct(col("quality"), col("doc_id")), n = 4)
      .as[(Long, String, Long)].collect()
    assert(out.length == 12)
    // per source: exactly the window-rank top 4 by (quality, doc_id) desc
    val ref = docs
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("quality").desc, col("doc_id").desc)))
      .filter(col("rn") <= 4).drop("rn")
      .as[(Long, String, Long)].collect()
    assert(out.sortBy(_._1).toSeq == ref.sortBy(_._1).toSeq)
  }

  test("classifierScore sums broadcast bucket weights per doc") {
    val docs = Seq((1L, "aa bb aa"), (2L, "cc")).toDF("doc_id", "text")
    val buckets = 64
    // weights: bucket -> bucket (identity), so scores are checkable
    // against an independently computed token-bucket sum
    val w = spark.range(buckets).select(
      col("id").as("bucket"), col("id").as("w_milli"))
    val out = CorpusStats.classifierScore(docs, col("doc_id"), col("text"), w, buckets)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    def b(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    assert(out(1L) == ((1L, 3L, 2 * b("aa") + b("bb"), 1L)))
    assert(out(2L) == ((2L, 1L, b("cc"), 1L)))
  }

  test("classifierScore keep flag follows the score sign") {
    val docs = Seq((1L, "x x x"), (2L, "y")).toDF("doc_id", "text")
    val buckets = 16
    // all-negative weights -> nothing kept
    val w = spark.range(buckets).select(
      col("id").as("bucket"), lit(-5L).as("w_milli"))
    val out = CorpusStats.classifierScore(docs, col("doc_id"), col("text"), w, buckets)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 == -15L && out(1L)._4 == 0L)
    assert(out(2L)._3 == -5L && out(2L)._4 == 0L)
  }

  test("fdiv is floor division on negatives (matches the oracle's divisible-numerator spelling)") {
    val df = Seq((-7L, 2L), (7L, 2L), (-8L, 2L), (0L, 3L), (-1L, 4L))
      .toDF("a", "b")
    val out = df.select(CorpusStats.fdiv(col("a"), col("b"))).as[Long].collect().toSeq
    assert(out == Seq(-4L, 3L, -4L, 0L, -1L))
  }

  test("trainClassifier learns the distilled quality signal and plugs into classifierScore") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val w = CorpusStats.trainClassifier(docs, col("doc_id"), col("text"),
      buckets = 512, iters = 3)
    // the trained table drops straight into the inference operator
    // (same feature space, keep = score >= 0 == hard-sigmoid >= 0.5)
    val scored = CorpusStats.classifierScore(docs, col("doc_id"), col("text"),
      w.select(col("bucket"), col("w_micro").as("w_milli")), buckets = 512)
    val labeled = docs.select(col("doc_id"),
      (TextAnalysis.qualityMilli(col("text")) >= 30).cast("bigint").as("y"))
    val joined = scored.join(labeled, "doc_id")
      .select(col("keep"), col("y")).as[(Long, Long)].collect()
    // the untrained (all-zero) model predicts keep=1 everywhere —
    // balanced accuracy 0.5 exactly. Training with class-balanced
    // gradients must lift BOTH per-class recalls off the floor.
    val pos = joined.filter(_._2 == 1L)
    val neg = joined.filter(_._2 == 0L)
    assert(pos.nonEmpty && neg.nonEmpty, "fixture lost a class")
    val recP = pos.count(_._1 == 1L).toDouble / pos.length
    val recN = neg.count(_._1 == 0L).toDouble / neg.length
    val bacc = (recP + recN) / 2
    assert(bacc > 0.6, s"balanced acc $bacc (recP=$recP recN=$recN) barely beats all-ones 0.5")
  }

  test("familiarity floor-divides the integer ratios") {
    // doc 1: bigrams "a b" (corpus cnt 2: docs 1,2) and "b z" (cnt 1)
    // -> freq_sum 3, n_bigrams 2 -> avg 1 (floor 1.5), rare 500
    val docs = Seq((1L, "a b z"), (2L, "a b")).toDF("doc_id", "text")
    val out = CorpusStats.familiarity(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 1L, 500L)))
    assert(out(2L) == ((2L, 1L, 2L, 0L)))
  }

  test("importance scoring tilts toward the planted domain: docs " +
    "sharing the target's bigrams keep, disjoint docs drop, empty " +
    "docs score zero") {
    // target domain: medical-ish bigram space
    val target = Seq(
      "patient dose trial patient dose outcome",
      "dose trial outcome patient dose trial")
      .toDF("text")
    val corpus = Seq(
      (1L, "patient dose trial outcome patient dose"), // in-domain
      (2L, "stock market price stock market index"),   // out-of-domain
      (3L, "patient dose stock market patient dose"),  // mixed
      (4L, "x"))                                       // no bigrams
      .toDF("doc_id", "text")
    val out = CorpusStats.importanceScore(
      corpus, col("doc_id"), col("text"), target, col("text"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._4 == 1L, s"in-domain doc must keep: ${out(1L)}")
    assert(out(2L)._4 == 0L, s"out-of-domain doc must drop: ${out(2L)}")
    assert(out(1L)._3 > out(3L)._3 && out(3L)._3 > out(2L)._3,
      s"scores must order in-domain > mixed > out: $out")
    assert(out(4L) == ((4L, 0L, 0L, 0L)), "no-bigram doc scores zero")
  }

  test("from-features scoring paths are row-identical to the re-scan spellings") {
    // the shared-feature-table spellings (one tokenize/bigram pass for
    // train + score) must reproduce the original operators bit-exactly,
    // including the no-token / no-bigram edge docs
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .unionByName(Seq((900001L, "x", "en", "webz", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val w = CorpusStats.syntheticWeights(spark, 512)
      .select(col("bucket"), col("w_milli"))
    val (tok, _) = CorpusStats.classifierFeatures(
      docs, col("doc_id"), col("text"), buckets = 512)
    val a = CorpusStats.classifierScore(
      docs, col("doc_id"), col("text"), w, buckets = 512)
    val b = CorpusStats.classifierScoreFromFeatures(tok, w)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "classifier scoring diverged between spellings")

    val target = docs.filter(col("doc_id") % 20 === 0)
    val iw = CorpusStats.importanceWeights(
      docs, col("text"), target, col("text"), buckets = 512)
    val cnts = CorpusStats.bigramBucketCounts(
      docs, col("doc_id"), col("text"), buckets = 512)
    val iw2 = CorpusStats.importanceWeightsFromCounts(
      cnts, target, col("text"), buckets = 512)
    assert(iw.exceptAll(iw2).isEmpty && iw2.exceptAll(iw).isEmpty,
      "importance weights diverged between spellings")
    val s1 = CorpusStats.scoreWithImportanceWeights(
      docs, col("doc_id"), col("text"), iw, buckets = 512)
    val s2 = CorpusStats.scoreWithImportanceWeightsFromCounts(cnts, iw2)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty,
      "importance scoring diverged between spellings")
  }
}
