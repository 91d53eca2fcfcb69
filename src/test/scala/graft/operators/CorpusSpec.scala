package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"), // shares "alpha beta gamma" with bench
    (2L, "totally unrelated words with nothing shared at all"),
    (3L, "xx"), // fewer than 3 tokens -> no shingles, never contaminated
    (4L, "one two three four five six seven")
  ).toDF("doc_id", "text")
  private val bench = Seq(
    (100L, "alpha beta gamma something else entirely"),
    (101L, "one two three and more")
  ).toDF("doc_id", "text")

  test("contamination flags shared 3-shingles and keeps clean docs at zero") {
    val out = Corpus.contamination(
      corpus, col("doc_id"), col("text"), bench, col("text"), k = 3)
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, n, c) => id -> ((n, c)) }.toMap
    assert(out(1L) == (1L, true)) // "alpha beta gamma"
    assert(out(2L) == (0L, false))
    assert(out(3L) == (0L, false)) // short doc still present
    assert(out(4L) == (1L, true)) // "one two three"
    assert(out.size == 4)
  }

  test("stratified sample is deterministic and tracks per-stratum rates") {
    val n = 4000
    val df = spark.range(n).select(
      col("id").as("doc_id"),
      when(col("id") % 2 === 0, "en").otherwise("zh").as("lang"))
    val rates = Map("en" -> 100, "zh" -> 700)
    val s1 = Corpus.stratifiedSample(df, col("doc_id"), col("lang"), rates, 300)
      .as[(Long, String)].collect().toSet
    val s2 = Corpus.stratifiedSample(df, col("doc_id"), col("lang"), rates, 300)
      .as[(Long, String)].collect().toSet
    assert(s1 == s2) // same rows every run
    val en = s1.count(_._2 == "en").toDouble / (n / 2)
    val zh = s1.count(_._2 == "zh").toDouble / (n / 2)
    assert(math.abs(en - 0.100) < 0.03, s"en rate $en")
    assert(math.abs(zh - 0.700) < 0.03, s"zh rate $zh")
  }

  test("mixtureRates keeps the binding stratum whole and scales the rest exactly") {
    val d = Seq(
      // stratum A: 1000 tokens, target 500 -> ratio 2 (binding)
      (1L, "A", 600L), (2L, "A", 400L),
      // stratum B: 10000 tokens, target 500 -> ratio 20
      (3L, "B", 10000L),
      // stratum C: not in the target mixture -> no rate row
      (4L, "C", 777L))
      .toDF("doc_id", "lang", "n_tokens")
    val rates = Corpus.mixtureRates(
      d, col("lang"), col("n_tokens"), Map("A" -> 500, "B" -> 500))
      .select("stratum", "rate_permille").as[(String, Long)].collect().toMap
    assert(rates == Map("A" -> 1000L, "B" -> 100L)) // 1000*500*1000/(500*10000)
    val kept = Corpus.rebalance(
      d, col("doc_id"), col("lang"), col("n_tokens"), Map("A" -> 500, "B" -> 500))
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(2L)) // binding stratum keeps all
    assert(!kept.contains(4L)) // unlisted stratum dropped
  }

  test("temperatureRates: smallest stratum binds, rates follow sqrt upweighting exactly") {
    val d = Seq(
      (1L, "small", 100L),          // T=100,  w=10
      (2L, "mid", 10000L),          // T=10^4, w=100
      (3L, "big", 1000000L))        // T=10^6, w=1000
      .toDF("doc_id", "src", "n_tokens")
    val rates = Corpus.temperatureRates(d, col("src"), col("n_tokens"))
      .select("stratum", "weight", "rate_permille")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rates("small")._2 == 10L && rates("mid")._2 == 100L && rates("big")._2 == 1000L)
    // binding = smallest; rate_s = fdiv(w_s * fdiv(1e6*T_m, T_s), 1000*w_m)
    assert(rates("small")._3 == 1000L)
    assert(rates("mid")._3 == 100L)  // 100 * 10000 / (1000*10) = 100
    assert(rates("big")._3 == 10L)   // 1000 * 100 / (1000*10)  = 10
  }

  test("integer-verified isqrt is exact at perfect-square boundaries") {
    // t = k^2 and k^2 - 1 straddle the double-sqrt rounding edge
    val d = Seq(
      (1L, "a", 99999999L),   // 10000^2 - 1 -> isqrt 9999
      (2L, "b", 100000000L),  // 10000^2     -> isqrt 10000
      (3L, "c", 100000001L))  // 10000^2 + 1 -> isqrt 10000
      .toDF("doc_id", "src", "n_tokens")
    val w = Corpus.temperatureRates(d, col("src"), col("n_tokens"))
      .select("stratum", "weight").as[(String, Long)].collect().toMap
    assert(w == Map("a" -> 9999L, "b" -> 10000L, "c" -> 10000L))
  }

  test("temperatureSample keeps ~rate_permille of each stratum, deterministically") {
    val d = (0L until 4000L).map(i =>
      (i, if (i < 200) "tail" else "head", 10L)).toDF("doc_id", "src", "n_tokens")
    val kept = Corpus.temperatureSample(d, col("doc_id"), col("src"), col("n_tokens"))
    val byStratum = kept.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    // tail binds (rate 1000): every tail row survives
    assert(byStratum("tail") == 200L)
    // head rate = sqrt(200/3800) scaled: fdiv staging gives 229 permille
    val headRate = kept.filter(col("src") === "head")
      .select("rate_permille").distinct().as[Long].head()
    assert(headRate > 150L && headRate < 300L, s"head rate $headRate")
    val frac = byStratum("head").toDouble / 3800
    assert(math.abs(frac - headRate / 1000.0) < 0.05,
      s"kept $frac of head at rate $headRate")
    // deterministic: a second run keeps the identical id set
    val again = Corpus.temperatureSample(d, col("doc_id"), col("src"), col("n_tokens"))
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.select("doc_id").as[Long].collect().toSet)
  }

  test("repetitionMilli scores repeated shingles and zeroes short docs") {
    val d = Seq(
      (1L, "a a a a"), // 3 bigrams, 1 distinct -> 667
      (2L, "one two three four"), // all distinct -> 0
      (3L, "x")) // too short to shingle -> 0
      .toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
      TextAnalysis.repetitionMilli(col("text"), 2).as("r"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 667L, 2L -> 0L, 3L -> 0L))
  }

  test("topKeywords ranks rare terms above ubiquitous ones, integer-exact") {
    val d = Seq(
      (1L, "common common zebra common"),
      (2L, "common words here"),
      (3L, "common words again")).toDF("doc_id", "text")
    val out = Corpus.topKeywords(d, col("doc_id"), col("text"), k = 2)
      .select("doc_id", "token", "score")
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // doc 1: zebra (tf=1, df=1, idf=3e6) ties common (tf=3, df=3, idf=1e6)
    // at score 3_000_000 — both make the top-2
    assert(out(1L) == Set("zebra", "common"))
    // doc 2/3: the df=2 words (idf floor 1_500_000) beat common (1_000_000)
    assert(out(2L).toSet == Set("words", "here"))
    assert(out(3L).toSet == Set("words", "again"))
  }

  test("packChunks assigns chunks by running token offset within a group") {
    val df = Seq(
      (1L, "g", 300L), (2L, "g", 300L), (3L, "g", 300L), (4L, "g", 50L),
      (10L, "h", 600L), (11L, "h", 10L)
    ).toDF("doc_id", "grp", "n_tokens")
    val out = Corpus.packChunks(df, col("doc_id"), col("grp"), col("n_tokens"), 512L)
      .select("doc_id", "start_offset", "chunk_id", "chunk_pos")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, 0L, 0L, 1L), // starts at 0 -> chunk 0
      (2L, 300L, 0L, 2L), // starts at 300 -> chunk 0 (spans into 1)
      (3L, 600L, 1L, 1L), // starts at 600 -> chunk 1
      (4L, 900L, 1L, 2L),
      (10L, 0L, 0L, 1L), // group h independent
      (11L, 600L, 1L, 1L)))
  }

  test("packChunks start offsets are contiguous (sum of preceding tokens)") {
    val df = spark.range(200).select(
      col("id").as("doc_id"), lit("g").as("grp"), (col("id") % 7 + 1).as("n_tokens"))
    val out = Corpus.packChunks(df, col("doc_id"), col("grp"), col("n_tokens"), 64L)
      .select("doc_id", "n_tokens", "start_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    out.foldLeft(0L) { case (expect, (_, nt, off)) =>
      assert(off == expect); expect + nt
    }
  }

  test("packSequences tiles every sequence exactly and reassembles every doc") {
    val df = spark.range(300).select(
      col("id").as("doc_id"), (col("id") % 3).cast("string").as("grp"),
      (col("id") % 11 + 1).as("n_tokens"))
    val L = 64L
    val out = Corpus.packSequences(df, col("doc_id"), col("grp"), col("n_tokens"), L)
      .as[(Long, String, Long, Long, Long, Long, Long, Boolean)].collect()

    // per document: pieces are contiguous in doc_begin and sum to n_tokens
    val tokensOf = df.select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    out.groupBy(_._1).foreach { case (doc, pieces) =>
      val sorted = pieces.sortBy(_._3) // by seq_id
      assert(sorted.head._6 == 0L && sorted.head._8, s"doc $doc must open with a starts_doc piece")
      assert(sorted.tail.forall(!_._8))
      sorted.foldLeft(0L) { case (pos, p) =>
        assert(p._6 == pos, s"doc $doc pieces must be contiguous"); pos + p._7
      }
      assert(sorted.map(_._7).sum == tokensOf(doc))
    }
    // per (grp, seq): pieces tile [0, L) with no gaps/overlaps; every
    // sequence except the group's last is exactly full
    out.groupBy(p => (p._2, p._3)).foreach { case ((g, seq), pieces) =>
      val sorted = pieces.sortBy(_._4)
      sorted.foldLeft(sorted.head._4) { case (pos, p) =>
        assert(p._4 == pos, s"($g,$seq) pieces must tile"); p._5
      }
      assert(sorted.head._4 == 0L)
    }
    val lastSeq = out.groupBy(_._2).map { case (g, ps) => g -> ps.map(_._3).max }
    out.groupBy(p => (p._2, p._3)).foreach { case ((g, seq), pieces) =>
      if (seq != lastSeq(g))
        assert(pieces.map(_._7).sum == L, s"($g,$seq) must be a full sequence")
    }
  }

  test("decontaminateScrub cuts exactly the benchmark spans and keeps the rest") {
    val bench = Seq((100L, "secret eval question here")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro words secret eval question here outro words"), // quoted once
      (2L, "totally unrelated clean document text"),
      (3L, "secret eval question here")) // fully contaminated
      .toDF("doc_id", "text")
    val out = Corpus.decontaminateScrub(
      corpus, col("doc_id"), col("text"), bench, col("text"), k = 3)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1: the 4 shared shingle windows cover "secret eval question
    // here" plus the adjacent windows' overlap — the planted quote and
    // nothing outside the covering windows survives removal
    assert(out(1L)._2 == "intro words outro words")
    assert(out(1L)._3 == 4L && out(1L)._4 == 4L)
    assert(out(2L) == (2L, "totally unrelated clean document text", 5L, 0L))
    assert(out(3L)._2 == "" && out(3L)._3 == 0L)
  }

  test("corpusDiff classifies added/removed/changed/unchanged; whitespace churn is not change") {
    val old = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "kept text"), (4L, "will vanish"))
      .toDF("doc_id", "text")
    val neu = Seq(
      (1L, "  ALPHA   beta "), // same fingerprint after normalize
      (2L, "gamma delta edited"), // changed
      (3L, "kept text"), // unchanged
      (5L, "brand new")) // added; 4 removed
      .toDF("doc_id", "text")
    val out = Corpus.corpusDiff(old, col("doc_id"), col("text"),
      neu, col("doc_id"), col("text"))
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "added"))
  }

  test("trainingShards is a deterministic permutation; seed reshuffles") {
    val docs = spark.range(200).toDF("doc_id")
    def run(seed: String) =
      Corpus.trainingShards(docs, col("doc_id"), seed, 8)
        .select("doc_id", "shard", "pos")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
    val a = run("s1")
    assert(a.sameElements(run("s1"))) // reproducible
    assert(a.map(_._1).toSet == (0L until 200L).toSet) // a permutation
    assert(a.forall(r => r._2 >= 0 && r._2 < 8))
    // within each shard, pos is exactly 1..count
    a.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.length).toSeq)
    }
    // a different seed produces a different order
    val b = run("s2")
    assert(!a.sameElements(b))
  }

  test("lineDedup matches a brute-force reference on seeded random corpora") {
    val vocab = Vector(
      "alpha beta gamma delta epsilon!", "the common navigation banner line",
      "another substantial sentence of text", "short", "--", "",
      "terms of service apply to all pages")
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val corpus = (0L until 30L).map { id =>
        val n = 1 + rnd.nextInt(6)
        (id, Seq.fill(n)(
          vocab(rnd.nextInt(vocab.length)) +
            (if (rnd.nextBoolean()) "" else s" ${rnd.nextInt(3)}")).mkString("\n"))
      }
      // reference: first occurrence corpus-wide in (doc_id, line_idx) order
      val seen = scala.collection.mutable.Set[String]()
      val expected = corpus.map { case (id, text) =>
        val lines = text.split("\n", -1)
        val kept = lines.filter { l =>
          // eligibility on the NORMALIZED form, like the operator
          if (l.trim.toLowerCase.count(!_.isWhitespace) < 10) true
          else { val fp = l.trim.toLowerCase; seen.add(fp) }
        }
        (id, kept.mkString("\n"), kept.length.toLong,
          (lines.length - kept.length).toLong)
      }
      val got = Corpus.lineDedup(
        corpus.toDF("doc_id", "text"), col("doc_id"), col("text"))
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == expected)
    }
  }

  test("lineDedup keeps a substantial line only at its first corpus occurrence") {
    val banner = "Subscribe to our newsletter for updates!"
    val docs = Seq(
      (1L, s"Unique opening line one.\n$banner\nshort"),
      (2L, s"$banner\nAnother unique body line here.\n$banner"),
      (3L, banner),          // fully boilerplate once deduped
      (4L, "tiny\n--\nok"))  // nothing substantial: untouched
      .toDF("doc_id", "text")
    val out = Corpus.lineDedup(docs, col("doc_id"), col("text"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, s"Unique opening line one.\n$banner\nshort", 3L, 0L)))
    // doc 2 loses BOTH banner copies (doc 1 owns the first occurrence)
    assert(out(1) == ((2L, "Another unique body line here.", 1L, 2L)))
    assert(out(2) == ((3L, "", 0L, 1L)))
    assert(out(3) == ((4L, "tiny\n--\nok", 3L, 0L)))
    // normalization: case/edge-whitespace variants are the same line
    val norm = Corpus.lineDedup(
      Seq((1L, "The Quick Brown Fox Jumps"), (2L, "  the quick brown fox jumps  "))
        .toDF("doc_id", "text"), col("doc_id"), col("text"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(norm(0)._3 == 1L && norm(1)._2 == "" && norm(1)._4 == 1L)
  }
}
