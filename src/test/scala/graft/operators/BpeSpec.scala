package graft.operators

import graft.SparkSpec
import graft.functions.BpeApply
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train recovers the obvious merges of a tiny corpus") {
    // "low" x4, "lower" x2, "newest" x6: first merge must be the pair
    // inside the most frequent character run
    val docs = Seq(
      (1L, "low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest")
    ).toDF("doc_id", "text")
    val merges = Bpe.train(docs, col("text"), numMerges = 4, maxWords = 100)
    assert(merges.length == 4)
    assert(merges.map(_.rank) == Seq(1L, 2L, 3L, 4L))
    // pair counts: (e,s)=6, (e,w)=6, (s,t)=6, (w,e)=8, (n,e)=6, (l,o)=6, (o,w)=6
    // argmax is (w,e) freq 8 ("lower" 2 + "newest" 6)
    assert((merges.head.l, merges.head.r, merges.head.freq) == ("w", "e", 8L))
    // rank 2: after "we", newest = "n e we s t" -> pairs (e,we)=6,(we,s)=6,
    // (s,t)=6,(n,e)=6, low/lower give (l,o)=6,(o,w)=4,(o,we)=2,(we,r)=2;
    // six-way tie at 6 -> lexicographically smallest (l, r) = (e, we)
    assert((merges(1).l, merges(1).r, merges(1).freq) == ("e", "we", 6L))
  }

  test("driver-local fit == distributed trainRounds, merge for merge") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val local = Bpe.train(docs, col("text"), numMerges = 6, maxWords = 256)
    val dist = Bpe.trainRounds(docs, col("text"), numMerges = 6, maxWords = 256)
    assert(local == dist)
  }

  test("applyMergeLocal matches mergeFold on overlapping runs") {
    val cases = Seq("a a a", "a a a a", "b a a b", "a", "b b")
    val viaSql = cases.toDF("syms")
      .select(Bpe.mergeFold(col("syms"), lit("a"), lit("a")).as("m"))
      .as[String].collect().toSeq
    val viaLocal = cases.map(s =>
      Bpe.applyMergeLocal(s.split(" "), "a", "a").mkString(" "))
    assert(viaSql == viaLocal)
  }

  test("mergeFold is greedy left-to-right: a merged tail participates immediately") {
    val df = Seq("a a a", "a a a a", "b a a b").toDF("syms")
    val out = df.select(
      Bpe.mergeFold(col("syms"), lit("a"), lit("a")).as("m"))
      .as[String].collect().toSeq
    assert(out == Seq("aa a", "aa aa", "b aa b"))
  }

  test("native kernel == chained HOF folds, including overlapping and cascading merges") {
    // adversarial merge list: self-pair (a,a), a merge consuming a
    // previous merge's output (aa,b), and one that never fires (z,z)
    val merges = Seq(
      BpeMerge(1, "a", "a", 0), BpeMerge(2, "aa", "b", 0),
      BpeMerge(3, "z", "z", 0), BpeMerge(4, "aab", "c", 0))
    val words = Seq("aaab", "aaabc", "abab", "aabaab", "a", "bc",
      "aaaa", "caaabaa", "zzz", "abcabc").toDF("word")
    val both = words.select(
      col("word"),
      BpeApply(col("word"), merges.map(m => (m.l, m.r))).as("kernel"),
      Bpe.encodeSymsHof(col("word"), merges).as("hof"))
      .as[(String, String, String)].collect()
    both.foreach { case (w, k, h) => assert(k == h, s"mismatch on '$w'") }
  }

  test("kernel == HOF chain on the real sf0.001 vocabulary with trained merges") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val merges = Bpe.train(docs, col("text"), numMerges = 8, maxWords = 512)
    // fold one merge per round with materialization between rounds:
    // the one-shot nested encodeSymsHof re-embeds its input expression
    // several times per level (exponential tree in merge count — fine
    // at the adversarial test's 4 merges, pathological at 8)
    var v = docs.select(explode(Bpe.words(col("text"))).as("word"))
      .distinct()
      .withColumn("hof", Bpe.charSyms(col("word")))
      .localCheckpoint(true)
    merges.sortBy(_.rank).foreach { m =>
      v = v.withColumn("hof",
        Bpe.mergeFold(col("hof"), lit(m.l), lit(m.r))).localCheckpoint(true)
    }
    val diff = v.select(
      col("word"),
      BpeApply(col("word"), merges.map(m => (m.l, m.r))).as("kernel"),
      col("hof"))
      .filter(col("kernel") =!= col("hof"))
      .count()
    assert(diff == 0L)
  }

  test("stateless per-doc encode == distinct-word-join encode on the real corpus") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val merges = Bpe.train(docs, col("text"), numMerges = 8, maxWords = 512)
    val a = Bpe.encodeDocs(docs, col("doc_id"), col("text"), merges)
    val b = Bpe.encodeDocsStateless(docs, col("doc_id"), col("text"), merges)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // and the stateless plan really is stateless: no shuffle at all
    val plan = b.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"stateless encode shuffled:\n$plan")
  }

  test("encodeDocs: counts are consistent and docs without tokens keep zeros") {
    val docs = Seq(
      (1L, "aa bb aa"),
      (2L, "!!! ???"), // no [a-z0-9] runs
      (3L, "aa")
    ).toDF("doc_id", "text")
    val merges = Seq(BpeMerge(1, "a", "a", 0), BpeMerge(2, "b", "b", 0))
    val out = Bpe.encodeDocs(docs, col("doc_id"), col("text"), merges)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 6L, 3L))) // 3 words, 6 chars, 3 pieces
    assert(out(2L) == ((2L, 0L, 0L, 0L)))
    assert(out(3L) == ((3L, 1L, 2L, 1L)))
  }

  test("wordFreqs cap is a deterministic total order (freq desc, word asc)") {
    val docs = Seq((1L, "b b b a a c c z")).toDF("doc_id", "text")
    val top = Bpe.wordFreqs(docs, col("text"), maxWords = 3)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("b", 3L), ("a", 2L), ("c", 2L)))
  }

  test("encode pays the fold per distinct word, not per occurrence") {
    // the plan must contain exactly one BpeApply projection, fed by a
    // distinct aggregate — never the exploded token stream directly
    val docs = Seq((1L, "x x x x x x")).toDF("doc_id", "text")
    val plan = Bpe.encodeDocs(docs, col("doc_id"), col("text"),
      Seq(BpeMerge(1, "x", "x", 0)))
      .queryExecution.optimizedPlan.toString()
    assert(plan.contains("bpe_apply"))
    assert(plan.linesIterator.exists(l =>
      l.contains("Aggregate") && l.contains("word")),
      s"expected a distinct-word aggregate under the kernel:\n$plan")
  }
}
