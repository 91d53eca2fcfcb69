package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpansSpec extends SparkSpec {
  import spark.implicits._

  test("spanDedup keeps the first occurrence and cuts later repeats") {
    val span = "a b c d e f g h" // exactly k=8 tokens
    val docs = Seq(
      (1L, s"intro one two $span tail1 x"),
      (2L, s"$span other words entirely here"),
      (3L, "no duplicated material at all in this document")
    ).toDF("doc_id", "text")
    val out = Spans.spanDedup(docs, col("doc_id"), col("text"), k = 8, minCount = 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1 holds the corpus-wide first occurrence (min doc_id) -> intact
    assert(out(1L)._2 == s"intro one two $span tail1 x")
    assert(out(1L)._4 == 0L)
    // doc 2's copy is a later repeat -> its 8 tokens are cut
    assert(out(2L)._2 == "other words entirely here")
    assert(out(2L)._3 == 4L && out(2L)._4 == 8L)
    assert(out(3L)._4 == 0L)
  }

  test("spanDedup unions overlapping duplicated spans positionally") {
    // doc 2 repeats a 10-token run from doc 1: three overlapping 8-token
    // windows are all duplicated; coverage is their union (10 tokens)
    val run = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val docs = Seq(
      (1L, s"$run unique ending here"),
      (2L, s"start pad $run closing words")
    ).toDF("doc_id", "text")
    val out = Spans.spanDedup(docs, col("doc_id"), col("text"), k = 8, minCount = 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._4 == 0L)
    assert(out(2L)._2 == "start pad closing words")
    assert(out(2L)._4 == 10L)
  }

  test("spanDedup leaves sub-k documents and unique text untouched") {
    val docs = Seq(
      (1L, "short doc"),
      (2L, "seven tokens is less than the window"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Spans.spanDedup(docs, col("doc_id"), col("text"), k = 8, minCount = 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, "short doc", 2L, 0L)))
    assert(out(2L)._4 == 0L)
    assert(out(3L)._3 == 1L) // split("") == [""] — one empty token, kept
  }

  test("chunkDocs splits with overlap and a remainder final chunk") {
    val toks = (1 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, toks), (2L, "tiny doc")).toDF("doc_id", "text")
    val out = Spans.chunkDocs(docs, col("doc_id"), col("text"), maxTokens = 10, overlap = 3)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    // stride 7: chunks at offsets 0,7,14 then remainder check:
    // n=25 -> nChunks = 1 + ceil(15/7) = 4 (offsets 0,7,14,21)
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d1(0)._3 == (1 to 10).map(i => s"w$i").mkString(" "))
    assert(d1(1)._3 == (8 to 17).map(i => s"w$i").mkString(" "))
    assert(d1(3)._3 == (22 to 25).map(i => s"w$i").mkString(" ")) // remainder
    assert(d1.map(_._4).toSeq == Seq(10L, 10L, 10L, 4L))
    // consecutive chunks share exactly `overlap` tokens
    assert(d1(0)._3.split(" ").takeRight(3).toSeq == d1(1)._3.split(" ").take(3).toSeq)
    val d2 = out.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0L, "tiny doc", 2L)))
  }

  test("spanDedup matches a brute-force reference on seeded random corpora") {
    val k = 4
    for (seed <- Seq(7L, 42L)) {
      val rnd = new scala.util.Random(seed)
      // tiny vocab forces organic span repeats
      val corpus = (1 to 40).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(12) + 2)(s"t${rnd.nextInt(5)}").mkString(" "))
      }
      // brute force: count spans, keep-first, positional union
      val wins = corpus.flatMap { case (id, text) =>
        val toks = text.split(" ")
        (0 to toks.length - k).map(s => (toks.slice(s, s + k).mkString(" "), id, s))
      }
      val byText = wins.groupBy(_._1)
      val covered = byText.values.flatMap { occ =>
        if (occ.size < 2) Seq.empty
        else occ.sortBy(o => (o._2, o._3)).drop(1)
          .flatMap(o => (o._3 + 1 to o._3 + k).map(p => (o._2, p)))
      }.toSet
      val expect = corpus.map { case (id, text) =>
        val toks = text.split(" ")
        val kept = toks.zipWithIndex.collect {
          case (t, i) if !covered((id, i + 1)) => t
        }
        id -> ((id, kept.mkString(" "), kept.length.toLong,
          (toks.length - kept.length).toLong))
      }.toMap
      val got = Spans.spanDedup(
        corpus.toDF("doc_id", "text"), col("doc_id"), col("text"),
        k = k, minCount = 2)
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> ((r._1, r._2, r._3, r._4))).toMap
      assert(got == expect, s"seed $seed diverged")
    }
  }

  test("chunkDocs covers every token exactly once outside overlaps") {
    val n = 103
    val toks = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, toks)).toDF("doc_id", "text")
    val m = 16; val o = 4; val stride = m - o
    val chunks = Spans.chunkDocs(docs, col("doc_id"), col("text"), m, o)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    // stitching chunk 0 + the non-overlap suffix of each later chunk
    // reproduces the document verbatim
    val stitched = (chunks.head._3.split(" ") ++
      chunks.tail.flatMap(_._3.split(" ").drop(o))).mkString(" ")
    assert(stitched == toks)
    // every chunk except the last is full-size
    assert(chunks.init.forall(_._4 == m.toLong))
    assert(chunks.last._4 == (n - (chunks.length - 1) * stride).toLong)
  }

  test("token-array overloads: whitespace arrays reproduce the text forms; plugged tokenizers change boundaries") {
    val docs = Seq(
      (1L, "Alpha-beta, gamma! alpha-beta gamma delta."),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    // whitespace array == text overload, bit-identical
    val viaText = Spans.chunkDocs(docs, col("doc_id"), col("text"), 4, 1)
      .as[(Long, Long, String, Long)].collect().toSet
    val viaToks = Spans.chunkDocsTokens(docs, col("doc_id"),
      TextAnalysis.tokens(col("text")), 4, 1)
      .as[(Long, Long, String, Long)].collect().toSet
    assert(viaText == viaToks)
    val sdText = Spans.spanDedup(docs, col("doc_id"), col("text"), k = 2)
      .as[(Long, String, Long, Long)].collect().toSet
    val sdToks = Spans.spanDedupTokens(docs, col("doc_id"),
      TextAnalysis.tokens(col("text")), k = 2)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(sdText == sdToks)
    // a plugged punctuation-splitting tokenizer sees different token
    // boundaries: "Alpha-beta," becomes two alphanumeric tokens, so
    // the 2-token span "alpha beta" repeats and gets span-deduped,
    // which the whitespace view ("Alpha-beta," vs "alpha-beta") cannot
    val bpeIsh = filter(
      split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0)
    val sdBpe = Spans.spanDedupTokens(docs, col("doc_id"), bpeIsh, k = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(sdBpe(1L)._4 > 0L, "plugged tokenizer must cut the repeated span")
    val wsDoc1 = sdToks.find(_._1 == 1L).get
    assert(wsDoc1._4 == 0L, "whitespace view has no exact 2-token repeat")
  }
}
