package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

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

  test("familiarity floor-divides the integer ratios") {
    // doc 1: bigrams "a b" (corpus cnt 2: docs 1,2) and "b z" (cnt 1)
    // -> freq_sum 3, n_bigrams 2 -> avg 1 (floor 1.5), rare 500
    val docs = Seq((1L, "a b z"), (2L, "a b")).toDF("doc_id", "text")
    val out = CorpusStats.familiarity(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 1L, 500L)))
    assert(out(2L) == ((2L, 1L, 2L, 0L)))
  }
}
