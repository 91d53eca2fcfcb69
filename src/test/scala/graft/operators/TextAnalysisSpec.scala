package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token count, chars, avg length") {
    val df = Seq((1L, "  the  quick  brown fox ")).toDF("id", "text")
    val out = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.charsNoSpace(col("text")),
      TextAnalysis.avgTokenLenMilli(col("text")))
      .as[(Int, Int, Long)].head()
    assert(out == ((4, 16, 4000L)))
  }

  test("quality score counts stopwords") {
    val df = Seq((1L, "the cat sat on a mat")).toDF("id", "text")
    val out = df.select(
      TextAnalysis.stopwordHits(col("text")),
      TextAnalysis.qualityMilli(col("text")))
      .as[(Int, Long)].head()
    assert(out == ((2, 333L)))
  }

  test("langid picks the language with the most marker hits") {
    val df = Seq(
      (1L, "the cat is on the mat and the dog is here"),
      (2L, "le chat et la porte et les fenetres des maisons"),
      (3L, "el perro de la casa que los gatos las ven")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.predictedLang(col("text")))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "fr")
    assert(out(3L) == "es")
  }

  test("subTokens splits punctuation (BPE-ish regex)") {
    val df = Seq((1L, "hello, world! x2")).toDF("id", "text")
    val out = df.select(TextAnalysis.subTokens(col("text"))).as[Seq[String]].head()
    // alnum runs stay whole ("x2"); punctuation becomes its own token
    assert(out == Seq("hello", ",", "world", "!", "x2"))
  }

  test("md5 fingerprint is normalization-invariant") {
    val df = Seq((1L, "Hello   World"), (2L, "hello world")).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprintMd5(col("text"))).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("markup strip + PII redaction scrub tags, emails, ips, long ids") {
    val df = Seq((1L,
      "<div class=x>see</div> mail a.b+c@foo-bar.org or 192.168.0.1 id 1234567890 ok"))
      .toDF("id", "text")
    val out = df.select(
      TextAnalysis.redactPii(TextAnalysis.stripMarkup(col("text")))).as[String].head()
    assert(out == " see  mail [EMAIL] or [IP] id [NUM] ok")
    // short digit runs and plain text survive
    val keep = df.select(TextAnalysis.redactPii(lit("v2 x 123-456"))).as[String].head()
    assert(keep == "v2 x 123-456")
  }
}
