package graft.functions

import graft.SparkSpec
import graft.operators.{Dedup, TextAnalysis}
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** The native signature kernels must be value-identical to the
  * declarative higher-order-function definitions (which in turn are
  * what the DuckDB oracles replay).
  */
class SignatureKernelsSpec extends SparkSpec {

  private def docs = Tables.load(spark, Sf0001, "documents")

  test("native minhash == declarative Kirsch-Mitzenmacher fold on real docs") {
    val diff = docs
      .select(
        MinHashSig(Dedup.shingles(col("text"), 3), 16).as("native"),
        Dedup.minHashFromHashes(Dedup.shingleHashes(col("text"), 3), 16).as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff == 0L)
  }

  test("fused tokens->minhash kernel == shingle-column kernel on real docs") {
    val diff = docs
      .select(
        MinHashSigTokens(TextAnalysis.tokens(col("text")), 3, 16).as("fused"),
        MinHashSig(Dedup.shingles(col("text"), 3), 16).as("staged"))
      .filter(col("fused") =!= col("staged"))
      .count()
    assert(diff == 0L)
  }

  test("native simhash and rolling hash == declarative folds on real docs") {
    val diff = docs
      .select(
        SimHash32(TextAnalysis.tokens(col("text"))).as("sh_native"),
        Dedup.simHashFromHashes(Dedup.tokenHashes32(col("text"))).as("sh_decl"),
        RollingHash32(TextAnalysis.tokens(col("text"))).as("rh_native"),
        TextAnalysis.rollingHashDeclarative(col("text")).as("rh_decl"))
      .filter(col("sh_native") =!= col("sh_decl") || col("rh_native") =!= col("rh_decl"))
      .count()
    assert(diff == 0L)
  }

  test("native simhash64 == per-word declarative majority vote on real docs") {
    // word q of a token's 64-bit md5-prefix hash = hex chars
    // 13-4q..16-4q; compare the kernel word-by-word (assembling the
    // packed long declaratively would overflow under ANSI arithmetic)
    def wordOf(tok: org.apache.spark.sql.Column, q: Int) =
      conv(substring(md5(tok), 13 - 4 * q, 4), 16, 10).cast("bigint")
    def declWord(q: Int) = {
      val toks = TextAnalysis.tokens(col("text"))
      (0 until 16).map { j =>
        when(aggregate(transform(toks, t =>
          when(wordOf(t, q).bitwiseAND(lit(1L << j)) =!= 0L, 1).otherwise(-1)),
          lit(0), _ + _) > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val native = SimHash64(TextAnalysis.tokens(col("text")))
    val ok = (0 until 4).map(q =>
      shiftrightunsigned(native, 16 * q).bitwiseAND(lit(0xFFFFL)) === declWord(q))
      .reduce(_ && _)
    assert(docs.select(ok.as("ok")).filter(!col("ok")).count() == 0L)
  }

  test("native shingle hashes == declarative distinct portable-56 hashes") {
    val diff = docs
      .select(
        ShingleHashes56(TextAnalysis.tokens(col("text")), 3).as("native"),
        array_distinct(transform(Dedup.shingleHashes(col("text"), 3),
          e => e.getField("h1"))).as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff == 0L)
  }

  test("native positional shingle hashes == declarative per-window portable-56") {
    val toks = TextAnalysis.tokens(col("text"))
    val decl = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - lit(3)),
        i => TextAnalysis.portableHash56(array_join(slice(toks, i + lit(1), lit(3)), " "))))
      .otherwise(array().cast("array<bigint>"))
    val diff = docs
      .select(
        ShingleHashesAll56(toks, 3).as("native"),
        decl.as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff == 0L)
    // sub-k input -> empty array, not null
    import spark.implicits._
    val short = Seq("one two").toDF("text")
      .select(ShingleHashesAll56(TextAnalysis.tokens(col("text")), 3).as("h"))
      .as[Seq[Long]].collect()
    assert(short.head.isEmpty)
  }

  test("native shingle strings == declarative per-window join") {
    val toks = TextAnalysis.tokens(col("text"))
    val diff = docs
      .select(
        ShingleStrings(toks, 3).as("native"),
        graft.operators.CorpusStats.ngramStringsDeclarative(toks, 3).as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff == 0L)
    import spark.implicits._
    val short = Seq("one two").toDF("text")
      .select(ShingleStrings(TextAnalysis.tokens(col("text")), 3).as("s"))
      .as[Seq[String]].collect()
    assert(short.head.isEmpty)
  }

  test("native normalize == declarative trim/collapse/lower, incl. edge whitespace") {
    import spark.implicits._
    val edge = Seq("  Hello\t\tWorld ", "\tTAB edges\n", "ÜPPER Case", "", "  ",
      "multi   space\r\nmix").toDF("text")
    val diff = docs.select(col("text")).union(edge)
      .select(
        TextAnalysis.normalize(col("text")).as("native"),
        TextAnalysis.normalizeDeclarative(col("text")).as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff == 0L)
  }

  test("empty and sub-shingle-size inputs hit the sentinel paths") {
    import spark.implicits._
    val edge = Seq((0L, ""), (1L, "one two")).toDF("doc_id", "text")
    val sigs = edge.select(
      MinHashSig(Dedup.shingles(col("text"), 3), 4).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs.forall(_.forall(_ == SignatureKernels.MinHashMod)))
  }
}
