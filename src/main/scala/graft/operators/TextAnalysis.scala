package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines: normalization,
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything is Column-based (higher-order functions over token arrays,
  * no UDFs) so it stays in whole-stage codegen and is embarrassingly
  * parallel — no shuffle at all for per-document features; a 100 TB
  * corpus maps straight through.
  */
object TextAnalysis {

  /** Whitespace-collapsed, trimmed, lowercased normal form. */
  def normalize(text: Column): Column =
    graft.functions.NormalizeText(text)

  /** The declarative spelling of [[normalize]] — the portable
    * reference the native kernel is spec-checked against (and what
    * the DuckDB oracles replay).
    */
  def normalizeDeclarative(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** Whitespace tokenization (the BPE-ish regex variant splits on
    * non-word boundaries too — same machinery, different pattern).
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word-punctuation split ("BPE-ish"): words, digits runs, punct. */
  def subTokens(text: Column): Column =
    filter(split(lower(text), "(?=[^a-z0-9])|(?<=[^a-z0-9])"), t => length(trim(t)) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Characters excluding whitespace. */
  def charsNoSpace(text: Column): Column =
    length(regexp_replace(trim(text), "\\s+", ""))

  /** Mean token length in exact milli-chars (int64, oracle-stable). */
  def avgTokenLenMilli(text: Column): Column =
    round(lit(1000.0) * charsNoSpace(text) / tokenCount(text)).cast("bigint")

  /** Stopword hits (tiny built-in list; real pipelines pass their own). */
  def stopwordHits(text: Column, stopwords: Seq[String] = Seq("the", "a")): Column =
    size(filter(tokens(text), t => stopwords.map(t === _).reduce(_ || _)))

  /** Quality score in milli-units: stopword ratio (a cheap fluency
    * proxy), penalized for extreme length. Deterministic integer output.
    */
  def qualityMilli(text: Column): Column =
    round(lit(1000.0) * stopwordHits(text) / tokenCount(text)).cast("bigint")

  def qualityBand(text: Column): Column = {
    val q = qualityMilli(text)
    when(q >= 100, "high").when(q >= 30, "medium").otherwise("low")
  }

  /** Within-document repetition: per-mille share of k-token shingles
    * that are repeats of an earlier shingle (1000·(n−distinct)/n; 0
    * for docs too short to shingle). The standard boilerplate/spam
    * signal a quality gate thresholds on — high repetition ≈ templated
    * or looping text. Pure per-row column, no shuffle.
    */
  def repetitionMilli(text: Column, k: Int): Column = {
    val sh = Dedup.shingles(text, k)
    when(size(sh) === 0, lit(0L)).otherwise(
      round(lit(1000.0) * (size(sh) - size(array_distinct(sh))) / size(sh))
        .cast("bigint"))
  }

  /** Content-hash fingerprint of the normal form (md5 — exact-dup key). */
  def fingerprintMd5(text: Column): Column = md5(normalize(text))

  /** Scrubbing regexes — deliberately RE2-compatible (no lookaround,
    * no backrefs) so the same pattern text runs identically in Spark's
    * Java regex and the DuckDB oracle's RE2.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val LongNumRe = "\\d{9,}"

  /** Drop markup tags (the `<...>` boilerplate strip that precedes
    * quality scoring on scraped corpora). Pure per-row column.
    */
  def stripMarkup(text: Column): Column =
    regexp_replace(text, "<[^>]+>", " ")

  /** PII redaction: emails → `[EMAIL]`, IPv4s → `[IP]`, long digit
    * runs (ids/phones) → `[NUM]` — the scrub pass a training corpus
    * runs before anything ships. Order matters: emails first so their
    * user/host digits can't half-match the later patterns. Stateless
    * codegen'd chain, no shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      LongNumRe, "[NUM]")

  /** Engine-portable integer hash: a slice of the md5 hex digest read
    * as a base-16 number. Unlike Spark's murmur3 `hash()`, any SQL
    * engine with `md5` can reproduce it bit-exactly — which is what
    * lets the minhash/simhash/rolling-hash signatures be verified by an
    * independent oracle. `len` ≤ 15 keeps the value inside int64.
    */
  private def hexSlice(s: Column, start: Int, len: Int): Column =
    conv(substring(md5(s), start, len), 16, 10).cast("bigint")

  /** 56-bit portable hash (first 14 hex digits of md5). */
  def portableHash56(s: Column): Column = hexSlice(s, 1, 14)

  /** Independent second 56-bit portable hash (next 14 hex digits) —
    * with [[portableHash56]] forms the Kirsch–Mitzenmacher double-
    * hashing base: h_j(x) = (h1 + j·h2) mod 2^56 gives an arbitrarily
    * large family from ONE md5 per input.
    */
  def portableHash56b(s: Column): Column = hexSlice(s, 15, 14)

  /** 32-bit portable hash (first 8 hex digits of md5). */
  def portableHash32(s: Column): Column = hexSlice(s, 1, 8)

  /** Rolling polynomial hash over portable 32-bit token hashes
    * (order-sensitive — distinguishes permuted documents where a
    * bag-of-words hash does not). Native kernel
    * ([[graft.functions.RollingHash32]]); value-identical to
    * [[rollingHashDeclarative]], no UDF, no shuffle,
    * oracle-reproducible.
    */
  def rollingHash(text: Column): Column =
    graft.functions.RollingHash32(tokens(text))

  /** The declarative (higher-order-fold) definition of [[rollingHash]]
    * — the portable reference the native kernel is spec-checked
    * against. Modular (2^31-1) so the fold never overflows ANSI int64
    * math: acc < 2^31, acc*31 + 32-bit hash < 2^37.
    */
  def rollingHashDeclarative(text: Column): Column =
    aggregate(tokens(text), lit(7L),
      (acc, t) => pmod(acc * lit(31L) + portableHash32(t), lit(2147483647L)))

  /** Language ID: n-gram/stopword profile scoring. Each candidate
    * language has a tiny marker profile; score = marker hit ratio over
    * tokens + charset evidence; winner takes the label. On latin-script
    * synthetic corpora this degrades gracefully to the dominant class —
    * the spec exercises real per-language markers.
    */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "de", "que", "los", "las"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq() // non-latin charset evidence only
  )

  def langScores(text: Column): Column = {
    val toks = tokens(lower(text))
    val latinRatio = // charset evidence: fraction of non-ascii chars
      (length(regexp_replace(text, "[\\x00-\\x7F]", "")) + lit(1)).cast("double") /
        (length(text) + lit(1))
    val entries = LangProfiles.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val hits =
        if (markers.isEmpty) round(lit(1000.0) * latinRatio).cast("bigint")
        else round(lit(1000.0) * size(filter(toks, t => markers.map(t === _).reduce(_ || _))) /
          size(toks)).cast("bigint")
      struct(lit(lang).as("lang"), hits.as("score"))
    }
    array(entries: _*)
  }

  /** argmax over [[langScores]] (ties broken by language name order). */
  def predictedLang(text: Column): Column = {
    val best = array_max(transform(langScores(text),
      e => struct(e.getField("score").as("score"), e.getField("lang").as("lang"))))
    best.getField("lang")
  }

  def predictedLangConfidenceMilli(text: Column): Column =
    array_max(transform(langScores(text), _.getField("score")))
}
