package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-span operators for training-data preparation: duplicated-span
  * removal (the scalable approximation of exact-substring dedup) and
  * long-document chunking for context-window packing. Both are pure
  * declarative plans over a CALLER-SUPPLIED token-array column — the
  * real training-prep contract, where token boundaries come from the
  * model's tokenizer (BPE pieces precomputed upstream), not from the
  * engine. The `text`-taking overloads default to the whitespace
  * tokenization shared with [[TextAnalysis.tokens]]. Everything hashes
  * through the portable md5 family, so a DuckDB oracle reproduces
  * every row bit-exactly under ANY tokenization it can replay.
  * (The sibling [[Corpus.packChunks]] is tokenizer-pluggable the same
  * way — it takes a precomputed token-COUNT column.)
  */
object Spans {

  /** Duplicated-span removal — the distributed approximation of
    * exact-substring training-data dedup (the "dedup repeated k-token
    * substrings corpus-wide" pass run after document-level dedup):
    * every k-token window whose text occurs at least `minCount` times
    * across the corpus is a duplicated span; every occurrence EXCEPT
    * the corpus-wide first (min (doc_id, start)) has its token
    * positions removed, and documents are reassembled from their
    * surviving tokens in order. Keep-first semantics mirror
    * [[Corpus.lineDedup]]: the text survives exactly once, later
    * repeats (license boilerplate, quoted chain mail, copy-pasted
    * code) are cut mid-document even when the documents as a whole are
    * not duplicates.
    *
    * Shape at scale: windows are a narrow per-doc expansion (one
    * 56-bit hash per token position — fixed-width shuffle keys); the
    * occurrence count + first-occurrence choice is ONE groupBy on the
    * window hash whose map-side combine absorbs the hot boilerplate
    * spans (the skew IS the workload, same argument as lineDedup); the
    * join back is keyed the same way; coverage expansion is ×k narrow;
    * reassembly is one per-doc groupBy. No window function over the
    * corpus, no driver state.
    *
    * Returns (doc_id, clean_text, n_kept, n_dropped) for EVERY input
    * document.
    */
  def spanDedup(
      docs: DataFrame, id: Column, text: Column,
      k: Int = 8, minCount: Int = 2): DataFrame =
    spanDedupTokens(docs, id, TextAnalysis.tokens(text), k, minCount)

  /** [[spanDedup]] over a precomputed token-array column (`toks`,
    * array<string>) — plug in any tokenizer (BPE pieces, SentencePiece,
    * a language-specific splitter) computed upstream; `clean_text`
    * reassembles with single spaces between surviving tokens.
    */
  def spanDedupTokens(
      docs: DataFrame, id: Column, toks: Column,
      k: Int = 8, minCount: Int = 2): DataFrame = {
    require(k >= 2, s"span length k=$k must be >= 2")
    require(minCount >= 2, s"minCount=$minCount must be >= 2")
    val base = docs.select(id.as("doc_id"), toks.as("toks"))
    // one row per k-token window occurrence; s is the 0-based start.
    // Hashes come from the native positional kernel — one codegen'd
    // pass per doc (StringBuilder + md5) instead of an interpreted
    // concat+md5 expression tree per window; value-identical to
    // portableHash56(join(tokens[s..s+k))) (kernel-parity spec)
    val wins = base
      .select(col("doc_id"),
        posexplode(graft.functions.ShingleHashesAll56(col("toks"), k))
          .as(Seq("s", "h")))
    // per-span occurrence count + corpus-wide first occurrence, one
    // map-side-combinable aggregate (min and count both combine)
    val spans = wins.groupBy(col("h")).agg(
      count(lit(1)).as("cnt"),
      min(struct(col("doc_id"), col("s"))).as("first"))
    // 1-based positions covered by a NON-FIRST occurrence of a
    // duplicated span, folded to ONE small array per affected doc —
    // only covered docs shuffle here, and only their covered
    // positions, never the token stream
    // span STARTS only — never the ×k position expansion (a
    // wholesale-duplicated doc would pay k× the shuffle for the same
    // information); the interval union happens inside the kernel
    val covAgg = wins
      .join(spans.filter(col("cnt") >= minCount), Seq("h"))
      .filter(!(col("doc_id") === col("first.doc_id") && col("s") === col("first.s")))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set((col("s") + 1).cast("long"))).as("cov_starts"))
    // reassemble through the two-pointer native kernel — O(len +
    // |spans|) per doc: interval union + filter + join in one pass.
    // Untouched docs skip the merge entirely. Covered docs have ≥ k
    // non-empty tokens, so the kept count recomputes exactly from the
    // rebuilt text (empty ⇒ 0).
    val rebuilt = base.join(covAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"), col("cov_starts"),
        when(col("cov_starts").isNull, array_join(col("toks"), " "))
          .otherwise(graft.functions.FilterOutSpans(col("toks"), col("cov_starts"), k))
          .as("clean_text"))
    rebuilt
      .select(col("doc_id"), col("clean_text"),
        when(col("cov_starts").isNull, size(col("toks")).cast("bigint"))
          .otherwise(when(col("clean_text") === "", lit(0L))
            .otherwise(size(split(col("clean_text"), " ")).cast("bigint")))
          .as("n_kept"),
        col("toks"))
      .select(col("doc_id"), col("clean_text"), col("n_kept"),
        (size(col("toks")).cast("bigint") - col("n_kept")).as("n_dropped"))
  }

  /** Long-document chunking with overlap — the split step of
    * context-window preparation (complement of [[Corpus.packChunks]],
    * which packs SHORT docs; this splits LONG docs): a document of n
    * tokens becomes ceil-many chunks of at most `maxTokens` tokens,
    * consecutive chunks sharing `overlap` tokens (stride =
    * maxTokens − overlap). The final chunk is the remainder — never
    * empty, never an extra stride-aligned sliver (a doc with
    * n ≤ maxTokens is exactly one chunk).
    *
    * Pure narrow operator: tokenize, compute the chunk count
    * arithmetically, explode a `sequence`, slice — no shuffle, no
    * state, pushes through the scan.
    *
    * Returns (doc_id, chunk_idx, chunk_text, n_tokens) with
    * 0-based chunk_idx.
    */
  def chunkDocs(
      docs: DataFrame, id: Column, text: Column,
      maxTokens: Int, overlap: Int): DataFrame =
    chunkDocsTokens(docs, id, TextAnalysis.tokens(text), maxTokens, overlap)

  /** [[chunkDocs]] over a precomputed token-array column — the
    * tokenizer-pluggable form (chunk boundaries land on the MODEL's
    * token boundaries, which is the point of chunking to a context
    * window); `chunk_text` joins the chunk's tokens with single spaces.
    */
  def chunkDocsTokens(
      docs: DataFrame, id: Column, toks: Column,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens=$maxTokens must be >= 1")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap=$overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    val base = docs.select(id.as("doc_id"), toks.as("toks"))
      .withColumn("n", size(col("toks")).cast("bigint"))
      // n <= maxTokens -> 1 chunk; else 1 + ceil((n - maxTokens)/stride).
      // `div` (integer floor-div) — Column./ is double division, which
      // drifts past 2^53; token counts are positive so floor == ceil-1
      .withColumn("n_chunks",
        when(col("n") <= maxTokens, lit(1L))
          .otherwise(expr(s"1 + (n - $maxTokens + ${stride - 1}) div $stride")))
    base
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        array_join(slice(col("toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(maxTokens)), " ")
          .as("chunk_text"),
        least(lit(maxTokens.toLong), col("n") - col("chunk_idx") * stride)
          .as("n_tokens"))
  }
}
