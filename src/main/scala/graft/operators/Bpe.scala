package graft.operators

import graft.functions.BpeApply
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One trained merge: at `rank` (1-based) the adjacent symbol pair
  * (`l`, `r`) had the highest corpus frequency `freq` and becomes the
  * new symbol `l+r`.
  */
case class BpeMerge(rank: Long, l: String, r: String, freq: Long)

/** Distributed BPE tokenizer training + encoding (Sennrich et al.
  * 2016, alg. 1) — the train-your-own-tokenizer step of a pretraining
  * data pipeline, built scale-first:
  *
  *   - Training never iterates over the corpus: one corpus pass
  *     collapses documents to a word-frequency table capped at the top
  *     `maxWords` words (`TakeOrderedAndProject` — per-partition heaps,
  *     the standard trainer pre-tokenization cap), and the merge
  *     rounds fit the model on that table driver-locally — a
  *     model-bounded collect (maxWords rows), the k-means
  *     broadcast-the-model pattern of [[Similarity.kmeansCodebook]].
  *     [[trainRounds]] keeps the all-distributed round loop for vocab
  *     caps set beyond driver memory; both spellings are exact integer
  *     math with the same total order, so they agree bit-for-bit
  *     (spec-asserted).
  *   - Encoding pays the merge fold once per DISTINCT word (vocab-
  *     sized), never per occurrence: distinct words go through the
  *     native [[graft.functions.BpeApply]] kernel, documents join the
  *     encoded vocab back on the word key (broadcast-able — the vocab
  *     is model-scale next to a 100 TB corpus).
  *
  * All counting is exact integer math with lexicographic tiebreaks, so
  * a DuckDB oracle replays training round by round as a materialized
  * CTE chain (see [[graft.queries.CorpusQueries]] `bpe_train`).
  */
object Bpe {

  /** Pre-tokenizer: lowercase alphanumeric runs — the same planted
    * RE2-safe tokenization the `chunk_docs_bpe` gate uses, keeping
    * symbols in [a-z0-9] so the space-delimited symbol-string fold and
    * its regexp spelling are unambiguous.
    */
  def words(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Char-level start symbols, space-joined: "low" → "l o w". */
  def charSyms(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** One greedy left-to-right merge pass over a space-joined symbol
    * string — the portable HOF spelling (DuckDB replays it verbatim
    * via `list_reduce`): fold symbols left to right; when the
    * accumulated string ends in `l` and the incoming symbol is `r`,
    * rewrite that tail to `l+r` (which immediately participates in the
    * next comparison — "a a a" under (a,a) → "aa a").
    */
  def mergeFold(syms: Column, l: Column, r: Column): Column = {
    val toks = split(syms, " ")
    aggregate(
      slice(toks, lit(2), size(toks) - 1),
      element_at(toks, 1),
      (acc, x) =>
        when(regexp_extract(acc, "([^ ]+)$", 1) === l && x === r,
          regexp_replace(acc, lit("([^ ]+)$"), concat(l, r)))
          .otherwise(concat(acc, lit(" "), x)))
  }

  /** The portable encode: apply `merges` in rank order as chained
    * [[mergeFold]]s. Interpreted HOFs — the spec reference the native
    * [[graft.functions.BpeApply]] kernel is asserted against; use the
    * kernel on real corpora.
    */
  def encodeSymsHof(word: Column, merges: Seq[BpeMerge]): Column =
    merges.sortBy(_.rank).foldLeft(charSyms(word))((acc, m) =>
      mergeFold(acc, lit(m.l), lit(m.r)))

  /** Word-frequency table capped at the `maxWords` most frequent words
    * (ties to the lexicographically smallest word — a total order, so
    * the cap is deterministic). One corpus pass, map-side combinable;
    * the cap is the TakeOrderedAndProject shape, never a global sort.
    */
  def wordFreqs(docs: DataFrame, text: Column, maxWords: Int): DataFrame =
    docs.select(explode(words(text)).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)

  /** Adjacent-pair frequencies over a (cnt, syms) vocab table, weighted
    * by word count. Overlaps count per occurrence ("a a a" contributes
    * (a,a) twice), matching the classic trainer.
    */
  private[graft] def pairCounts(vocab: DataFrame): DataFrame = {
    val toks = split(col("syms"), " ")
    vocab
      .select(col("cnt"), toks.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => struct(
          element_at(col("t"), i).as("l"),
          element_at(col("t"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("freq"))
  }

  /** Train `numMerges` BPE merges on the corpus: ONE distributed
    * corpus pass builds the `maxWords`-capped word-frequency table,
    * then the merge rounds fit the model on that table driver-locally.
    * The collect is model-bounded by construction (maxWords rows — the
    * same broadcast-the-model pattern as [[Similarity.kmeansCodebook]];
    * every production trainer fits merges on an in-memory word-count
    * dict), so round cost is independent of corpus size and pays no
    * per-round job overhead. Semantics are bit-identical to the
    * distributed [[trainRounds]] spelling: exact integer pair counts
    * weighted by word frequency, argmax by (freq desc, l asc, r asc),
    * greedy left-to-right fold with immediate tail participation.
    */
  def train(
      docs: DataFrame, text: Column,
      numMerges: Int, maxWords: Int): Seq[BpeMerge] = {
    var vocab: Array[(Long, Array[String])] =
      wordFreqs(docs, text, maxWords).collect().map { r =>
        (r.getLong(1), r.getString(0).map(_.toString).toArray)
      }
    val merges = Seq.newBuilder[BpeMerge]
    var i = 1
    while (i <= numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((cnt, syms) <- vocab; j <- 0 until syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        counts(p) = counts.getOrElse(p, 0L) + cnt
      }
      require(counts.nonEmpty,
        s"corpus exhausted at merge $i: every word is a single symbol")
      val ((l, r), freq) = counts.minBy { case ((l, r), f) => (-f, l, r) }
      merges += BpeMerge(i.toLong, l, r, freq)
      vocab = vocab.map { case (cnt, syms) => (cnt, applyMergeLocal(syms, l, r)) }
      i += 1
    }
    merges.result()
  }

  /** One greedy left-to-right merge pass, local spelling — the exact
    * semantics of [[mergeFold]]: when the accumulated tail symbol is
    * `l` and the incoming symbol is `r`, rewrite the tail to `l+r`,
    * which immediately participates in the next comparison.
    */
  private[graft] def applyMergeLocal(
      syms: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (s <- syms) {
      if (out.nonEmpty && out.last == l && s == r) out(out.length - 1) = l + r
      else out += s
    }
    out.toArray
  }

  /** The all-distributed rounds spelling of [[train]] — each round
    * counts pairs and folds the argmax merge as Spark jobs over the
    * vocab table. Same result as [[train]] (spec-asserted); use it only
    * when `maxWords` is set beyond driver memory, where the capped
    * table itself is too big to collect.
    */
  def trainRounds(
      docs: DataFrame, text: Column,
      numMerges: Int, maxWords: Int): Seq[BpeMerge] = {
    var vocab = wordFreqs(docs, text, maxWords)
      .withColumn("syms", charSyms(col("word")))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[BpeMerge]
    var i = 1
    while (i <= numMerges) {
      val top = pairCounts(vocab)
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      require(top.nonEmpty,
        s"corpus exhausted at merge $i: every word is a single symbol")
      val row = top.head
      val m = BpeMerge(i.toLong, row.getString(0), row.getString(1), row.getLong(2))
      merges += m
      vocab = vocab.withColumn("syms",
        mergeFold(col("syms"), lit(m.l), lit(m.r)))
      // re-materialize every round: the fold chain's cost is not the
      // 2048-row execution but PLANNING the nested HOF lambda trees —
      // measured at sf0.1 the 16-round train is 23.9 s at cadence 8,
      // 13.6 s at cadence 2; the checkpoint job itself is vocab-sized
      vocab = vocab.localCheckpoint(true)
      i += 1
    }
    merges.result()
  }

  /** [[train]] as a gate-shaped DataFrame: (rank, l, r, freq). */
  def trainDf(
      docs: DataFrame, text: Column,
      numMerges: Int, maxWords: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, text, numMerges, maxWords).toDF("rank", "l", "r", "freq")
      .select(col("rank"), col("l"), col("r"), col("freq"))
  }

  /** Encode every document with a trained merge list: per doc the
    * pre-token count, total char symbols, and total BPE pieces after
    * the merges (the tokens-per-doc budget a packing stage consumes).
    * The fold runs once per distinct word through the native kernel;
    * docs join the encoded vocab back on the word key. Docs with no
    * [a-z0-9] runs encode to all-zero counts.
    */
  /** [[encodeDocs]] as a STATELESS per-document projection — no
    * distinct, no join, no shuffle: each word runs the native kernel
    * in place (inside array HOFs), so the same Column works unchanged
    * on a stream (micro-batch encode with a broadcast-trained model
    * has no state to manage). The batch spelling amortizes the fold
    * per DISTINCT word and wins when the corpus is at rest; this one
    * is the streaming/online shape. Value-identical to [[encodeDocs]]
    * (spec-pinned).
    */
  def encodeDocsStateless(
      docs: DataFrame, id: Column, text: Column,
      merges: Seq[BpeMerge]): DataFrame = {
    val mergePairs = merges.sortBy(_.rank).map(m => (m.l, m.r))
    val ws = words(text)
    docs.select(
      id.as("doc_id"),
      size(ws).cast("bigint").as("n_tokens"),
      aggregate(ws, lit(0L), (acc, w) => acc + length(w))
        .cast("bigint").as("n_chars"),
      aggregate(ws, lit(0L), (acc, w) =>
        acc + size(split(BpeApply(w, mergePairs), " ")))
        .cast("bigint").as("n_pieces"))
  }

  def encodeDocs(
      docs: DataFrame, id: Column, text: Column,
      merges: Seq[BpeMerge]): DataFrame = {
    val tok = docs.select(id.as("doc_id"), explode(words(text)).as("word"))
    val mergePairs = merges.sortBy(_.rank).map(m => (m.l, m.r))
    val enc = tok.select(col("word")).distinct()
      .select(
        col("word"),
        length(col("word")).cast("bigint").as("w_chars"),
        size(split(BpeApply(col("word"), mergePairs), " "))
          .cast("bigint").as("w_pieces"))
    val perDoc = tok.join(enc, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("w_chars")).as("n_chars"),
        sum(col("w_pieces")).as("n_pieces"))
    docs.select(id.as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).cast("bigint").as("n_tokens"),
        coalesce(col("n_chars"), lit(0L)).cast("bigint").as("n_chars"),
        coalesce(col("n_pieces"), lit(0L)).cast("bigint").as("n_pieces"))
  }
}
