package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a training-data pipeline needs after
  * dedup: benchmark decontamination, deterministic stratified
  * sampling, and token-budget chunk packing. All three are pure
  * declarative plans (Catalyst prunes/pushes/combines freely) and all
  * three are engine-portable — the only hash is the md5-derived
  * [[TextAnalysis.portableHash32]]/[[TextAnalysis.portableHash56]]
  * family, so DuckDB reproduces every row bit-exactly (oracle-gated).
  */
object Corpus {

  /** Benchmark decontamination: flag corpus documents that share at
    * least one k-token shingle with any benchmark/eval document (the
    * standard n-gram-overlap test-set leak check).
    *
    * Shape at scale: the benchmark side is tiny (eval sets are
    * thousands of docs) — its distinct shingle hashes are broadcast,
    * so the corpus side is ONE narrow pass (explode + broadcast-hash-
    * join + partial-agg groupBy on doc_id; no corpus shuffle beyond
    * the final per-doc count, which map-side combine collapses).
    * Joining on the 56-bit portable hash instead of the shingle string
    * keeps the broadcast and the join keys fixed-width.
    */
  def contamination(
      corpus: DataFrame, id: Column, text: Column,
      benchmark: DataFrame, btext: Column, k: Int = 3): DataFrame = {
    // one codegen'd kernel call per doc (tokens → distinct 56-bit
    // shingle hashes), not an interpreted concat+md5 fold per shingle
    def hashes(t: Column) =
      graft.functions.ShingleHashes56(TextAnalysis.tokens(t), k)
    val benchHashes = benchmark
      .select(explode(hashes(btext)).as("h")).distinct()
    val corpusShingles = corpus
      .select(id.as("doc_id"), explode_outer(hashes(text)).as("h"))
    corpusShingles
      .join(broadcast(benchHashes.select(col("h"), lit(1).as("hit"))), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(col("hit")).as("n_shared_shingles"))
      .select(col("doc_id"), col("n_shared_shingles"),
        (col("n_shared_shingles") > 0).as("contaminated"))
  }

  /** Span-level decontamination — the REMEDIATION counterpart of
    * [[contamination]]: instead of flagging (and losing) a document
    * that shares any k-shingle with the benchmark set, REMOVE the
    * shared spans and keep the rest — the right action when eval
    * questions get quoted inside otherwise-good pages. Every corpus
    * window whose positional 56-bit shingle hash appears in the
    * (broadcast, model-sized) benchmark hash set covers its k token
    * positions; documents reassemble from the uncovered tokens through
    * the same two-pointer native kernel as duplicated-span removal.
    * Shape at scale: one narrow positional-hash kernel pass per doc,
    * one broadcast semi-join (only contaminated docs' span STARTS
    * shuffle — never the token stream), one per-doc fold. Returns
    * (doc_id, clean_text, n_kept, n_dropped) for EVERY corpus doc.
    */
  def decontaminateScrub(
      corpus: DataFrame, id: Column, text: Column,
      benchmark: DataFrame, btext: Column, k: Int = 3): DataFrame = {
    val benchHashes = benchmark
      .select(explode(
        graft.functions.ShingleHashes56(TextAnalysis.tokens(btext), k)).as("h"))
      .distinct()
    val base = corpus.select(id.as("doc_id"), TextAnalysis.tokens(text).as("toks"))
    val wins = base.select(col("doc_id"),
      posexplode(graft.functions.ShingleHashesAll56(col("toks"), k))
        .as(Seq("s", "h")))
    val covAgg = wins
      .join(broadcast(benchHashes), Seq("h"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set((col("s") + 1).cast("long"))).as("cov_starts"))
    base.join(covAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"), col("cov_starts"),
        when(col("cov_starts").isNull, array_join(col("toks"), " "))
          .otherwise(graft.functions.FilterOutSpans(col("toks"), col("cov_starts"), k))
          .as("clean_text"))
      .select(col("doc_id"), col("clean_text"),
        when(col("cov_starts").isNull, size(col("toks")).cast("bigint"))
          .otherwise(when(col("clean_text") === "", lit(0L))
            .otherwise(size(split(col("clean_text"), " ")).cast("bigint")))
          .as("n_kept"),
        col("toks"))
      .select(col("doc_id"), col("clean_text"), col("n_kept"),
        (size(col("toks")).cast("bigint") - col("n_kept")).as("n_dropped"))
  }

  /** The shared deterministic keep-predicate: portable 32-bit hash of
    * "stratum:id" lands below the per-mille rate. ONE definition so
    * [[stratifiedSample]] and [[rebalance]] can never drift apart.
    */
  private def keepRow(stratum: Column, id: Column, ratePerMille: Column): Column =
    pmod(TextAnalysis.portableHash32(
      concat(stratum, lit(":"), id.cast("string"))), lit(1000)) < ratePerMille

  /** Deterministic per-stratum downsampling: keep a row iff the
    * portable 32-bit hash of "stratum:id" lands below the stratum's
    * per-mille rate. No RNG, no state, no shuffle — a pure narrow
    * filter that pushes into the scan, gives the same sample on every
    * run/engine, and composes with resumable pipelines (a re-run
    * selects the same rows). Rates are per-mille per stratum with a
    * default for unlisted strata.
    */
  def stratifiedSample(
      df: DataFrame, id: Column, stratum: Column,
      ratesPerMille: Map[String, Int], defaultPerMille: Int): DataFrame = {
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (s, r)) => when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(keepRow(stratum, id, rate))
  }

  /** Domain-mixture rebalancing, step 1: per-stratum keep rates (in
    * per-mille) that downsample the corpus to a TARGET TOKEN MIXTURE
    * (`targetsPerMille`, e.g. en→500 ‰ of final tokens). Since a
    * sampler can only drop, the binding stratum is the one with the
    * least tokens RELATIVE to its target; it keeps everything
    * (rate 1000) and every other stratum is scaled down
    * proportionally: rate_s = 1000·target_s·T_m / (target_m·T_s),
    * where m is the binding stratum and T the per-stratum token
    * totals. Strata not in the target mixture are dropped.
    *
    * One aggregation over the corpus + driver-size arithmetic on the
    * |strata|-row result; the rates come out as exact integer
    * arithmetic (bigint cross-multiplication, floor division), so an
    * independent engine reproduces them bit-for-bit. (At corpora
    * beyond ~9·10¹² tokens per stratum the cross-product needs
    * decimal(38) — swap the two multiplies then.)
    */
  /** Temperature-based mixture sampling at α = 1/2 — the multilingual
    * pretraining recipe (sample stratum s with probability ∝ T_s^α,
    * α < 1 upweights small strata relative to their natural share):
    * expected kept tokens per stratum ∝ √T_s, the binding stratum
    * (max √T_s/T_s, i.e. the smallest) keeps everything and the rest
    * scale down. All arithmetic is exact int64:
    *
    *   w_s    = isqrt(T_s)       (floor sqrt, integer-verified ±1 —
    *                              immune to any libm rounding)
    *   m      = argmin fdiv(256·T_s, w_s), ties by stratum name
    *   b_s    = fdiv(10^6·T_m, T_s)
    *   rate_s = min(1000, fdiv(w_s·b_s, 1000·w_m))   per-mille
    *
    * The two-stage floor division keeps every intermediate under 2^63
    * provided the BINDING (smallest-ratio) stratum holds ≤ ~9.2·10^12
    * tokens (the 10^6·T_m multiply is the tightest term; 256·T_s
    * allows other strata up to ~3.6·10^16). Beyond that, stage the
    * 10^6 scale in two fdiv steps or move to decimal(38). The oracle
    * replays the exact staging, so the floors are part of the spec,
    * not error.
    * One aggregate over the corpus → a |strata|-row model; sampling
    * itself is the same stateless portable-hash filter as
    * [[stratifiedSample]] (no RNG, pushes into the scan).
    */
  def temperatureRates(
      df: DataFrame, stratum: Column, tokens: Column): DataFrame =
    temperatureRatesFromTotals(
      df.select(stratum.as("stratum"), tokens.as("n_tokens"))
        .groupBy("stratum").agg(sum("n_tokens").as("t")))

  /** The √T rate-derivation tail of [[temperatureRates]] on a
    * (stratum, t) totals frame — shared by the batch aggregate and
    * the drained streaming per-stratum sums (associative addition ⇒
    * identical totals ⇒ identical rates).
    */
  def temperatureRatesFromTotals(rawTotals: DataFrame): DataFrame = {
    val fdiv = graft.operators.CorpusStats.fdiv _
    val totals = rawTotals.filter(col("t") > 0)
    val w = totals
      .withColumn("s0", floor(sqrt(col("t").cast("double"))).cast("bigint"))
      .withColumn("w",
        when((col("s0") + 1) * (col("s0") + 1) <= col("t"), col("s0") + 1)
          .when(col("s0") * col("s0") > col("t"), col("s0") - 1)
          .otherwise(col("s0")))
      .select(col("stratum"), col("t"), col("w"))
    val m = w
      .orderBy(fdiv(col("t") * 256L, col("w")).asc, col("stratum").asc)
      .limit(1)
      .select(col("t").as("m_t"), col("w").as("m_w"))
    w.crossJoin(broadcast(m))
      .select(col("stratum"), col("t").as("total_tokens"), col("w").as("weight"),
        least(lit(1000L),
          fdiv(col("w") * fdiv(lit(1000000L) * col("m_t"), col("t")),
            lit(1000L) * col("m_w"))).as("rate_permille"))
  }

  /** Filter `df` to the α = 1/2 temperature sample: rates from
    * [[temperatureRates]] broadcast back (a |strata|-row model), keep
    * decided by the shared deterministic hash predicate. */
  def temperatureSample(
      df: DataFrame, id: Column, stratum: Column, tokens: Column): DataFrame =
    temperatureSampleWithRates(df, id, stratum, temperatureRates(df, stratum, tokens))

  /** Apply a precomputed [[temperatureRates]] table (broadcast |strata|
    * rows + the stateless hash filter) — the entry point for rates
    * maintained ONLINE from streamed per-stratum totals.
    */
  def temperatureSampleWithRates(
      df: DataFrame, id: Column, stratum: Column, ratesDf: DataFrame): DataFrame = {
    val rates = ratesDf
      .select(col("stratum").as("__ts_stratum"), col("rate_permille"))
    df.join(broadcast(rates), stratum === col("__ts_stratum"))
      .filter(keepRow(col("__ts_stratum"), id, col("rate_permille")))
      .drop("__ts_stratum")
  }

  def mixtureRates(
      df: DataFrame, stratum: Column, tokens: Column,
      targetsPerMille: Map[String, Int]): DataFrame =
    mixtureRatesFromTotals(
      df.select(stratum.as("stratum"), tokens.as("n_tokens"))
        .groupBy("stratum").agg(sum("n_tokens").as("total_tokens")),
      targetsPerMille)

  /** The rate-derivation tail of [[mixtureRates]], usable on any
    * (stratum, total_tokens) frame — including totals drained from a
    * STREAMING per-stratum sum (addition is associative, so online
    * totals equal the batch totals exactly and this tail gives the
    * identical rates).
    */
  def mixtureRatesFromTotals(
      totals: DataFrame, targetsPerMille: Map[String, Int]): DataFrame = {
    val targets = totals.sparkSession.createDataFrame(
      targetsPerMille.toSeq.map { case (s, t) => (s, t.toLong) })
      .toDF("stratum", "target_permille")
    val j = totals.join(targets, Seq("stratum"))
    // binding stratum: min tokens-to-target ratio (double ONLY for the
    // argmin ordering; the rates below are exact integer arithmetic)
    val m = j
      .orderBy((col("total_tokens").cast("double") / col("target_permille")).asc,
        col("stratum").asc)
      .limit(1)
      .select(col("total_tokens").as("m_tokens"), col("target_permille").as("m_target"))
    j.crossJoin(broadcast(m))
      .select(col("stratum"), col("total_tokens"),
        least(lit(1000L),
          expr("(1000 * target_permille * m_tokens) div (m_target * total_tokens)"))
          .as("rate_permille"))
  }

  /** Domain-mixture rebalancing, step 2: apply [[mixtureRates]] with
    * the deterministic portable-hash sampler — a broadcast join of the
    * |strata|-row rate table plus a narrow filter; the corpus is
    * touched once and never shuffled.
    */
  def rebalance(
      df: DataFrame, id: Column, stratum: Column, tokens: Column,
      targetsPerMille: Map[String, Int]): DataFrame =
    rebalance(df, id, stratum, mixtureRates(df, stratum, tokens, targetsPerMille))

  /** [[rebalance]] against a precomputed [[mixtureRates]] table —
    * callers that also report the rates reuse one aggregation pass, so
    * the corpus is read exactly twice (totals, then filter): the
    * two-pass minimum for a rate that depends on global totals.
    */
  def rebalance(
      df: DataFrame, id: Column, stratum: Column, mixtureRatesDf: DataFrame): DataFrame = {
    val rates = mixtureRatesDf
      .select(col("stratum").as("__stratum"), col("rate_permille"))
    df.join(broadcast(rates), stratum === col("__stratum"))
      .filter(keepRow(stratum, id, col("rate_permille")))
      .drop("__stratum", "rate_permille")
  }

  /** Per-document keyword extraction by integer-exact tf·idf: token
    * frequency within the doc times a scaled inverse document
    * frequency (`idf = N·10⁶ div df` — integer floor, no float logs,
    * so an independent engine reproduces every score bit-for-bit).
    * Top-k per doc runs through the bounded-heap
    * [[graft.plans.TopK.perGroup]] operator (descending (score, token)
    * with no full window sort).
    *
    * Shape at scale: tf and df are map-side-combinable aggregations;
    * the tf⋈df join shuffles on token (the vocabulary is corpus-sized,
    * NOT broadcastable); the doc count joins as a broadcast scalar.
    */
  def topKeywords(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    val tokens = docs.select(
      id.as("doc_id"), explode(TextAnalysis.tokens(lower(text))).as("token"))
    val tf = tokens.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * expr("(n_docs * 1000000) div df"))
    graft.plans.TopK.perGroup(
      scored, Seq(col("doc_id")), struct(col("score"), col("token")), k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("score"))
  }

  /** Token-budget packing: assign documents to fixed-budget training
    * chunks by cumulative token count within each group (the
    * concatenate-then-split-at-context-length step of sequence
    * packing). A document starting before offset n·budget belongs to
    * chunk n. Emits (chunk_id, chunk_pos, start_offset) per doc.
    *
    * The running sum is a DISTRIBUTED two-level prefix sum, not one
    * window per group: groups (languages, sources) are low-cardinality,
    * so `sum().over(partitionBy(group))` would materialize and sort a
    * whole group — billions of rows at 100 TB — in ONE task (the same
    * skewed-window hazard ngramJaccard's df cap had). Instead:
    *  1. ids are blocked (`id div blockSize`, monotone in id, so
    *     (block, id) order == id order) and the within-block prefix
    *     runs under a window over (group, block) — high cardinality,
    *     ≤ blockSize rows per partition by construction;
    *  2. block totals (one row per (group, block), a map-side-combined
    *     aggregate) get their own prefix sum — a window over the group
    *     again, but over n/blockSize TOTAL rows, not n;
    *  3. start_offset = block offset + within-block prefix, joined
    *     back on (group, block) — a broadcast-sized side.
    */
  def packChunks(
      df: DataFrame, id: Column, group: Column, tokens: Column,
      budgetTokens: Long, blockSize: Long = 1L << 20): DataFrame =
    startOffsets(df, id, group, tokens, blockSize)
      // integer floor-div (offsets are non-negative): exact at any
      // magnitude, matching the oracle's `//`; floor(x / w) would
      // round through a double and drift past 2^53 cumulative tokens
      .withColumn("chunk_id", expr(s"start_offset div $budgetTokens"))
      .withColumn("chunk_pos",
        row_number().over(
          Window.partitionBy(col("grp"), col("chunk_id")).orderBy(col("doc_id")))
          .cast("long"))

  /** The distributed two-level prefix sum shared by [[packChunks]] and
    * [[packSequences]]: per-group cumulative token offset of every
    * document in id order, with no single-task window over a group
    * (see [[packChunks]] docs for why). Output: (doc_id, grp,
    * n_tokens, start_offset).
    */
  private def startOffsets(
      df: DataFrame, id: Column, group: Column, tokens: Column,
      blockSize: Long): DataFrame = {
    val base = df.select(id.as("doc_id"), group.as("grp"), tokens.as("n_tokens"))
      .withColumn("__blk", expr(s"doc_id div $blockSize"))
    val wBlk = Window.partitionBy(col("grp"), col("__blk")).orderBy(col("doc_id"))
    val local = base.withColumn("__local",
      coalesce(sum(col("n_tokens"))
        .over(wBlk.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wBlocks = Window.partitionBy(col("grp")).orderBy(col("__blk"))
    val blockOffsets = base
      .groupBy(col("grp"), col("__blk"))
      .agg(sum(col("n_tokens")).as("__blk_sum"))
      .withColumn("__blk_off",
        coalesce(sum(col("__blk_sum"))
          .over(wBlocks.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("grp"), col("__blk"), col("__blk_off"))
    local.join(blockOffsets, Seq("grp", "__blk"))
      .withColumn("start_offset", col("__blk_off") + col("__local"))
      .select(col("doc_id"), col("grp"), col("n_tokens"), col("start_offset"))
  }

  /** Fixed-length training-SEQUENCE packing — the actual LLM
    * pretraining layout (concatenate the group's token stream in
    * deterministic doc order, cut it into `seqLen`-token sequences,
    * documents SPLIT across sequence boundaries and continue in the
    * next sequence — nothing is padded or dropped mid-stream).
    * [[packChunks]] answers "which budget bin does each doc START in";
    * this emits the position-level layout a training loader consumes:
    * one row per (document × sequence) intersection,
    *
    *   (doc_id, grp, seq_id, begin_in_seq, end_in_seq [exclusive],
    *    doc_begin, n_piece, starts_doc)
    *
    * where `doc_begin` is the token index into the document where the
    * piece starts and `starts_doc` marks pieces that OPEN a document —
    * exactly the per-sequence attention-reset boundary offsets
    * (cross-document attention masking) a packed-pretraining reader
    * needs. Scale shape: the cumulative offsets are the shared
    * two-level prefix sum; the (doc × sequence) expansion is a narrow
    * `sequence`+`explode` (a doc spans ceil(n/seqLen)+1 sequences at
    * most); no further shuffle. Zero-token documents emit nothing.
    */
  def packSequences(
      df: DataFrame, id: Column, group: Column, tokens: Column,
      seqLen: Long, blockSize: Long = 1L << 20): DataFrame = {
    require(seqLen >= 1, s"seqLen=$seqLen must be >= 1")
    startOffsets(df, id, group, tokens, blockSize)
      .filter(col("n_tokens") > 0)
      .withColumn("seq_id", explode(sequence(
        expr(s"start_offset div $seqLen"),
        expr(s"(start_offset + n_tokens - 1) div $seqLen"))))
      .withColumn("__seq_start", col("seq_id") * seqLen)
      .withColumn("begin_in_seq",
        greatest(col("start_offset"), col("__seq_start")) - col("__seq_start"))
      .withColumn("end_in_seq",
        least(col("start_offset") + col("n_tokens"),
          col("__seq_start") + seqLen) - col("__seq_start"))
      .withColumn("doc_begin",
        greatest(lit(0L), col("__seq_start") - col("start_offset")))
      .withColumn("n_piece", col("end_in_seq") - col("begin_in_seq"))
      .withColumn("starts_doc", (col("doc_begin") === 0L).cast("boolean"))
      .select(col("doc_id"), col("grp"), col("seq_id"), col("begin_in_seq"),
        col("end_in_seq"), col("doc_begin"), col("n_piece"), col("starts_doc"))
  }

  /** Deterministic training-shard assignment + within-shard order —
    * the corpus-shuffle step before training. Shard = portable 32-bit
    * hash of (seed, doc id) mod `nShards`; order within a shard = the
    * full md5 digest of the same key (doc id breaks the astronomically
    * unlikely digest tie). Changing the seed reshuffles the whole
    * corpus; same seed reproduces the exact order on any engine.
    *
    * Scale: the assignment is a narrow map, and the per-shard rank is
    * the Wal two-pass numbering scheme, NOT a per-shard window (which
    * would sort corpus/nShards rows in ONE task — ~100 GB per task at
    * 100 TB): range-partition on (shard, sort_key, id) into
    * cluster-sized partitions, `zipWithIndex` for a global dense index
    * (order-stable across range partitions), then subtract each
    * shard's start offset — a prefix over nShards counter rows joined
    * back broadcast-style. No single-partition stage at any corpus
    * size.
    */
  def trainingShards(
      docs: DataFrame, id: Column, seed: String, nShards: Int): DataFrame = {
    val key = concat(lit(seed), lit(":"), id.cast("string"))
    val base = docs.select(
      id.as("doc_id"),
      pmod(TextAnalysis.portableHash32(key), lit(nShards)).cast("bigint").as("shard"),
      md5(key).as("sort_key"))
    val sorted = base
      .repartitionByRange(col("shard"), col("sort_key"), col("doc_id"))
      .sortWithinPartitions(col("shard"), col("sort_key"), col("doc_id"))
    val schema = sorted.schema.add("__gidx",
      org.apache.spark.sql.types.LongType, nullable = false)
    val withIdx = sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema)
    // per-shard start = rows in earlier shards. The counter table has
    // exactly nShards rows (bounded by the caller's parameter, not the
    // corpus), so the prefix runs on the driver — the same bounded
    // collect as zipWithIndex's own count pass — and ships back as a
    // broadcast join side. No window anywhere in this operator.
    val counts = base.groupBy(col("shard")).agg(count(lit(1)).as("__n"))
      .orderBy(col("shard")).collect()
    var acc = 0L
    val starts = counts.map { r =>
      val p = (r.getLong(0), acc); acc += r.getLong(1); p
    }.toSeq
    val offsets = {
      import sorted.sparkSession.implicits._
      starts.toDF("shard", "__start")
    }
    withIdx.join(broadcast(offsets), Seq("shard"))
      .select(col("doc_id"), col("shard"), col("sort_key"),
        (col("__gidx") - col("__start") + 1L).as("pos"))
  }

  /** C4/CCNet-style LINE-level corpus dedup: a substantial line (≥
    * `minChars` non-whitespace chars after normalization) survives only
    * at its FIRST occurrence corpus-wide — (min doc_id, then min line
    * index) — every later copy is dropped; short lines (headings,
    * separators, code punctuation) always stay. Documents are then
    * reassembled from their surviving lines in original order. This is
    * the boilerplate-killer between exact-document and near-dup
    * passes: navigation chrome, cookie banners, license footers repeat
    * across millions of pages that are NOT document-level dups.
    *
    * Shape at scale: explode to lines (narrow), one groupBy-min on the
    * line fingerprint (map-side combine collapses the hot boilerplate
    * fingerprints — the skew IS the workload), one join back keyed the
    * same way, one per-doc reassembly groupBy. No window over the
    * corpus, no driver state.
    *
    * Returns (doc_id, clean_text, n_kept, n_dropped) for EVERY input
    * document (a fully-boilerplate doc comes back with empty text).
    */
  def lineDedup(
      docs: DataFrame, id: Column, text: Column,
      minChars: Int = 10): DataFrame = {
    val lines = docs
      .select(id.as("doc_id"), posexplode(split(text, "\n")).as(Seq("line_idx", "line")))
      // eligibility is computed on the NORMALIZED form the fingerprint
      // hashes — not the raw line — so it is constant across a
      // fingerprint group by construction (raw-line length can differ
      // within a group when Unicode case-folding changes string length,
      // e.g. 'İ' → 'i̇')
      .withColumn("eligible",
        length(regexp_replace(lower(trim(col("line"))), "\\s", "")) >= minChars)
      .withColumn("lfp", md5(lower(trim(col("line")))))
    val keepers = lines.filter(col("eligible"))
      .groupBy(col("lfp"))
      .agg(min(struct(col("doc_id"), col("line_idx"))).as("first"))
    val kept = lines
      .join(keepers, Seq("lfp"), "left")
      .filter(!col("eligible") ||
        (col("doc_id") === col("first.doc_id") && col("line_idx") === col("first.line_idx")))
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("line_idx"), col("line")))),
          e => e.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(id.as("doc_id"),
        (size(split(text, "\n"))).cast("bigint").as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Corpus snapshot DIFF — the incremental-refresh primitive: given
    * two corpus snapshots keyed by document id, classify every id as
    * `added` (new only), `removed` (old only), `changed` (both, text
    * fingerprint differs) or `unchanged`. Fingerprint =
    * [[TextAnalysis.fingerprintMd5]] (whitespace-normalized md5), so
    * cosmetic whitespace churn does not count as change and the whole
    * comparison moves 32-byte digests, never text. Shape at scale:
    * each side reduces to (id, fp) at the scan, then ONE full outer
    * equi-join on the id — co-locatable via bucketing on id for the
    * repeated nightly-diff case. Feeding only the `added`+`changed`
    * slice to the dedup/curation pipelines is what turns a 100 TB
    * reprocess into an incremental one.
    *
    * Returns (doc_id, status, old_fp, new_fp) — absent-side
    * fingerprints are null.
    */
  def corpusDiff(
      oldDocs: DataFrame, oldId: Column, oldText: Column,
      newDocs: DataFrame, newId: Column, newText: Column): DataFrame = {
    val o = oldDocs.select(oldId.as("doc_id"),
      TextAnalysis.fingerprintMd5(oldText).as("old_fp"))
    val n = newDocs.select(newId.as("doc_id"),
      TextAnalysis.fingerprintMd5(newText).as("new_fp"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") === col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_fp"), col("new_fp"))
  }
}
