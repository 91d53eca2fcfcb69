package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level frequency statistics for training-data curation:
  * heavy-hitter n-gram detection (the boilerplate/spam discovery pass
  * that feeds stop-span lists) and n-gram-LM familiarity scoring (the
  * integer-exact analog of the KenLM-perplexity quality filter). Both
  * are aggregate-only plans — map-side combine absorbs the Zipfian
  * skew that IS the workload — and both are engine-portable (no
  * floating point, no engine-specific hash), so a DuckDB oracle
  * reproduces every row bit-exactly.
  */
object CorpusStats {

  /** Every n-token window of `toks` as a space-joined string (empty
    * array below n tokens) — the shared n-gram projection for the
    * batch and streaming counting paths. Runs through the native
    * [[graft.functions.ShingleStrings]] kernel (one StringBuilder
    * pass); [[ngramStringsDeclarative]] is the portable reference the
    * kernel is spec-pinned to.
    */
  def ngramStrings(toks: Column, n: Int): Column =
    graft.functions.ShingleStrings(toks, n)

  /** The declarative (HOF) definition of [[ngramStrings]]. */
  def ngramStringsDeclarative(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - lit(n)),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Global top-k of a (ngram, cnt) count table by (cnt desc, ngram
    * desc) with a 1-based rank — orderBy+limit plans as
    * TakeOrderedAndProject (per-partition bounded heaps merged on the
    * driver, never a global sort); the rank window then runs over the
    * k-row result only.
    */
  def topKByCount(counts: DataFrame, k: Int): DataFrame = {
    val top = counts.orderBy(col("cnt").desc, col("ngram").desc).limit(k)
    top.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("ngram").desc)).cast("bigint"))
      .select(col("rank"), col("ngram"), col("cnt"))
  }

  /** Corpus-wide top-k most frequent n-grams (heavy hitters) — the
    * discovery pass behind boilerplate stop-lists: the n-grams that
    * dominate a crawl (navigation chrome, cookie banners, license
    * headers) surface here before any dedup decision is made.
    *
    * Shape at scale: explode n-grams (narrow), ONE groupBy(ngram)
    * count whose map-side partial aggregation collapses the hot keys
    * per task before the shuffle (the Zipf head never concentrates in
    * one reducer as raw rows), then a global top-k via
    * orderBy+limit — Spark plans that as TakeOrderedAndProject:
    * per-partition bounded heaps merged on the driver, O(partitions·k)
    * driver memory, never a global sort. Ties break on the n-gram
    * text descending, so the result is deterministic on any engine.
    *
    * Returns (rank, ngram, cnt), rank 1-based by (cnt desc, ngram
    * desc).
    */
  def heavyNgrams(
      docs: DataFrame, text: Column, n: Int = 3, k: Int = 50): DataFrame = {
    require(n >= 1 && k >= 1)
    val counts = docs
      .select(explode(ngramStrings(TextAnalysis.tokens(text), n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"))
    topKByCount(counts, k)
  }

  /** Per-source document cap — the domain-balancing pass of crawl
    * curation: keep at most `n` documents per source/host, preferring
    * the best by `order` (ties broken by the caller's key to a total
    * order). Runs through the bounded-heap
    * [[graft.plans.TopK.perGroup]] operator — O(sources·n) memory, no
    * per-host window sort, so a mega-host with 10⁹ pages costs
    * O(pages·log n), not a 10⁹-row sort in one task (hosts are
    * exactly the key a crawl is skewed on).
    */
  def capPerSource(
      docs: DataFrame, source: Column, order: Column, n: Int): DataFrame =
    graft.plans.TopK.perGroup(docs, Seq(source), order, n)

  /** Hashed-bag-of-words linear classifier scoring — the fasttext-
    * style model-based quality/topic filter as a Spark plan: each
    * token hashes into one of `buckets` feature slots, the model is a
    * (bucket, integer milli-weight) table, a document's score is the
    * sum of its token occurrences' weights. The model side is
    * broadcast (a few thousand rows — model size, not data size); the
    * corpus side is one narrow pass + a map-side-combinable per-doc
    * sum. Integer weights keep every score oracle-exact; `keep` =
    * score ≥ 0 is the filter decision.
    */
  def classifierScore(
      docs: DataFrame, id: Column, text: Column,
      weights: DataFrame, buckets: Int): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
      explode(TextAnalysis.tokens(text)).as("token"))
    toks
      .withColumn("bucket",
        pmod(TextAnalysis.portableHash32(col("token")), lit(buckets.toLong)))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("token")).as("n_tokens"),
        coalesce(sum(col("w_milli")), lit(0L)).as("score_sum"))
      .withColumn("keep", (col("score_sum") >= 0).cast("bigint"))
  }

  /** A deterministic synthetic weight table for [[classifierScore]]
    * demos/gates: w(b) = (b·2654435761 mod 1997) − 998 — spread over
    * [−998, 998], reproducible on any engine with integer math.
    * Real deployments load trained weights from a table instead.
    */
  def syntheticWeights(spark: org.apache.spark.sql.SparkSession, buckets: Int): DataFrame =
    spark.range(buckets).select(
      col("id").as("bucket"),
      (pmod(col("id") * 2654435761L, lit(1997L)) - 998L).as("w_milli"))

  /** DSIR-style importance scoring (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS'23): score
    * every corpus document by how much its hashed-bigram distribution
    * looks like a TARGET domain sample versus the corpus itself —
    * the standard recipe for tilting a 100 TB crawl toward a domain
    * without training a classifier. Exact integer end to end:
    *
    *  - features: hashed bigrams into `buckets` (the DSIR hashed
    *    n-gram feature space);
    *  - per-bucket importance w(b) = p_target(b) / p_corpus(b) with
    *    Laplace smoothing, in milli fixed point:
    *    `w_milli(b) = (1000·(t_b+1)·(C+B)) div ((c_b+1)·(T+B))`
    *    (t/c = bucket counts, T/C = totals, B = buckets);
    *  - per-doc score = mean importance over its bigram OCCURRENCES
    *    (`score_milli = Σ w div n`), `keep` = score ≥ 1000 (more
    *    domain-like than corpus-average) — the deterministic
    *    selection analog of DSIR's weight-proportional sampling.
    *
    * Shape at scale: both count tables are ≤ `buckets` rows —
    * BROADCAST onto the occurrence stream; totals are two scalar
    * aggregates. One corpus scan per side plus the broadcast-joined
    * scoring pass; no shuffle keyed on anything wider than the doc id.
    * Int64 bounds: the numerator `1000·(t_b+1)·(C+B)` needs
    * t_b·C ≲ 9·10^15 — fine to ~10^7 target × 10^8 corpus bigrams; at
    * larger totals divide in two steps (scale after the ratio).
    * Docs with no bigram score (0, 0, keep=0).
    */
  private def bigramBuckets(
      df: DataFrame, cols: Seq[Column], t: Column, buckets: Int) =
    df.select((cols :+
      explode_outer(ngramStrings(TextAnalysis.tokens(t), 2)).as("bg")): _*)
      .withColumn("bucket", when(col("bg").isNotNull,
        pmod(TextAnalysis.portableHash32(col("bg")), lit(buckets.toLong))))

  /** The frozen DSIR weight table: `(bucket, w_milli)` for EVERY
    * bucket (absent-on-both-sides buckets get the smoothed neutral
    * ratio), derivable once and broadcast/pinned wherever scoring
    * happens — including a streaming scorer that must not rescan
    * either corpus.
    */
  def importanceWeights(
      corpus: DataFrame, text: Column,
      target: DataFrame, targetText: Column,
      buckets: Int = 4096): DataFrame = {
    val spark = corpus.sparkSession
    val tgtCnt = bigramBuckets(target, Seq(lit(1L).as("one")), targetText, buckets)
      .filter(col("bucket").isNotNull)
      .groupBy(col("bucket")).agg(count(lit(1)).as("t_cnt"))
    val corCnt = bigramBuckets(corpus, Seq(lit(1L).as("one")), text, buckets)
      .filter(col("bucket").isNotNull)
      .groupBy(col("bucket")).agg(count(lit(1)).as("c_cnt"))
    val totT = tgtCnt.agg(coalesce(sum("t_cnt"), lit(0L))).head.getLong(0)
    val totC = corCnt.agg(coalesce(sum("c_cnt"), lit(0L))).head.getLong(0)
    val b = buckets.toLong
    spark.range(buckets).select(col("id").as("bucket"))
      .join(tgtCnt, Seq("bucket"), "left")
      .join(corCnt, Seq("bucket"), "left")
      .withColumn("__num", lit(1000L)
        * (coalesce(col("t_cnt"), lit(0L)) + 1L) * lit(totC + b))
      .withColumn("__den",
        (coalesce(col("c_cnt"), lit(0L)) + 1L) * lit(totT + b))
      .select(col("bucket"), expr("__num div __den").as("w_milli"))
  }

  /** Score docs against a frozen weight table (stateless per doc —
    * any batch split lands identical scores).
    */
  def scoreWithImportanceWeights(
      docs: DataFrame, id: Column, text: Column,
      weights: DataFrame, buckets: Int = 4096): DataFrame =
    bigramBuckets(docs, Seq(id.as("doc_id")), text, buckets)
      .join(broadcast(weights), Seq("bucket"), "left")
      .withColumn("w_milli",
        when(col("bucket").isNotNull, col("w_milli")))
      .groupBy(col("doc_id"))
      .agg(count(col("bucket")).as("n_feats"),
        coalesce(sum(col("w_milli")), lit(0L)).as("w_sum"))
      .select(col("doc_id"), col("n_feats"),
        when(col("n_feats") === 0, lit(0L))
          .otherwise(expr("w_sum div n_feats")).as("score_milli"))
      .withColumn("keep", (col("score_milli") >= 1000L).cast("bigint"))

  def importanceScore(
      corpus: DataFrame, id: Column, text: Column,
      target: DataFrame, targetText: Column,
      buckets: Int = 4096): DataFrame =
    scoreWithImportanceWeights(corpus, id, text,
      importanceWeights(corpus, text, target, targetText, buckets), buckets)

  /** Per-doc hashed-bigram counts (doc_id, bucket, cnt) — the shared
    * DSIR feature table: weight training needs the corpus-side bucket
    * totals, scoring needs the per-doc rollup, and both otherwise
    * re-run the bigram explode (an md5 per bigram occurrence) over
    * the corpus (guide §6 read-once). A doc with no bigram keeps one
    * null-bucket row so the scorer still emits its (0, 0, keep=0).
    * Sealed pre-partitioned on doc_id — the scorer's groupBy rides
    * the checkpoint partitioning with no exchange.
    */
  def bigramBucketCounts(
      df: DataFrame, id: Column, text: Column,
      buckets: Int = 4096): DataFrame =
    bigramBuckets(df, Seq(id.as("doc_id")), text, buckets)
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .repartition(col("doc_id"))
      .localCheckpoint(true)

  /** [[importanceWeights]] with the corpus side fed from a pre-built
    * [[bigramBucketCounts]] table — value-identical (the bucket totals
    * are Σ cnt = occurrence counts), one corpus bigram pass cheaper.
    */
  def importanceWeightsFromCounts(
      corpusCnts: DataFrame,
      target: DataFrame, targetText: Column,
      buckets: Int = 4096): DataFrame = {
    val spark = corpusCnts.sparkSession
    val tgtCnt = bigramBuckets(target, Seq(lit(1L).as("one")), targetText, buckets)
      .filter(col("bucket").isNotNull)
      .groupBy(col("bucket")).agg(count(lit(1)).as("t_cnt"))
    val corCnt = corpusCnts
      .filter(col("bucket").isNotNull)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("c_cnt"))
    val totT = tgtCnt.agg(coalesce(sum("t_cnt"), lit(0L))).head.getLong(0)
    val totC = corCnt.agg(coalesce(sum("c_cnt"), lit(0L))).head.getLong(0)
    val b = buckets.toLong
    spark.range(buckets).select(col("id").as("bucket"))
      .join(tgtCnt, Seq("bucket"), "left")
      .join(corCnt, Seq("bucket"), "left")
      .withColumn("__num", lit(1000L)
        * (coalesce(col("t_cnt"), lit(0L)) + 1L) * lit(totC + b))
      .withColumn("__den",
        (coalesce(col("c_cnt"), lit(0L)) + 1L) * lit(totT + b))
      .select(col("bucket"), expr("__num div __den").as("w_milli"))
  }

  /** [[scoreWithImportanceWeights]] over a pre-built
    * [[bigramBucketCounts]] table — value-identical: n_feats counts
    * non-null-bucket occurrences (Σ cnt), w_sum sums their weights
    * (Σ cnt·w; the null-bucket marker row joins no weight and
    * contributes null, exactly like the occurrence spelling).
    */
  def scoreWithImportanceWeightsFromCounts(
      cnts: DataFrame, weights: DataFrame): DataFrame =
    cnts
      .join(broadcast(weights), Seq("bucket"), "left")
      .withColumn("w_milli",
        when(col("bucket").isNotNull, col("w_milli")))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("bucket").isNotNull, col("cnt")).otherwise(lit(0L)))
          .as("n_feats"),
        coalesce(sum(col("cnt") * col("w_milli")), lit(0L)).as("w_sum"))
      .select(col("doc_id"), col("n_feats"),
        when(col("n_feats") === 0, lit(0L))
          .otherwise(expr("w_sum div n_feats")).as("score_milli"))
      .withColumn("keep", (col("score_milli") >= 1000L).cast("bigint"))

  /** DSIR importance RESAMPLING — the paper's actual selection rule:
    * keep each scored doc with probability PROPORTIONAL to its
    * importance weight (milli weight 1000 = corpus-average = keep at
    * rate 1), via the same deterministic portable-hash per-mille
    * sampler every other curation stage uses. No RNG, no state, a
    * pure narrow filter — the same sample on every run/engine. The
    * hard `keep` flag ("strictly more target-like than average") is
    * for diagnostics; composing a TILT needs the proportional rule,
    * since a weakly-differentiated target domain can leave the hard
    * gate empty while the resample still shifts the mixture.
    */
  def importanceResample(
      scored: DataFrame, id: Column, salt: String = "dsir"): DataFrame =
    scored.filter(
      pmod(TextAnalysis.portableHash32(
        concat(lit(salt), lit(":"), id.cast("string"))), lit(1000L))
        < least(lit(1000L), col("score_milli")))

  /** Bigram-LM familiarity scoring — the exact-integer analog of the
    * KenLM-perplexity quality filter: train bigram occurrence counts
    * on the corpus itself (one aggregate), then score every document
    * by how familiar its bigrams are corpus-wide. Low familiarity /
    * high rarity = text unlike the rest of the corpus (gibberish,
    * encoding damage, exotic boilerplate) — the standard
    * perplexity-filter signal without a float log-prob in sight, so
    * the whole pipeline is oracle-exact.
    *
    * Per doc: `n_bigrams` (token occurrences, not distinct),
    * `avg_bigram_freq` = floor(Σ corpus-count / n_bigrams) — the mean
    * corpus frequency of the doc's bigrams, and `rare_permille` =
    * floor(1000·|bigrams with corpus count == 1| / n_bigrams) — the
    * share of bigrams that exist nowhere else in the corpus. Docs
    * with fewer than 2 tokens score (0, 0, 0).
    *
    * Shape at scale: the bigram vocabulary is corpus-sized — NOT
    * broadcastable — so the count table joins back on the bigram hash
    * (fixed-width shuffle key, both sides shuffle once); the per-doc
    * rollup is a map-side-combinable groupBy. Two aggregates + one
    * equi-join total; no window, no driver state.
    */
  def familiarity(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val occ = docs
      .select(id.as("doc_id"),
        explode_outer(ngramStrings(TextAnalysis.tokens(text), 2)).as("bg"))
      .withColumn("h", TextAnalysis.portableHash56(col("bg")))
    val counts = occ.filter(col("h").isNotNull)
      .groupBy(col("h")).agg(count(lit(1)).as("cnt"))
    occ.join(counts, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("h")).as("n_bigrams"),
        coalesce(sum(col("cnt")), lit(0L)).as("freq_sum"),
        coalesce(sum(when(col("cnt") === 1, 1L).otherwise(0L)), lit(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_bigrams"),
        when(col("n_bigrams") === 0, lit(0L))
          .otherwise(expr("freq_sum div n_bigrams")).as("avg_bigram_freq"),
        when(col("n_bigrams") === 0, lit(0L))
          .otherwise(expr("(1000 * n_rare) div n_bigrams")).as("rare_permille"))
  }

  /** K-minimum-values distinct-count estimator — cardinality profiling
    * that never materializes the distinct set anywhere: the classic
    * KMV sketch on the portable 56-bit hash space. Distinct hashes
    * (one map-side-combined shuffle), then the k smallest via
    * orderBy+limit — planned as TakeOrderedAndProject (per-partition
    * bounded heaps merged on the driver: O(partitions·k), never a
    * global sort). Estimate = (k−1)·2^56 / h_k, exact integer
    * division, so any engine reproduces the ESTIMATE bit-exactly (the
    * property approx_count_distinct's HLL cannot give an oracle).
    * Fewer than k distinct values ⇒ the count is already exact.
    * Standard error ≈ 1/√(k−2) (~13% at k = 64).
    *
    * Returns ONE row: (k_seen, kth_hash, est_distinct).
    */
  def distinctKmv(df: DataFrame, value: Column, k: Int = 64): DataFrame = {
    // (k-1)·2^56 must stay inside int64: k-1 < 128
    require(k >= 2 && k <= 128, s"k=$k must be in [2, 128]")
    val spark = df.sparkSession
    import spark.implicits._
    // Per-partition bounded k-min BEFORE any shuffle: each input
    // partition keeps only its k smallest DISTINCT hashes in a TreeSet
    // (the global k smallest distinct values are each among their own
    // partition's k smallest distinct), so the exchange moves at most
    // partitions·k longs instead of every distinct hash in the corpus —
    // the same k-min-distributes argument the streaming sibling
    // (kmvFromFiles) relies on, applied map-side.
    val perPartition = df
      .select(TextAnalysis.portableHash56(value).as("h"))
      .filter(col("h").isNotNull)
      .as[Long]
      .mapPartitions { it =>
        val smallest = new java.util.TreeSet[java.lang.Long]()
        it.foreach { h =>
          smallest.add(h)
          if (smallest.size > k) smallest.pollLast()
        }
        import scala.jdk.CollectionConverters._
        smallest.iterator.asScala.map(_.longValue())
      }
    val smallest = perPartition.toDF("h")
      .distinct()
      .orderBy(col("h"))
      .limit(k)
    kmvFinish(smallest, k)
  }

  /** PER-GROUP KMV distinct estimate — the grouped form of
    * [[distinctKmv]] (distinct users per segment, distinct tokens per
    * language: the rollup whose exact spelling shuffles every distinct
    * (group, value) pair, unpayable at corpus scale). Same two-phase
    * k-min-distributes shape, grouped: each input partition keeps the
    * k smallest distinct hashes PER GROUP it sees (a TreeSet per
    * group; bounded by groups×k per partition), the exchange moves at
    * most partitions×groups×k longs, and the per-group k smallest +
    * estimator run on that bounded frame (the rank window is fine
    * here precisely because the input is already bounded — it never
    * sees raw data). Returns (g, k_seen, kth_hash, est_distinct) per
    * group, DuckDB-replayable like the global operator.
    */
  def distinctKmvByGroup(
      df: DataFrame, group: Column, value: Column, k: Int = 64): DataFrame = {
    require(k >= 2 && k <= 128, s"k=$k must be in [2, 128]")
    val spark = df.sparkSession
    import spark.implicits._
    val perPartition = df
      .select(group.cast("string").as("g"),
        TextAnalysis.portableHash56(value).as("h"))
      .filter(col("h").isNotNull && col("g").isNotNull)
      .as[(String, Long)]
      .mapPartitions { it =>
        val mins =
          scala.collection.mutable.HashMap.empty[String, java.util.TreeSet[java.lang.Long]]
        it.foreach { case (g, h) =>
          val s = mins.getOrElseUpdate(g, new java.util.TreeSet[java.lang.Long]())
          s.add(h)
          if (s.size > k) s.pollLast()
        }
        import scala.jdk.CollectionConverters._
        mins.iterator.flatMap { case (g, s) =>
          s.iterator.asScala.map(h => (g, h.longValue()))
        }
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("h"))
    perPartition.toDF("g", "h")
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("k_seen"), max(col("h")).as("kth_hash"))
      .select(col("g"), col("k_seen"), col("kth_hash"),
        when(col("k_seen") < k || col("kth_hash") === 0, col("k_seen"))
          .otherwise(expr(s"(${k - 1} * 72057594037927936 div kth_hash)"))
          .cast("bigint").as("est_distinct"))
  }

  /** The KMV estimate over an (already k-truncated) frame of the
    * smallest distinct hashes — shared by the batch operator and the
    * streaming bounded-state spelling so both answer the SAME oracle.
    */
  private[graft] def kmvFinish(smallest: DataFrame, k: Int): DataFrame =
    smallest
      .agg(count(lit(1)).as("k_seen"), max(col("h")).as("kth_hash"))
      .select(col("k_seen"), col("kth_hash"),
        // kth_hash = 0 (an input whose md5 starts with 14 zero hex
        // digits) would make Spark's div return null where DuckDB's //
        // raises; but hashes are distinct, so the k-th SMALLEST being 0
        // forces k_seen = 1 < k and the first branch already answers
        // exactly. The explicit guard makes the div unreachable at 0.
        when(col("k_seen") < k || col("kth_hash") === 0, col("k_seen"))
          .otherwise(expr(s"(${k - 1} * 72057594037927936 div kth_hash)"))
          .cast("bigint").as("est_distinct"))

  /** Count-min sketch: `depth` hash rows × `width` buckets, bucket of
    * row j = (h1 + j·h2) mod 2^56 … mod width (the Kirsch–Mitzenmacher
    * family over ONE md5 per value — engine-portable). Built by one
    * narrow ×depth expansion + one map-side-combinable groupBy; the
    * sketch itself is model-sized (depth·width rows), the shape that
    * lets frequency estimation run over corpora whose exact count
    * table would itself be too large to keep. Returns (d, bucket, cnt).
    */
  def countMinSketch(
      df: DataFrame, value: Column, depth: Int = 3, width: Int = 4096): DataFrame = {
    // d·h2 + h1 < depth·2^56 must stay inside int64: depth <= 63
    require(depth >= 1 && depth <= 63 && width >= 1)
    df.select(
        TextAnalysis.portableHash56(value).as("h1"),
        TextAnalysis.portableHash56b(value).as("h2"))
      .filter(col("h1").isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("d"),
        col("h1"), col("h2"))
      .withColumn("bucket", pmod(col("h1") + col("d") * col("h2"), lit(width.toLong)))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate counts for `values` from a count-min sketch: min
    * over the depth rows of each value's bucket counts — the classic
    * one-sided CM bound (estimate ≥ true count, over-counting only
    * from collisions). The sketch side is broadcast (model-sized); the
    * probe is one equi-join + one groupBy on the value.
    */
  def cmEstimate(
      sketch: DataFrame, values: DataFrame, value: Column,
      depth: Int, width: Int): DataFrame =
    values
      .select(value.as("v"),
        TextAnalysis.portableHash56(value).as("h1"),
        TextAnalysis.portableHash56b(value).as("h2"))
      .select(col("v"), explode(sequence(lit(0), lit(depth - 1))).as("d"),
        col("h1"), col("h2"))
      .withColumn("bucket", pmod(col("h1") + col("d") * col("h2"), lit(width.toLong)))
      // Left join: a (d, bucket) row absent from the sketch means that
      // bucket was never hit, so the correct CM count there is 0 (and
      // the min over depth rows is then 0) — an inner join would either
      // drop the probed value or take min over < depth rows.
      .join(broadcast(sketch), Seq("d", "bucket"), "left")
      .groupBy(col("v"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))

  /** Exact floor division for int64 columns: `(a - pmod(a, b)) / b`.
    * The numerator is exactly divisible by `b`, so the double divide
    * is exact below 2^53 (every quantity in [[trainClassifier]] stays
    * orders of magnitude under that); DuckDB replays it as
    * `(a - ((a % b) + b) % b) // b` — its `//` truncates, but a
    * divisible numerator makes truncation == floor. One spelling,
    * both engines, no float drift.
    */
  private[graft] def fdiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("bigint")

  /** In-engine TRAINING of the hashed linear quality classifier —
    * batch gradient descent in exact int64 fixed point, so the run is
    * bit-reproducible on ANY partitioning of the corpus and on any
    * engine (a DuckDB oracle replays every iteration as a CTE chain).
    * That determinism is the point at cluster scale: float gradient
    * sums depend on partition order, so retraining on 1000 executors
    * never reproduces; integer sums are associative-commutative and
    * always do.
    *
    * The model distills the heuristic quality gate into a fasttext-
    * style hashed bag-of-words model ([[classifierScore]]'s exact
    * feature space, so the trained table drops straight into it):
    * label y = 1 iff [[TextAnalysis.qualityMilli]] ≥ `labelThreshold`
    * (self-distillation — the standard way a cheap rule becomes a
    * cheaper, smoother model-based filter). Prediction is a
    * hard-sigmoid logistic unit in micro fixed point (scale 10^6):
    *
    *   t     = fdiv(z, n_toks)            mean token weight, micro
    *   yhat  = clamp(fdiv(t, 4) + 500000, 0, 10^6)
    *   err   = fdiv((y_micro − yhat) · cw(y), 10^6)
    *   G_b   = Σ_docs fdiv(err · cnt_b, n_toks)
    *   w_b  += fdiv(G_b, 2 · n_docs)      (learning rate 1/2)
    *
    * `cw(y)` is the class-balance weight `min(5·10^5·n/n_y, 10^8)` —
    * a corpus that is mostly "keep" (quality gates usually are) would
    * otherwise drift every shared bucket positive and the model would
    * collapse to the all-ones baseline; inverse-frequency weighting
    * makes the two classes pull equally (the cap guards the int64
    * budget when one class all but vanishes). Both weights are exact
    * integer scalars computed from one count aggregate.
    *
    * Shape at scale: the (doc, bucket, cnt) feature table is built
    * once (one corpus pass, map-side-combinable aggregate) and reused
    * every iteration; each iteration is a broadcast join of the
    * model-sized weight table + two map-side-combinable aggregates —
    * no window, no driver-side data beyond the `buckets`-row model.
    */
  def trainClassifier(
      docs: DataFrame, id: Column, text: Column,
      buckets: Int, iters: Int,
      labelThreshold: Long = 30L): DataFrame = {
    val (tok, lab) = classifierFeatures(docs, id, text, buckets, labelThreshold)
    trainClassifierOnFeatures(tok, lab, buckets, iters)
  }

  /** The classifier's two sealed feature tables, built ONCE from one
    * corpus pass each and shared by training AND scoring (guide §6
    * read-once: a composed curation pipeline otherwise re-tokenizes
    * the corpus per stage — each token pays an md5):
    *  - `tok` (doc_id, bucket, cnt): hashed bag-of-words occurrence
    *    counts;
    *  - `lab` (doc_id, n_toks, y_micro): token counts + distillation
    *    labels.
    * Both sealed PRE-PARTITIONED on doc_id (guide §2.4: operations
    * keyed the same way share one exchange): each GD iteration
    * aggregates tok by doc_id, joins lab on doc_id, then joins tok on
    * doc_id again — with the checkpoint pinned to
    * hashpartitioning(doc_id), none of those re-shuffles the
    * corpus-sized feature table; the only per-iteration exchange left
    * is the model-sized bucket rollup. (Integer arithmetic end to
    * end, so results are partitioning-independent — plan shape only.)
    */
  def classifierFeatures(
      docs: DataFrame, id: Column, text: Column,
      buckets: Int, labelThreshold: Long = 30L): (DataFrame, DataFrame) = {
    val base = docs.select(id.as("doc_id"), text.as("text"))
    val tok = base
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      .withColumn("bucket",
        pmod(TextAnalysis.portableHash32(col("token")), lit(buckets.toLong)))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .repartition(col("doc_id"))
      .localCheckpoint(true)
    val lab = base.select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_toks"),
      when(TextAnalysis.qualityMilli(col("text")) >= labelThreshold,
        lit(1000000L)).otherwise(lit(0L)).as("y_micro"))
      .repartition(col("doc_id"))
      .localCheckpoint(true)
    (tok, lab)
  }

  /** Score docs from the PRE-BUILT [[classifierFeatures]] `tok` table
    * instead of re-tokenizing the corpus — value-identical to
    * [[classifierScore]] (n_tokens = Σ cnt = token occurrences;
    * score_sum = Σ cnt·w over the same occurrences; docs whose token
    * array is empty appear in neither spelling), one corpus pass
    * cheaper, and the groupBy rides tok's pinned doc_id partitioning
    * with no exchange.
    */
  def classifierScoreFromFeatures(
      tok: DataFrame, weights: DataFrame): DataFrame =
    tok
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_tokens"),
        coalesce(sum(col("cnt") * col("w_milli")), lit(0L)).as("score_sum"))
      .withColumn("keep", (col("score_sum") >= 0).cast("bigint"))

  /** The GD loop of [[trainClassifier]] over pre-built
    * [[classifierFeatures]] tables.
    */
  def trainClassifierOnFeatures(
      tok: DataFrame, lab: DataFrame,
      buckets: Int, iters: Int): DataFrame = {
    val spark = tok.sparkSession
    val cnts = lab.agg(
      sum(when(col("y_micro") > 0, lit(1L)).otherwise(lit(0L))),
      count(lit(1))).head()
    val nPos = cnts.getLong(0)
    val nDocs = cnts.getLong(1)
    val nNeg = nDocs - nPos
    val cPos = math.min(500000L * nDocs / math.max(nPos, 1L), 100000000L)
    val cNeg = math.min(500000L * nDocs / math.max(nNeg, 1L), 100000000L)
    def clampMicro(c: Column): Column =
      least(greatest(c, lit(0L)), lit(1000000L))
    var w = spark.range(buckets.toLong)
      .select(col("id").as("bucket"), lit(0L).as("w_micro"))
    var i = 0
    while (i < iters) {
      val z = tok.join(broadcast(w), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt") * col("w_micro")).as("z"))
      val p = lab.join(z, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_toks"),
          fdiv(
            (col("y_micro") - clampMicro(
              fdiv(fdiv(coalesce(col("z"), lit(0L)), col("n_toks")), lit(4L))
                + lit(500000L))) *
              when(col("y_micro") > 0, lit(cPos)).otherwise(lit(cNeg)),
            lit(1000000L)).as("err"))
      val g = tok.join(p, Seq("doc_id"))
        .groupBy(col("bucket"))
        .agg(sum(fdiv(col("err") * col("cnt"), col("n_toks"))).as("g"))
      w = w.join(g, Seq("bucket"), "left")
        .select(col("bucket"),
          (col("w_micro") + fdiv(coalesce(col("g"), lit(0L)),
            lit(2L * nDocs))).as("w_micro"))
        .localCheckpoint(true)
      i += 1
    }
    w.orderBy(col("bucket"))
  }
}
