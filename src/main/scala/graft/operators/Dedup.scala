package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for LLM-data pipelines: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard.
  *
  * Scale design: candidate generation is ALWAYS a bucketed equi-join
  * (shuffle on a band/bucket hash) — never an all-pairs cross join. At
  * 100 TB the shuffle volume is O(n · bands), and each bucket is small
  * by construction (hash of r minhash rows); skewed buckets (e.g. empty
  * documents) can be salted or capped upstream.
  */
object Dedup {

  /** Exact dedup: group on the md5 of the normal form, keep the lowest
    * id. One shuffle on the fingerprint; map-side partial agg applies.
    */
  def exact(docs: DataFrame, textCol: Column, idCol: Column): DataFrame =
    docs
      .select(TextAnalysis.fingerprintMd5(textCol).as("fingerprint"), idCol.as("doc_id"))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** k-shingles (k consecutive tokens, space-joined). Higher-order
    * functions only — no explode, no shuffle.
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) < k, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Modulus of the portable double-hashing family: 2^56. */
  val MinHashMod: Long = 1L << 56

  /** Per-shingle (h1, h2) portable hash pairs — ONE md5 per shingle;
    * the whole hash family derives arithmetically (see
    * [[minHashFromHashes]]). Project this as its own column before the
    * signature so the md5 work runs once, not once per hash function.
    */
  def shingleHashes(text: Column, shingleSize: Int): Column =
    transform(shingles(text, shingleSize), s =>
      struct(TextAnalysis.portableHash56(s).as("h1"),
        TextAnalysis.portableHash56b(s).as("h2")))

  /** MinHash signature from precomputed (h1, h2) pairs: hash function
    * j is the Kirsch–Mitzenmacher combination (h1 + j·h2) mod 2^56 —
    * an engine-portable family (any SQL engine with md5 reproduces it
    * bit-exactly, which is what puts the signature under the DuckDB
    * oracle gate). Empty shingle sets give the sentinel 2^56 (above
    * every real hash). Per-row array fold; no shuffle.
    */
  def minHashFromHashes(hashes: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), j =>
      aggregate(hashes, lit(MinHashMod), (acc, e) =>
        least(acc, pmod(e.getField("h1") + j * e.getField("h2"), lit(MinHashMod)))))

  /** MinHash signature straight from text — the fused
    * [[graft.functions.MinHashSigTokens]] kernel: shingling AND the
    * whole hash family run in one primitive loop over the token array
    * (no shingle-string column, no interpreted concat pass;
    * value-identical to [[minHashFromHashes]], spec-asserted).
    */
  def minHashSignature(text: Column, numHashes: Int, shingleSize: Int): Column =
    graft.functions.MinHashSigTokens(
      TextAnalysis.tokens(text), shingleSize, numHashes)

  /** Candidate near-duplicate pairs via LSH: equi-join on
    * (band_id, band_hash) — a shuffle on the bucket key, NEVER a cross
    * join — deduped to (a < b) pairs with the estimated Jaccard =
    * fraction of equal signature positions.
    */
  def nearDuplicateCandidates(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSig = docs.select(
      idCol.as("doc_id"),
      minHashSignature(textCol, numHashes, shingleSize).as("sig"))
    val banded = withSig.select(
      col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        .as(Seq("band_id", "band_hash")))
    // self-join via alias (identical subtrees → one shuffle of the
    // banded signature table, exchange-reused by both sides)
    banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_hash") === col("b.band_hash"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (aggregate(zip_with(col("a.sig"), col("b.sig"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
          .cast("double") / numHashes).as("est_jaccard"))
      .distinct()
  }

  /** LSH candidates with ENGINE-PORTABLE banding: the band key is the
    * raw r-row signature slice itself (array-equality equi-join), not
    * an engine hash of it — so the COMPLETE pipeline (portable minhash
    * signature → banding → pair emission → similarity estimate)
    * reproduces bit-exactly in any SQL engine and sits under the
    * DuckDB oracle gate end to end. Exactly-once emission: a pair
    * survives only from its FIRST agreeing band (decided by comparing
    * the carried signatures — per-row arithmetic, no `distinct`
    * re-shuffle of the candidate set, unlike the hashed variant).
    * Same shuffle shape as [[nearDuplicateCandidates]]: one equi-join
    * on (band_id, band_key); the wider key (r longs vs one int) buys
    * zero false bucket collisions.
    */
  def nearDuplicateCandidatesPortable(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3): DataFrame = {
    val r = numHashes / bands
    val withSig = docs.select(
      idCol.as("doc_id"),
      minHashSignature(textCol, numHashes, shingleSize).as("sig"))
    val banded = withSig.select(
      col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * r + 1, lit(r))))
        .as(Seq("band_id", "band_key")))
    val firstAgreeingBand = array_position(
      transform(sequence(lit(0), lit(bands - 1)), bi =>
        slice(col("a.sig"), bi * r + 1, lit(r)) ===
          slice(col("b.sig"), bi * r + 1, lit(r))),
      true) - 1
    // self-join via alias (identical subtrees → one shuffle of the
    // banded signature table, exchange-reused by both sides)
    banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_key") === col("b.band_key"))
      .filter(col("a.doc_id") < col("b.doc_id") &&
        firstAgreeingBand === col("a.band_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(aggregate(zip_with(col("a.sig"), col("b.sig"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
          .cast("double") * 1000 / numHashes)
          .cast("bigint").as("est_jaccard_milli"))
  }

  /** Exact n-gram Jaccard for a set of candidate pairs (doc_a, doc_b):
    * verification step after LSH. Joins the shingle sets back — the
    * candidate set is tiny relative to the corpus, so this is two
    * broadcast-able joins plus one per-pair array op.
    */
  def jaccardVerify(
      candidates: DataFrame,
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      shingleSize: Int = 3): DataFrame = {
    val sh = docs.select(
      idCol.as("doc_id"),
      array_distinct(shingles(textCol, shingleSize)).as("sh"))
    candidates
      .join(sh.withColumnsRenamed(Map("doc_id" -> "doc_a", "sh" -> "sh_a")), "doc_a")
      .join(sh.withColumnsRenamed(Map("doc_id" -> "doc_b", "sh" -> "sh_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
  }

  /** Corpus-scale exact n-gram Jaccard via an inverted-index join (no
    * candidate set required): explode each doc's DISTINCT shingle
    * hashes, self-join on the hash, and count shared shingles per
    * pair — the intersection size falls straight out of the group-by,
    * and the union is |A| + |B| − |A∩B|.
    *
    * Scale design:
    *  - the index key is the 56-bit PORTABLE shingle hash from the
    *    native [[graft.functions.ShingleHashes56]] kernel (one md5
    *    per shingle in a single primitive loop) — the interpreted
    *    HOF shingle-string pipeline this replaces was ~20× slower,
    *    and an 8-byte join key shuffles a fraction of the strings;
    *  - `maxShingleDf` is an idf floor, the standard guard every
    *    serious near-dup index applies: a shingle shared by more
    *    than `maxShingleDf` documents (boilerplate, stop-word runs)
    *    carries no similarity signal but contributes df² pairs —
    *    one stop shingle across 1M docs would emit ~5·10¹¹ pairs.
    *    Dropping them bounds pair volume by df·|index| (linear in
    *    corpus size) and the union arithmetic stays consistent by
    *    counting only KEPT shingles on both sides;
    *  - the df cap and the per-doc kept-shingle count are AGGREGATES,
    *    not windows: a window over the shingle key must materialize
    *    and sort each key's partition in one task — and the hottest
    *    keys are exactly the boilerplate the cap exists to drop, so
    *    at 1M docs one stop shingle would pin ~1M rows in a single
    *    task *before* the filter discards them. `groupBy("h").count()`
    *    lets map-side partial aggregation absorb the hot key to one
    *    row per partition; only the tiny over-cap shingle list
    *    survives, anti-joined back against the index (broadcast when
    *    small, shuffle otherwise — AQE handles residual skew);
    *  - both self-join sides are the same sub-plan shuffled on the
    *    hash (merge-join hint), so Spark's ReuseExchange computes
    *    the index pipeline once.
    */
  def ngramJaccard(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      shingleSize: Int = 3,
      minJaccardMilli: Int = 500,
      maxShingleDf: Int = 64): DataFrame = {
    val inv = docs.select(
      idCol.as("doc_id"),
      explode(graft.functions.ShingleHashes56(
        TextAnalysis.tokens(textCol), shingleSize)).as("h"))
    // shingles with df > maxShingleDf: a hash-aggregate with map-side
    // combine (hot keys collapse to one row per map partition), then a
    // filter that keeps only the over-cap tail — tiny by construction
    // (at most totalShingleRows / maxShingleDf distinct hashes).
    val overCap = inv
      .groupBy(col("h"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDf)
      .select(col("h"))
    val keptInv = inv.join(overCap, Seq("h"), "left_anti")
    // kept-shingle count per doc — again an aggregate (one row per
    // doc), carried onto each index row so the pair group-by below
    // needs no end-join against a per-doc side table.
    val perDoc = keptInv.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val kept = keptInv.join(perDoc, "doc_id")
      .select(col("doc_id"), col("n_sh"), col("h"))
      .hint("merge")
    // self-join via alias (identical subtrees → one shuffle + sort of
    // the inverted index, exchange-reused by both sides)
    kept.as("a").join(kept.as("b"), col("a.h") === col("b.h"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      .agg(count(lit(1)).as("inter"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("n_a") + col("n_b") - col("inter")).cast("bigint").as("uni"),
        round(lit(1000.0) * col("inter") / (col("n_a") + col("n_b") - col("inter")))
          .cast("bigint").as("jaccard_milli"))
      .filter(col("jaccard_milli") >= minJaccardMilli)
  }

  /** SimHash near-duplicates via pigeonhole banding (the classic
    * simhash dedup construction) over the native 64-bit
    * [[graft.functions.SimHash64]]: split the simhash into 4 16-bit
    * words — any pair within Hamming distance <= 3 must agree on at
    * least one word — bucket-join on (word index, word value), then
    * exact `bit_count(xor)` rerank.
    *
    * Scale design (the 32-bit byte-banded ancestor had 4×256 = 1,024
    * total buckets — expected bucket size n/1024 goes quadratic long
    * before 100 TB — and re-shuffled the candidate set through a
    * `dropDuplicates`):
    *  - 4×65,536 = 262k buckets, and within-band bucket values spread
    *    over the full 16-bit space;
    *  - exactly-once emission by the FIRST-AGREEING-BAND predicate
    *    (codegen'd integer compares on the packed signature — the
    *    same machinery as the minhash/embedding LSH paths), so there
    *    is no dedupe re-shuffle of the candidate set;
    *  - a default-on hot-bucket cap ([[Similarity.capBuckets]]): a
    *    degenerate word value (e.g. the all-zero word of very short
    *    docs) is dropped above the cap, bounding per-bucket pair
    *    volume, with surviving-table bitmasks preserving exactly-once
    *    emission for pairs that also agree elsewhere.
    */
  def simhashNearDups(
      docs: DataFrame, textCol: Column, idCol: Column,
      maxHamming: Int = 3,
      maxBucketSize: Option[Int] = Some(10000)): DataFrame =
    hamming64NearDups(
      docs.select(
        idCol.as("id"),
        graft.functions.SimHash64(TextAnalysis.tokens(textCol)).as("sig")),
      maxHamming, maxBucketSize)

  /** Pigeonhole near-dup pairs over ANY packed 64-bit signature column
    * (`(id, sig)` input) — the banding machinery shared by the text
    * simhash path and the image perceptual-hash path: 4 × 16-bit
    * words (a pair within Hamming distance ≤ 3 must agree on at least
    * one word), bucket self-join (never all-pairs), exactly-once
    * first-agreeing-word emission, exact `bit_count(xor)` rerank.
    */
  def hamming64NearDups(
      withSig: DataFrame, // (id, sig: long)
      maxHamming: Int = 3,
      maxBucketSize: Option[Int] = Some(10000)): DataFrame = {
    val bits = 16
    val tables = 4
    // word q = bits [16q, 16q+16) of the packed signature (unsigned
    // shift: the sign bit is just bit 63 of word 3)
    val bands = (0 until tables).map(q =>
      shiftrightunsigned(col("sig"), bits * q).bitwiseAND(lit((1L << bits) - 1)))
    val e = Similarity.capBuckets(
      withSig.select(col("id"), col("sig"),
        posexplode(array(bands: _*)).as(Seq("tbl", "bucket"))),
      maxBucketSize, tables)
    // SELF-join on identical subtrees (alias-rename AFTER the join):
    // both inputs canonicalize equal, so exchange reuse computes the
    // signature + banding chain ONCE — per-side projections before
    // the join made the subtrees differ and ran it twice (guide §2.4)
    e.as("a").join(e.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket"))
      .filter(col("a.id") < col("b.id") &&
        col("a.tbl") === Similarity.emissionPredicate(maxBucketSize,
          col("a.sig"), col("b.sig"), col("a.__surv"), col("b.__surv"),
          bits, tables) &&
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= maxHamming)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig")))
          .cast("bigint").as("hamming"))
  }

  /** Embedding-cosine near-duplicates (semantic dedup): sign-LSH
    * bucketing (same machinery as ANN — shuffle on the bucket key,
    * never all-pairs), within-bucket self-join, exact rerank with the
    * codegen'd [[graft.functions.QuantizedDot]] kernel.
    *
    * Scale design beyond the bucket join:
    *  - each candidate pair is emitted exactly ONCE — from the first
    *    table where the two bucket arrays agree — so there is no
    *    `dropDuplicates` shuffle over the (much larger) candidate set;
    *  - the threshold `cos >= minCosineMilli/1000` is evaluated on the
    *    milli-quantized integers with an exact cross-multiplied
    *    comparison (dot > 0 ∧ dot²·10⁶ ≥ m²·‖a‖²q·‖b‖²q — decimal, no
    *    sqrt, no floating point), which makes the output deterministic
    *    and independently oracle-checkable;
    *  - the per-pair work is one codegen'd primitive loop, not an
    *    interpreted higher-order fold.
    */
  def embeddingNearDups(
      df: DataFrame, id: Column, vec: Column,
      minCosineMilli: Long, bits: Int = 8, tables: Int = 4,
      maxBucketSize: Option[Int] = Some(10000)): DataFrame = {
    import Similarity.{packedSignBuckets, signBuckets}
    import graft.functions.QuantizedDot
    val pre = df.select(id.as("id"), vec.as("v"),
      signBuckets(vec, bits, tables).as("bs"),
      packedSignBuckets(vec, bits, tables).as("sig"))
      .withColumn("nq", QuantizedDot(col("v"), col("v")))
    // default-on hot-bucket cap — see [[Similarity.capBuckets]]: a
    // degenerate bucket (near-duplicate flood, all-zero vectors) would
    // otherwise emit O(bucket²) pairs; under the default cap no fixture
    // bucket is dropped (they're far below 10k), so the oracle-gated
    // outputs are unchanged while a 100 TB corpus is bounded. Pass
    // None to disable (exhaustive small-corpus runs).
    val e = Similarity.capBuckets(
      pre.select(col("id"), col("v"), col("nq"), col("sig"),
        posexplode(col("bs")).as(Seq("tbl", "bucket"))),
      maxBucketSize, tables)
    // self-join via alias (identical subtrees → one shuffle of the
    // bucketed vector table, exchange-reused by both sides)
    e.as("l").join(e.as("r"),
        col("l.tbl") === col("r.tbl") && col("l.bucket") === col("r.bucket"))
      .filter(col("l.id") < col("r.id") &&
        col("l.tbl") === Similarity.emissionPredicate(maxBucketSize,
          col("l.sig"), col("r.sig"), col("l.__surv"), col("r.__surv"),
          bits, tables) &&
        graft.functions.QuantizedCosineGe(
          col("l.v"), col("r.v"), col("l.nq"), col("r.nq"), minCosineMilli))
      // recompute the dot only for the (tiny) surviving pair set
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        QuantizedDot(col("l.v"), col("r.v")).as("dot_q"))
  }

  /** SEMANTIC decontamination — the embedding-space sibling of
    * [[Corpus.contamination]]'s n-gram flag: flag every corpus member
    * whose embedding is within `minCosineMilli` cosine of ANY eval-set
    * embedding (benchmark leakage that survives paraphrasing, which
    * n-gram overlap misses). BIPARTITE sign-LSH: the (small) eval set
    * explodes to its (table, bucket) keys and BROADCASTS onto the
    * corpus side's keys — the corpus streams through once, per-row
    * work is bounded by the eval rows sharing a bucket (≤ |eval|), and
    * no all-pairs join exists at any size. Each (corpus, eval) pair is
    * checked exactly once (first-agreeing-table predicate) with the
    * exact integer cosine test, so `n_near_eval` is a true distinct
    * count. Output: one row PER CORPUS MEMBER —
    * (vec_id, n_near_eval, contaminated).
    */
  def semanticContamination(
      corpus: DataFrame, id: Column, vec: Column,
      evalSet: DataFrame, evalId: Column, evalVec: Column,
      minCosineMilli: Long, bits: Int = 6, tables: Int = 8): DataFrame = {
    import Similarity.{firstAgreeingTable, packedSignBuckets, signBuckets}
    import graft.functions.QuantizedDot
    val c = corpus.select(id.as("id"), vec.as("v"),
        signBuckets(vec, bits, tables).as("bs"),
        packedSignBuckets(vec, bits, tables).as("sig"))
      .withColumn("nq", QuantizedDot(col("v"), col("v")))
      .select(col("id"), col("v"), col("nq"), col("sig"),
        posexplode(col("bs")).as(Seq("tbl", "bucket")))
    val e = evalSet.select(evalId.as("eid"), evalVec.as("ev"),
        signBuckets(evalVec, bits, tables).as("ebs"),
        packedSignBuckets(evalVec, bits, tables).as("esig"))
      .withColumn("enq", QuantizedDot(col("ev"), col("ev")))
      .select(col("eid"), col("ev"), col("enq"), col("esig"),
        posexplode(col("ebs")).as(Seq("tbl", "bucket")))
    val hits = c.join(broadcast(e), Seq("tbl", "bucket"))
      .filter(col("tbl") === firstAgreeingTable(
          col("sig"), col("esig"), bits, tables)
        && graft.functions.QuantizedCosineGe(
          col("v"), col("ev"), col("nq"), col("enq"), minCosineMilli))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_near_eval"))
    corpus.select(id.as("vec_id"))
      .join(hits.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_near_eval"), lit(0L)).as("n_near_eval"),
        (coalesce(col("n_near_eval"), lit(0L)) > 0L)
          .cast("bigint").as("contaminated"))
  }

  /** Portable 32-bit token hashes for [[simHashFromHashes]] — one md5
    * per token; project as its own column so it runs once.
    */
  def tokenHashes32(text: Column): Column =
    transform(TextAnalysis.tokens(text), t => TextAnalysis.portableHash32(t))

  /** 32-bit SimHash from precomputed token hashes: per-bit majority
    * vote, folded with higher-order functions (per-row, no shuffle).
    * Portable-hash based, so an independent engine reproduces it.
    */
  def simHashFromHashes(hashes: Column): Column = {
    // bit i of a 32-bit hash, via a mask (shiftright only takes a
    // literal shift, the lambda variable `i` is a Column): 2^i as long.
    def mask(i: Column) = pow(lit(2.0), i).cast("long")
    val bits = transform(sequence(lit(0), lit(31)), i =>
      when(
        aggregate(hashes, lit(0),
          (acc, h) => acc +
            when(h.bitwiseAND(mask(i)) =!= 0, 1).otherwise(-1))
          > 0, lit(1L)).otherwise(lit(0L)))
    aggregate(
      zip_with(bits, sequence(lit(0), lit(31)), (b, i) => b * mask(i)),
      lit(0L), _ + _)
  }

  /** 32-bit SimHash straight from text — the native
    * [[graft.functions.SimHash32]] kernel (value-identical to
    * [[simHashFromHashes]], spec-asserted).
    */
  def simHash(text: Column): Column =
    graft.functions.SimHash32(TextAnalysis.tokens(text))
}
