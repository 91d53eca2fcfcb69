package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series subsequence similarity search (the "find windows that
  * look like this pattern" primitive — EDBT'19-style streaming-data
  * similarity search, UCR-suite shape): per-key event series →
  * sliding windows → OFFSET-INVARIANT squared distance to a query
  * pattern → global top-k matches.
  *
  * The distance is mean-centered SSD kept EXACT in int64 by scaling
  * through the window length instead of dividing by it:
  * d = Σⱼ ((w·xⱼ − Sₓ) − (w·qⱼ − S_q))², which is w² × the
  * mean-centered SSD — same ranking, no floating point, so an
  * independent engine reproduces every distance bit-for-bit
  * (oracle-gated).
  *
  * Shape at scale: series are assembled per KEY (one shuffle on the
  * series key; a key's events must fit an executor — series are
  * device/user-sized, not corpus-sized); window extraction is a
  * narrow per-row expansion; the pattern broadcasts as a literal;
  * the global top-k is orderBy+limit = TakeOrderedAndProject
  * (per-partition heaps, never a global sort).
  */
object TimeSeries {

  /** Per-key sliding windows of `w` consecutive values in
    * (ts, tiebreak) order: (k, idx, win) with 0-based idx.
    */
  def slidingWindows(
      events: DataFrame, key: Column, ts: Column, tiebreak: Column,
      value: Column, w: Int): DataFrame = {
    require(w >= 2, s"window length $w must be >= 2")
    val series = events
      .select(key.as("k"), struct(ts.as("ts"), tiebreak.as("tb"), value.as("v")).as("e"))
      .groupBy(col("k"))
      .agg(transform(array_sort(collect_list(col("e"))), e => e.getField("v"))
        .as("vals"))
    series
      .select(col("k"),
        posexplode(
          when(size(col("vals")) >= w,
            transform(sequence(lit(0), size(col("vals")) - lit(w)),
              i => slice(col("vals"), i + lit(1), lit(w))))
            .otherwise(array().cast("array<array<bigint>>")))
          .as(Seq("idx", "win")))
  }

  /** Exact integer offset-invariant squared distance between a window
    * column and a literal pattern: Σ ((w·x − Sₓ) − (w·q − S_q))² —
    * the pattern ships as an array literal into the same native
    * [[graft.functions.CenteredSsd]] kernel the pair scan uses.
    */
  def centeredDistance(win: Column, pattern: Array[Long]): Column =
    graft.functions.CenteredSsd(win, lit(pattern), pattern.length)

  /** Exact integer offset-invariant squared distance between two
    * window columns (the pairwise form of [[centeredDistance]]) —
    * runs per CANDIDATE PAIR, so it goes through the native
    * [[graft.functions.CenteredSsd]] kernel; the declarative form
    * below is the portable reference it is spec-pinned to.
    */
  def centeredDistancePair(a: Column, b: Column, w: Int): Column =
    graft.functions.CenteredSsd(a, b, w)

  /** The declarative (HOF) definition of [[centeredDistancePair]]. */
  def centeredDistancePairDeclarative(a: Column, b: Column, w: Int): Column = {
    val sa = aggregate(a, lit(0L), _ + _)
    val sb = aggregate(b, lit(0L), _ + _)
    aggregate(
      zip_with(a, b, (x, y) =>
        (x * w - sa - (y * w - sb)) * (x * w - sa - (y * w - sb))),
      lit(0L), _ + _)
  }

  /** Offset-invariant PAA sketch of a window: split into `paa` equal
    * segments, take `paa·segsum − total` per segment (integer,
    * offset-free), then coarsen by a power-of-two `shift` (the +2^40
    * bias keeps the value non-negative so `>>` floors identically on
    * every engine). Windows with equal sketches are closest-pair
    * candidates — the discretized-PAA bucketing the indexable
    * time-series literature uses, playing the role LSH bands play in
    * the dedup pipeline.
    */
  def paaSketch(win: Column, w: Int, paa: Int, shift: Int): Column = {
    require(w % paa == 0, s"w=$w must divide into paa=$paa segments")
    val segLen = w / paa
    val total = aggregate(win, lit(0L), _ + _)
    transform(sequence(lit(0), lit(paa - 1)), i =>
      shiftright(
        aggregate(slice(win, i * segLen + 1, lit(segLen)), lit(0L), _ + _) * paa
          - total + lit(1L << 40),
        shift))
  }

  /** Motif DISCOVERY — the matrix-profile headline question ("which
    * two windows anywhere in the corpus are closest?") without the
    * O(n²) scan: windows bucket by their PAA sketch (equi-join, the
    * same never-all-pairs shape as the LSH dedup operators), pairs
    * within a bucket get the exact centered distance, the global
    * top-k ranks by (dist, keys, idxs). Overlapping windows of the
    * same series are excluded (trivial matches); `maxBucket` drops
    * degenerate flooded buckets (a constant series floods one
    * sketch), bounding candidate volume like the dedup bucket caps.
    * Sketch-equality is a candidate FILTER, not the metric — recall
    * vs the exact scan is spec-measured, the emitted distances exact.
    */
  def motifPairs(
      events: DataFrame, key: Column, ts: Column, tiebreak: Column,
      value: Column, w: Int, paa: Int, shift: Int, k: Int,
      maxBucket: Int = 10000): DataFrame = {
    val wins = slidingWindows(events, key, ts, tiebreak, value, w)
      .withColumn("b",
        array_join(transform(paaSketch(col("win"), w, paa, shift),
          _.cast("string")), ","))
    // The hot-bucket cap rides the SAME shuffle as the join sides: a
    // count over a window partitioned by the bucket key replaces the
    // separate groupBy + semi-join (which re-ran the whole window-
    // construction chain — scan → collect_list → explode — a third
    // time). Same cap semantics: a bucket's windows all share one
    // count, compared after it's complete.
    val side = wins
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("b"))))
      .filter(col("__n") <= maxBucket)
      .select(col("b"), col("k"), col("idx"), col("win"))
    // SELF-join on identical subtrees (rename via alias AFTER the
    // join, not with per-side projections): both join inputs
    // canonicalize equal, so Spark's exchange reuse feeds both sides
    // from ONE shuffle of the window table — the former l/r
    // projections made the subtrees differ and the chain ran once per
    // side (guide §2.4: remove shuffles outright)
    val cands = side.as("l").join(side.as("r"),
      col("l.b") === col("r.b") &&
        (col("l.k") < col("r.k") ||
          (col("l.k") === col("r.k") && col("l.idx") + w <= col("r.idx"))))
    cands
      .select(col("l.k").as("k1"), col("l.idx").cast("bigint").as("i1"),
        col("r.k").as("k2"), col("r.idx").cast("bigint").as("i2"),
        centeredDistancePair(col("l.win"), col("r.win"), w).as("dist"))
      .orderBy(col("dist").asc, col("k1").asc, col("i1").asc,
        col("k2").asc, col("i2").asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("dist").asc, col("k1").asc, col("i1").asc,
            col("k2").asc, col("i2").asc)).cast("bigint"))
      .select(col("rank"), col("k1"), col("i1"), col("k2"), col("i2"), col("dist"))
  }

  /** Top-k most similar windows to `pattern` across every key's
    * series, ranked by (distance, key, idx) — a total order, so the
    * result is deterministic on any engine. `exclude` drops the
    * pattern's own source window (the trivial zero-distance match)
    * when the pattern was cut from the corpus itself.
    */
  def motifSearch(
      events: DataFrame, key: Column, ts: Column, tiebreak: Column,
      value: Column, pattern: Array[Long], k: Int,
      exclude: Option[(Long, Int)] = None): DataFrame = {
    val wins = slidingWindows(events, key, ts, tiebreak, value, pattern.length)
    val filtered = exclude match {
      case Some((xk, xi)) => wins.filter(!(col("k") === xk && col("idx") === xi))
      case None => wins
    }
    filtered
      .select(col("k"), col("idx").cast("bigint").as("idx"),
        centeredDistance(col("win"), pattern).as("dist"))
      .orderBy(col("dist").asc, col("k").asc, col("idx").asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("dist").asc, col("k").asc, col("idx").asc)).cast("bigint"))
      .select(col("rank"), col("k"), col("idx"), col("dist"))
  }
}
