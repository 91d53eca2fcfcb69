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
    * column and a literal pattern: Σ ((w·x − Sₓ) − (w·q − S_q))².
    */
  def centeredDistance(win: Column, pattern: Array[Long]): Column = {
    val w = pattern.length
    val sq = pattern.sum
    val sx = aggregate(win, lit(0L), _ + _)
    aggregate(
      zip_with(win, lit(pattern), (x, q) =>
        (x * w - sx - (q * w - sq)) * (x * w - sx - (q * w - sq))),
      lit(0L), _ + _)
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
