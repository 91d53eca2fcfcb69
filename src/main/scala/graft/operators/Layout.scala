package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering (Z-order / Morton curve)
  * — the file-layout optimization that makes min/max data skipping
  * work on MORE than one filter column at 100 TB: interleave the bits
  * of d quantized dimensions into one scalar, range-partition + sort
  * by it, and every written file covers a small hyper-rectangle of
  * the key space instead of a thin slice of just the leading sort
  * key. A point/range filter on ANY clustered dimension then prunes
  * most files from their parquet min/max footer stats — the same
  * layout pass Delta's OPTIMIZE ZORDER or an Iceberg sort-order
  * rewrite runs, expressed as a plain Spark plan.
  *
  * The z-value is pure integer bit math (shift/and/multiply-add), so
  * it codegens into the scan projection and an independent engine
  * reproduces it bit-exactly (oracle-gated).
  */
object Layout {

  /** Space-filling curve selector for clustered layout rewrites
    * ([[graft.sources.ManifestStore.compactClustered]]): [[Z]] is the
    * bit-interleave (any dimension count), [[Hilbert]] the 2-D
    * stronger-locality curve — its unit steps are 4-adjacent, so
    * equal-count file cuts cover strictly contiguous boxes and a slice
    * grid prunes at least as well as under Z's diagonal jumps.
    */
  sealed trait Curve
  case object Z extends Curve
  case object Hilbert extends Curve

  /** Bit-interleaved z-value of `cols` (already quantized to
    * non-negative ints < 2^bits each): bit b of dimension d lands at
    * position b·n + d. `bits·n` must fit a signed long. Columns are
    * masked to `bits`, so out-of-range inputs wrap instead of
    * corrupting neighbors' bits.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "zValue needs at least one column")
    require(bits >= 1 && bits * n <= 62, s"bits=$bits x $n dims must fit a long")
    val terms =
      for { b <- 0 until bits; (c, d) <- cols.zipWithIndex }
        yield shiftright(c.cast("bigint"), b).bitwiseAND(lit(1L)) *
          lit(1L << (b * n + d))
    terms.reduce(_ + _)
  }

  /** Quantize a numeric column into [0, 2^bits) rank space given its
    * observed min/max (from stats or a prior aggregate): shift the
    * zero-based value right until the span fits — a power-of-two
    * bucket width, so the whole quantizer is exact integer bit math
    * (no division, no double anywhere, overflow-free at any long
    * span), monotone, and clamped against out-of-range inputs.
    */
  def quantize(c: Column, minV: Long, maxV: Long, bits: Int): Column = {
    require(maxV > minV, s"quantize needs maxV > minV, got [$minV, $maxV]")
    require(bits >= 1 && bits <= 62)
    val span = maxV - minV + 1 // values, not gaps
    // smallest shift with ceil(span / 2^shift) <= 2^bits
    val shift = math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(span - 1) - bits)
    least(
      greatest(
        shiftright(c.cast("bigint") - minV, shift),
        lit(0L)),
      lit((1L << bits) - 1))
  }

  /** Hilbert-curve index of two quantized dimensions — [[zValue]]'s
    * stronger-locality sibling: every unit step along the curve is
    * 4-adjacent (no Z-shaped diagonal jumps), so range-partition
    * boundaries cut strictly contiguous regions of the key space.
    * Runs through the native codegen'd
    * [[graft.functions.HilbertIndex2D]] kernel (the per-bit rotation
    * is sequential state — the textbook case for a custom expression).
    */
  def hilbertValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31)
    graft.functions.HilbertIndex2D(x.cast("bigint"), y.cast("bigint"), bits)
  }

  /** d-DIMENSIONAL Hilbert index (Skilling transpose walk) — the
    * any-dimension sibling of [[hilbertValue]], through the native
    * codegen'd [[graft.functions.HilbertIndexN]] kernel. Two columns
    * keep routing through the classic 2-D kernel (the curves are
    * reflections of each other — both Hilbert, not bit-identical — and
    * existing 2-D layouts must stay byte-stable).
    */
  def hilbertValueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "hilbertValueN needs at least two dims")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits=$bits x ${cols.size} dims must fit a long")
    graft.functions.HilbertIndexN(cols.map(_.cast("bigint")), bits)
  }

  /** Cluster `df` for data skipping: range-partition into
    * `numPartitions` by the z-value of the quantized dimensions and
    * sort within each partition, so a parquet write of the result
    * yields files whose per-column min/max ranges tile the space in
    * compact boxes. One range exchange (sampled boundaries — skew in
    * z-space balances automatically), one local sort; nothing else.
    */
  def zorder(
      df: DataFrame, dims: Seq[Column], bits: Int,
      numPartitions: Int): DataFrame = {
    val z = zValue(dims, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
