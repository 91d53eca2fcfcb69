package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed quantiles from a log-histogram sketch — the scale
  * answer to exact `percentile()` (which buffers every value of a
  * group in one aggregation buffer; at 10^12 rows per group that is
  * the executor OOM, and DuckDB's quantile_cont is a per-group sort).
  *
  * The sketch: values quantize to micro int64, each lands in a
  * base-2 log bucket refined by 3 mantissa bits —
  *
  *   id(0)      = 0
  *   id(v > 0)  = v                      for v ≤ 15 (b ≤ 4)
  *   id(v > 0)  = 16·b + fdiv(v, 2^(b-4)) otherwise, b = bitlen(v)
  *   id(v < 0)  = −id(−v)
  *
  * id is monotone in v, so rank queries against bucket counts answer
  * quantiles with relative error ≤ 2^-3 (the sub-bucket width), and
  * the whole construction is exact integer arithmetic: bitlen is the
  * length of the binary string (`bin` prints identically in Spark and
  * DuckDB), 2^k casts exactly from double, division is the shared
  * floor-div — so a DuckDB oracle reproduces every count and every
  * picked bucket bit-exactly, which no floating t-digest can offer.
  *
  * Shape at scale: ONE map-side-combinable aggregate over the data
  * (≤ ~2000 live buckets per group — model-sized, mergeable by
  * addition across partitions/corpora/days); quantile selection runs
  * entirely on the sketch (a per-group window over ≤2000 rows).
  */
object Quantiles {

  /** Bucket id of a micro-scaled int64 value (monotone, sign-mirrored). */
  def bucketId(vMicro: Column): Column = {
    val a = abs(vMicro)
    val b = length(bin(a)).cast("bigint")
    val p = pow(lit(2.0), (b - 4).cast("double")).cast("bigint")
    val mag = when(a <= 15, a)
      .otherwise(lit(16L) * b + CorpusStats.fdiv(a, p))
    when(vMicro === 0, lit(0L))
      .when(vMicro > 0, mag)
      .otherwise(-mag)
  }

  /** Inclusive lower bound of a bucket, in micro units. */
  def bucketLo(id: Column): Column = lowerOf(abs(id), id < 0)

  /** Inclusive upper bound of a bucket, in micro units. */
  def bucketHi(id: Column): Column = upperOf(abs(id), id < 0)

  private def lowerOf(mag: Column, neg: Column): Column = {
    val b = CorpusStats.fdiv(mag, lit(16L))
    val sub = pmod(mag, lit(16L))
    val p = pow(lit(2.0), (b - 4).cast("double")).cast("bigint")
    val lo = when(mag <= 15, mag).otherwise(sub * p)
    val hi = when(mag <= 15, mag).otherwise(sub * p + (p - 1))
    when(neg, -hi).otherwise(lo)
  }

  private def upperOf(mag: Column, neg: Column): Column = {
    val b = CorpusStats.fdiv(mag, lit(16L))
    val sub = pmod(mag, lit(16L))
    val p = pow(lit(2.0), (b - 4).cast("double")).cast("bigint")
    val lo = when(mag <= 15, mag).otherwise(sub * p)
    val hi = when(mag <= 15, mag).otherwise(sub * p + (p - 1))
    when(neg, -lo).otherwise(hi)
  }

  /** The sketch: per (group, bucket) exact counts. `value` is quantized
    * to micro fixed point (round half away from zero — the engines
    * agree) before bucketing. Mergeable: sketches of two corpora add.
    */
  def sketch(df: DataFrame, group: Column, value: Column): DataFrame =
    sketchMicro(df, group, round(value * 1000000).cast("bigint"))

  /** [[sketch]] over a column that is ALREADY micro-quantized int64 —
    * the entry point for second-round sketches (e.g. absolute
    * deviations in [[outliersMad]]) where re-scaling would be wrong.
    */
  def sketchMicro(df: DataFrame, group: Column, valueMicro: Column): DataFrame =
    df.select(group.as("grp"), bucketId(valueMicro).as("bucket_id"))
      .groupBy(col("grp"), col("bucket_id"))
      .agg(count(lit(1)).as("cnt"))

  /** Quantile answers from the sketch: for each per-mille rank in
    * `permille`, the first bucket (ascending id) whose cumulative
    * count reaches rank ceil(q·n/1000). Output carries the bucket's
    * exact value bounds — the true quantile provably lies inside
    * [lo_micro, hi_micro]. All arithmetic on the model-sized sketch.
    */
  def quantiles(
      df: DataFrame, group: Column, value: Column,
      permille: Seq[Int]): DataFrame =
    quantilesFromSketch(sketch(df, group, value), permille)

  /** The rank-selection tail of [[quantiles]], usable on any sketch
    * with (grp, bucket_id, cnt) rows — including one drained from a
    * streaming aggregation (counting is associative, so an online
    * sketch equals the batch sketch exactly and this tail gives the
    * identical answers).
    */
  def quantilesFromSketch(sk: DataFrame, permille: Seq[Int]): DataFrame = {
    val cum = sk.withColumn("cum",
      sum(col("cnt")).over(
        Window.partitionBy(col("grp")).orderBy(col("bucket_id"))))
    val ranks = sk.groupBy(col("grp")).agg(sum(col("cnt")).as("n"))
      .select(col("grp"), col("n"),
        explode(array(permille.map(q => lit(q.toLong)): _*)).as("q_permille"))
      .withColumn("q_rank",
        CorpusStats.fdiv(col("q_permille") * col("n") + 999, lit(1000L)))
    ranks.join(cum, Seq("grp"))
      .filter(col("cum") >= col("q_rank"))
      .groupBy(col("grp"), col("q_permille"), col("n"), col("q_rank"))
      .agg(min(col("bucket_id")).as("bucket_id"))
      .select(col("grp"), col("q_permille"), col("n"), col("q_rank"),
        col("bucket_id"),
        bucketLo(col("bucket_id")).as("lo_micro"),
        bucketHi(col("bucket_id")).as("hi_micro"))
  }

  /** Deterministic single-value representative of a picked bucket:
    * the floor midpoint of its exact bounds. Integer arithmetic
    * (shared floor-div), so a DuckDB oracle reproduces it bit-exactly.
    */
  def bucketMid(lo: Column, hi: Column): Column =
    CorpusStats.fdiv(lo + hi, lit(2L))

  /** Scale-safe replacement for the exact `percentile()` family:
    * per-group n + median and p90 BOUNDS, all answered from ONE
    * mergeable log-histogram aggregate (≤ ~2000 int buckets per
    * group). No aggregation buffer anywhere grows with the number of
    * distinct values — the hazard of Spark's exact `Percentile`
    * (a per-group value map) that this spelling exists to remove.
    * The true quantile provably lies inside each [lo, hi] (relative
    * width ≤ 2^-3).
    */
  def percentileStats(df: DataFrame, group: Column, value: Column): DataFrame =
    quantiles(df, group, value, permille = Seq(500, 900))
      .groupBy(col("grp"))
      .agg(
        max(col("n")).as("n"),
        max(when(col("q_permille") === 500, col("lo_micro"))).as("med_lo_micro"),
        max(when(col("q_permille") === 500, col("hi_micro"))).as("med_hi_micro"),
        max(when(col("q_permille") === 900, col("lo_micro"))).as("p90_lo_micro"),
        max(when(col("q_permille") === 900, col("hi_micro"))).as("p90_hi_micro"))

  /** Robust per-group outliers via sketch-derived median + MAD — the
    * scale-safe re-spelling of the exact-percentile MAD (which buffers
    * every distinct value of a group in one aggregation buffer). Two
    * sketch rounds: median of the micro values, then median of the
    * absolute deviations from the (deterministic, integer) bucket
    * midpoint; both model-sized results broadcast back. Flags values
    * whose deviation exceeds `cut`·MAD. Every quantity is exact int64
    * — a DuckDB oracle replays both rounds and every flag bit-exactly.
    * Shape at scale: three passes over the data, each a map-side-
    * combinable aggregate or a broadcast-join + aggregate; per-group
    * state never exceeds the ≤2000-bucket sketch.
    */
  def outliersMad(
      df: DataFrame, group: Column, valueMicro: Column, cut: Long): DataFrame = {
    val v = df.select(group.as("g"), valueMicro.as("vm"))
    val med = quantilesFromSketch(
        sketchMicro(v, col("g"), col("vm")), permille = Seq(500))
      .select(col("grp").as("g"),
        bucketMid(col("lo_micro"), col("hi_micro")).as("med_micro"))
    val withDev = v.join(broadcast(med), "g")
      .withColumn("dev", abs(col("vm") - col("med_micro")))
    val mad = quantilesFromSketch(
        sketchMicro(withDev, col("g"), col("dev")), permille = Seq(500))
      .select(col("grp").as("g"),
        bucketMid(col("lo_micro"), col("hi_micro")).as("mad_micro"))
    withDev.join(broadcast(mad), "g")
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n"),
        max(col("med_micro")).as("med_micro"),
        max(col("mad_micro")).as("mad_micro"),
        sum(when(col("dev") > lit(cut) * col("mad_micro"), 1L).otherwise(0L))
          .as("n_outliers"),
        min(when(col("dev") > lit(cut) * col("mad_micro"), col("vm")))
          .as("lo_outlier_micro"),
        max(when(col("dev") > lit(cut) * col("mad_micro"), col("vm")))
          .as("hi_outlier_micro"))
  }
}
