package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The d-dim Hilbert kernel IS a Hilbert curve: a bijection over the
  * quantized cube whose consecutive indices are unit steps in exactly
  * one axis (the two properties that define the curve and give the
  * layout its contiguous-box guarantee). Plus: codegen == interpreted,
  * and the analysis-time guards.
  */
class HilbertIndexNSpec extends SparkSpec {
  import spark.implicits._

  private def cube(n: Int, bits: Int): Seq[Array[Long]] = {
    val side = 1 << bits
    def rec(d: Int): Seq[List[Long]] =
      if (d == 0) Seq(Nil)
      else for { rest <- rec(d - 1); v <- 0 until side } yield v.toLong :: rest
    rec(n).map(_.toArray)
  }

  test("bijective over the cube and unit-step adjacent, for 3 and 4 " +
    "dims (the Hilbert-curve definition)") {
    for ((n, bits) <- Seq((3, 3), (4, 2))) {
      val cells = cube(n, bits)
      val byIndex = cells.map(c =>
        HilbertIndexN.hilbertNdEval(c, bits) -> c).toMap
      val size = 1L << (bits * n)
      assert(byIndex.size == cells.size, s"n=$n: the walk must be injective")
      assert(byIndex.keySet == (0L until size).toSet,
        s"n=$n: the walk must cover exactly [0, 2^${bits * n})")
      (0L until size - 1).foreach { h =>
        val a = byIndex(h); val b = byIndex(h + 1)
        val dist = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        assert(dist == 1, s"n=$n: step $h -> ${h + 1} must be " +
          s"unit-adjacent, got ${a.toSeq} -> ${b.toSeq}")
      }
    }
  }

  test("codegen equals interpreted, nulls propagate, out-of-range " +
    "coords wrap, and bad (bits x dims) fails at analysis") {
    val df = spark.range(0, 300).select(
      (col("id") % 7L).as("a"), (col("id") % 11L).as("b"),
      (col("id") % 5L).as("c"))
    val got = df.select(
        col("a"), col("b"), col("c"),
        graft.functions.HilbertIndexN(
          Seq(col("a"), col("b"), col("c")), 4).as("h"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (a, b, c, h) =>
      assert(h == HilbertIndexN.hilbertNdEval(Array(a, b, c), 4))
    }
    // null in -> null out
    val nulled = spark.sql("SELECT CAST(NULL AS BIGINT) AS a").select(
      graft.functions.HilbertIndexN(
        Seq(col("a"), lit(1L), lit(2L)), 3))
    assert(nulled.collect().head.isNullAt(0))
    // out-of-range wraps via the mask rather than corrupting the walk
    assert(HilbertIndexN.hilbertNdEval(Array(8L + 3L, 2L), 3) ==
      HilbertIndexN.hilbertNdEval(Array(3L, 2L), 3))
    // bits * dims > 62 and bits < 1 fail at analysis time
    intercept[Exception] {
      spark.range(1).select(graft.functions.HilbertIndexN(
        Seq(lit(1L), lit(1L), lit(1L)), 21)).collect()
    }
    intercept[Exception] {
      spark.range(1).select(graft.functions.HilbertIndexN(
        Seq(lit(1L), lit(1L)), 0)).collect()
    }
  }
}
