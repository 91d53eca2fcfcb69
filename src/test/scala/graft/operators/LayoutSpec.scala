package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def morton2(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { b =>
      (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }.sum

  test("zValue interleaves bits exactly (reference reimplementation)") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 1L), (65535L, 65535L))
      .toDF("x", "y")
    val out = rows.select(col("x"), col("y"),
        Layout.zValue(Seq(col("x"), col("y")), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (x, y, z) => assert(z == morton2(x, y, 16), s"($x,$y)") }
    // locality sanity: the max 16-bit point fills all 32 bits
    assert(morton2(65535L, 65535L, 16) == (1L << 32) - 1)
  }

  test("quantize is monotone, clamped, and shift-exact") {
    val df = Seq(-5L, 0L, 1L, 999L, 1000L, 5000L).toDF("v")
    // span 0..999 into 4 bits: shift = 10 - 4 = 6 -> v >> 6, clamp 15
    val out = df.select(col("v"), Layout.quantize(col("v"), 0L, 999L, 4).as("q"))
      .as[(Long, Long)].collect().toMap
    assert(out(-5L) == 0L)
    assert(out(0L) == 0L)
    assert(out(1L) == 0L)
    assert(out(999L) == 999L >> 6)
    assert(out(1000L) == 15L) // 1000>>6 == 15, top bucket
    assert(out(5000L) == 15L) // clamped
  }

  test("hilbert index walks the order-1 curve and stays 4-adjacent at order 4") {
    // order 1: (0,0)->0 (0,1)->1 (1,1)->2 (1,0)->3
    val small = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .select(col("x"), col("y"), Layout.hilbertValue(col("x"), col("y"), 1).as("h"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(small == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L, (1L, 1L) -> 2L, (1L, 0L) -> 3L))
    // THE Hilbert property: consecutive curve positions are 4-adjacent
    // cells — z-order cannot say this (its diagonal jumps are why
    // hilbert boxes tile tighter)
    val bits = 4; val n = 1 << bits
    val grid = spark.range(n.toLong * n)
      .select((col("id") % n).as("x"), (col("id") / n).cast("bigint").as("y"))
      .select(col("x"), col("y"), Layout.hilbertValue(col("x"), col("y"), bits).as("h"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(grid.map(_._3).toSeq == (0L until n.toLong * n)) // a bijection
    grid.sliding(2).foreach { case Array(a, b) =>
      assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2) == 1,
        s"non-adjacent step ${a} -> ${b}")
    }
  }

  test("z-order layout skips more partitions than a single-column sort") {
    // 64x64 grid of (x, y) points: a filter on y alone prunes nothing
    // under an x-sorted layout but most z-ordered partitions
    val n = 64
    val pts = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"), (col("id") / n).cast("bigint").as("y"))
    val parts = 16

    def boxes(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      .as[(Int, Long, Long, Long, Long)].collect()

    val naive = boxes(pts.repartitionByRange(parts, col("x")).sortWithinPartitions(col("x")))
    val zed = boxes(Layout.zorder(pts, Seq(col("x"), col("y")), 6, parts))

    // point-band query on y: how many partitions' min/max boxes match?
    def touched(bs: Array[(Int, Long, Long, Long, Long)], yLo: Long, yHi: Long) =
      bs.count { case (_, _, _, y0, y1) => y1 >= yLo && y0 <= yHi }

    val bands = Seq((0L, 3L), (20L, 23L), (40L, 43L), (60L, 63L))
    val naiveTouched = bands.map(b => touched(naive, b._1, b._2)).sum
    val zTouched = bands.map(b => touched(zed, b._1, b._2)).sum
    // x-sorted layout: every partition spans all y -> touches all 16
    assert(naiveTouched == bands.size * naive.length)
    // z-order: each band lives in a handful of space-filling boxes
    assert(zTouched < naiveTouched / 2, s"z=$zTouched naive=$naiveTouched")
    // both layouts hold the full data
    assert(naive.length == parts && zed.length == parts)
  }
}
