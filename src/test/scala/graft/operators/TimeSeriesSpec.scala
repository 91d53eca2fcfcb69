package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, id, value): key 1 carries the pattern at idx 0; key 2
  // carries the SAME SHAPE shifted by +1000 at idx 2 (offset
  // invariance must find it at distance zero); key 3 is noise
  private def fixture = {
    val pat = Seq(10L, 50L, 20L, 80L)
    val rows =
      pat.zipWithIndex.map { case (v, i) => (1L, i.toLong, i.toLong, v) } ++
        (Seq(7L, 9L) ++ pat.map(_ + 1000L) ++ Seq(3L)).zipWithIndex.map {
          case (v, i) => (2L, i.toLong, 100L + i, v)
        } ++
        Seq(500L, 1L, 999L, 2L, 777L).zipWithIndex.map {
          case (v, i) => (3L, i.toLong, 200L + i, v)
        }
    rows.toDF("k", "ts", "id", "v")
  }

  test("sliding windows are per-key, ordered, and complete") {
    val wins = TimeSeries.slidingWindows(
      fixture, col("k"), col("ts"), col("id"), col("v"), w = 4)
      .as[(Long, Int, Seq[Long])].collect()
    assert(wins.count(_._1 == 1L) == 1) // exactly the 4-value series
    assert(wins.count(_._1 == 2L) == 4) // 7 values -> 4 windows
    assert(wins.find(w => w._1 == 2L && w._2 == 2).get._3 ==
      Seq(1010L, 1050L, 1020L, 1080L))
  }

  test("motif search finds the offset-shifted copy at distance zero") {
    val out = TimeSeries.motifSearch(
      fixture, col("k"), col("ts"), col("id"), col("v"),
      pattern = Array(10L, 50L, 20L, 80L), k = 3,
      exclude = Some((1L, 0)))
      .as[(Long, Long, Long, Long)].collect()
    // rank 1: key 2 idx 2, the +1000-shifted copy, exactly distance 0
    assert(out.head == ((1L, 2L, 2L, 0L)))
    // the excluded self-window is absent
    assert(!out.exists(r => r._2 == 1L && r._3 == 0L))
    // distances are non-decreasing in rank
    assert(out.map(_._4).toSeq == out.map(_._4).sorted.toSeq)
  }

  test("motif pairs find planted twins and recall the exact closest pairs") {
    // two series sharing an identical (offset-shifted) 8-window among
    // noise: the planted pair must surface at distance zero
    val rnd = new scala.util.Random(11)
    val motif = Seq(100L, 900L, 300L, 700L, 50L, 450L, 600L, 20L)
    def noisy(n: Int) = Seq.fill(n)(rnd.nextInt(1000).toLong)
    val s1 = noisy(6) ++ motif ++ noisy(6)
    val s2 = noisy(3) ++ motif.map(_ + 5000L) ++ noisy(9)
    val s3 = noisy(20)
    val rows = Seq(1L -> s1, 2L -> s2, 3L -> s3).flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case (v, i) => (k, i.toLong, k * 1000 + i, v) }
    }
    val df = rows.toDF("k", "ts", "id", "v")
    val got = TimeSeries.motifPairs(
      df, col("k"), col("ts"), col("id"), col("v"),
      w = 8, paa = 4, shift = 10, k = 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.head == ((1L, 1L, 6L, 2L, 3L, 0L)), got.head)

    // recall: the sketch-bucketed top-5 contains the true best pair
    // and every emitted distance is exact (verified by brute force)
    val wins = TimeSeries.slidingWindows(
      df, col("k"), col("ts"), col("id"), col("v"), 8)
      .as[(Long, Int, Seq[Long])].collect()
    def dist(a: Seq[Long], b: Seq[Long]): Long = {
      val (sa, sb) = (a.sum, b.sum)
      a.zip(b).map { case (x, y) =>
        val d = x * 8 - sa - (y * 8 - sb); d * d
      }.sum
    }
    val brute = (for {
      (k1, i1, w1) <- wins; (k2, i2, w2) <- wins
      if k1 < k2 || (k1 == k2 && i1 + 8 <= i2)
    } yield (k1, i1, k2, i2, dist(w1, w2)))
      .sortBy(p => (p._5, p._1, p._2, p._3, p._4))
    assert(got.head._6 == brute.head._5) // same best distance (0)
    got.foreach { g =>
      val exact = brute.find(b =>
        (b._1, b._2, b._3, b._4) == ((g._2, g._3, g._4, g._5))).get
      assert(exact._5 == g._6) // emitted distances are exact
    }
  }

  test("centered distance is exactly w^2 times the mean-centered SSD") {
    val win = Seq((Seq(1L, 2L, 3L, 6L))).toDF("win")
    val d = win.select(
      TimeSeries.centeredDistance(col("win"), Array(2L, 3L, 4L, 7L)).as("d"))
      .as[Long].head()
    // both series have the same shape up to offset 1 -> distance 0
    assert(d == 0L)
    val d2 = win.select(
      TimeSeries.centeredDistance(col("win"), Array(1L, 2L, 3L, 7L)).as("d"))
      .as[Long].head()
    // means differ by 1/4; w-scaled residuals: x*4 - 12 vs q*4 - 13
    // -> diffs (1,1,1,-3) -> ssd 12
    assert(d2 == 12L)
  }
}
