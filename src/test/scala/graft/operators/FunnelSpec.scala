package graft.operators

import graft.SparkSpec
import graft.functions.WindowFunnelDepth
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def depthOf(events: Seq[(Long, Long)], h: Long): Long =
    Seq(Tuple1(events)).toDF("events")
      .select(WindowFunnelDepth(sort_array(col("events")), 3, h).as("d"))
      .as[Long].head()

  /** The EXISTS definition, literally: strict chain, all chain events
    * within h of the chain's first.
    */
  private def brute(events: Seq[(Long, Long)], h: Long): Long = {
    val s = (0 to 2).map(i => events.filter(_._2 == i).map(_._1))
    val d3 = s(0).exists(t1 => s(1).exists(t2 => t2 > t1 &&
      s(2).exists(t3 => t3 > t2 && t3 <= t1 + h)))
    val d2 = s(0).exists(t1 => s(1).exists(t2 => t2 > t1 && t2 <= t1 + h))
    if (d3) 3L else if (d2) 2L else if (s(0).nonEmpty) 1L else 0L
  }

  test("a later chain start succeeds where the earliest start fails") {
    // view@0 can't reach purchase@12 within h=8, but view@5 can —
    // a greedy earliest-view fold would answer 2; the answer is 3
    val ev = Seq((0L, 0L), (5L, 0L), (6L, 1L), (12L, 2L))
    assert(depthOf(ev, 8L) == 3L)
    assert(brute(ev, 8L) == 3L)
  }

  test("strictness: equal-time events never chain off each other") {
    assert(depthOf(Seq((7L, 0L), (7L, 1L)), 100L) == 1L)
    assert(depthOf(Seq((7L, 0L), (7L, 1L), (8L, 1L)), 100L) == 2L)
    // but equal-time events DO update their own levels independently
    assert(depthOf(Seq((5L, 0L), (7L, 1L), (7L, 2L)), 100L) == 2L)
    assert(depthOf(Seq((5L, 0L), (6L, 1L), (7L, 1L), (7L, 2L)), 100L) == 3L)
  }

  test("horizon boundary: exactly start+h counts, start+h+1 does not") {
    assert(depthOf(Seq((0L, 0L), (10L, 1L)), 10L) == 2L)
    assert(depthOf(Seq((0L, 0L), (11L, 1L)), 10L) == 1L)
  }

  test("steps out of order do not advance the funnel") {
    assert(depthOf(Seq((5L, 1L), (6L, 2L), (7L, 0L)), 100L) == 1L)
    assert(depthOf(Seq((5L, 1L), (6L, 0L), (7L, 2L)), 100L) == 1L)
    assert(depthOf(Seq((5L, 2L), (6L, 1L)), 100L) == 0L)
  }

  test("kernel equals the EXISTS brute force on dense random histories") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 500).map { c =>
      val n = 1 + rnd.nextInt(12)
      // tiny time range on purpose: forces ties and boundary hits
      val ev = (1 to n).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(3).toLong))
      (c.toLong, ev, (1 + rnd.nextInt(8)).toLong)
    }
    cases.groupBy(_._3).foreach { case (h, group) =>
      val got = group.map(g => (g._1, g._2)).toDF("id", "events")
        .select(col("id"),
          WindowFunnelDepth(sort_array(col("events")), 3, h).as("d"))
        .as[(Long, Long)].collect().toMap
      group.foreach { case (id, ev, _) =>
        assert(got(id) == brute(ev, h), s"case $id: ev=$ev h=$h")
      }
    }
  }
}
