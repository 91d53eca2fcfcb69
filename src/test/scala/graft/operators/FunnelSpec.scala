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

  test("the oracle's window-fold spelling equals the kernel on dense " +
    "random histories (pins the sf1-feasible DuckDB oracle)") {
    // mirror of FunnelOracle: each slot is a running max with a
    // RANGE … 1 PRECEDING frame (excluding the current timestamp is
    // the kernel's equal-time-group commit rule); Spark and DuckDB
    // share the frame semantics, so green here pins the DuckDB side
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(271)
    val h = 6L
    val rows = (1 to 500).flatMap { id =>
      val n = 1 + rnd.nextInt(12)
      (1 to n).map(_ => (id.toLong, rnd.nextInt(20).toLong, rnd.nextInt(3).toLong))
    }
    val df = rows.toDF("user_id", "tsm", "ti")
    val w = Window.partitionBy("user_id").orderBy("tsm")
      .rangeBetween(Window.unboundedPreceding, -1)
    val oracle = df
      .withColumn("s0_prev", max(when(col("ti") === 0, col("tsm"))).over(w))
      .withColumn("vstart", when(col("ti") === 1 && col("s0_prev").isNotNull
        && col("tsm") <= col("s0_prev") + h, col("s0_prev")))
      .withColumn("s1_prev", max(col("vstart")).over(w))
      .groupBy("user_id")
      .agg(
        max(when(col("ti") === 0, 1L).otherwise(0L)).as("d1"),
        max(when(col("vstart").isNotNull, 1L).otherwise(0L)).as("d2"),
        max(when(col("ti") === 2 && col("s1_prev").isNotNull
          && col("tsm") <= col("s1_prev") + h, 1L).otherwise(0L)).as("d3"))
      .select(col("user_id"),
        (col("d1") + col("d2") + col("d3")).as("depth"))
      .as[(Long, Long)].collect().toMap
    val kernel = rows.groupBy(_._1).map { case (id, evs) =>
      id -> {
        val sorted = evs.map(e => (e._2, e._3)).sorted
        val times = graft.functions.FunnelKernel.freshTimes(3)
        graft.functions.FunnelKernel.advance(
          times, sorted.map(_._1).toArray, sorted.map(_._2).toArray, h)
        graft.functions.FunnelKernel.depth(times)
      }
    }
    kernel.foreach { case (id, d) =>
      assert(oracle(id) == d, s"user $id: oracle ${oracle(id)} != kernel $d")
    }
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
