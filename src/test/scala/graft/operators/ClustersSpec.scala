package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(edges.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long)].collect().toMap

  /** Reference union-find for arbitrary edge sets. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // normalize: label = min member of the component
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ms) => ms.map(_ -> ms.min) }.toMap
  }

  test("two disjoint clusters resolve to their min ids") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    assert(cc(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a long chain converges (pointer jumping beats diameter)") {
    // path 0-1-2-...-40: diameter 40, must converge within maxIter=25
    val edges = (0L until 40L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.values.toSet == Set(0L))
    assert(got.size == 41)
  }

  test("matches union-find on an adversarial mixed graph") {
    // high ids bridging low ids, a cycle, a star, and self-contained pairs
    val edges = Seq(
      (100L, 7L), (7L, 55L), (55L, 3L), // chain touching 3
      (20L, 21L), (21L, 22L), (22L, 20L), // cycle
      (60L, 61L), (60L, 62L), (60L, 63L), // star
      (90L, 91L)) // pair
    assert(cc(edges) == unionFind(edges))
  }

  test("distributed propagation path matches union-find (threshold forced to 0)") {
    spark.conf.set("spark.graft.cc.localEdgeThreshold", "0")
    try {
      val edges = Seq(
        (100L, 7L), (7L, 55L), (55L, 3L),
        (20L, 21L), (21L, 22L), (22L, 20L),
        (60L, 61L), (60L, 62L), (60L, 63L),
        (90L, 91L)) ++ (200L until 230L).map(i => (i, i + 1))
      assert(cc(edges) == unionFind(edges))
    } finally spark.conf.unset("spark.graft.cc.localEdgeThreshold")
  }

  test("duplicateClusters flags exactly one canonical per cluster") {
    val pairs = Seq((5L, 9L), (9L, 2L), (30L, 31L)).toDF("id_a", "id_b")
    val out = Clusters.duplicateClusters(pairs, col("id_a"), col("id_b"))
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(
      (2L, 2L, true), (5L, 2L, false), (9L, 2L, false),
      (30L, 30L, true), (31L, 30L, false)))
    // exactly one canonical per cluster
    out.groupBy(_._2).foreach { case (_, ms) =>
      assert(ms.count(_._3) == 1)
    }
  }

  test("empty pair set yields an empty cluster table") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Clusters.connectedComponents(empty, col("id_a"), col("id_b")).isEmpty)
  }
}
