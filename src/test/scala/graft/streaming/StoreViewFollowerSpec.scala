package graft.streaming

import graft.SparkSpec
import graft.sources.ManifestStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The follower invariant under churn: after any tick the view equals
  * a fresh aggregate over the version it reports; idle ticks are
  * metadata-only; sleeping past retention rebuilds instead of erring.
  */
class StoreViewFollowerSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(StructField("k", LongType),
    StructField("v", LongType), StructField("p", LongType)))

  private def rows(kvs: (Long, Long, Long)*) =
    kvs.toSeq.toDF("k", "v", "p")

  private def freshView(dir: String): Set[(Long, Long, Long)] =
    ManifestStore.read(spark, dir, sch, "p")
      .groupBy("p").agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .as[(Long, Long, Long)].collect().toSet

  private def viewOf(f: StoreViewFollower): Set[(Long, Long, Long)] =
    f.current.select("p", "n_rows", "sum_val")
      .as[(Long, Long, Long)].collect().toSet

  test("every tick lands on the fresh aggregate: seed, single-version " +
    "feed, a multi-version span, and an idle tick that moves nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-follow").toString
    ManifestStore.init(
      rows((1L, 10L, 0L), (2L, 20L, 0L), (3L, 30L, 1L)), "p", dir)
    val f = new StoreViewFollower(spark, dir, sch, "p", Seq("p"), "v")
    assert(f.tick() == 0L && viewOf(f) == freshView(dir), "seed tick")
    // single-version feed
    ManifestStore.commit(rows((1L, 11L, 0L), (4L, 40L, 0L)), "p", Seq(0L), dir)
    assert(f.tick() == 1L && viewOf(f) == freshView(dir))
    // idle tick: version unchanged, view object untouched
    val before = f.current
    assert(f.tick() == 1L)
    assert(f.current eq before, "an idle tick must not rebuild the view")
    // two commits between ticks: ONE spanning feed catches up
    ManifestStore.append(rows((9L, 90L, 1L)), "p", dir)
    ManifestStore.commit(rows((3L, 33L, 1L), (9L, 90L, 1L)), "p", Seq(1L), dir)
    assert(f.tick() == 3L && viewOf(f) == freshView(dir),
      "a spanning feed must net the missed versions")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("sleeping past retention rebuilds from the snapshot and keeps " +
    "following") {
    val dir = java.nio.file.Files.createTempDirectory("graft-follow-ret").toString
    ManifestStore.init(rows((1L, 10L, 0L)), "p", dir)
    val f = new StoreViewFollower(spark, dir, sch, "p", Seq("p"), "v")
    f.tick()
    // churn far past the follower's applied version under a tight
    // retention window — its diff base manifests age out
    (0 until 6).foreach(i => ManifestStore.commit(
      rows((1L, 100L + i, 0L)), "p", Seq(0L), dir, retainVersions = 2))
    assert(f.tick() == 6L && viewOf(f) == freshView(dir),
      "a follower past retention must rebuild, not err or guess")
    // and it follows incrementally again afterwards
    ManifestStore.append(rows((7L, 70L, 1L)), "p", dir)
    assert(f.tick() == 7L && viewOf(f) == freshView(dir))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }
}
