package graft.streaming

import graft.SparkSpec
import graft.sources.ManifestStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming append-ingest drills: exactly-once tagged appends,
  * split-equivalence, mid-stream compaction, zone-map skipping on the
  * drained store.
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int) =
    (0 until n).map(i => (i.toLong, i.toLong % 5, i.toLong % 3))
      .toDF("k", "u", "ub")

  private def content(store: String) =
    ManifestStore.read(spark, store,
      rows(1).schema, "ub").select("k", "u", "ub")
      .as[(Long, Long, Long)].collect().toSet

  test("tagged appends are exactly-once: a replayed batch (same tag) " +
    "returns the current version and appends nothing") {
    val dir = Files.createTempDirectory("graft-ingest-tag").toString
    ManifestStore.init(rows(0), "ub", dir, statsCols = Seq("k"))
    val v1 = ManifestStore.append(rows(30), "ub", dir,
      statsCols = Seq("k"), tag = Some("b00000"))
    val before = content(dir)
    // the replay: same logical batch, same tag — a no-op at version v1
    val v2 = ManifestStore.append(rows(30), "ub", dir,
      statsCols = Seq("k"), tag = Some("b00000"))
    assert(v2 == v1, "replayed append must not publish a new version")
    assert(content(dir) == before, "replayed append must not duplicate")
    // a NEW batch under a new tag appends normally
    val v3 = ManifestStore.append(
      rows(40).filter(col("k") >= 30), "ub", dir,
      statsCols = Seq("k"), tag = Some("b00001"))
    assert(v3 == v1 + 1)
    assert(content(dir).size == 40)
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("drained ingest == the batch table at any split; mid-stream " +
    "compaction bounds per-partition files; zone maps skip on the " +
    "drained store") {
    val all = rows(120)
    val expected = all.as[(Long, Long, Long)].collect().toSet
    def drain(nBatches: Int, compactEvery: Int): String = {
      val scratch = Files.createTempDirectory(s"graft-ingest-$nBatches").toString
      val store = new java.io.File(scratch, "store").toString
      StreamingIngest.appendStoreFromFiles(
        spark, all, orderCol = "k", partCol = "ub", nBatches,
        scratch, store, statsCols = Seq("k"),
        compactEvery = compactEvery, maxFilesPerPartition = 2)
      store
    }
    val s6 = drain(6, compactEvery = 2)
    val s2 = drain(2, compactEvery = 0)
    assert(content(s6) == expected, "6-batch drain lost or duplicated rows")
    assert(content(s2) == expected, "2-batch drain lost or duplicated rows")
    // compaction ran mid-stream: without it 6 appends give 6 files per
    // partition; the cadence (every 2 batches, threshold 2) keeps the
    // final count strictly below that
    val files6 = ManifestStore.selectFiles(s6, "ub",
      partVals = Some(Seq(0L))).size
    assert(files6 < 6, s"compaction never folded: $files6 files")
    // the batches arrive k-ordered, so the drained store's zone maps
    // prune historic files for a high-k range
    val allFiles = ManifestStore.selectFiles(s2, "ub").size
    val pruned = ManifestStore.selectFiles(s2, "ub",
      range = Some(("k", 100L, 200L))).size
    assert(pruned < allFiles,
      s"high-k range must skip the low-k batch files: $pruned/$allFiles")
    // and the skipped read equals the exact filter
    assert(ManifestStore.read(spark, s2, all.schema, "ub",
      range = Some(("k", 100L, 200L)))
      .filter(col("k").between(100L, 200L))
      .as[(Long, Long, Long)].collect().toSet ==
      expected.filter(r => r._1 >= 100 && r._1 <= 200))
    graft.sources.FileIO.deleteScratch(new java.io.File(s6))
    graft.sources.FileIO.deleteScratch(new java.io.File(s2))
  }
}
