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

  test("kill-and-restart drill: a crash AFTER the append but BEFORE " +
    "the checkpoint commit replays the batch; the tagged append " +
    "dedupes and the drained store is exact") {
    val all = rows(80)
    val scratch = Files.createTempDirectory("graft-ingest-crash").toString
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val store = new java.io.File(base, "store").toString
    graft.sources.FileIO.stageRangeBatches(
      all, col("k"), 4, new java.io.File(base, "stage"), inDir)
    ManifestStore.init(all.limit(0), "ub", store, statsCols = Seq("k"))
    val ckpt = new java.io.File(base, "ckpt").toString
    val ss = StreamSessions.scoped(spark, 4)
    // run 1: batch 2's append PUBLISHES, then the "process dies"
    // before foreachBatch returns — the checkpoint never commits it
    val boom = new RuntimeException("simulated crash post-append")
    val q1 = graft.sources.FileIO
      .streamParquet(ss, inDir.toString, all.schema, maxFilesPerTrigger = 1)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        ManifestStore.append(batch, "ub", store,
          statsCols = Seq("k"), tag = Some(f"b$id%05d"))
        if (id == 2L) throw boom
        ()
      }.start()
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(died.getMessage.contains("simulated crash")
      || Option(died.getCause).exists(_.getMessage.contains("simulated crash")))
    // batch 2's rows ARE in the store (append published before the
    // crash) — the restart will replay batch 2 against them
    val midCount = ManifestStore.read(spark, store, all.schema, "ub").count()
    assert(midCount == 60L, s"batches 0-2 should be in the store: $midCount")
    // run 2: same checkpoint — batch 2 replays (same id, same tag), the
    // append dedupes, batch 3 lands; the drain is exact, no duplicates
    val q2 = graft.sources.FileIO
      .streamParquet(ss, inDir.toString, all.schema, maxFilesPerTrigger = 1)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        ManifestStore.append(batch, "ub", store,
          statsCols = Seq("k"), tag = Some(f"b$id%05d"))
        ()
      }.start()
    q2.awaitTermination()
    assert(content(store) ==
      all.as[(Long, Long, Long)].collect().toSet,
      "restart must replay without duplicating the crashed batch")
    graft.sources.FileIO.deleteScratch(base)
  }

  test("crash AFTER a same-batch compaction replays exactly-once: the " +
    "compact republishes files under a fresh commit id (the c<tag>- " +
    "markers are gone) but the manifest's tag ledger survives") {
    val all = rows(80)
    val scratch = Files.createTempDirectory("graft-ingest-crash2").toString
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val store = new java.io.File(base, "store").toString
    graft.sources.FileIO.stageRangeBatches(
      all, col("k"), 4, new java.io.File(base, "stage"), inDir)
    ManifestStore.init(all.limit(0), "ub", store, statsCols = Seq("k"))
    val ckpt = new java.io.File(base, "ckpt").toString
    val ss = StreamSessions.scoped(spark, 4)
    // run 1: batch 2 appends, COMPACTS (threshold 1 folds every
    // partition — all of batch 2's own files are rewritten under a
    // fresh commit id), then "dies" before the checkpoint commits
    val boom = new RuntimeException("simulated crash post-compact")
    val q1 = graft.sources.FileIO
      .streamParquet(ss, inDir.toString, all.schema, maxFilesPerTrigger = 1)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        ManifestStore.append(batch, "ub", store,
          statsCols = Seq("k"), tag = Some(f"b$id%05d"))
        if (id == 2L) {
          ManifestStore.compact(ss, store, all.schema, "ub",
            maxFilesPerPartition = 1, statsCols = Seq("k"))
          throw boom
        }
        ()
      }.start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    // the compacted head carries NO b00002 filename marker anymore —
    // this is the window the pre-ledger dedup lost
    val vHead = ManifestStore.latestVersion(store).get
    assert(!ManifestStore.files(store, vHead)
      .exists(_.split('/').last.startsWith("cb00002-")),
      "drill precondition: compaction must have folded batch 2's files")
    assert(ManifestStore.tags(store, vHead).contains("b00002"),
      "the tag ledger must survive the compaction")
    // run 2: batch 2 replays — the ledger dedupes it, batch 3 lands
    val q2 = graft.sources.FileIO
      .streamParquet(ss, inDir.toString, all.schema, maxFilesPerTrigger = 1)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        ManifestStore.append(batch, "ub", store,
          statsCols = Seq("k"), tag = Some(f"b$id%05d"))
        ()
      }.start()
    q2.awaitTermination()
    assert(content(store) == all.as[(Long, Long, Long)].collect().toSet,
      "restart after compact must replay without duplicating")
    graft.sources.FileIO.deleteScratch(base)
  }

  test("online-built store serves bloom point-reads: bloomCols thread " +
    "through init/append/compact to the streamed files") {
    val all = rows(120)
    val scratch = Files.createTempDirectory("graft-ingest-bloom").toString
    val store = new java.io.File(scratch, "store").toString
    StreamingIngest.appendStoreFromFiles(
      spark, all, orderCol = "k", partCol = "ub", nBatches = 4,
      scratch, store, statsCols = Seq("k", "u"),
      compactEvery = 2, maxFilesPerPartition = 2, bloomCols = Seq("u"))
    // u = k % 5: per-file min/max on u span the whole domain (every
    // batch holds every residue), so zone maps cannot prune — only the
    // blooms can exclude files for a point key
    val hit = ManifestStore.readPoint(
      spark, store, all.schema, "ub", "u", 3L)
      .as[(Long, Long, Long)].collect().toSet
    assert(hit == all.filter(col("u") === 3L)
      .as[(Long, Long, Long)].collect().toSet,
      "bloom point-read must return exactly the matching rows")
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
  }

  test("clusterBy turns the compaction cadence into OPTIMIZE ZORDER: " +
    "the drained store bounds the SECOND dimension too, content exact") {
    val all = (0 until 160).map(i =>
      (i.toLong, (i * 37L) % 160L, i.toLong % 2)).toDF("k", "u", "ub")
    val scratch = Files.createTempDirectory("graft-ingest-zorder").toString
    val store = new java.io.File(scratch, "store").toString
    StreamingIngest.appendStoreFromFiles(
      spark, all, orderCol = "k", partCol = "ub", nBatches = 4,
      scratch, store, statsCols = Seq("k", "u"),
      compactEvery = 3, maxFilesPerPartition = 2,
      clusterBy = Seq("k", "u"))
    assert(ManifestStore.read(spark, store, all.schema, "ub")
      .select("k", "u", "ub").as[(Long, Long, Long)].collect().toSet ==
      all.as[(Long, Long, Long)].collect().toSet,
      "clustered online compaction must not change content")
    // u spans everything per arrival batch; the clustered fold bounds
    // it — a slice past u's top z-bit (u >= 128 on a [0,159] domain)
    // skips the low-quadrant files at the manifest
    val total = ManifestStore.selectFiles(store, "ub").size
    val uSlice = ManifestStore.selectFiles(store, "ub",
      range = Some(("u", 128L, 159L))).size
    assert(uSlice < total,
      s"clustered cadence must bound the second dim: $uSlice/$total")
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    // the HILBERT spelling of the same cadence: identical content,
    // second dimension still bounded online
    val scratchH = Files.createTempDirectory("graft-ingest-hilbert").toString
    val storeH = new java.io.File(scratchH, "store").toString
    StreamingIngest.appendStoreFromFiles(
      spark, all, orderCol = "k", partCol = "ub", nBatches = 4,
      scratchH, storeH, statsCols = Seq("k", "u"),
      compactEvery = 3, maxFilesPerPartition = 2,
      clusterBy = Seq("k", "u"), curve = graft.operators.Layout.Hilbert)
    assert(ManifestStore.read(spark, storeH, all.schema, "ub")
      .select("k", "u", "ub").as[(Long, Long, Long)].collect().toSet ==
      all.as[(Long, Long, Long)].collect().toSet,
      "hilbert online compaction must not change content")
    val totalH = ManifestStore.selectFiles(storeH, "ub").size
    val uSliceH = ManifestStore.selectFiles(storeH, "ub",
      range = Some(("u", 128L, 159L))).size
    assert(uSliceH < totalH,
      s"hilbert cadence must bound the second dim: $uSliceH/$totalH")
    graft.sources.FileIO.deleteScratch(new java.io.File(scratchH))
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
