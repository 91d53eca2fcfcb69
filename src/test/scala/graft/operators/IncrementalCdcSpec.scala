package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IncrementalCdcSpec extends SparkSpec {
  import spark.implicits._

  private val nShards = 8
  private val nFpBuckets = 16

  private def doc(id: Long, body: String) =
    (id, s"the doc $body has a body of the usual words", "en", "s", 10L)

  private def corpus(n: Int): DataFrame =
    (0 until n).map(i => doc(i.toLong, s"number $i"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def ev(id: Long, body: String, del: Boolean, seq: Long) =
    (id, s"the doc $body has a body of the usual words", "en", "s", 10L, del, seq)

  private def evDf(rows: Seq[(Long, String, String, String, Long, Boolean, Long)]) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars", "is_delete", "ev_seq")

  private def packedSet(df: DataFrame) =
    df.select("doc_id", "grp", "seq_id", "begin_in_seq", "end_in_seq",
      "doc_begin", "n_piece", "starts_doc")
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].collect().toSet

  /** scratch layout + store init shared by the drills */
  private case class Dirs(base: String) {
    val corpus = s"$base/corpus"
    val index = s"$base/index"
    val keeps = s"$base/keeps"
    val cls = s"$base/cls"
    val packed = s"$base/packed"
  }

  private def initStores(old: DataFrame, d: Dirs, seqLen: Long): Unit = {
    IncrementalCdc.writeCorpusStore(old, nShards, d.corpus)
    IncrementalCdc.writeDedupStores(old, nShards, nFpBuckets, d.index, d.keeps)
    graft.sources.ManifestStore.init(
      Incremental.pipelineSharded(old, nShards, seqLen), "grp", d.packed)
  }

  private def apply1(
      d: Dirs, evs: DataFrame, batchId: Long, seqLen: Long): DataFrame =
    IncrementalCdc.applyDocEvents(
      spark, evs, d.corpus, d.index, d.keeps, d.cls, d.packed,
      batchId, nShards, seqLen, nFpBuckets)

  private def partMtimes(store: String, prefix: String): Map[String, Map[String, Long]] =
    Option(new java.io.File(store).listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .map(dir => dir.getName ->
        dir.listFiles().toSeq.filterNot(_.getName.startsWith("_"))
          .map(f => f.getName -> f.lastModified()).toMap)
      .toMap

  test("event sequences across batches: update-then-delete, " +
    "delete-then-readd, within-batch last-wins — drained store == " +
    "full recompute on the final corpus") {
    val old = corpus(40)
    val d = Dirs(Files.createTempDirectory("graft-cdc").toString)
    initStores(old, d, seqLen = 16L)
    // batch 1: doc 11 edited; doc 20 deleted; doc 100 added; doc 7
    //   gets TWO events — the higher ev_seq (second edit) must win
    apply1(d, evDf(Seq(
      ev(11L, "number 11 v2", del = false, 1L),
      (20L, "x", "en", "s", 1L, true, 2L),
      ev(100L, "brand new", del = false, 3L),
      ev(7L, "number 7 draft", del = false, 4L),
      ev(7L, "number 7 final", del = false, 5L))), batchId = 0L, seqLen = 16L)
    // batch 2: doc 11 deleted (update-then-delete); doc 20 re-added
    //   (delete-then-readd); doc 100 edited again
    apply1(d, evDf(Seq(
      (11L, "x", "en", "s", 1L, true, 6L),
      ev(20L, "number 20 reborn", del = false, 7L),
      ev(100L, "brand new v2", del = false, 8L))), batchId = 1L, seqLen = 16L)
    // expected final corpus
    val expected = corpus(40)
      .filter(!col("doc_id").isin(7L, 11L, 20L))
      .unionByName(Seq(
        doc(7L, "number 7 final"), doc(20L, "number 20 reborn"),
        doc(100L, "brand new v2"))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val gotCorpus = IncrementalCdc.readCorpusStore(spark, d.corpus)
      .drop("shard").as[(Long, String, String, String, Long)].collect().toSet
    assert(gotCorpus ==
      expected.as[(Long, String, String, String, Long)].collect().toSet)
    val full = Incremental.pipelineSharded(expected, nShards, seqLen = 16L)
    assert(packedSet(IncrementalCdc.readPacked(spark, d.packed)) ==
      packedSet(full))
    // the index's kept state equals the from-scratch state
    assert(IncrementalCdc.readKept(spark, d.index)
      .as[(String, Long, Long)].collect().toSet ==
      Incremental.keptState(expected, col("doc_id"), col("text"), 30L)
        .as[(String, Long, Long)].collect().toSet)
    // keeps store == the keeper ids the index encodes
    assert(IncrementalCdc.readKeeps(spark, d.keeps)
      .select("keep_id").as[Long].collect().toSet ==
      IncrementalCdc.readKept(spark, d.index)
        .select("keep_id").as[Long].collect().toSet)
  }

  test("redelivered identical event classifies unchanged: no shard " +
    "repacks, no packed partition files rewritten") {
    val old = corpus(40)
    val d = Dirs(Files.createTempDirectory("graft-cdc-redeliver").toString)
    initStores(old, d, seqLen = 16L)
    val before = partMtimes(d.packed, "grp=")
    Thread.sleep(1100)
    // the exact current content of doc 5 re-sent as an upsert
    val touched = apply1(
      d, evDf(Seq(ev(5L, "number 5", del = false, 1L))),
      batchId = 0L, seqLen = 16L)
    assert(touched.isEmpty, "identical upsert must touch nothing")
    assert(partMtimes(d.packed, "grp=") == before,
      "packed partitions were rewritten")
  }

  test("a deleted duplicate keeper promotes the surviving copy's " +
    "shard through the CDC path") {
    val base = corpus(40)
    val dups = Seq(
      (100L, "the duplicated text a rather the common one", "en", "s", 8L),
      (203L, "the duplicated text a rather the common one", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val old = base.unionByName(dups)
    val d = Dirs(Files.createTempDirectory("graft-cdc-flip").toString)
    initStores(old, d, seqLen = 16L)
    val touched = apply1(
      d, evDf(Seq((100L, "x", "en", "s", 1L, true, 1L))),
      batchId = 0L, seqLen = 16L)
    assert(touched.as[Long].collect().toSet.contains(203L % nShards))
    assert(IncrementalCdc.readKept(spark, d.index)
      .filter(col("keep_id") === 203L).count() == 1L)
    assert(IncrementalCdc.readKeeps(spark, d.keeps)
      .filter(col("keep_id") === 203L).count() == 1L)
    val expected = old.filter(col("doc_id") =!= 100L)
    assert(packedSet(IncrementalCdc.readPacked(spark, d.packed)) ==
      packedSet(Incremental.pipelineSharded(expected, nShards, seqLen = 16L)))
  }

  test("an edit-sized batch opens and rewrites ONLY its touched " +
    "fingerprint buckets: untouched index partitions' files keep " +
    "their mtimes (work scales with the edit, not the corpus)") {
    val old = corpus(120)
    val d = Dirs(Files.createTempDirectory("graft-cdc-prune").toString)
    initStores(old, d, seqLen = 16L)
    val idxBefore = partMtimes(d.index, "fpb=")
    assert(idxBefore.size > 4, s"fixture must spread buckets: ${idxBefore.size}")
    Thread.sleep(1100)
    // one text edit: touches exactly the buckets of old_fp and new_fp
    val touched = apply1(
      d, evDf(Seq(ev(17L, "number 17 revised", del = false, 1L))),
      batchId = 0L, seqLen = 16L)
    assert(touched.count() >= 1)
    val idxAfter = partMtimes(d.index, "fpb=")
    val rewritten = idxAfter.keySet.filter(p =>
      idxBefore.get(p) != idxAfter.get(p)) ++ (idxBefore.keySet -- idxAfter.keySet)
    assert(rewritten.nonEmpty && rewritten.size <= 2,
      s"1-doc edit rewrote ${rewritten.size} index buckets: $rewritten")
    (idxBefore.keySet -- rewritten).foreach { p =>
      assert(idxAfter(p) == idxBefore(p), s"untouched index bucket $p rewritten")
    }
    // the index still encodes the exact kept state
    val expected = old.filter(col("doc_id") =!= 17L)
      .unionByName(Seq(doc(17L, "number 17 revised"))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    assert(IncrementalCdc.readKept(spark, d.index)
      .as[(String, Long, Long)].collect().toSet ==
      Incremental.keptState(expected, col("doc_id"), col("text"), 30L)
        .as[(String, Long, Long)].collect().toSet)
  }

  test("10-batch churn: per-batch invalidation stays edit-sized and " +
    "the store tracks the evolving corpus exactly") {
    val old = corpus(120)
    val d = Dirs(Files.createTempDirectory("graft-cdc-churn").toString)
    initStores(old, d, seqLen = 16L)
    // driver-side model of the evolving corpus (id -> text)
    val model = scala.collection.mutable.Map(
      (0 until 120).map(i => i.toLong -> s"the doc number $i has a body of the usual words"): _*)
    var seq = 0L
    for (b <- 0 until 10) {
      val editId = (b * 7L) % 120L
      val delId = (b * 11L + 3L) % 120L
      val addId = 1000L + b
      val newText = s"the doc number $editId has a body of the usual words v$b"
      val evs = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long, Boolean, Long)]()
      if (editId != delId) {
        evs += ((editId, newText, "en", "s", 10L, false, { seq += 1; seq }))
        model(editId) = newText
      }
      evs += ((delId, "x", "en", "s", 1L, true, { seq += 1; seq }))
      model.remove(delId)
      val addText = s"the doc number $addId arrives with a body of the usual words"
      evs += ((addId, addText, "en", "s", 10L, false, { seq += 1; seq }))
      model(addId) = addText
      val touched = apply1(d, evDf(evs.toSeq), batchId = b.toLong, seqLen = 16L)
      val n = touched.count()
      assert(n <= 6, s"batch $b touched $n of $nShards shards")
    }
    val expected = model.toSeq.map { case (id, text) => (id, text, "en", "s", 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(IncrementalCdc.readCorpusStore(spark, d.corpus).drop("shard")
      .as[(Long, String, String, String, Long)].collect().toSet ==
      expected.as[(Long, String, String, String, Long)].collect().toSet)
    assert(packedSet(IncrementalCdc.readPacked(spark, d.packed)) ==
      packedSet(Incremental.pipelineSharded(expected, nShards, seqLen = 16L)))
    assert(IncrementalCdc.readKept(spark, d.index)
      .as[(String, Long, Long)].collect().toSet ==
      Incremental.keptState(expected, col("doc_id"), col("text"), 30L)
        .as[(String, Long, Long)].collect().toSet)
    graft.sources.FileIO.deleteScratch(new java.io.File(d.base))
  }

  test("journal replay: re-applying a batch AFTER its store writes " +
    "landed (the crash-before-checkpoint-commit shape) converges — " +
    "the journal carries the pre-state classification") {
    val base = corpus(40)
    val dups = Seq(
      (100L, "the duplicated text a rather the common one", "en", "s", 8L),
      (203L, "the duplicated text a rather the common one", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val old = base.unionByName(dups)
    val d = Dirs(Files.createTempDirectory("graft-cdc-replay").toString)
    initStores(old, d, seqLen = 16L)
    // the keeper-delete batch: WITHOUT the journal, a replay would
    // classify against the already-updated corpus ('noop'), skip the
    // keeper recompute, and leave the promotion unapplied
    val evs = evDf(Seq((100L, "x", "en", "s", 1L, true, 1L)))
    apply1(d, evs, batchId = 0L, seqLen = 16L)
    val keptAfterFirst = IncrementalCdc.readKept(spark, d.index)
      .as[(String, Long, Long)].collect().toSet
    val packedAfterFirst = packedSet(IncrementalCdc.readPacked(spark, d.packed))
    // the REPLAY: same batch id, same events, stores already post-state
    apply1(d, evs, batchId = 0L, seqLen = 16L)
    assert(IncrementalCdc.readKept(spark, d.index)
      .as[(String, Long, Long)].collect().toSet == keptAfterFirst)
    assert(packedSet(IncrementalCdc.readPacked(spark, d.packed)) ==
      packedAfterFirst)
    val expected = old.filter(col("doc_id") =!= 100L)
    assert(packedAfterFirst ==
      packedSet(Incremental.pipelineSharded(expected, nShards, seqLen = 16L)))
  }

  test("kill-and-restart drill: the stream crashes after a batch's " +
    "store writes but before its checkpoint commit; a RESTART from " +
    "the checkpoint replays it through the journal and the drained " +
    "stores equal the full recompute — no driver-held state") {
    val old = corpus(60)
    val scratch = Files.createTempDirectory("graft-cdc-restart").toString
    val d = Dirs(scratch)
    val inDir = new java.io.File(scratch, "in")
    val ckpt = new java.io.File(scratch, "ckpt").toString
    initStores(old, d, seqLen = 16L)
    // 4 batches of events: edits, a delete, an add, a keeper flip
    val events = evDf(Seq(
      ev(11L, "number 11 v2", del = false, 1L),
      (20L, "x", "en", "s", 1L, true, 2L),
      ev(100L, "brand new", del = false, 3L),
      ev(31L, "number 31 v2", del = false, 4L),
      ev(100L, "brand new v2", del = false, 5L),
      ev(45L, "number 45 v2", del = false, 6L),
      (11L, "x", "en", "s", 1L, true, 7L),
      ev(52L, "number 52 v2", del = false, 8L)))
    graft.sources.FileIO.stageRangeBatches(
      events, col("ev_seq"), 4, new java.io.File(scratch, "stage"), inDir)
    val ss = graft.streaming.StreamSessions.scoped(spark, 4)
    def runStream(crashAtBatch: Option[Long]): Unit = {
      val q = graft.sources.FileIO.streamParquet(
        ss, inDir.toString, events.schema, maxFilesPerTrigger = 1)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          IncrementalCdc.applyDocEvents(
            spark, batch, d.corpus, d.index, d.keeps, d.cls, d.packed,
            id, nShards, seqLen = 16L, nFpBuckets)
          // the drill: stores are fully written, then the JVM "dies"
          // before Structured Streaming commits the batch
          if (crashAtBatch.contains(id))
            throw new RuntimeException(s"induced crash after batch $id")
          ()
        }
        .start()
      try q.awaitTermination()
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException
          if crashAtBatch.isDefined
            && e.getMessage.contains("induced crash") => ()
      }
    }
    runStream(crashAtBatch = Some(1L)) // dies mid-stream, batch 1 uncommitted
    runStream(crashAtBatch = None)     // restart: replays batch 1, drains
    val expected = old
      .filter(!col("doc_id").isin(11L, 20L, 31L, 45L, 52L))
      .unionByName(Seq(
        doc(31L, "number 31 v2"), doc(45L, "number 45 v2"),
        doc(52L, "number 52 v2"), doc(100L, "brand new v2"))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    assert(IncrementalCdc.readCorpusStore(spark, d.corpus).drop("shard")
      .as[(Long, String, String, String, Long)].collect().toSet ==
      expected.as[(Long, String, String, String, Long)].collect().toSet)
    assert(packedSet(IncrementalCdc.readPacked(spark, d.packed)) ==
      packedSet(Incremental.pipelineSharded(expected, nShards, seqLen = 16L)))
    assert(IncrementalCdc.readKept(spark, d.index)
      .as[(String, Long, Long)].collect().toSet ==
      Incremental.keptState(expected, col("doc_id"), col("text"), 30L)
        .as[(String, Long, Long)].collect().toSet)
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
  }
}
