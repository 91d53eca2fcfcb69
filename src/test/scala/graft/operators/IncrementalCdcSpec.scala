package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IncrementalCdcSpec extends SparkSpec {
  import spark.implicits._

  private val nShards = 8

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

  test("event sequences across batches: update-then-delete, " +
    "delete-then-readd, within-batch last-wins — drained store == " +
    "full recompute on the final corpus") {
    val old = corpus(40)
    val scratch = Files.createTempDirectory("graft-cdc").toString
    val corpusDir = s"$scratch/corpus"
    val packedDir = s"$scratch/packed"
    IncrementalCdc.writeCorpusStore(old, nShards, corpusDir)
    Incremental.writeShardStore(
      Incremental.pipelineSharded(old, nShards, seqLen = 16L), packedDir)
    var kept = Incremental.keptState(old, col("doc_id"), col("text"), 30L)
    // batch 1: doc 11 edited; doc 20 deleted; doc 100 added; doc 7
    //   gets TWO events — the higher ev_seq (second edit) must win
    val b1 = evDf(Seq(
      ev(11L, "number 11 v2", del = false, 1L),
      (20L, "x", "en", "s", 1L, true, 2L),
      ev(100L, "brand new", del = false, 3L),
      ev(7L, "number 7 draft", del = false, 4L),
      ev(7L, "number 7 final", del = false, 5L)))
    val (k1, _) = IncrementalCdc.applyDocEvents(
      spark, b1, corpusDir, kept, packedDir, nShards, seqLen = 16L)
    kept = k1
    // batch 2: doc 11 deleted (update-then-delete); doc 20 re-added
    //   (delete-then-readd); doc 100 edited again
    val b2 = evDf(Seq(
      (11L, "x", "en", "s", 1L, true, 6L),
      ev(20L, "number 20 reborn", del = false, 7L),
      ev(100L, "brand new v2", del = false, 8L)))
    val (k2, _) = IncrementalCdc.applyDocEvents(
      spark, b2, corpusDir, kept, packedDir, nShards, seqLen = 16L)
    kept = k2
    // expected final corpus
    val expected = corpus(40)
      .filter(!col("doc_id").isin(7L, 11L, 20L))
      .unionByName(Seq(
        doc(7L, "number 7 final"), doc(20L, "number 20 reborn"),
        doc(100L, "brand new v2"))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val gotCorpus = IncrementalCdc.readCorpusStore(spark, corpusDir)
      .drop("shard").as[(Long, String, String, String, Long)].collect().toSet
    assert(gotCorpus ==
      expected.as[(Long, String, String, String, Long)].collect().toSet)
    val full = Incremental.pipelineSharded(expected, nShards, seqLen = 16L)
    assert(packedSet(Incremental.readShardStore(spark, packedDir)) ==
      packedSet(full))
    // kept state equals the from-scratch state on the final corpus
    assert(kept.as[(String, Long, Long)].collect().toSet ==
      Incremental.keptState(expected, col("doc_id"), col("text"), 30L)
        .as[(String, Long, Long)].collect().toSet)
  }

  test("redelivered identical event classifies unchanged: no shard " +
    "repacks, no partition files rewritten") {
    val old = corpus(40)
    val scratch = Files.createTempDirectory("graft-cdc-redeliver").toString
    val corpusDir = s"$scratch/corpus"
    val packedDir = s"$scratch/packed"
    IncrementalCdc.writeCorpusStore(old, nShards, corpusDir)
    Incremental.writeShardStore(
      Incremental.pipelineSharded(old, nShards, seqLen = 16L), packedDir)
    val kept = Incremental.keptState(old, col("doc_id"), col("text"), 30L)
    def mtimes() = new java.io.File(packedDir).listFiles().toSeq
      .filter(_.getName.startsWith("grp="))
      .map(d => d.getName -> d.listFiles().map(_.lastModified()).toSeq).toMap
    val before = mtimes()
    Thread.sleep(1100)
    // the exact current content of doc 5 re-sent as an upsert
    val (_, touched) = IncrementalCdc.applyDocEvents(
      spark, evDf(Seq(ev(5L, "number 5", del = false, 1L))),
      corpusDir, kept, packedDir, nShards, seqLen = 16L)
    assert(touched.isEmpty, "identical upsert must touch nothing")
    assert(mtimes() == before, "packed partitions were rewritten")
  }

  test("a deleted duplicate keeper promotes the surviving copy's " +
    "shard through the CDC path") {
    val base = corpus(40)
    val dups = Seq(
      (100L, "the duplicated text a rather the common one", "en", "s", 8L),
      (203L, "the duplicated text a rather the common one", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val old = base.unionByName(dups)
    val scratch = Files.createTempDirectory("graft-cdc-flip").toString
    val corpusDir = s"$scratch/corpus"
    val packedDir = s"$scratch/packed"
    IncrementalCdc.writeCorpusStore(old, nShards, corpusDir)
    Incremental.writeShardStore(
      Incremental.pipelineSharded(old, nShards, seqLen = 16L), packedDir)
    val kept = Incremental.keptState(old, col("doc_id"), col("text"), 30L)
    val (k2, touched) = IncrementalCdc.applyDocEvents(
      spark, evDf(Seq((100L, "x", "en", "s", 1L, true, 1L))),
      corpusDir, kept, packedDir, nShards, seqLen = 16L)
    assert(touched.as[Long].collect().toSet.contains(203L % nShards))
    assert(k2.filter(col("keep_id") === 203L).count() == 1L)
    val expected = old.filter(col("doc_id") =!= 100L)
    assert(packedSet(Incremental.readShardStore(spark, packedDir)) ==
      packedSet(Incremental.pipelineSharded(expected, nShards, seqLen = 16L)))
  }

  test("10-batch churn: per-batch invalidation stays edit-sized and " +
    "the store tracks the evolving corpus exactly") {
    val old = corpus(120)
    val scratch = Files.createTempDirectory("graft-cdc-churn").toString
    val corpusDir = s"$scratch/corpus"
    val packedDir = s"$scratch/packed"
    IncrementalCdc.writeCorpusStore(old, nShards, corpusDir)
    Incremental.writeShardStore(
      Incremental.pipelineSharded(old, nShards, seqLen = 16L), packedDir)
    var kept = Incremental.keptState(old, col("doc_id"), col("text"), 30L)
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
      val (k2, touched) = IncrementalCdc.applyDocEvents(
        spark, evDf(evs.toSeq), corpusDir, kept, packedDir, nShards, seqLen = 16L)
      kept = k2
      val n = touched.count()
      assert(n <= 6, s"batch $b touched $n of $nShards shards")
    }
    val expected = model.toSeq.map { case (id, text) => (id, text, "en", "s", 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(IncrementalCdc.readCorpusStore(spark, corpusDir).drop("shard")
      .as[(Long, String, String, String, Long)].collect().toSet ==
      expected.as[(Long, String, String, String, Long)].collect().toSet)
    assert(packedSet(Incremental.readShardStore(spark, packedDir)) ==
      packedSet(Incremental.pipelineSharded(expected, nShards, seqLen = 16L)))
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
  }
}
