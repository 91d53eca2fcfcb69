package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def collectPacked(df: DataFrame): Set[(Long, Long, Long, Long, Long, Long, Long, Boolean)] =
    df.select("doc_id", "grp", "seq_id", "begin_in_seq", "end_in_seq",
      "doc_begin", "n_piece", "starts_doc")
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].collect().toSet

  test("a 3-doc edit reprocesses a small shard fraction and still " +
    "equals the full recompute") {
    val old = Tables.load(spark, Sf0001, "documents")
    val nShards = 64
    // tiny edit: 2 texts changed, 1 doc added
    val newDocs = old
      .withColumn("text",
        when(col("doc_id").isin(11L, 23L), concat(col("text"), lit(" tweak")))
          .otherwise(col("text")))
      .unionByName(old.filter(col("doc_id") === 5L)
        .select(lit(20000001L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    val priorKept = Incremental.keptState(old, col("doc_id"), col("text"), 30L)
    val priorPacked = Incremental.pipelineSharded(old, nShards, seqLen = 256L)
    val (kept2, packed2, touched) = Incremental.pipelineIncremental(
      old, newDocs, priorKept, priorPacked, nShards, seqLen = 256L)
    val touchedN = touched.count()
    assert(touchedN > 0 && touchedN <= 8,
      s"3-doc edit touched $touchedN of $nShards shards")
    // incremental == full, on BOTH outputs
    val full = Incremental.pipelineSharded(newDocs, nShards, seqLen = 256L)
    assert(collectPacked(packed2) == collectPacked(full))
    val fullKept = Incremental.keptState(newDocs, col("doc_id"), col("text"), 30L)
      .as[(String, Long, Long)].collect().toSet
    assert(kept2.as[(String, Long, Long)].collect().toSet == fullKept)
  }

  test("a removed duplicate promotes a copy in an UNtouched shard — " +
    "the kept-flip invalidation catches it") {
    val nShards = 8
    // docs 100 (shard 4) and 203 (shard 3) are exact duplicates; the
    // rest are unique. Removing 100 promotes 203, whose shard the
    // diff alone would never touch. (Text must pass the stop-word
    // quality gate.)
    val base = (0 until 50).map(i =>
      (i * 10L + 1L, s"the doc number $i has a body of the usual words", "en", "s", 10L))
    val rows = base ++ Seq(
      (100L, "the duplicated text a rather the common one", "en", "s", 8L),
      (203L, "the duplicated text a rather the common one", "en", "s", 8L))
    val old = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val newDocs = old.filter(col("doc_id") =!= 100L)
    val priorKept = Incremental.keptState(old, col("doc_id"), col("text"), 30L)
    val priorPacked = Incremental.pipelineSharded(old, nShards, seqLen = 16L)
    val (kept2, packed2, touched) = Incremental.pipelineIncremental(
      old, newDocs, priorKept, priorPacked, nShards, seqLen = 16L)
    val touchedShards = touched.as[Long].collect().toSet
    assert(touchedShards.contains(203L % nShards),
      s"promoted copy's shard not invalidated: $touchedShards")
    val full = Incremental.pipelineSharded(newDocs, nShards, seqLen = 16L)
    assert(collectPacked(packed2) == collectPacked(full))
    // the promoted doc is now kept
    assert(kept2.filter(col("keep_id") === 203L).count() == 1L)
  }

  test("store-backed incremental: touched shards dynamic-overwrite " +
    "their partitions, untouched partition FILES are never rewritten, " +
    "emptied shards drop theirs; store == full recompute") {
    val nShards = 8
    val rows = (0 until 60).map(i =>
      (i.toLong, s"the doc number $i has a body of the usual words", "en", "s", 10L))
    val old = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    // edit: change doc 11 (shard 3); REMOVE every doc of shard 5
    val newDocs = old
      .filter(pmod(col("doc_id"), lit(nShards.toLong)) =!= 5L)
      .withColumn("text",
        when(col("doc_id") === 11L, concat(col("text"), lit(" tweak")))
          .otherwise(col("text")))
    val store = java.nio.file.Files.createTempDirectory("graft-incr-store").toString
    Incremental.writeShardStore(
      Incremental.pipelineSharded(old, nShards, seqLen = 16L), store)
    def partFiles(): Map[String, Map[String, Long]] =
      new java.io.File(store).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("grp="))
        .map(d => d.getName ->
          d.listFiles().toSeq.filterNot(_.getName.startsWith("_"))
            .map(f => f.getName -> f.lastModified()).toMap)
        .toMap
    val before = partFiles()
    assert(before.keySet.size == nShards, s"expected all shards: ${before.keySet}")
    Thread.sleep(1100) // mtime resolution guard
    val priorKept = Incremental.keptState(old, col("doc_id"), col("text"), 30L)
    val (_, touched) = Incremental.pipelineIncrementalToStore(
      old, newDocs, priorKept, store, nShards, seqLen = 16L)
    val touchedSet = touched.as[Long].collect().toSet
    assert(touchedSet.contains(3L) && touchedSet.contains(5L))
    val after = partFiles()
    // emptied shard's partition is gone
    assert(!after.contains("grp=5"), s"stale emptied partition: ${after.keySet}")
    // untouched partitions: identical file lists AND timestamps
    (before.keySet - "grp=5").filterNot(p =>
      touchedSet.contains(p.stripPrefix("grp=").toLong)).foreach { p =>
      assert(after(p) == before(p), s"untouched partition $p was rewritten")
    }
    // touched non-empty shard really was replaced
    assert(after("grp=3") != before("grp=3"), "touched partition not rewritten")
    // the store equals a from-scratch run on the new corpus
    val full = Incremental.pipelineSharded(newDocs, nShards, seqLen = 16L)
    assert(collectPacked(Incremental.readShardStore(spark, store)) ==
      collectPacked(full))
    graft.sources.FileIO.deleteScratch(new java.io.File(store))
  }

  test("torn store heals: a crash mid-dynamic-overwrite (partitions " +
    "half-replaced) converges by re-running the incremental step") {
    // dynamic partition overwrite is not atomic across partitions —
    // but the incremental step derives its touched set from the
    // CORPORA (diff + priors), never from the store, so a re-run
    // recomputes and overwrites the same partitions and converges
    val nShards = 8
    val rows = (0 until 60).map(i =>
      (i.toLong, s"the doc number $i has a body of the usual words", "en", "s", 10L))
    val old = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val newDocs = old.withColumn("text",
      when(col("doc_id").isin(11L, 20L), concat(col("text"), lit(" tweak")))
        .otherwise(col("text")))
    val store = java.nio.file.Files.createTempDirectory("graft-incr-torn").toString
    Incremental.writeShardStore(
      Incremental.pipelineSharded(old, nShards, seqLen = 16L), store)
    val priorKept = Incremental.keptState(old, col("doc_id"), col("text"), 30L)
    val (_, touched) = Incremental.pipelineIncrementalToStore(
      old, newDocs, priorKept, store, nShards, seqLen = 16L)
    val touchedSet = touched.as[Long].collect().toSet
    assert(touchedSet.size >= 2, s"need >= 2 touched shards: $touchedSet")
    // simulate the torn crash: one touched partition reverts to its
    // PRE-RUN content (as if its overwrite never committed)
    val revert = touchedSet.head
    val dir = new java.io.File(store, s"grp=$revert")
    graft.sources.FileIO.deleteScratch(dir)
    Incremental.writeShardStore(
      Incremental.pipelineSharded(old, nShards, seqLen = 16L)
        .filter(col("grp") === revert), store)
    val full = Incremental.pipelineSharded(newDocs, nShards, seqLen = 16L)
    assert(collectPacked(Incremental.readShardStore(spark, store)) !=
      collectPacked(full), "torn store should differ before the healing re-run")
    // the healing re-run: same inputs, same touched set, converges
    Incremental.pipelineIncrementalToStore(
      old, newDocs, priorKept, store, nShards, seqLen = 16L)
    assert(collectPacked(Incremental.readShardStore(spark, store)) ==
      collectPacked(full), "re-run did not heal the torn store")
    graft.sources.FileIO.deleteScratch(new java.io.File(store))
  }

  test("a lang-only metadata flip (text unchanged) invalidates its " +
    "shard — incremental == full through the stratified-sample change") {
    val nShards = 8
    val rows = (0 until 60).map(i =>
      (i.toLong, s"the doc number $i has a body of the usual words", "en", "s", 10L))
    val old = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    // doc 12's lang flips en -> xx: fingerprint identical, but lang
    // keys both the sample RATE (en 600 vs default 800 per mille) and
    // the md5 keep-hash — the packed output changes, so the shard
    // MUST be classified as touched
    val newDocs = old.withColumn("lang",
      when(col("doc_id") === 12L, lit("xx")).otherwise(col("lang")))
    val priorKept = Incremental.keptState(old, col("doc_id"), col("text"), 30L)
    val priorPacked = Incremental.pipelineSharded(old, nShards, seqLen = 16L)
    val (kept2, packed2, touched) = Incremental.pipelineIncremental(
      old, newDocs, priorKept, priorPacked, nShards, seqLen = 16L)
    val touchedSet = touched.as[Long].collect().toSet
    assert(touchedSet.contains(12L % nShards),
      s"lang-only edit did not invalidate its shard: $touchedSet")
    val full = Incremental.pipelineSharded(newDocs, nShards, seqLen = 16L)
    assert(collectPacked(packed2) == collectPacked(full))
    // text unchanged -> kept state unchanged
    assert(kept2.as[(String, Long, Long)].collect().toSet ==
      Incremental.keptState(newDocs, col("doc_id"), col("text"), 30L)
        .as[(String, Long, Long)].collect().toSet)
  }

  test("empty diff: nothing recomputes, outputs carry over verbatim") {
    val old = Tables.load(spark, Sf0001, "documents")
    val priorKept = Incremental.keptState(old, col("doc_id"), col("text"), 30L)
    val priorPacked = Incremental.pipelineSharded(old, 16, seqLen = 256L)
    val (kept2, packed2, touched) = Incremental.pipelineIncremental(
      old, old, priorKept, priorPacked, 16, seqLen = 256L)
    assert(touched.isEmpty)
    assert(collectPacked(packed2) == collectPacked(priorPacked))
    assert(kept2.count() == priorKept.count())
  }

  test("viewApplyChanges: signed deltas maintain a keyed (count, sum) " +
    "view — keys drain to zero and drop out, new keys arrive, and the " +
    "result equals a fresh aggregate") {
    val view0 = Seq((0L, 2L, 30L), (1L, 1L, 5L), (2L, 3L, 60L))
      .toDF("k", "n", "s")
    // key 1 drains entirely; key 0 updates one row (delete+insert);
    // key 9 is brand new
    val feed = Seq(
      (1L, 5L, "delete"),
      (0L, 10L, "delete"), (0L, 17L, "insert"),
      (9L, 100L, "insert"), (9L, 1L, "insert"))
      .toDF("k", "v", "change")
    val out = Incremental.viewApplyChanges(
      view0, feed, Seq("k"), "v", "n", "s")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((0L, 2L, 37L), (2L, 3L, 60L), (9L, 2L, 101L)),
      s"drained keys must drop out and new keys arrive: $out")
  }

  test("viewApplyChanges: NULL keys merge into one group exactly as a " +
    "fresh aggregate would — the null-safe join keeps view == fresh") {
    val view0 = Seq(
      (Option(0L), 2L, 30L), (Option.empty[Long], 2L, 10L))
      .toDF("k", "n", "s")
    // the null-keyed group updates (one delete, two inserts) — plain
    // equality would leave the old null row AND a new null delta row
    val feed = Seq(
      (Option.empty[Long], 4L, "delete"),
      (Option.empty[Long], 7L, "insert"),
      (Option.empty[Long], 9L, "insert"),
      (Option(0L), 1L, "insert"))
      .toDF("k", "v", "change")
    val out = Incremental.viewApplyChanges(
      view0, feed, Seq("k"), "v", "n", "s")
      .as[(Option[Long], Long, Long)].collect().toSet
    assert(out == Set((Option(0L), 3L, 31L), (Option.empty[Long], 3L, 22L)),
      s"null keys must merge like a fresh groupBy: $out")
  }
}
