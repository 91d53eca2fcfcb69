package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Cross-store transaction log drills: every readable tx names a
  * CONSISTENT combination of the four CDC stores — the invariant a
  * per-store snapshot alone cannot give (store A post-batch-N + store
  * B post-batch-N-1 are both atomic reads, their join is garbage).
  */
class TxLogSpec extends SparkSpec {
  import spark.implicits._

  private val nShards = 8
  private val nFpBuckets = 16
  private val seqLen = 16L

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

  private def freshDirs(tag: String): IncrementalCdc.CdcDirs = {
    val d = IncrementalCdc.CdcDirs(
      Files.createTempDirectory(s"graft-tx-$tag").toString)
    graft.sources.FileIO.deleteScratchOnExit(new java.io.File(d.scratch))
    d
  }

  private def initStores(old: DataFrame, d: IncrementalCdc.CdcDirs): Unit = {
    IncrementalCdc.writeCorpusStore(old, nShards, d.corpus)
    IncrementalCdc.writeDedupStores(old, nShards, nFpBuckets, d.index, d.keeps)
    graft.sources.ManifestStore.init(
      Incremental.pipelineSharded(old, nShards, seqLen), "grp", d.packed)
    graft.sources.TxLog.publish(d.tx, batchId = -1L,
      Map("corpus" -> 0L, "index" -> 0L, "keeps" -> 0L, "packed" -> 0L))
    ()
  }

  private def apply1(
      d: IncrementalCdc.CdcDirs, evs: DataFrame, batchId: Long): Unit = {
    IncrementalCdc.applyDocEvents(
      spark, evs, d.corpus, d.index, d.keeps,
      s"${d.scratch}/cls", d.packed,
      batchId, nShards, seqLen, nFpBuckets, txDir = Some(d.tx))
    ()
  }

  /** The cross-store consistency oracle at one tx: the packed store AT
    * tx must equal a from-scratch recompute over the corpus store AT
    * THE SAME tx, and the keeps store AT tx must hold exactly the
    * keeper ids the index AT tx encodes. Any version mixing across
    * stores breaks one of the two.
    */
  private def assertConsistentAt(
      d: IncrementalCdc.CdcDirs, txId: Long): Unit = {
    val (_, corp, idx, keeps, packed) =
      IncrementalCdc.readAtTx(spark, d, Some(txId))
    assert(packedSet(packed) ==
      packedSet(Incremental.pipelineSharded(
        corp.drop("shard"), nShards, seqLen)),
      s"packed@tx$txId != recompute(corpus@tx$txId)")
    assert(keeps.select("keep_id").as[Long].collect().toSet ==
      idx.groupBy("fingerprint").agg(min("doc_id").as("k"))
        .select("k").as[Long].collect().toSet,
      s"keeps@tx$txId != keepers(index@tx$txId)")
  }

  test("every retained tx reads a consistent cross-store combination " +
    "while later batches keep publishing") {
    val d = freshDirs("consistency")
    initStores(corpus(40), d)
    // three batches that move all four stores: edits, a delete of a
    // group keeper (flips the keeps store), an add
    apply1(d, evDf(Seq(
      ev(11L, "number 11 v2", del = false, 1L),
      ev(100L, "brand new", del = false, 2L))), batchId = 0L)
    apply1(d, evDf(Seq(
      (20L, "x", "en", "s", 1L, true, 3L),
      ev(100L, "brand new v2", del = false, 4L))), batchId = 1L)
    apply1(d, evDf(Seq(
      ev(20L, "number 20 reborn", del = false, 5L))), batchId = 2L)
    val latest = graft.sources.TxLog.latestId(d.tx).get
    assert(latest == 3L, "bootstrap tx0 + one tx per batch")
    // every retained tx — including the ones the writer has since
    // superseded — still names a consistent combination
    (0L to latest).foreach(assertConsistentAt(d, _))
  }

  test("a pinned tx re-reads byte-identical while the writer publishes " +
    "on top of it") {
    val d = freshDirs("pin")
    initStores(corpus(30), d)
    apply1(d, evDf(Seq(ev(5L, "number 5 v2", del = false, 1L))), 0L)
    val pinned = graft.sources.TxLog.latestId(d.tx).get
    val before = packedSet(IncrementalCdc.readAtTx(spark, d, Some(pinned))._5)
    val beforeCorpus = IncrementalCdc.readAtTx(spark, d, Some(pinned))._2
      .drop("shard").as[(Long, String, String, String, Long)].collect().toSet
    // the writer moves on: a delete + an add land after the pin
    apply1(d, evDf(Seq(
      (5L, "x", "en", "s", 1L, true, 2L),
      ev(200L, "late arrival", del = false, 3L))), 1L)
    assert(graft.sources.TxLog.latestId(d.tx).get == pinned + 1)
    // the pinned combination is frozen — no torn read, no new rows
    assert(packedSet(
      IncrementalCdc.readAtTx(spark, d, Some(pinned))._5) == before)
    assert(IncrementalCdc.readAtTx(spark, d, Some(pinned))._2
      .drop("shard").as[(Long, String, String, String, Long)]
      .collect().toSet == beforeCorpus)
    // and the latest tx sees the post-batch world
    val after = IncrementalCdc.readAtTx(spark, d, None)._2
      .select("doc_id").as[Long].collect().toSet
    assert(!after.contains(5L) && after.contains(200L))
  }

  test("a tx past retention answers a defined error, never a wrong " +
    "combination; the latest keeps serving") {
    val d = freshDirs("retention")
    initStores(corpus(20), d)
    // push 9 more tx records through (retainTx = 8): tx0 drops
    (0 until 9).foreach { i =>
      apply1(d, evDf(Seq(
        ev(3L, s"number 3 rev $i", del = false, 10L + i))), i.toLong)
    }
    val latest = graft.sources.TxLog.latestId(d.tx).get
    assert(latest == 9L)
    val err = intercept[graft.sources.RetentionException] {
      IncrementalCdc.readAtTx(spark, d, Some(0L))
    }
    assert(err.getMessage.contains("past retention"))
    assertConsistentAt(d, latest)
  }

  test("tx publish records a strictly-increasing timestamp; readAsOf " +
    "pins the cross-store combination as of a wall-time, byte-stable " +
    "mid-churn; too-early pins answer the typed retention error; " +
    "legacy timestampless records are skipped") {
    val dir = Files.createTempDirectory("graft-tx-asof").toString
    graft.sources.TxLog.publish(dir, 0L, Map("a" -> 0L, "b" -> 0L))
    graft.sources.TxLog.publish(dir, 1L, Map("a" -> 1L, "b" -> 1L))
    graft.sources.TxLog.publish(dir, 2L, Map("a" -> 2L, "b" -> 1L))
    val txs = (0L to 2L).map(i => graft.sources.TxLog.read(dir, Some(i)))
    val ts = txs.map(_.ts.get)
    assert(ts == ts.sorted && ts.distinct == ts,
      s"tx timestamps must be strictly increasing: $ts")
    // exact / in-between / after-all pins
    assert(graft.sources.TxLog.readAsOf(dir, ts(1)).txId == 1L)
    assert(graft.sources.TxLog.readAsOf(dir, ts(2) - 1L).txId == 1L)
    val pinned = graft.sources.TxLog.readAsOf(dir, ts(1))
    assert(pinned.versions == Map("a" -> 1L, "b" -> 1L))
    // churn on top: the as-of resolution is stable
    graft.sources.TxLog.publish(dir, 3L, Map("a" -> 3L, "b" -> 2L))
    assert(graft.sources.TxLog.readAsOf(dir, ts(1)) == pinned,
      "an as-of tx pin must not move under a publishing writer")
    // before the first retained record: typed
    intercept[graft.sources.RetentionException](
      graft.sources.TxLog.readAsOf(dir, ts(0) - 1L))
    // a legacy record without #ts is never resolved by a time pin
    graft.sources.StoreFs.writeOverwrite(
      new org.apache.hadoop.fs.Path(s"$dir/tx000000000099.txt"),
      "batch=9\na=9")
    assert(graft.sources.TxLog.readAsOf(
      dir, System.currentTimeMillis() + 10000L).txId == 3L,
      "timestampless records must be skipped by readAsOf")
    assert(graft.sources.TxLog.read(dir, Some(99L)).ts.isEmpty)
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("tx publish is a CAS: racing publishers never silently " +
    "overwrite — every published record is distinct and well-formed, " +
    "losers fail typed") {
    val d = freshDirs("cas")
    val txDir = s"${d.scratch}/tx"
    graft.sources.TxLog.publish(txDir, -1L,
      Map("corpus" -> 0L, "index" -> 0L, "keeps" -> 0L, "packed" -> 0L))
    // 8 threads race 25 publishes each through a start barrier; a
    // loser of any round's version race must throw TYPED (the fence),
    // never overwrite a winner's record
    val threads = 8
    val rounds = 25
    val barrier = new java.util.concurrent.CyclicBarrier(threads)
    val published = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val raced = new java.util.concurrent.atomic.AtomicInteger()
    val pool = (0 until threads).map { th =>
      new Thread(() => {
        barrier.await()
        (0 until rounds).foreach { r =>
          try {
            published.add(graft.sources.TxLog.publish(
              txDir, batchId = th * 1000L + r,
              Map("corpus" -> 1L, "index" -> 1L, "keeps" -> 1L,
                "packed" -> 1L),
              retainTx = 1000))
            ()
          } catch {
            case _: graft.sources.ConcurrentCommitException =>
              raced.incrementAndGet(); ()
          }
        }
      })
    }
    pool.foreach(_.start()); pool.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val all = published.asScala.toSeq
    val ids = all.toSet
    assert(all.size == ids.size, "some tx id was published TWICE")
    assert(ids.size + raced.get == threads * rounds,
      "every attempt either published a distinct id or failed typed")
    // every winner's record survived intact (no torn/overwritten file)
    ids.foreach { id =>
      val rec = graft.sources.TxLog.read(txDir, Some(id))
      assert(rec.versions == Map("corpus" -> 1L, "index" -> 1L,
        "keeps" -> 1L, "packed" -> 1L))
    }
    assert(raced.get > 0, "the drill should actually produce races")
  }

  test("the retention coupling is enforced at publish: retainTx " +
    "outliving a member store's retainVersions is rejected FAST, not " +
    "discovered as a pinned reader's missing manifest") {
    val txDir = java.nio.file.Files
      .createTempDirectory("graft-txguard").toString + "/tx"
    val err = intercept[IllegalArgumentException] {
      graft.sources.TxLog.publish(txDir, -1L,
        Map("corpus" -> 0L, "packed" -> 0L),
        retainTx = 16,
        memberRetention = Map("corpus" -> 16, "packed" -> 8))
    }
    assert(err.getMessage.contains("packed")
      && err.getMessage.contains("retainTx=16"),
      s"guard must name the violating store: ${err.getMessage}")
    assert(graft.sources.TxLog.latestId(txDir).isEmpty,
      "a rejected configuration must publish NOTHING")
    // the conforming configuration publishes normally
    val id = graft.sources.TxLog.publish(txDir, -1L,
      Map("corpus" -> 0L, "packed" -> 0L),
      retainTx = 8,
      memberRetention = Map("corpus" -> 16, "packed" -> 8))
    assert(id == 0L)
    graft.sources.FileIO.deleteScratch(
      new java.io.File(txDir).getParentFile)
  }
}
