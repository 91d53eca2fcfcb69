package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CdcVectors — the PQ codes store maintained from upsert/delete
  * vector events (frozen codebook, manifest-committed shards) and
  * served live across churn by AnnServer's store-follow mode.
  */
class CdcVectorsSpec extends SparkSpec {
  import spark.implicits._

  private val M = 4
  private val SubDim = 4
  private val Dim = M * SubDim
  private val NShards = 4

  private def vec(seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(Dim)((rnd.nextFloat() - 0.5f) * 2.0f)
  }

  private lazy val initial: DataFrame =
    (0 until 40).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  private def codesOf(df: DataFrame): Set[(Long, Int, Long)] =
    df.select("cid", "sub", "cell").as[(Long, Int, Long)].collect().toSet

  test("drained CDC codes == one-shot encode of the post-churn corpus, " +
    "at different batch splits (delete, upsert, add, delete-then-readd)") {
    val cb = CdcVectors.trainCodebook(
      initial, M, SubDim, iters = 2, sampleN = 24)
    // churn: delete %5; re-embed %4 (not %5); add 100+i for %7;
    // delete-then-readd id 10 (also %5) with a new embedding
    def ev(id: Long, v: Array[Float], del: Boolean, seq: Long) =
      (id, v, del, seq)
    val events =
      (0 until 40).filter(_ % 5 == 0).map(i =>
        ev(i.toLong, vec(i), del = true, i.toLong)) ++
        (0 until 40).filter(i => i % 5 != 0 && i % 4 == 0).map(i =>
          ev(i.toLong, vec(1000 + i), del = false, i.toLong)) ++
        (0 until 40).filter(_ % 7 == 0).map(i =>
          ev(100L + i, vec(2000 + i), del = false, 100L + i)) ++
        Seq(ev(10L, vec(3000), del = false, 900L))
    val evDf = events.toDF("vec_id", "embedding", "is_delete", "ev_seq")
    // post-churn corpus, folded the same way
    val byId = events.groupBy(_._1).map { case (id, es) => es.maxBy(_._4) }
    val finalRows =
      (0 until 40).filterNot(i => byId.exists(_._1 == i))
        .map(i => (i.toLong, vec(i))) ++
        byId.filterNot(_._3).map(e => (e._1, e._2))
    val expect = codesOf(Similarity.pqEncodeWith(
      finalRows.toSeq.toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), cb, M, SubDim))
    Seq(2, 5).foreach { nBatches =>
      val got = codesOf(CdcVectors.pipelineFromVectorEventsFromFiles(
        spark, evDf, initial, M, SubDim, iters = 2, sampleN = 24,
        nBatches = nBatches,
        scratch = graft.LocalDir.runDir(s"cdcv-spec-$nBatches"),
        nShards = NShards))
      assert(got == expect, s"split nBatches=$nBatches diverged")
    }
  }

  test("a replayed batch reconverges without a journal (stateless " +
    "rewrite: old-minus-ids plus re-encoded upserts)") {
    val dir = java.nio.file.Files.createTempDirectory("cdcv-replay").toString
    val cb = CdcVectors.trainCodebook(
      initial, M, SubDim, iters = 2, sampleN = 24)
    CdcVectors.initCodes(initial, cb, M, SubDim, NShards, dir)
    val batch = Seq(
      (3L, vec(333), false, 1L),
      (4L, vec(4), true, 2L)).toDF("vec_id", "embedding", "is_delete", "ev_seq")
    CdcVectors.applyVectorEvents(spark, batch, cb, M, SubDim, NShards, dir)
    val after1 = codesOf(CdcVectors.readCodes(spark, dir))
    CdcVectors.applyVectorEvents(spark, batch, cb, M, SubDim, NShards, dir)
    val after2 = codesOf(CdcVectors.readCodes(spark, dir))
    assert(after1 == after2, "replay must be a fixpoint")
    assert(!after2.exists(_._1 == 4L), "deleted id must stay gone")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("AnnServer store-follow serves across churn: answers track " +
    "deletes and re-embeds within a refresh interval, bit-identical " +
    "to batch pqTopK on the post-churn codes") {
    val dir = java.nio.file.Files.createTempDirectory("cdcv-serve").toString
    val cb = CdcVectors.trainCodebook(
      initial, M, SubDim, iters = 2, sampleN = 24)
    CdcVectors.initCodes(initial, cb, M, SubDim, NShards, dir)
    val emptyCodes = Seq.empty[(Long, Int, Long)].toDF("cid", "sub", "cell")
    val srv = new graft.serving.AnnServer(
      emptyCodes, cb, M, SubDim, refreshMillis = 100L, storeDir = Some(dir))
    try {
      val client = new graft.serving.AnnClient("localhost", srv.boundPort)
      try {
        def batchTop(k: Int, q: Array[Float]): Seq[(Long, Long)] = {
          val qdf = Seq((Long.MinValue, q)).toDF("qid", "qvec")
          Similarity.pqTopK(
            qdf, CdcVectors.readCodes(spark, dir), cb, k, M, SubDim)
            .orderBy("rnk").select("cid", "dot_pq")
            .as[(Long, Long)].collect().toSeq
        }
        val q = vec(7)
        // pre-churn: wire == batch
        var tries = 0
        while (client.count() != 40 && tries < 100) {
          Thread.sleep(100); tries += 1
        }
        assert(client.count() == 40)
        assert(client.topk(q, 5) == batchTop(5, q))
        // churn: delete the current top answer, re-embed another id
        val victim = client.topk(q, 1).head._1
        val batch = Seq(
          (victim, vec(1), true, 1L),
          (11L, vec(5000), false, 2L)).toDF("vec_id", "embedding", "is_delete", "ev_seq")
        CdcVectors.applyVectorEvents(spark, batch, cb, M, SubDim, NShards, dir)
        tries = 0
        while (client.count() != 39 && tries < 100) {
          Thread.sleep(100); tries += 1
        }
        assert(client.count() == 39, "COUNT must track the delete")
        val post = client.topk(q, 5)
        assert(!post.exists(_._1 == victim),
          "a deleted vector must leave the served index")
        assert(post == batchTop(5, q),
          "served post-churn answers must equal batch pqTopK on the store")
      } finally client.close()
    } finally srv.close()
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }
}
