package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import graft.tables.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  test("streamed PQ codes == the batch encode under any split " +
    "(frozen codebook, stateless assignment)") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    val (_, batchCodes) = Similarity.pqTrainSampleEncode(
      e, col("vec_id"), col("embedding"), m = 8, subDim = 8,
      iters = 2, sampleN = 384)
    val batch = batchCodes.as[(Long, Int, Long)].collect().toSet
    assert(batch.size == 500 * 8)
    for (nBatches <- Seq(1, 4)) {
      val scratch = Files.createTempDirectory(s"graft-spq-$nBatches").toString
      val streamed = StreamingAnn.pqEncodeFromFiles(
        spark, e, m = 8, subDim = 8, iters = 2, sampleN = 384,
        nBatches = nBatches, scratch)
        .as[(Long, Int, Long)].collect().toSet
      assert(streamed == batch, s"split into $nBatches batches diverged")
      graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    }
  }

  test("determinism drill: N full stage->stream->drain loops under " +
    "induced concurrent scheduler load land byte-identical codes and " +
    "identical stage digests (the r11 gate-flake investigation)") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    // induced load: parallel shuffle jobs churning the shared session's
    // scheduler for the whole drill (the one condition the gate runs
    // under that solo re-runs don't reproduce)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val noise = (0 until 2).map { i =>
      val t = new Thread(() => {
        while (!stop.get()) {
          spark.range(0, 200000).select(col("id") % 97)
            .groupBy("id").count().agg(sum("count")).collect()
        }
      }, s"pq-drill-noise-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    try {
      def diagFiles() = Option(new java.io.File("target/diag/stream_pq_codes")
        .listFiles()).getOrElse(Array.empty).map(_.getName).toSet
      val runs = (0 until 3).map { i =>
        val scratch = Files.createTempDirectory(s"graft-spq-drill-$i").toString
        val before = diagFiles()
        val codes = StreamingAnn.pqEncodeFromFiles(
          spark, e, m = 8, subDim = 8, iters = 2, sampleN = 384,
          nBatches = 4, scratch)
          .orderBy("cid", "sub")
          .as[(Long, Int, Long)].collect().toSeq
        val digestFile = (diagFiles() -- before).toSeq match {
          case Seq(one) => new java.io.File("target/diag/stream_pq_codes", one)
          case other => fail(s"expected exactly one new digest, got $other")
        }
        val digest = new String(
          java.nio.file.Files.readAllBytes(digestFile.toPath), "UTF-8")
        // stage hashes only — file names/sizes legitimately differ per run
        val HashRe = """"(sample_hash|codebook_hash|codes_hash)":(-?\d+)""".r
        val hashes = HashRe.findAllMatchIn(digest)
          .map(m => m.group(1) -> m.group(2)).toMap
        assert(hashes.size == 3, s"digest missing stage hashes: $digest")
        graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
        (codes, hashes)
      }
      assert(runs.map(_._1).distinct.size == 1,
        "codes diverged across loaded runs")
      assert(runs.map(_._2).distinct.size == 1,
        s"stage digests diverged across loaded runs: ${runs.map(_._2)}")
    } finally {
      stop.set(true)
      noise.foreach(_.join(5000))
    }
  }

  test("the online pipeline end to end: streamed codes feed the live " +
    "server; wire answers == batch pqTopK") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    val scratch = Files.createTempDirectory("graft-spq-serve").toString
    val codes = StreamingAnn.pqEncodeFromFiles(
      spark, e, m = 8, subDim = 8, iters = 2, sampleN = 384,
      nBatches = 4, scratch).localCheckpoint(true)
    val (cb, _) = Similarity.pqTrainSampleEncode(
      e, col("vec_id"), col("embedding"), 8, 8, iters = 2, sampleN = 384)
    val batch = Similarity.pqTopK(
      e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      codes, cb, k = 5, m = 8, subDim = 8)
      .select("qid", "rnk", "cid", "dot_pq")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    val srv = new graft.serving.AnnServer(codes, cb, 8, 8)
    try {
      val client = new graft.serving.AnnClient("localhost", srv.boundPort)
      try {
        val qs = e.filter(col("vec_id") < 5)
          .select(col("vec_id"), col("embedding"))
          .as[(Long, Seq[Float])].collect()
        val wire = qs.map { case (qid, qv) =>
          qid -> client.topk(qv, 6).filter(_._1 != qid).take(5)
        }.toMap
        assert(wire == batch, "served answers diverged from batch pqTopK")
      } finally client.close()
    } finally srv.close()
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
  }
}
