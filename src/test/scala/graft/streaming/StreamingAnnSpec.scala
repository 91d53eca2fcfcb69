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
}
