package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The compressed embedding index maintained ONLINE: vectors arrive
  * as micro-batch files and PQ-encode against a FROZEN sample-trained
  * codebook — the FAISS operating model (a codebook is a model:
  * train once on a sample, encode forever) as a streaming query.
  * The encode is a STATELESS codegen projection
  * ([[Similarity.pqEncodeWith]]'s `PqAssign` kernel — the codebook
  * rides as a reference object), so any micro-batch split lands
  * row-identical codes to the batch encode, exactly-once through the
  * file sink; nothing about the stream is approximate.
  *
  * This is the ingest half of a live ANN service: the drained (or
  * continuously growing) codes table is exactly what [[Similarity.pqTopK]]
  * / [[Similarity.pqTopKRerank]] scan.
  */
object StreamingAnn {

  def pqEncodeFromFiles(
      spark: SparkSession,
      embs: DataFrame, // (vec_id, embedding)
      m: Int, subDim: Int, iters: Int, sampleN: Int,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    val narrow = embs.select(col("vec_id"), col("embedding"))
    // train on the md5 sample of the FULL corpus (the model is frozen
    // before the stream starts — the production shape)
    val (codebook, _) = Similarity.pqTrainSampleEncode(
      narrow, col("vec_id"), col("embedding"), m, subDim, iters, sampleN)
    graft.sources.FileIO.stageRangeBatches(
      narrow, col("vec_id"), nBatches, new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
    val codes = Similarity.pqEncodeWith(
      stream, col("vec_id"), col("embedding"), codebook, m, subDim)
    val q = graft.sources.FileIO.streamingParquetSink(
      codes, outDir.toString, new java.io.File(base, "ckpt").toString).start()
    q.awaitTermination()
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    graft.sources.FileIO.deleteScratchOnExit(base)
    spark.read.parquet(outDir.toString)
  }
}
