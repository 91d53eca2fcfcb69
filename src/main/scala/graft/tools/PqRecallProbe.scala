package graft.tools

import graft.operators.Similarity
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** PQ recall sweep — ADC and rerank recall@5 vs the exact scan across
  * (sampleN, iters, m, subDim) configs, so the gate's sample-trained
  * spelling is measured, not guessed:
  * `sbt "runMain graft.tools.PqRecallProbe /root/testdata/sf0.001"`.
  */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", graft.LocalDir.scratch)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = Tables.load(spark, dir, "embeddings")
    val nq = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val q = e.filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val brute = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet

    def run(sampleN: Int, iters: Int, m: Int, subDim: Int): Unit = {
      val (cb, enc) = Similarity.pqTrainSampleEncode(
        e, col("vec_id"), col("embedding"), m, subDim, iters, sampleN)
      val adc = Similarity.pqTopK(q, enc, cb, 5, m, subDim)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      val rer = Similarity.pqTopKRerank(q, enc, cb, c, 5, 50, m, subDim)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      val ra = (brute & adc).size.toDouble / brute.size
      val rr = (brute & rer).size.toDouble / brute.size
      println(f"[pq-probe] sampleN=$sampleN%4d iters=$iters m=$m subDim=$subDim adc=$ra%.3f rerank=$rr%.3f")
    }
    for {
      sampleN <- Seq(384)
      iters <- Seq(2)
    } run(sampleN, iters, 8, 8)

    run(384, 2, 16, 4)

    // the residual rung: same codes, coarse term restored exactly
    def runIvfPq(cells: Int, coarseIters: Int, iters: Int, m: Int, subDim: Int): Unit = {
      val (coarse, pqCb, enc) = Similarity.ivfPqTrainSampleEncode(
        e, col("vec_id"), col("embedding"), cells, coarseIters,
        m = m, subDim = subDim, iters = iters,
        sampleN = math.max(384, Similarity.recommendedPqSample(subDim)))
      val adc = Similarity.ivfPqTopK(q, enc, coarse, pqCb, 5, m, subDim)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      val ra = (brute & adc).size.toDouble / brute.size
      println(f"[pq-probe] IVFPQ cells=$cells%3d coarseIters=$coarseIters iters=$iters m=$m subDim=$subDim adc=$ra%.3f")
    }
    val cells = Similarity.recommendedCells(e.count())
    for (ci <- Seq(2); c <- Seq(cells, 64)) runIvfPq(c, ci, 2, 8, 8)

    // multi-stage residual PQ: 8 bytes per stage
    def runRq(stages: Int): Unit = {
      val (cbs, enc) = Similarity.pqResidualTrainSampleEncode(
        e, col("vec_id"), col("embedding"), m = 8, subDim = 8,
        iters = 2, sampleN = 384, stages = stages)
      val adc = Similarity.pqResidualTopK(q, enc, cbs, 5, 8, 8)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      val ra = (brute & adc).size.toDouble / brute.size
      println(f"[pq-probe] RQ stages=$stages adc=$ra%.3f")
    }
    Seq(2, 3).foreach(runRq)
    spark.stop()
  }
}
