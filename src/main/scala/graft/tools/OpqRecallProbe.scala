package graft.tools

import graft.operators.Similarity
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** OPQ recall ladder — ADC recall@5 vs the exact scan for plain PQ,
  * permutation-OPQ (variance-balanced allocation), whiten+PQ, and the
  * full alternating-Procrustes dense OPQ, all at equal bytes (m=8,
  * subDim=8 → 8 bytes/vector):
  * `sbt "runMain graft.tools.OpqRecallProbe /root/testdata/sf0.001 50"`.
  */
object OpqRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nq = args.drop(1).headOption.map(_.toInt).getOrElse(50)
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
    // `fixture` arg: the planted-correlation fixture (8 high-variance
    // noise dims + 56 low-variance shared-signal dims, twins at
    // i/i+200) — the anisotropic case OPQ exists for; the parquet
    // embeddings are near-isotropic (eig spread ~4x), where no
    // rotation can beat plain PQ and parity is the expected result
    val e =
      if (dir == "fixture") {
        val rnd = new scala.util.Random(7)
        def noise() = Array.fill(8)((rnd.nextFloat() - 0.5f) * 6.0f)
        val signals = (0 until 200).map(_ =>
          Array.fill(56)((rnd.nextFloat() - 0.5f) * 0.6f))
        val rows =
          (0 until 200).map(i => (i.toLong, noise() ++ signals(i))) ++
            (0 until 200).map(i => ((i + 200).toLong,
              noise() ++ signals(i).map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f)))
        rows.toDF("vec_id", "embedding")
      } else Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val brute = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet

    def adcRecall(frame: DataFrame, label: String): Unit = {
      val (cb, enc) = Similarity.pqTrainSampleEncode(
        frame, col("vec_id"), col("embedding"), m = 8, subDim = 8,
        iters = 2, sampleN = 384)
      val qr = frame.filter(col("vec_id") < nq)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val adc = Similarity.pqTopK(qr, enc, cb, 5, 8, 8)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      val r = (brute & adc).size.toDouble / brute.size
      println(f"[opq-probe] $label%-12s adc=$r%.3f")
    }

    def asVecs(milli: DataFrame): DataFrame =
      milli.select(col("id").as("vec_id"),
        Similarity.milliToVec(col("wvec")).as("embedding"))

    adcRecall(e, "plain")

    val scales = Similarity.whitenScales(
      Similarity.embGram(e, col("embedding")))
    val perm = Similarity.opqPermutation(scales, 8, 8)
    adcRecall(asVecs(Similarity.applyPermutation(
      e, col("vec_id"), col("embedding"), perm)), "perm")

    val whitened = asVecs(
      Similarity.whiten(e, col("vec_id"), col("embedding"), scales))
    adcRecall(whitened, "whiten")

    val wScales = Similarity.whitenScales(
      Similarity.embGram(whitened, col("embedding")))
    val wPerm = Similarity.opqPermutation(wScales, 8, 8)
    adcRecall(asVecs(Similarity.applyPermutation(
      whitened, col("vec_id"), col("embedding"), wPerm)), "whiten+perm")

    def dense(frame: DataFrame, iters: Int, label: String): Unit = {
      val sample = Similarity.pqSample(
        frame, col("vec_id"), col("embedding"), 384, "opq")
        .select(Similarity.quantize(col("__svec")))
        .collect().map(_.getSeq[Long](0).toArray)
      val r = Similarity.opqTrainRotationMilli(sample, 8, 8, iters)
      adcRecall(asVecs(Similarity.applyDenseMilli(
        frame, col("vec_id"), col("embedding"), r)), label)
    }
    dense(e, 0, "dense-0")
    dense(e, 1, "dense-1")
    dense(e, 4, "dense-4")
    dense(e, 8, "dense-8")
    dense(whitened, 4, "wh+dense-4")

    // dense alternation COMPOSED ON the permutation rung: rotate by
    // the perm first, then let the Procrustes alternation refine
    val permuted = asVecs(Similarity.applyPermutation(
      e, col("vec_id"), col("embedding"), perm))
    dense(permuted, 0, "perm+dense-0")
    dense(permuted, 2, "perm+dense-2")
    dense(permuted, 4, "perm+dense-4")

    spark.stop()
  }
}
