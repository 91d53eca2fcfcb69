package graft.tools

import graft.operators.Similarity
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** IVF recall sweep — measures recall@5 vs the exact scan across
  * (cells, iters, nprobe, cassign) configs on a testdata embeddings
  * table, so gate/config choices are measured, not guessed:
  * `sbt "runMain graft.tools.IvfRecallProbe /root/testdata/sf0.001"`.
  */
object IvfRecallProbe {
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
    val e = Tables.load(spark, dir, "embeddings")
    val n = e.count()
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    import spark.implicits._
    val brute = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    println(s"[ivf-probe] n=$n recommendedCells=${Similarity.recommendedCells(n)}")

    def run(cells: Int, iters: Int, nprobe: Int, cassign: Int): Unit = {
      val seed =
        if (cells == 10) col("label")
        else pmod(col("vec_id"), lit(cells)).cast("int")
      val cb = Similarity.kmeansCodebook(e, seed, col("embedding"), iters)
      val nCells = cb.select("cell").distinct().count().toInt
      val np = math.min(nprobe, nCells)
      val ca = math.min(cassign, nCells)
      val got = Similarity.ivfTopK(q, c, cb, 5, np, ca)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      val recall = (brute & got).size.toDouble / brute.size
      println(f"[ivf-probe] cells=$cells%3d (live $nCells%3d) iters=$iters np=$np ca=$ca recall=$recall%.3f")
    }
    for {
      cells <- Seq(10, Similarity.recommendedCells(n))
      iters <- Seq(2, 3)
      (np, ca) <- Seq(
        (2, 2), (3, 3),
        (Similarity.recommendedNprobe(cells), 2),
        (Similarity.recommendedNprobe(cells), 3),
        (Similarity.recommendedNprobe(cells, 0.25), 2),
        (Similarity.recommendedNprobe(cells, 0.25), 3))
    } run(cells, iters, np, ca)
    spark.stop()
  }
}
