package graft.tools

import graft.operators.Similarity
import graft.serving.{AnnClient, AnnServer}
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Sustained wire throughput of the live ANN endpoint (cached mode):
  * N client threads stream top-k requests for `seconds`;
  * `sbt "runMain graft.tools.AnnRateProbe /root/testdata/sf0.001 4 5"`.
  */
object AnnRateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nClients = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val seconds = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", graft.LocalDir.scratch)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = Tables.load(spark, dir, "embeddings")
    val (cb, enc) = Similarity.pqTrainSampleEncode(
      e, col("vec_id"), col("embedding"), m = 8, subDim = 8,
      iters = 2, sampleN = 384)
    val srv = new AnnServer(enc.localCheckpoint(true), cb, 8, 8)
    try {
      require(srv.isCached, "probe measures the cached fast path")
      val queries = e.filter(col("vec_id") < 64)
        .select(col("embedding")).as[Seq[Float]].collect()
      val stopAt = System.nanoTime() + seconds * 1_000_000_000L
      val counts = new java.util.concurrent.atomic.AtomicLong(0L)
      val threads = (0 until nClients).map { t =>
        new Thread(() => {
          val c = new AnnClient("localhost", srv.boundPort)
          try {
            var i = t
            while (System.nanoTime() < stopAt) {
              val r = c.topk(queries(i % queries.length), 5)
              require(r.length == 5)
              counts.incrementAndGet()
              i += 1
            }
          } finally c.close()
        }, s"ann-probe-$t")
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      val total = counts.get()
      println(f"[ann-probe] clients=$nClients seconds=$seconds topk5_requests=$total rate=${total.toDouble / seconds}%.0f q/s")
    } finally srv.close()
    spark.stop()
  }
}
