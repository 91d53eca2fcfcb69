package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing probe: runs registered queries N times on
  * one SF dir and prints cold/warm seconds — separates one-time costs
  * (session, codegen, file listing) from steady-state per-row work,
  * which is what matters for the 100 TB extrapolation. Set
  * SPARK_GRAFT_EXPLAIN=1 to also print each query's formatted plan.
  *
  * `sbt "runMain graft.tools.QueryProbe <query>[,<query>...] [sfDir] [reps]"`
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_EXTENSIONS=1 mirrors the bench session exactly
    // (GraftExtensions injected); default stays the bare session so
    // historical probe numbers remain comparable
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", graft.LocalDir.scratch)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (sys.env.contains("SPARK_GRAFT_EXTENSIONS"))
      b0.withExtensions(new graft.functions.GraftExtensions) else b0)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.tables.Tables.All.foreach(t => graft.tables.Tables.load(spark, dir, t).count())
    names.foreach { name =>
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        println(f"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
