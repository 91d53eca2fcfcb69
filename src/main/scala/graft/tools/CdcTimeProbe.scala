package graft.tools

import org.apache.spark.sql.functions._

/** Phase-timing probe for the CDC gate query (stage / init / per-batch
  * apply / read-back). Pair with GRAFT_CDC_TIMING=1 for the inner
  * applyDocEvents phase breakdown. arg0 = sf dir (default sf0.01).
  */
object CdcTimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("cdc-time")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.LocalDir.scratch)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val old = graft.tables.Tables.load(spark, dir, "documents")
    old.count() // warm
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[cdctime] $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val scratch = graft.LocalDir.runDir("cdc-time")
    val relabeled = old.withColumn("lang",
      when(col("doc_id") % 11 === 0, lit("xx")).otherwise(col("lang")))
    def ev(df: org.apache.spark.sql.DataFrame, del: Boolean) =
      df.select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars").cast("long").as("n_chars"), lit(del).as("is_delete"))
    val events = ev(old.filter(col("doc_id") % 7 === 0), del = true)
      .unionByName(ev(relabeled.filter(col("doc_id") % 7 =!= 0
          && (col("doc_id") % 10 === 0 || col("doc_id") % 11 === 0))
        .withColumn("text",
          when(col("doc_id") % 10 === 0, concat(col("text"), lit(" edited")))
            .otherwise(col("text"))), del = false))
      .unionByName(ev(relabeled.filter(col("doc_id") % 13 === 0)
        .withColumn("doc_id", col("doc_id") + 10000000L), del = false))
      .withColumn("ev_seq", col("doc_id"))
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val corpusDir = new java.io.File(base, "corpus").toString
    val indexDir = new java.io.File(base, "index").toString
    val keepsDir = new java.io.File(base, "keeps").toString
    val clsDir = new java.io.File(base, "cls").toString
    val packedDir = new java.io.File(base, "packed").toString
    t("stage") { graft.sources.FileIO.stageRangeBatches(
      events, col("ev_seq"), 3, new java.io.File(base, "stage"), inDir) }
    t("init-corpus") { graft.operators.IncrementalCdc.writeCorpusStore(old, 16, corpusDir) }
    t("init-dedup") { graft.operators.IncrementalCdc.writeDedupStores(old, 16, 16, indexDir, keepsDir) }
    t("init-packed") { graft.sources.ManifestStore.init(
      graft.operators.Incremental.pipelineSharded(old, 16, 256L), "grp", packedDir) }
    val ss = graft.streaming.StreamSessions.scoped(spark, 4)
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, events.schema, maxFilesPerTrigger = 1)
    var i = 0
    val q = stream.writeStream
      .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        t(s"batch-$id") { graft.operators.IncrementalCdc.applyDocEvents(
          ss, batch, corpusDir, indexDir, keepsDir, clsDir, packedDir,
          id, 16, 256L, 16) }
        ()
      }.start()
    t("stream-total") { q.awaitTermination() }
    t("read-back") { graft.operators.IncrementalCdc.readPacked(spark, packedDir).count() }
    spark.stop()
  }
}
