package graft.streaming

import graft.operators.{CorpusStats, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus statistics over a live document ingest — the
  * streaming side of [[CorpusStats]]: n-gram counts maintained as a
  * NATIVE Structured Streaming stateful aggregation (groupBy + count
  * over the state store — no custom state code; Spark's own
  * incremental aggregation IS the right operator here), with the
  * corpus-wide heavy-hitter ranking computed from the maintained
  * counts. This is live boilerplate discovery: the navigation chrome
  * flooding a crawl surfaces in the top-k while the ingest is still
  * running, instead of after a batch recount.
  *
  * Equivalence contract (oracle-gated): after the stream drains, the
  * maintained counts are EXACTLY the batch counts — counting is
  * associative and the state store is exactly-once per micro-batch —
  * so the final top-k shares [[CorpusStats.heavyNgrams]]'s DuckDB
  * oracle verbatim, whatever the micro-batch partitioning.
  *
  * Scale notes: state is one row per distinct n-gram (the vocabulary)
  * sharded by the aggregation key across executors; map-side partial
  * aggregation inside each micro-batch collapses the Zipf head before
  * it touches the store. The complete-mode snapshot written per batch
  * is for the bounded top-k consumer; a production deployment with an
  * unbounded vocabulary reads the state store directly or windows the
  * counts.
  */
object StreamingStats {

  /** Incremental n-gram counts of a streaming document frame. */
  def ngramCounts(docs: DataFrame, text: Column, n: Int): DataFrame =
    docs
      .select(explode(
        CorpusStats.ngramStrings(TextAnalysis.tokens(text), n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"))

  /** File-fed end-to-end run (the gate-query spelling): documents are
    * staged as ordered micro-batch files, streamed through the
    * stateful count, each micro-batch's complete snapshot overwrites
    * the output (idempotent — a replayed batch rewrites the same
    * state), and the FINAL snapshot is ranked exactly like the batch
    * operator. The driver moves file metadata only.
    */
  def heavyNgramsFromFiles(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      k: Int,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 8): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    graft.sources.FileIO.stageRangeBatches(
      docs.select(col(idCol), col(textCol)), col(idCol), nBatches,
      new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, docs.select(col(idCol), col(textCol)).schema,
      maxFilesPerTrigger = 1)
    val counts = ngramCounts(stream, col(textCol), n)
    val q = counts.writeStream
      .outputMode("complete")
      .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outDir.toString)
      }
      .start()
    q.awaitTermination()
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    CorpusStats.topKByCount(spark.read.parquet(outDir.toString), k)
  }

  /** STREAMING count-min sketch — the frequency sketch maintained
    * live, with state BOUNDED BY CONSTRUCTION: the stateful
    * aggregation's key space is (depth × width) buckets, never the
    * vocabulary, so unlike [[ngramCounts]] (state = one row per
    * distinct n-gram) this runs forever over an unbounded token stream
    * at fixed store size. Counting is associative and the store is
    * exactly-once per micro-batch, so the drained sketch equals the
    * batch [[CorpusStats.countMinSketch]] EXACTLY whatever the
    * micro-batch partitioning — the gate probes it with the batch
    * top-k and shares `cm_heavy_est`'s oracle verbatim.
    */
  def cmSketchFromFiles(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      depth: Int,
      width: Int,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 8): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    graft.sources.FileIO.stageRangeBatches(
      docs.select(col(idCol), col(textCol)), col(idCol), nBatches,
      new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, docs.select(col(idCol), col(textCol)).schema,
      maxFilesPerTrigger = 1)
    val grams = stream.select(explode(
      CorpusStats.ngramStrings(TextAnalysis.tokens(col(textCol)), n)).as("ngram"))
    val sketch = CorpusStats.countMinSketch(grams, col("ngram"), depth, width)
    val q = sketch.writeStream
      .outputMode("complete")
      .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outDir.toString)
      }
      .start()
    q.awaitTermination()
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    spark.read.parquet(outDir.toString)
  }

  /** One salt group's current k-minimum set, versioned per update so
    * the sink's LAST emission per salt is recoverable.
    */
  final case class KmvSnap(salt: Int, ver: Long, hashes: Seq[Long])

  /** STREAMING KMV cardinality — bounded-state online distinct
    * counting: hashes shard by `salt = h mod salts`, each salt group's
    * keyed state holds only its k smallest DISTINCT hashes seen so far
    * (state = salts·k longs total, fixed forever), and the global
    * answer is the k smallest of the groups' union — EXACT, because
    * min-k distributes over any partition of the input. The drained
    * estimate therefore equals the batch [[CorpusStats.distinctKmv]]
    * bit-for-bit under any micro-batch split, and the gate shares
    * `distinct_kmv`'s oracle verbatim. This is the online shape the
    * unbounded-vocabulary case needs: the exact distinct count would
    * keep one state row per distinct value; the sketch never grows.
    */
  def kmvFromFiles(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      idCol: String,
      k: Int,
      salts: Int,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 8): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    graft.sources.FileIO.stageRangeBatches(
      docs.select(col(idCol), col(textCol)), col(idCol), nBatches,
      new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    import ss.implicits._
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, docs.select(col(idCol), col(textCol)).schema,
      maxFilesPerTrigger = 1)
    val hashes = stream
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .select(TextAnalysis.portableHash56(col("tok")).as("h"))
      .filter(col("h").isNotNull)
      .select(col("h"), pmod(col("h"), lit(salts.toLong)).cast("int").as("salt"))
      .as[(Long, Int)]
    val snaps = hashes.groupByKey(_._2).flatMapGroupsWithState(
      org.apache.spark.sql.streaming.OutputMode.Append(),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
      (salt: Int, it: Iterator[(Long, Int)],
       state: org.apache.spark.sql.streaming.GroupState[KmvSnap]) =>
        val prior = state.getOption.getOrElse(KmvSnap(salt, 0L, Seq.empty))
        val merged = (prior.hashes.iterator ++ it.map(_._1))
          .toSeq.distinct.sorted.take(k)
        val next = KmvSnap(salt, prior.ver + 1, merged)
        state.update(next)
        Iterator(next)
    }
    val q = snaps.toDF().writeStream
      .format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    // last emission per salt -> union of k-sets -> global k smallest
    val last = spark.read.parquet(outDir.toString)
      .groupBy(col("salt"))
      .agg(max_by(col("hashes"), col("ver")).as("hashes"))
    val smallest = last
      .select(explode(col("hashes")).as("h"))
      .orderBy(col("h"))
      .limit(k)
    CorpusStats.kmvFinish(smallest, k)
  }
}
