package graft.streaming

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingRollupSpec extends SparkSpec {
  import spark.implicits._

  private def batchRollup(events: org.apache.spark.sql.DataFrame) =
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(col("day").cast("string"), col("event_type"), col("n"), col("cents"))
      .as[(String, String, Long, Long)].collect().toSet

  test("incrementally-maintained rollup equals the batch GROUP BY under any split") {
    val events = Tables.load(spark, Sf0001, "events")
    val batch = batchRollup(events)
    assert(batch.nonEmpty)
    for (nBatches <- Seq(1, 5)) {
      val scratch = Files.createTempDirectory(s"graft-rollup-$nBatches").toString
      val got = StreamingRollup.rollupFromFiles(
        spark, events.select(col("ts"), col("event_type"), col("value")),
        nBuckets = 4, nBatches = nBatches, scratch, statePartitions = 4)
        .select(col("day").cast("string"), col("event_type"),
          col("n_events"), col("sum_cents"))
        .as[(String, String, Long, Long)].collect().toSet
      assert(got == batch, s"split into $nBatches batches diverged")
    }
  }

  test("REAL crash-replay: lost commit marker replays the batch through the engine; guard refuses it") {
    val events = Tables.load(spark, Sf0001, "events")
    val batch = batchRollup(events)
    val scratch = Files.createTempDirectory("graft-rollup-crash").toString
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val storeDir = new java.io.File(base, "store").toString
    val ckpt = new java.io.File(base, "ckpt").toString
    val narrow = events.select(
      col("ts"), col("event_type").as("etype"),
      round(col("value") * 100).cast("long").as("cents"))
    graft.sources.FileIO.stageRangeBatches(
      narrow, col("ts"), 4, new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, 2)
    val rewrites = scala.collection.mutable.ArrayBuffer.empty[Int]
    def run(): Unit = {
      val q = graft.sources.FileIO
        .streamParquet(ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          rewrites += StreamingRollup.mergeAdditive(
            ss, df.select(to_date(col("ts")).as("day"), col("etype"), col("cents")),
            storeDir, nBuckets = 4, id)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run() // batches 0..3 merged and committed
    def store() = spark.read.parquet(storeDir)
      .select(col("day").cast("string"), col("etype"), col("cnt"), col("cents"))
      .as[(String, String, Long, Long)].collect().toSet
    val after1 = store()
    // crash window: the merge landed but the batch's commit marker was
    // lost -> the engine MUST replay the last batch under the same id
    val last = new java.io.File(s"$ckpt/commits").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).map(_.toLong).max
    val marker = new java.io.File(s"$ckpt/commits/$last")
    assert(marker.delete(), s"missing $marker")
    val crc = new java.io.File(marker.getParentFile, s".${marker.getName}.crc")
    if (crc.exists()) crc.delete()
    val before = rewrites.size
    run() // restart: replays batch `last`
    assert(rewrites.size > before, "engine did not replay the batch")
    assert(rewrites.drop(before).forall(_ == 0),
      s"replayed batch rewrote buckets: ${rewrites.drop(before)}")
    assert(store() == after1 && after1 == batch
      .map(r => (r._1, r._2, r._3, r._4)),
      "crash replay changed the store")
    graft.sources.FileIO.deleteScratch(base)
  }

  test("replay guard: full and TORN same-batch replays converge to exactly-once content") {
    val scratch = Files.createTempDirectory("graft-rollup-replay").toString
    val store = s"$scratch/store"
    def frame(rows: Seq[(String, String, Long)]) =
      rows.toDF("d", "etype", "cents")
        .select(col("d").cast("date").as("day"), col("etype"), col("cents"))
    // the torn-write simulation drops PART of the batch, which is only
    // a valid tear if the kept and dropped rows live in DIFFERENT
    // buckets (dynamic overwrite commits whole buckets) — pick two
    // days verified to hash apart under the operator's own bucketing
    val candidates = (1 to 20).map(i => f"2024-01-$i%02d")
    val buckets = candidates.toDF("d")
      .select(col("d"),
        pmod(xxhash64(col("d").cast("date")), lit(8L)).cast("int").as("b"))
      .as[(String, Int)].collect().toMap
    val dayA = candidates.head
    val dayB = candidates.find(d => buckets(d) != buckets(dayA)).get
    val seed = Seq((dayA, "a", 10L), (dayB, "a", 20L))
    assert(StreamingRollup.mergeAdditive(
      spark, frame(seed), store, nBuckets = 8, batchId = 0L) > 0)
    val batch1 = Seq((dayA, "a", 1L), (dayB, "a", 2L))
    // TORN apply: batch 1 reaches only day 1's bucket (simulates a
    // crash mid dynamic-overwrite commit)...
    StreamingRollup.mergeAdditive(
      spark, frame(batch1.take(1)), store, nBuckets = 8, batchId = 1L)
    // ...then the recovered query REPLAYS the full batch 1 under the
    // same id: day-1's bucket must refuse it, day-2's must absorb it
    StreamingRollup.mergeAdditive(
      spark, frame(batch1), store, nBuckets = 8, batchId = 1L)
    // and a further full replay is a no-op
    val rewrote = StreamingRollup.mergeAdditive(
      spark, frame(batch1), store, nBuckets = 8, batchId = 1L)
    assert(rewrote == 0, s"full replay rewrote $rewrote buckets")
    val got = spark.read.parquet(store)
      .select(col("day").cast("string"), col("etype"), col("cnt"), col("cents"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      (dayA, "a", 2L, 11L),
      (dayB, "a", 2L, 22L)), s"replays double-counted: $got")
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
  }
}
