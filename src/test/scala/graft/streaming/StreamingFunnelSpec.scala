package graft.streaming

import graft.SparkSpec
import graft.operators.Funnel
import graft.tables.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val Steps = Seq("view", "click", "purchase")
  private val HorizonUs = 12L * 3600L * 1000000L

  test("streamed funnel report equals the batch kernel under any batch split") {
    val events = Tables.load(spark, Sf0001, "events")
    val batch = Funnel.funnelCounts(
      events, col("user_id"), col("ts"), col("event_type"), Steps, HorizonUs)
      .as[(Long, String, Long)].collect().toSet
    assert(batch.nonEmpty)
    for (nBatches <- Seq(1, 4)) {
      val scratch = Files.createTempDirectory(s"graft-sfun-$nBatches").toString
      val streamed = StreamingFunnel.funnelCountsFromFiles(
        spark,
        events.select(col("user_id"), col("ts"),
          col("event_id").as("tb"), col("event_type")),
        Steps, HorizonUs, nBatches = nBatches, scratch, statePartitions = 4)
        .as[(Long, String, Long)].collect().toSet
      assert(streamed == batch, s"split into $nBatches batches diverged")
      graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    }
  }

  test("depth advances across batches through carried slots, updates emit only on increase") {
    // one user whose chain spans all four batches: view in batch 1,
    // click in batch 2 (within horizon), noise in batch 3 (no emit),
    // purchase in batch 4 — the sink must hold exactly depths 1, 2, 3
    val base = 1704067200L * 1000000L
    val h = 3600L * 1000000L
    val rows = Seq(
      (1L, base, 1L, "view"),
      (1L, base + h / 4, 2L, "click"),
      (1L, base + h / 2, 3L, "view"), // no depth change -> no emission
      (1L, base + 3 * h / 4, 4L, "purchase"))
    val df = rows.toDF("user_id", "tsu", "tb", "event_type")
      .select(col("user_id"), timestamp_micros(col("tsu")).as("ts"),
        col("tb"), col("event_type"))
    val scratch = Files.createTempDirectory("graft-sfun-carry").toString
    val report = StreamingFunnel.funnelCountsFromFiles(
      spark, df, Steps, h, nBatches = 4, scratch, statePartitions = 2)
      .as[(Long, String, Long)].collect().toSet
    assert(report == Set((1L, "view", 1L), (2L, "click", 1L), (3L, "purchase", 1L)))
    // the RAW sink shows the emission discipline: exactly one row per
    // depth increase — the no-change batch emitted nothing
    val raw = spark.read.parquet(s"$scratch/out")
      .as[(Long, Long)].collect().toSeq
    assert(raw.sorted == Seq((1L, 1L), (1L, 2L), (1L, 3L)))
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
  }

  test("ttl evicts idle users (bounded store under user churn); " +
    "returning user restarts from fresh slots") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import scala.concurrent.duration._
    implicit val sqlCtx = spark.sqlContext
    // ProcessingTimeTimeout timers also fire during DATA batches, so
    // the test disables no-data batches and drives eviction with
    // batch 2 (the StateOperatorSpec ttl pattern)
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val ckpt = Files.createTempDirectory(
      java.nio.file.Paths.get(graft.LocalDir.scratch), "funttl-ckpt").toString
    val input = MemoryStream[StreamingFunnel.FunEvent]
    val q = StreamingFunnel.depthUpdates(
      input.toDS(), k = 3, horizonUs = HorizonUs, ttl = Some(300.millis))
      .writeStream.format("memory").queryName("funttl")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      val base = 1704067200L * 1000000L
      // batch 1: 200 users, view then click -> depth 2, 200 state rows
      input.addData((0 until 200).flatMap(u => Seq(
        StreamingFunnel.FunEvent(u.toLong, base, 1L, 0L),
        StreamingFunnel.FunEvent(u.toLong, base + 1000L, 2L, 1L))))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 200L)
      Thread.sleep(1500) // let every user's processing-time ttl expire
      // batch 2: 10 fresh users + returning user 7. Data arrival beats
      // the timer for u7; the other 199 idle users evict.
      input.addData((1000 until 1010).map(u =>
        StreamingFunnel.FunEvent(u.toLong, base + 5000L, 3L, 0L)) :+
        StreamingFunnel.FunEvent(7L, base + 5000L, 4L, 2L))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 11L,
        "expected only batch-2 keys after ttl eviction")
      // u7 survived (data beat the timer): purchase completes depth 3
      val u7 = spark.table("funttl").as[StreamingFunnel.FunDepth]
        .collect().filter(_.user_id == 7L).map(_.depth).sorted
      assert(u7.toSeq == Seq(2L, 3L))
      // batch 3: user 3 WAS evicted — returns with a view and re-emits
      // depth 1 (fresh slots); the report's max(depth) keeps its
      // earlier depth-2 emission, so the final report stays correct
      input.addData(Seq(StreamingFunnel.FunEvent(3L, base + 9000L, 5L, 0L)))
      q.processAllAvailable()
      val u3 = spark.table("funttl").as[StreamingFunnel.FunDepth]
        .collect().filter(_.user_id == 3L).map(_.depth).sorted
      assert(u3.toSeq == Seq(1L, 2L), s"got ${u3.toSeq}")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      graft.sources.FileIO.deleteScratch(new java.io.File(ckpt))
    }
  }
}
