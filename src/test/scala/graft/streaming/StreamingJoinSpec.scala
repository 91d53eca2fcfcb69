package graft.streaming

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private val HorizonUs = 12L * 3600L * 1000000L

  private def batchReport(
      events: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] = {
    val e = events.select(
      col("user_id"), unix_micros(col("ts")).as("tsm"),
      col("event_id").as("tb"), col("event_type"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("tsm").as("vtsm"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("tsm").as("ptsm"),
        col("tb").as("ptb"))
    p.join(v,
        col("p_uid") === col("v_uid") && col("vtsm") < col("ptsm") &&
          col("ptsm") <= col("vtsm") + HorizonUs)
      .groupBy(col("p_uid"), col("ptb"), col("ptsm"))
      .agg(max(col("vtsm")).as("view_tsm"))
      .select(col("p_uid"), col("ptb"), col("view_tsm"),
        (col("ptsm") - col("view_tsm")).as("lat_us"))
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("streamed attribution equals the batch join under any batch split") {
    val events = Tables.load(spark, Sf0001, "events")
    val batch = batchReport(events)
    assert(batch.nonEmpty)
    for (nBatches <- Seq(1, 4)) {
      val scratch = Files.createTempDirectory(s"graft-sjoin-$nBatches").toString
      val streamed = StreamingJoin.attributionFromFiles(
        spark,
        events.select(col("user_id"), col("ts"),
          col("event_id").as("tb"), col("event_type")),
        "view", "purchase", HorizonUs, nBatches = nBatches, scratch,
        statePartitions = 4)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"split into $nBatches batches diverged")
      graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    }
  }

  test("horizon boundary and strictly-before rule; argmax keeps the last view") {
    val base = 1704067200L * 1000000L
    val h = 3600L * 1000000L
    // user 1: views at base and base+h/2; purchases at base (same
    // instant as a view -> unattributed), base+h (exactly horizon from
    // the FIRST view, h/2 from the second -> attributed to the second),
    // base+h/2+h+1 (1us past horizon of the last view -> unattributed)
    val rows = Seq(
      (1L, base, 10L, "view"),
      (1L, base + h / 2, 11L, "view"),
      (1L, base, 20L, "purchase"),
      (1L, base + h, 21L, "purchase"),
      (1L, base + h / 2 + h + 1L, 22L, "purchase"))
    val df = rows.toDF("user_id", "tsu", "tb", "event_type")
      .select(col("user_id"), timestamp_micros(col("tsu")).as("ts"),
        col("tb"), col("event_type"))
    val scratch = Files.createTempDirectory("graft-sjoin-edge").toString
    val report = StreamingJoin.attributionFromFiles(
      spark, df, "view", "purchase", h, nBatches = 2, scratch,
      statePartitions = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(report == Set((1L, 21L, base + h / 2, h / 2)))
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
  }

  test("watermark evicts join state: final state rows << staged rows") {
    // 400 rows spread over 100 horizons: by the last micro-batch the
    // watermark has buried almost every earlier view and purchase, so
    // the join's retained state must be a small fraction of the input
    val base = 1704067200L * 1000000L
    val h = 3600L * 1000000L
    val rows = (0 until 200).flatMap { i =>
      val t = base + i * h / 2 // two events per horizon-half step
      Seq((i.toLong % 7L, t, i * 2L, "view"),
        (i.toLong % 7L, t + h / 4, i * 2L + 1L, "purchase"))
    }
    val df = rows.toDF("user_id", "tsu", "tb", "event_type")
      .select(col("user_id"), timestamp_micros(col("tsu")).as("ts"),
        col("tb"), col("event_type"))
    val scratch = Files.createTempDirectory("graft-sjoin-evict").toString
    val report = StreamingJoin.attributionFromFiles(
      spark, df, "view", "purchase", h, nBatches = 8, scratch,
      statePartitions = 2)
    assert(report.count() == 200L) // every purchase has a view h/4 before
    val kept = StreamingJoin.lastStateRows
    assert(kept >= 0L, "no progress recorded")
    assert(kept < 100L, s"state not evicted: $kept rows retained of 400 staged")
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
  }

  test("left-outer attribution: unmatched purchases emit nulls at watermark eviction, matched equal inner") {
    val base = 1704067200L * 1000000L
    val h = 3600L * 1000000L
    // user 1: view then purchase within horizon -> attributed;
    // user 2: purchase with NO view -> must still emit, null view;
    // user 3: view AFTER its purchase -> unattributed (strictly-before)
    val rows = Seq(
      (1L, base, 10L, "view"), (1L, base + h / 2, 11L, "purchase"),
      (2L, base + h, 20L, "purchase"),
      (3L, base + 2 * h, 31L, "purchase"), (3L, base + 3 * h, 30L, "view"))
    val df = rows.toDF("user_id", "tsu", "tb", "event_type")
      .select(col("user_id"), timestamp_micros(col("tsu")).as("ts"),
        col("tb"), col("event_type"))
    val scratch = Files.createTempDirectory("graft-souter").toString
    val got = StreamingJoin.attributionOuterFromFiles(
      spark, df, "view", "purchase", 12L * h, nBatches = 2, scratch,
      statePartitions = 2)
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 11L, Some(base), Some(h / 2)),
      (2L, 20L, None, None),
      (3L, 31L, None, None)), s"got $got")
  }

  test("left-outer attribution equals the batch left join on real data") {
    val events = Tables.load(spark, Sf0001, "events")
    val e = events.select(
      col("user_id"), unix_micros(col("ts")).as("tsm"),
      col("event_id").as("tb"), col("event_type"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("tsm").as("vtsm"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("tsm").as("ptsm"),
        col("tb").as("ptb"))
    val batch = p.join(v,
        col("p_uid") === col("v_uid") && col("vtsm") < col("ptsm") &&
          col("ptsm") <= col("vtsm") + HorizonUs, "left_outer")
      .groupBy(col("p_uid"), col("ptb"), col("ptsm"))
      .agg(max(col("vtsm")).as("view_tsm"))
      .select(col("p_uid"), col("ptb"), col("view_tsm"),
        (col("ptsm") - col("view_tsm")).as("lat_us"))
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    val scratch = Files.createTempDirectory("graft-souter-real").toString
    val streamed = StreamingJoin.attributionOuterFromFiles(
      spark,
      events.select(col("user_id"), col("ts"),
        col("event_id").as("tb"), col("event_type")),
      "view", "purchase", HorizonUs, nBatches = 4, scratch,
      statePartitions = 2)
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(streamed == batch, "outer join diverged from batch")
    assert(streamed.exists(_._3.isEmpty), "fixture has no unattributed purchase — weak test")
  }

  test("stream-static enrichment equals the batch join under any batch split") {
    val events = Tables.load(spark, Sf0001, "events")
    val customer = Tables.load(spark, Sf0001, "customer")
    val batch = events
      .join(customer, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .as[(String, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    for (nBatches <- Seq(1, 4)) {
      val scratch = Files.createTempDirectory(s"graft-senrich-$nBatches").toString
      val streamed = StreamingJoin.enrichBySegmentFromFiles(
        spark, events.select(col("user_id"), col("ts"), col("value")),
        customer, nBatches = nBatches, scratch, statePartitions = 2)
        .as[(String, Long, Long)].collect().toSet
      assert(streamed == batch, s"split into $nBatches batches diverged")
    }
  }

  test("enrichment join plans as a broadcast hash join, stream side unshuffled") {
    val events = Tables.load(spark, Sf0001, "events")
      .select(col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
    val dim = Tables.load(spark, Sf0001, "customer").select(
      col("c_custkey").cast("long").as("k"), col("c_mktsegment").as("segment"))
    val plan = StreamingJoin.enriched(events, dim)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "stream side got shuffled")
  }
}
