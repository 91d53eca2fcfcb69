package graft.streaming

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def lastPerUser(events: org.apache.spark.sql.DataFrame) =
    events
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"),
        col("event_id"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("tsm"), col("event_id"), col("cents")),
        struct(col("tsm"), col("event_id"))).as("r"))
      .select(col("user_id"), col("r.tsm"), col("r.event_id"), col("r.cents"))
      .as[(Long, Long, Long, Long)].collect().toSet

  test("upserted store equals last-write-per-key under any split, idempotent on redelivery") {
    val events = Tables.load(spark, Sf0001, "events")
    val batch = lastPerUser(events)
    assert(batch.nonEmpty)
    for ((nBatches, redeliver) <- Seq((1, Nil), (4, Seq(0, 2)))) {
      val scratch = Files.createTempDirectory(s"graft-upsert-$nBatches").toString
      val got = StreamingUpsert.upsertFromFiles(
        spark,
        events.select(col("user_id"), col("ts"), col("event_id"), col("value")),
        nBuckets = 8, nBatches = nBatches, redeliver = redeliver,
        scratch, statePartitions = 4)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == batch, s"split=$nBatches redeliver=$redeliver diverged")
    }
  }

  test("merge rewrites only touched buckets; older rows never displace newer ones") {
    val scratch = Files.createTempDirectory("graft-upsert-buckets").toString
    val store = s"$scratch/store"
    def frame(rows: Seq[(Long, Long, Long, Long)]) =
      rows.toDF("key", "tsm", "tiebreak", "cents")
    // seed: keys 0..15 across all 8 buckets at t=100
    val seeded = StreamingUpsert.mergeBatch(
      spark, frame((0L until 16L).map(k => (k, 100L, k, k * 10L))),
      store, nBuckets = 8)
    assert(seeded == 8, s"seed touched $seeded buckets, want all 8")
    // update: keys 3 and 11 (both bucket 3) newer, key 5 OLDER (stale
    // replay) -> exactly buckets 3 and 5 rewritten, key 5 unchanged
    val touched = StreamingUpsert.mergeBatch(
      spark, frame(Seq((3L, 200L, 99L, 777L), (11L, 200L, 98L, 888L),
        (5L, 50L, 97L, 999L))),
      store, nBuckets = 8)
    assert(touched == 2, s"rewrote $touched buckets, want 2")
    val got = spark.read.parquet(store)
      .select(col("key"), col("tsm"), col("tiebreak"), col("cents"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got.size == 16)
    assert(got.contains((3L, 200L, 99L, 777L)), "newer update lost")
    assert(got.contains((11L, 200L, 98L, 888L)), "newer update lost")
    assert(got.contains((5L, 100L, 5L, 50L)), s"stale replay displaced newer row: $got")
    // duplicate-of-current replay: no-op on content
    StreamingUpsert.mergeBatch(
      spark, frame(Seq((3L, 200L, 99L, 777L))), store, nBuckets = 8)
    val again = spark.read.parquet(store)
      .select(col("key"), col("tsm"), col("tiebreak"), col("cents"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(again == got, "idempotent re-merge changed the store")
    graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
  }
}
