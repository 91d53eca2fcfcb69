package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The loader must survive testdata regeneration: the driver has shipped
  * `events.ts` both as parquet TIMESTAMP(NANOS) (readable only as int64
  * under the legacy flag) and as plain `timestamp[us]` (read as
  * TIMESTAMP_NTZ). Every physical encoding must normalize to the same
  * wall-clock TimestampType, and anything else must fail loudly at load.
  */
class TablesSpec extends SparkSpec {

  test("all ten tables load and match their declared logical schema") {
    Tables.All.foreach { t =>
      val df = Tables.load(spark, Sf0001, t)
      assert(df.limit(1).count() == 1, s"$t is empty")
    }
  }

  test("declared timestamp columns are wall-clock TimestampType after load") {
    val expectTs = Seq(
      "events" -> "ts", "orders" -> "o_orderdate", "lineitem" -> "l_shipdate")
    expectTs.foreach { case (t, c) =>
      val dt = Tables.load(spark, Sf0001, t).schema(c).dataType
      assert(dt == TimestampType, s"$t.$c read as $dt")
    }
  }

  private def writeEvents(tsCol: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("tables-spec").toString
    Seq((1L, 1704067200000000000L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "raw", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol).drop("raw")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("int64-nanos encoding converts exactly (legacy testdata shape)") {
    val dir = writeEvents(col("raw")) // plain long column
    val ts = Tables.load(spark, dir, "events")
      .select(unix_micros(col("ts"))).head().getLong(0)
    assert(ts == 1704067200000000L) // 2024-01-01T00:00:00Z in micros
  }

  test("timestamp_ntz encoding casts value-preserving under UTC session tz") {
    val dir = writeEvents(
      timestamp_micros(col("raw") / 1000 cast LongType).cast("timestamp_ntz"))
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    val ts = loaded.select(unix_micros(col("ts"))).head().getLong(0)
    assert(ts == 1704067200000000L)
  }

  test("unknown drift fails loudly at load naming the column") {
    val dir = writeEvents(lit("2024-01-01"))
    val e = intercept[IllegalStateException] {
      Tables.load(spark, dir, "events")
    }
    assert(e.getMessage.contains("'ts'"), e.getMessage)
  }
}
