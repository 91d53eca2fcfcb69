package graft.sources

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class FileIOSpec extends SparkSpec {
  import spark.implicits._

  test("csv and json round-trip lineitem with explicit schemas; corrupt rows are data") {
    val tmp = Files.createTempDirectory("graft-fileio").toString
    val li = Tables.load(spark, Sf0001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
      .limit(500)
    li.write.option("header", "true").csv(s"$tmp/csv")
    li.write.json(s"$tmp/json")

    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_quantity", DoubleType)))

    val fromCsv = FileIO.csv(spark, s"$tmp/csv", schema)
    val fromJson = FileIO.jsonLines(spark, s"$tmp/json", schema)
    val (cleanCsv, corruptCsv) = FileIO.partitionCorrupt(fromCsv)
    val (cleanJson, _) = FileIO.partitionCorrupt(fromJson)
    assert(corruptCsv.collect().length == 0)
    val expected = li.as[(Long, Long, Double)].collect().toSet
    assert(cleanCsv.as[(Long, Long, Double)].collect().toSet == expected)
    assert(cleanJson.as[(Long, Long, Double)].collect().toSet == expected)

    // malformed json line becomes a corrupt-record row, not a job failure
    Files.writeString(java.nio.file.Paths.get(s"$tmp/json/zz_bad.json"),
      """{"l_orderkey": 1, "l_partkey": oops}""")
    val (clean2, corrupt2) = FileIO.partitionCorrupt(
      FileIO.jsonLines(spark, s"$tmp/json", schema))
    // bare count() prunes everything but the corrupt-column filter and
    // trips SPARK-26208, so materialize instead of counting
    val corruptRows = corrupt2.collect()
    assert(corruptRows.length == 1)
    assert(corruptRows.head.getString(0).contains("oops"))
    assert(clean2.collect().length == 500)
  }

  test("streaming json source -> exactly-once parquet sink (AvailableNow)") {
    val tmp = Files.createTempDirectory("graft-fileio-stream").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    Seq((0L, "the first doc"), (1L, "a second doc"))
      .toDF("doc_id", "text").write.json(s"$tmp/in")

    val stream = FileIO.streamJsonLines(spark, s"$tmp/in", schema)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("bigint"))
    val q = FileIO.streamingParquetSink(stream, s"$tmp/out", s"$tmp/ckpt").start()
    q.awaitTermination(60000)

    val out = spark.read.parquet(s"$tmp/out")
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 3L), (1L, 3L)))

    // restart with no new files: the commit log prevents duplicates
    val q2 = FileIO.streamingParquetSink(stream, s"$tmp/out", s"$tmp/ckpt").start()
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$tmp/out").count() == 2)
  }

  test("stageRangeBatches replays contiguous ranges in order, one file per batch") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-stage").toString
    val df = spark.range(1000).select(col("id").as("tid"))
    val inDir = new java.io.File(tmp, "in")
    FileIO.stageRangeBatches(
      df, col("tid"), 4, new java.io.File(tmp, "stage"), inDir)
    val files = inDir.listFiles().sortBy(_.getName)
    assert(files.length == 4)
    // mtimes strictly ascending with the names — the file source's
    // modification-time ordering replays them in range order
    assert(files.map(_.lastModified).sliding(2).forall(p => p(0) < p(1)))
    // each file holds a contiguous tid range, ranges ascend with files
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.toString).agg(
        min("tid"), max("tid"), count(lit(1))).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(ranges.map(_._3).sum == 1000L)
    ranges.sliding(2).foreach { case Array(a, b) => assert(a._2 < b._1) }
    // stream it back: 4 micro-batches, union == input
    val got = FileIO.streamParquet(spark, inDir.toString, df.schema,
      maxFilesPerTrigger = 1)
    val q = FileIO.streamingParquetSink(got, s"$tmp/out", s"$tmp/ckpt").start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(s"$tmp/out").count() == 1000L)
    FileIO.deleteScratch(new java.io.File(tmp))
    assert(!new java.io.File(tmp).exists())
  }

  test("compaction merges small files losslessly into the target layout") {
    val tmp = Files.createTempDirectory("graft-compact").toString
    val df = spark.range(1000).select(col("id"), (col("id") * 3).as("v"))
    df.repartition(40).write.parquet(s"$tmp/in") // 40 tiny files
    val (rows, before, after) =
      FileIO.compactParquet(spark, s"$tmp/in", s"$tmp/out", targetRowsPerFile = 400L)
    assert(rows == 1000L && before == 40 && after == 3) // ceil(1000/400)
    val back = spark.read.parquet(s"$tmp/out")
      .as[(Long, Long)].collect().toSet
    assert(back == df.as[(Long, Long)].collect().toSet)
    // round-robin balance: no output file holds more than ~target rows
    val sizes = spark.read.parquet(s"$tmp/out")
      .groupBy(input_file_name()).count().as[(String, Long)].collect().map(_._2)
    assert(sizes.length == 3 && sizes.max <= 400L)
    FileIO.deleteScratch(new java.io.File(tmp))
  }
}
