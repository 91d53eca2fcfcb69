package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables: the co-located-join lever at
  * 100 TB. Writing both join sides bucketed+sorted on the join key
  * lets Spark's bucketed scan satisfy the join's distribution
  * requirement from disk layout — the join runs with NO shuffle on
  * either side (the `BucketingSpec` asserts the plan has no Exchange).
  *
  * Rule of thumb at scale: bucket the big fact tables on their
  * highest-fan-in join key (orderkey for lineitem/orders), bucket
  * count sized so a bucket ~ one task's memory (128-256 MB).
  */
object Bucketing {

  /** Drop a bucketed managed table AND its leftover warehouse
    * directory. A fresh session starts with an empty in-memory catalog
    * but inherits the warehouse dir on disk, so a managed-table write
    * that survived a previous session fails with
    * LOCATION_ALREADY_EXISTS unless the orphaned location is cleared.
    */
  def dropBucketed(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val whPath =
      if (wh.startsWith("file:")) new java.io.File(new java.net.URI(wh))
      else new java.io.File(wh)
    val loc = new java.io.File(whPath, table.toLowerCase)
    if (loc.exists()) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc.toPath).iterator().asScala.toSeq
        .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** Persist `df` as a bucketed+sorted managed table (replacing any
    * previous incarnation, catalog or orphaned on-disk).
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    dropBucketed(df.sparkSession, table)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — shuffle-free when
    * bucket counts match.
    */
  def bucketedJoin(
      spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Same, when the two sides name their bucket key differently. */
  def bucketedJoin(
      spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(
      spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
