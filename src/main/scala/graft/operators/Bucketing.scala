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

  /** Persist `df` as a bucketed+sorted managed table. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — shuffle-free when
    * bucket counts match.
    */
  def bucketedJoin(
      spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
