package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join runs without a shuffle on either side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Bucketing.writeBucketed(
        Tables.load(spark, Sf0001, "lineitem"), "li_bucketed", "l_orderkey", 4)
      Bucketing.writeBucketed(
        Tables.load(spark, Sf0001, "orders")
          .withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bucketed", "l_orderkey", 4)
      val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "ord_bucketed", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      // and it's still correct
      val direct = Tables.load(spark, Sf0001, "lineitem")
        .join(Tables.load(spark, Sf0001, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
