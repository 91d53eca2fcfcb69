package graft.analytics

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface: register the tables as temp views and run ANSI SQL via
  * `spark.sql`. Queries written against this surface are engine-
  * portable — `Tpch.Q6` below is literally the same text the DuckDB
  * oracle executes.
  */
object SqlInterface {
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.All.foreach(n => Tables.load(spark, dir, n).createOrReplaceTempView(n))

  def sql(spark: SparkSession, dir: String, text: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(text)
  }

  /** TPC-H Q6 shape in the engine-portable dialect (exact int64 cents,
    * explicit casts) — pushdown-friendly: every predicate reaches the
    * parquet scan.
    */
  val TpchQ6: String =
    """SELECT
      |  CAST(sum(CAST(round(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin
}
