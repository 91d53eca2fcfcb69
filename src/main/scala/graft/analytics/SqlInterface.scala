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

  /** Windowed exact dedup over the documents corpus in pure portable
    * SQL (md5 fingerprint of the normal form, first-id survivor per
    * group): the dedup operator a SQL-only user of the surface writes.
    * `row_number()` is INT in Spark and BIGINT in DuckDB — the explicit
    * cast keeps the shared text schema-identical in both engines.
    */
  val DedupSql: String =
    """SELECT doc_id, fingerprint FROM (
      |  SELECT doc_id, md5(lower(trim(text))) AS fingerprint,
      |    CAST(row_number() OVER (
      |      PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS BIGINT) AS rn
      |  FROM documents) t
      |WHERE rn = 1
      |ORDER BY fingerprint""".stripMargin

  /** Three-table join + aggregate (customer → nation → orders revenue
    * per nation) in the portable dialect: broadcast-able dims, exact
    * int64 cents, one shuffle on the group key.
    */
  val JoinAggSql: String =
    """SELECT n_name,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Top-3 orders per customer via a ranking window in the portable
    * dialect (the SQL spelling of the TopKPerGroup operator).
    */
  val TopKSql: String =
    """SELECT o_custkey, o_orderkey, total_cents FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
      |    CAST(row_number() OVER (
      |      PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, o_orderkey""".stripMargin
}
