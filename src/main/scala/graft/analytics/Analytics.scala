package graft.analytics

import graft.tgraph.backed.Transfers.cents
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OLAP building blocks over the TPC-H-ish tables — the analytical side
  * of the engine (the reference's evaluation queries are aggregations
  * over transactional state; these are the same shapes over the star
  * schema, written so Catalyst gets pushdown + broadcast).
  *
  * All money aggregates are exact int64 cents (order-independent, see
  * SURVEY.md §5).
  */
object Analytics {

  /** TPC-H Q1 shape: pricing summary with pushed-down date filter. */
  def pricingSummary(lineitem: DataFrame, shipBefore: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(shipBefore).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("bigint").as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("sum_disc_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")))).as("sum_charge_cents"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty_milli",
        round(lit(1000.0) * col("sum_qty") / col("count_order")).cast("bigint"))

  /** TPC-H Q3 shape: top revenue orders for one segment. The customer
    * dimension is explicitly broadcast — it is orders' small side at
    * every scale factor (1.5M rows at SF100 ≈ a few hundred MB would
    * switch to shuffle join; AQE handles that cutover).
    */
  def topOrders(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      segment: String, k: Int): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    val revenue = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
    lineitem
      .join(orders.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(revenue).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("l_orderkey"))
      .limit(k)
      .select(col("l_orderkey").as("orderkey"),
        to_date(col("o_orderdate")).as("order_date"), col("revenue_cents"))
  }

  /** Star join: revenue per region — all three dims broadcast. */
  def regionRevenue(
      orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("revenue_cents"))

  /** Gap-based sessionization: a new session starts after `gapSeconds`
    * of inactivity per key. Two windows over one shuffle (same
    * partitioning/order), all codegen'd — the standard scalable
    * formulation (lag → flag → running sum).
    */
  def sessionize(
      df: DataFrame, key: Column, time: Column, tiebreak: Column,
      gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(time, tiebreak)
    val micros = unix_micros(time)
    val gap = micros - lag(micros, 1).over(w)
    df.withColumn("__new",
      when(gap.isNull || gap > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** As-of join: enrich each left row with the latest right value whose
    * time is <= the left row's time, per key. Composed from built-ins
    * (preference (a)): union both sides, one window pass per key with
    * right rows sorting before left rows at equal times, `last(...,
    * ignoreNulls)` carries the value forward. ONE shuffle on the key —
    * no range join, no per-row lookup; this is the scalable spelling
    * of the operator (DuckDB's native ASOF JOIN is the oracle).
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: Column, rightTime: Column,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vType = right.schema(valueCol).dataType
    val r = right.select(
      col(key), rightTime.as("__t"), lit(1).as("__isr"), col(valueCol).as("__v"))
    val l = left
      .withColumn("__t", leftTime)
      .withColumn("__isr", lit(0))
      .withColumn("__v", lit(null).cast(vType))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__isr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn(valueCol + "_asof", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__isr") === 0)
      .drop("__t", "__isr", "__v")
  }

  /** Point-in-interval range join — the keyless join Spark would
    * otherwise plan as a broadcast-nested-loop/cartesian with a
    * post-filter. Bucketize instead: every interval explodes to the
    * `bucketWidth`-sized buckets it covers, every point maps to
    * exactly ONE bucket, and the match becomes an equi-join on the
    * bucket id plus an exact bounds filter. Shuffle volume is
    * O(points + intervals·len/width) — pick `bucketWidth` near the
    * typical interval length so the explode factor stays small — and
    * since a point lands in one bucket, no pair is emitted twice (no
    * dedup pass). Inclusive on both bounds.
    */
  def rangeJoin(
      points: DataFrame, t: Column,
      intervals: DataFrame, lo: Column, hi: Column,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // exact integer floor-division: (x - pmod(x, w)) div w. A double
    // division (floor(x / w)) loses exactness past 2^53 — nanosecond
    // epochs land there — and a boundary point would silently miss its
    // interval's bucket.
    def bucket(x: Column) = {
      val xl = x.cast("long")
      val exact = xl - pmod(xl, lit(bucketWidth)) // exact multiple of w
      org.apache.spark.sql.graftbridge.Bridge.column(
        new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graftbridge.Bridge.expression(exact),
          org.apache.spark.sql.graftbridge.Bridge.expression(lit(bucketWidth))))
    }
    val p = points.withColumn("__bucket", bucket(t))
    val i = intervals
      .withColumn("__bucket", explode(sequence(bucket(lo), bucket(hi))))
    p.join(i, Seq("__bucket"))
      .filter(t >= lo && t <= hi)
      .drop("__bucket")
  }

  /** TPC-H Q6 through the SQL surface (same text as the oracle). */
  def sqlQ6(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    SqlInterface.sql(spark, dir, SqlInterface.TpchQ6)

  /** Top-k per group via ranked window (deterministic tiebreak). */
  def topKPerGroup(
      df: DataFrame, groupCol: Column, orderCol: Column,
      tiebreak: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol.desc, tiebreak)
    df.withColumn("rnk", row_number().over(w).cast("bigint")).filter(col("rnk") <= k)
  }

  /** Cohort retention matrix: cohort = the user's first active day,
    * one output row per (cohort_day, offset_week) with the count of
    * cohort users active in that week-offset from their own start.
    *
    * Scale shape: TWO shuffles total — one groupBy on the user key
    * collecting the user's DISTINCT active days (map-side combined
    * partial sets; per-user state is the retention-bounded distinct-
    * day set, ≤ days-of-history elements whatever the event volume),
    * then one groupBy on the ~|cohorts|×|offsets| matrix key. No
    * self-join, no window function; the per-user offset projection is
    * a tiny array transform over the collected days.
    */
  /** Resample to a dense DAILY grid per key with FORWARD-FILL — the
    * time-series regularization every downstream model expects (a
    * sparse activity log becomes one row per key-day, gaps carrying
    * the last observed value). Scale shape: the grid is generated
    * DISTRIBUTED (`sequence` + `explode` per key, never a driver
    * calendar loop), the observed dailies join back on (key, day)
    * co-partitioned by the same shuffle, and the fill is one
    * `last(ignoreNulls)` running frame per key — a single Window
    * exchange whose per-key row count is bounded by the CALENDAR span,
    * not the event volume. Returns (user_id, day, cents) dense from
    * each key's first to last active day.
    */
  def resampleDailyFfill(
      df: DataFrame, user: Column, ts: Column, cents: Column): DataFrame = {
    val daily = df
      .select(user.as("user_id"), to_date(ts).as("day"), cents.as("c"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("c")).as("observed"))
    val grid = daily
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        last(col("observed"), ignoreNulls = true).over(w).as("cents"))
  }

  /** Robust OUTLIER flagging per group via MAD (median absolute
    * deviation) — mean/σ break down exactly when outliers are present,
    * so the robust pair (median, MAD) is the curation-grade spelling
    * for "drop pathological documents/values before training". Two
    * aggregate passes (median, then MAD of deviations) with the
    * model-sized per-group stats BROADCAST back — the data shuffles
    * once per pass on the group key and is never self-joined. Returns
    * per group: n, n_outliers beyond `cut`·MAD, and the outlier range.
    */
  def outliersMad(
      df: DataFrame, group: Column, value: Column, cut: Double): DataFrame = {
    val v = df.select(group.as("g"), value.cast("double").as("v"))
    val med = v.groupBy(col("g"))
      .agg(expr("percentile(v, 0.5)").as("med"))
    val withDev = v.join(broadcast(med), "g")
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = withDev.groupBy(col("g"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    withDev.join(broadcast(mad), "g")
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("dev") > lit(cut) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        min(when(col("dev") > lit(cut) * col("mad"), col("v"))).as("lo_outlier"),
        max(when(col("dev") > lit(cut) * col("mad"), col("v"))).as("hi_outlier"))
  }

  def retentionMatrix(
      df: DataFrame, user: Column, ts: Column): DataFrame =
    df.select(user.as("user_id"), to_date(ts).as("day"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("day"))).as("days"))
      .select(
        element_at(col("days"), 1).as("cohort_day"),
        explode(array_distinct(transform(col("days"),
          d => floor(datediff(d, element_at(col("days"), 1)) / 7)
            .cast("long")))).as("offset_week"))
      .groupBy(col("cohort_day"), col("offset_week"))
      .agg(count(lit(1)).as("n_users"))
}
