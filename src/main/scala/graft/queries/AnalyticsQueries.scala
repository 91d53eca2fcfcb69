package graft.queries

import graft.analytics.Analytics
import graft.tables.Tables
import graft.tgraph.backed.Transfers.cents
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analytical correctness queries over the star schema (SURVEY.md §2
  * row 34), each with a DuckDB oracle.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> ((s, dir) =>
      Analytics.pricingSummary(t(s, dir, "lineitem"), "1998-09-02 00:00:00")
        .orderBy("l_returnflag", "l_linestatus")),
    "q3_top_orders" -> ((s, dir) =>
      Analytics.topOrders(
        t(s, dir, "customer"), t(s, dir, "orders"), t(s, dir, "lineitem"),
        "BUILDING", 10)),
    "q_region_revenue" -> ((s, dir) =>
      Analytics.regionRevenue(
        t(s, dir, "orders"), t(s, dir, "customer"),
        t(s, dir, "nation"), t(s, dir, "region"))
        .orderBy("r_name")),
    "q_topk_per_group" -> ((s, dir) =>
      Analytics.topKPerGroup(
        t(s, dir, "part"), col("p_brand"), col("p_retailprice"), col("p_partkey"), 3)
        .select(col("p_brand"), col("rnk"), col("p_partkey"),
          cents(col("p_retailprice")).as("price_cents"))
        .orderBy("p_brand", "rnk")),
    // the custom TopKPerGroup physical operator under the oracle gate
    // (struct order-key carries the deterministic tiebreak)
    "q_topk_custom" -> ((s, dir) =>
      graft.plans.TopK.perGroup(
        t(s, dir, "part"), Seq(col("p_brand")),
        struct(col("p_retailprice"), col("p_partkey")), 3)
        .select(col("p_brand"), col("p_partkey"), cents(col("p_retailprice")).as("price_cents"))
        .orderBy("p_brand", "p_partkey")),
    "q_supplier_volume" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("bigint").as("qty_total"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"))
        .orderBy("s_name")),
    "q_type_stats" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(cents(col("value"))).as("sum_cents"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy("event_type")),
    "q_sessionize" -> ((s, dir) =>
      Analytics.sessionize(
        t(s, dir, "events"), col("user_id"), col("ts"), col("event_id"), 1800L)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("session_cents"))
        .orderBy("user_id", "session_seq")),
    // sessionization ONLINE: sessions emit the moment they close, the
    // watermark (event-time timeout) finalizes trailing open sessions
    // — same gap rule bit-for-bit, so the batch oracle holds verbatim
    "stream_sessionize" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("sess-online")
      graft.streaming.StreamingSessions.sessionizeFromFiles(
        s,
        t(s, dir, "events").select(
          col("user_id"), col("ts"), col("event_id").as("tb"),
          cents(col("value")).as("cents")),
        gapUs = 1800L * 1000000L, nBatches = 4, scratch)
        .orderBy("user_id", "session_seq")
    }),
    // windowed funnel: view -> click -> purchase, every chain event
    // within 12h of the chain's first; strict-chain EXISTS semantics
    // computed by the O(n·k) native fold, one shuffle on the user key
    "q_funnel" -> ((s, dir) =>
      graft.operators.Funnel.funnelCounts(
        t(s, dir, "events"), col("user_id"), col("ts"), col("event_type"),
        steps = Seq("view", "click", "purchase"),
        horizonUs = 12L * 3600L * 1000000L)
        .orderBy("step")),
    // the funnel LIVE: per-user depth updates emit as events arrive
    // (O(k) state per user), final report = per-user max emitted depth
    // — same strict-chain fold, so the batch EXISTS oracle holds
    "stream_funnel" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("funnel-online")
      graft.streaming.StreamingFunnel.funnelCountsFromFiles(
        s,
        t(s, dir, "events").select(
          col("user_id"), col("ts"), col("event_id").as("tb"),
          col("event_type")),
        steps = Seq("view", "click", "purchase"),
        horizonUs = 12L * 3600L * 1000000L, nBatches = 4, scratch)
        .orderBy("step")
    }),
    // watermarked tumbling-window aggregation: each (hour, type)
    // rollup emitted exactly-once on window close (append mode), the
    // closed window's state evicted at the same moment
    "stream_window_agg" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("winagg-online")
      graft.streaming.StreamingWindows.windowedTotalsFromFiles(
        s,
        t(s, dir, "events").select(col("ts"), col("event_type"), col("value")),
        windowDur = "1 hour", delay = "0 seconds", nBatches = 4, scratch,
        statePartitions = 4)
        .orderBy("win_us", "event_type")
    }),
    // data-quality audit: nullability/range/vocabulary/uniqueness/
    // predicate constraints, all counted in ONE aggregate over one scan
    "dq_events" -> ((s, dir) => {
      import graft.operators.DataQuality._
      audit(t(s, dir, "events"), Seq(
        NotNull("user_id"),
        InRange("value", 0.0, 400.0),
        AcceptedValues("event_type", Seq("view", "click", "purchase", "signup")),
        Unique(Seq("event_id")),
        Satisfies("positive_value", col("value") > 0)))
    }),
    // row-level dead-letter routing: first failing check (in caller
    // order) becomes the quarantine reason — one narrow projection,
    // quarantine and clean continuation split from the same scan
    "dq_route" -> ((s, dir) => {
      import graft.operators.DataQuality._
      graft.operators.DataQuality.route(t(s, dir, "events"), Seq(
        NotNull("user_id"),
        InRange("value", 0.0, 400.0),
        AcceptedValues("event_type", Seq("view", "click", "purchase", "signup")),
        Satisfies("positive_value", col("value") > 0)))
        .select(col("event_id"), col("dq_passed"), col("dq_reason"))
        .orderBy("event_id")
    }),
    // the audit taken ONLINE: per-batch codegen'd partial counters
    // (associative -> drained sum == batch audit) + stateful
    // first-seen emission for EXACT streaming uniqueness; shares
    // dq_events' oracle verbatim
    "stream_dq" -> ((s, dir) => {
      import graft.operators.DataQuality._
      val scratch = graft.LocalDir.runDir("dq-online")
      graft.streaming.StreamingQuality.auditFromFiles(
        s, t(s, dir, "events"), Seq(
          NotNull("user_id"),
          InRange("value", 0.0, 400.0),
          AcceptedValues("event_type", Seq("view", "click", "purchase", "signup")),
          Unique(Seq("event_id")),
          Satisfies("positive_value", col("value") > 0)),
        stageCol = "event_id", nBatches = 4, scratch)
    }),
    // incrementally-maintained rollup table: per-batch partials merged
    // additively into a bucketed store, per-bucket batch-id guards
    // making crash replays exactly-once for a non-idempotent monoid
    "stream_incr_rollup" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("rollup-online")
      graft.streaming.StreamingRollup.rollupFromFiles(
        s,
        t(s, dir, "events").select(col("ts"), col("event_type"), col("value")),
        nBuckets = 4, nBatches = 4, scratch, statePartitions = 4)
        .orderBy("day", "event_type")
    }),
    // streaming upsert sink: last-write-wins keyed store maintained by
    // foreachBatch merges that rewrite ONLY touched hash buckets
    // (dynamic partition overwrite); injected redelivery proves the
    // merge idempotent
    "stream_upsert" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("upsert-online")
      graft.streaming.StreamingUpsert.upsertFromFiles(
        s,
        t(s, dir, "events").select(
          col("user_id"), col("ts"), col("event_id"), col("value")),
        nBuckets = 8, nBatches = 4, redeliver = Seq(1), scratch,
        statePartitions = 4)
        .orderBy("user_id")
    }),
    // native session windows: dynamic-gap per (user, session) rollup,
    // partial sessions merged across micro-batches in the state store,
    // emitted exactly-once when the watermark passes last+gap
    "stream_session_agg" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("sesswin-online")
      graft.streaming.StreamingWindows.sessionTotalsFromFiles(
        s,
        t(s, dir, "events").select(col("user_id"), col("ts"), col("value")),
        gap = "30 minutes", delay = "0 seconds", nBatches = 4, scratch,
        statePartitions = 4)
        .orderBy("user_id", "sess_start_us")
    }),
    // exactly-once rollup from an at-least-once stream: injected
    // redelivered batches die in dropDuplicatesWithinWatermark (or as
    // late rows) before the chained windowed aggregate — two stateful
    // operators, one streaming plan
    "stream_dedup_window" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("dedupwin-online")
      graft.streaming.StreamingWindows.dedupedWindowedTotalsFromFiles(
        s,
        t(s, dir, "events").select(
          col("event_id"), col("ts"), col("event_type"), col("value")),
        windowDur = "1 hour", delay = "3 hours",
        nBatches = 4, redeliver = Seq(0, 3), scratch, statePartitions = 4)
        .orderBy("win_us", "event_type")
    }),
    // sliding-window rollup: every event in dur/slide overlapping
    // windows, same exactly-once close/evict contract per window
    "stream_sliding_agg" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("slidewin-online")
      graft.streaming.StreamingWindows.slidingTotalsFromFiles(
        s,
        t(s, dir, "events").select(col("ts"), col("event_type"), col("value")),
        windowDur = "2 hours", slide = "1 hour", delay = "0 seconds",
        nBatches = 4, scratch, statePartitions = 4)
        .orderBy("win_us", "event_type")
    }),
    // stream-static enrichment: events stream decorated per-row from
    // the customer dim via a broadcast hash join — stateless, the
    // stream side never shuffles; report = per-segment totals
    "stream_enrich" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("enrich-online")
      graft.streaming.StreamingJoin.enrichBySegmentFromFiles(
        s,
        t(s, dir, "events").select(col("user_id"), col("ts"), col("value")),
        t(s, dir, "customer"), nBatches = 4, scratch, statePartitions = 4)
        .orderBy("c_mktsegment")
    }),
    // stream-stream attribution join: view and purchase streams join
    // live under watermarks; the range condition makes per-side state
    // horizon-bounded; report = last qualifying view per purchase
    "stream_attribution" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("attribution-online")
      graft.streaming.StreamingJoin.attributionFromFiles(
        s,
        t(s, dir, "events").select(
          col("user_id"), col("ts"), col("event_id").as("tb"),
          col("event_type")),
        viewType = "view", purchaseType = "purchase",
        horizonUs = 12L * 3600L * 1000000L, nBatches = 4, scratch)
        .orderBy("user_id", "ptb")
    }),
    // stream-stream LEFT OUTER attribution: purchases with no
    // qualifying view still emit (nulls), produced at state-eviction
    // time when the watermark proves no match can arrive
    "stream_attribution_outer" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("attribution-outer")
      graft.streaming.StreamingJoin.attributionOuterFromFiles(
        s,
        t(s, dir, "events").select(
          col("user_id"), col("ts"), col("event_id").as("tb"),
          col("event_type")),
        viewType = "view", purchaseType = "purchase",
        horizonUs = 12L * 3600L * 1000000L, nBatches = 4, scratch,
        statePartitions = 4)
        .orderBy("user_id", "ptb")
    }),
    // cohort retention: first-active-day cohorts x week offsets,
    // distinct users active per cell — two shuffles, no self-join
    "q_retention" -> ((s, dir) =>
      Analytics.retentionMatrix(
        t(s, dir, "events"), col("user_id"), col("ts"))
        .orderBy("cohort_day", "offset_week")),
    "q_semi_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),
    "q_anti_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy("c_custkey")),
    "q_outer_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(cents(col("o_totalprice"))), lit(0L)).as("total_cents"))
        .orderBy("c_custkey")),
    "q6_sql" -> ((s, dir) => Analytics.sqlQ6(s, dir)),
    // SQL surface width: the SAME portable SQL text Spark executes is
    // the oracle DuckDB runs — windowed dedup over the LLM corpus,
    // dim-join aggregation, ranking-window top-k
    "q_dedup_sql" -> ((s, dir) =>
      graft.analytics.SqlInterface.sql(s, dir, graft.analytics.SqlInterface.DedupSql)),
    "q_joinagg_sql" -> ((s, dir) =>
      graft.analytics.SqlInterface.sql(s, dir, graft.analytics.SqlInterface.JoinAggSql)),
    "q_topk_sql" -> ((s, dir) =>
      graft.analytics.SqlInterface.sql(s, dir, graft.analytics.SqlInterface.TopKSql)),
    // as-of join: each event enriched with the user's end-of-prior-day
    // cumulative balance (snapshots derived from the same events table)
    "q_asof_join" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val daily = events
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(cents(col("value"))).as("day_cents"))
      val snapshots = daily
        .withColumn("snap_ts",
          date_add(col("day"), 1).cast("timestamp"))
        .withColumn("cum_cents",
          sum(col("day_cents")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("user_id")).orderBy(col("day"))
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .select(col("user_id"), col("snap_ts"), col("cum_cents"))
      Analytics.asOfJoin(
        events.select(col("event_id"), col("user_id"), col("ts"), cents(col("value")).as("value_cents")),
        snapshots, "user_id", col("ts"), col("snap_ts"), "cum_cents")
        .select(col("event_id"), col("user_id"), col("value_cents"),
          coalesce(col("cum_cents_asof"), lit(0L)).as("prev_balance_cents"))
        .orderBy("event_id")
    }),
    // keyless point-in-interval range join, bucketized (no cartesian):
    // per-user maintenance windows derived arithmetically; every event
    // inside any user's window is reported
    "q_range_join" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val points = events.select(col("event_id"), unix_seconds(col("ts")).as("t"))
      val windows = events.select(col("user_id").as("w_user")).distinct()
        .withColumn("lo", lit(1704067200L) + col("w_user") * 17000L)
        .withColumn("hi", col("lo") + 3600L + pmod(col("w_user"), lit(7200L)))
      Analytics.rangeJoin(points, col("t"), windows, col("lo"), col("hi"),
        bucketWidth = 3600L)
        .select(col("w_user"), col("event_id"), col("t"))
        .orderBy("w_user", "event_id")
    }),
    // scale-safe percentile family: median/p90 BOUNDS from ONE
    // mergeable log-histogram aggregate (≤2000 int buckets/group) —
    // no exact-Percentile value-map buffer anywhere (the executor-OOM
    // hazard at 100× data); exact spelling kept as a fixture-scale
    // parity spec
    "q_percentiles" -> ((s, dir) =>
      graft.operators.Quantiles.percentileStats(
        t(s, dir, "events"), col("event_type"), col("value"))
        .orderBy("grp")),
    // dense daily grid per user with forward-fill: distributed
    // sequence/explode calendar, one (key, day) co-partitioned join,
    // one last(ignoreNulls) running frame per key
    "q_resample_ffill" -> ((s, dir) =>
      Analytics.resampleDailyFfill(
        t(s, dir, "events"), col("user_id"), col("ts"), cents(col("value")))
        .orderBy("user_id", "day")),
    // robust outliers per group: sketch-derived median + MAD (two
    // sketch rounds, model-sized stats broadcast back, no self-join,
    // NO exact-percentile buffer), flag beyond 5·MAD — the
    // curation-grade "drop pathological values" spelling; the exact
    // spelling survives as a fixture-scale parity spec
    "q_outlier_mad" -> ((s, dir) =>
      graft.operators.Quantiles.outliersMad(
        t(s, dir, "events"), col("event_type"),
        round(col("value") * 1000000).cast("bigint"), cut = 5L)
        .orderBy("g")),
    // log-histogram quantile sketch: exact per-group percentile
    // buffering replaced by ONE mergeable aggregate over ~2000 integer
    // buckets per group — p50/p90/p99 answered from the sketch with
    // value bounds, every count and pick integer-exact
    "q_quantile_sketch" -> ((s, dir) =>
      graft.operators.Quantiles.quantiles(
        t(s, dir, "events"), col("event_type"), col("value"),
        permille = Seq(500, 900, 990))
        .orderBy("grp", "q_permille")),
    // the sketch taken ONLINE: events replay as micro-batch files
    // through a complete-mode count aggregate whose state is capped by
    // the bucket construction; counting is associative, so the drained
    // sketch == the batch sketch exactly — same oracle verbatim
    "stream_quantile_sketch" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("qsketch-online")
      graft.streaming.StreamingStats.quantileSketchFromFiles(
        s, t(s, dir, "events"), "event_type", "value", "event_id",
        permille = Seq(500, 900, 990), nBatches = 4, scratch)
        .orderBy("grp", "q_permille")
    }),
    "q_except" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.filter(col("event_type") === "click")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .except(e.filter(col("event_type") === "purchase")
          .select(col("user_id"), to_date(col("ts")).as("day")))
        .orderBy("user_id", "day")
    }),
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer").select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"))
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("revenue_cents"))
        .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_orders"), col("revenue_cents"))
        .orderBy("nation")),
    // CUBE: every subset of (nation, status) in one pass — Spark
    // expands the grouping-set lattice inline (an Expand node feeding
    // ONE hash aggregate), not 4 separate scans unioned
    "q_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer").select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("revenue_cents"))
        .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n_orders"), col("revenue_cents"))
        .orderBy("nation", "status")),
    // GROUPING SETS: the explicit lattice — only the named subsets,
    // same single-pass Expand plan as cube/rollup
    "q_grouping_sets" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer").select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupingSets(
          Seq(Seq(col("n_name")), Seq(col("o_orderstatus"))),
          col("n_name"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("revenue_cents"))
        .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n_orders"), col("revenue_cents"))
        .orderBy("nation", "status")),
    // INTERSECT: set semantics (distinct), planned as a left-semi
    // aggregate join, not a double scan + distinct union
    "q_intersect" -> ((s, dir) =>
      t(s, dir, "orders").filter(col("o_orderstatus") === "P")
        .select(col("o_custkey"))
        .intersect(
          t(s, dir, "orders").filter(col("o_orderstatus") === "F")
            .select(col("o_custkey")))
        .orderBy("o_custkey")),
    // UNPIVOT/melt: wide measure columns to (measure, value) rows via
    // the native Unpivot node (an Expand, no per-column union of scans)
    "q_unpivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          cents(col("l_extendedprice")).as("price_cents"),
          round(col("l_discount") * 1000).cast("long").as("disc_permille"),
          round(col("l_tax") * 1000).cast("long").as("tax_permille"),
          col("l_quantity").cast("long").as("qty"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("price_cents"), col("disc_permille"),
            col("tax_permille"), col("qty")),
          "measure", "value")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
        .orderBy("measure")),
    // analytic window functions: running + sliding frames and ranking
    // in one Window exchange per user (single shuffle, sorted once)
    "q_window_funcs" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("tsm"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsm"),
          cents(col("value")).as("cents"))
        .select(col("user_id"), col("event_id"),
          row_number().over(w).as("rn"),
          sum(col("cents")).over(w.rowsBetween(Long.MinValue, 0)).as("running_cents"),
          sum(col("cents")).over(w.rowsBetween(-2, 0)).as("win3_cents"),
          (col("cents") - lag(col("cents"), 1, 0L).over(w)).as("delta_cents"))
        .orderBy("user_id", "rn")
    }),
    // bucketed co-located join under the oracle gate: both sides
    // written bucketed+sorted on the join key, so the join AND the
    // per-customer aggregation run with zero Exchange (the
    // BucketingSpec asserts the plan; this asserts the semantics)
    "q_bucketed_join" -> ((s, dir) => {
      graft.operators.Bucketing.writeBucketed(
        t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "graft_bkt_orders", "o_custkey", 8)
      graft.operators.Bucketing.writeBucketed(
        t(s, dir, "customer").select("c_custkey", "c_name"),
        "graft_bkt_customer", "c_custkey", 8)
      graft.operators.Bucketing
        .bucketedJoin(s, "graft_bkt_customer", "graft_bkt_orders",
          "c_custkey", "o_custkey")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("total_cents"))
        .orderBy("c_custkey")
    }),
    // file source/sink surface under the oracle gate: nation round-
    // trips through CSV (quoted commas in comments) and JSON Lines with
    // explicit schemas + PERMISSIVE corrupt-record handling; both paths
    // must reproduce the parquet original byte for byte
    "q_file_roundtrip" -> ((s, dir) => {
      // a comma-bearing column forces the CSV writer/reader through
      // real quoting, not just happy-path token splitting
      val nation = t(s, dir, "nation")
        .withColumn("n_comment", concat(col("n_name"), lit(", "), col("n_regionkey")))
      val tmp = java.nio.file.Paths.get(graft.LocalDir.runDir("fileio"))
      val csvDir = tmp.resolve("csv").toString
      val jsonDir = tmp.resolve("json").toString
      nation.write.option("header", "true").csv(csvDir)
      nation.write.json(jsonDir)
      val cols = Seq(col("n_nationkey"), col("n_name"), col("n_regionkey"), col("n_comment"))
      // localCheckpoint: an aggregate-only consumer (count) would prune
      // the scan down to the bare corrupt-record column, which Spark
      // rejects (SPARK-26208, see FileIO.partitionCorrupt doc); nation
      // is a fixed 25 rows, so materializing is free
      val csvBack = graft.sources.FileIO
        .partitionCorrupt(graft.sources.FileIO.csv(s, csvDir, nation.schema))._1
        .select(lit("csv").as("src") +: cols: _*).localCheckpoint(true)
      val jsonBack = graft.sources.FileIO
        .partitionCorrupt(graft.sources.FileIO.jsonLines(s, jsonDir, nation.schema))._1
        .select(lit("json").as("src") +: cols: _*).localCheckpoint(true)
      csvBack.unionAll(jsonBack).orderBy("src", "n_nationkey")
    }),
    // ORC source/sink round-trip (the third columnar format beside
    // parquet and the text formats; schema preserved end to end)
    "q_orc_roundtrip" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val tmp = java.nio.file.Paths.get(graft.LocalDir.runDir("orc"))
      val orcDir = tmp.resolve("orc").toString
      nation.write.orc(orcDir)
      s.read.orc(orcDir).orderBy("n_nationkey").localCheckpoint(true)
    }),
    // small-file compaction: 25 one-row files rewritten into 2
    // balanced files; the oracle (the plain table) proves the rewrite
    // is lossless — only the layout changed (file counts spec-checked)
    "q_compaction" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val tmp = java.nio.file.Paths.get(graft.LocalDir.runDir("compact"))
      val inDir = tmp.resolve("in").toString
      val outDir = tmp.resolve("out").toString
      nation.repartition(25).write.parquet(inDir)
      graft.sources.FileIO.compactParquet(s, inDir, outDir, targetRowsPerFile = 13L)
      s.read.parquet(outDir).orderBy("n_nationkey").localCheckpoint(true)
    }),
    // salted top-k under the oracle gate: exact equality with the
    // plain window formulation is the whole point of the salting
    "q_skew_topk" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_suppkey"),
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("bigint").as("line_id"),
        cents(col("l_extendedprice")).as("price_cents"))
      graft.operators.Skew.saltedTopK(
        li, col("l_suppkey"), col("price_cents"), col("line_id"), k = 3, salts = 8)
        .select(col("l_suppkey"), col("rnk"), col("line_id"), col("price_cents"))
        .orderBy("l_suppkey", "rnk")
    }),
    // time-series motif search: user 1's first 8-value window is the
    // pattern; offset-invariant integer SSD over every user's sliding
    // windows, global top-20 (the pattern's own window excluded). The
    // 8-value pattern is a bounded driver collect (one series prefix)
    "ts_motif" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("user_id").cast("bigint").as("user_id"), col("ts"),
        col("event_id"), cents(col("value")).as("cents"))
      val pat = e.filter(col("user_id") === 1)
        .orderBy("ts", "event_id").limit(8)
        .select("cents").collect().map(_.getLong(0))
      graft.operators.TimeSeries.motifSearch(
        e, col("user_id"), col("ts"), col("event_id"), col("cents"),
        pat, k = 20, exclude = Some((1L, 0)))
        .select(col("rank"), col("k").cast("bigint").as("k"), col("idx"), col("dist"))
        .orderBy("rank")
    }),
    // STREAMING pattern matching: the motif search as a live alert —
    // per-key O(w) state, matches emitted as values arrive, fed
    // end-to-end through ts-ordered micro-batch files; the emitted
    // set must equal the batch filter (the equivalence claim)
    "stream_ts_match" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("user_id").cast("bigint").as("k"),
        unix_micros(col("ts")).as("ts"),
        col("event_id").cast("bigint").as("tb"),
        cents(col("value")).as("v"))
      val pat = e.filter(col("k") === 1).orderBy("ts", "tb").limit(8)
        .select("v").collect().map(_.getLong(0))
      val scratch = graft.LocalDir.runDir("ts-online")
      graft.streaming.StreamingTimeSeries.matchPatternFromFiles(
        s, e, pat, maxDist = 20000000000L, nBatches = 4, scratch)
        .select(col("k"), col("idx"), col("dist"))
        .orderBy("k", "idx")
    }),
    // motif DISCOVERY: closest window pairs anywhere in the corpus,
    // candidates bucketed by the discretized-PAA sketch (equi-join,
    // never the O(n^2) scan), exact centered distances, global top-15
    "ts_motif_pairs" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        col("user_id").cast("bigint").as("user_id"), col("ts"),
        col("event_id"), cents(col("value")).as("cents"))
      graft.operators.TimeSeries.motifPairs(
        e, col("user_id"), col("ts"), col("event_id"), col("cents"),
        w = 8, paa = 4, shift = 12, k = 15)
        .select(col("rank"), col("k1").cast("bigint").as("k1"), col("i1"),
          col("k2").cast("bigint").as("k2"), col("i2"), col("dist"))
        .orderBy("rank")
    }),
    // pivot (long->wide): per-cohort event-type revenue matrix with an
    // EXPLICIT pivot value list — one groupBy, no second pass to
    // discover columns, deterministic schema at any scale
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .select((col("user_id") % 10).as("cohort"), col("event_type"),
          cents(col("value")).as("v"))
        .groupBy(col("cohort"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(sum(col("v")))
        .na.fill(0L)
        .orderBy("cohort")),
    // semi-structured extraction: schema-on-read JSON parsing of the
    // event props (from_json with an explicit schema — codegen'd,
    // null on malformed input, no UDF) + a grouped rollup. At 100 TB
    // the parse is a narrow projection fused into the scan.
    "q_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")),
    // runtime Bloom-filter join pruning: the urgent-orders key set
    // becomes a ~1.2 MB filter pruning the lineitem scan before the
    // join's shuffle; the exact join behind it makes the result
    // bit-identical to the plain join (which IS the oracle)
    "q_bloom_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), cents(col("l_extendedprice")).as("price_cents"))
      graft.operators.BloomPrune.prunedJoin(
        li, col("l_orderkey"), o, col("o_orderkey"),
        expectedItems = 1L << 18, fpp = 0.01)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_lines"), sum(col("price_cents")).as("revenue_cents"))
        .orderBy("o_custkey")
    }),
    // z-order layout math: 16-bit quantize + bit interleave of
    // (l_partkey, l_suppkey) — the file-clustering key a 100 TB
    // multi-column data-skipping layout sorts by (the range-partition
    // step itself is sampling-based, so the gate pins the DETERMINISTIC
    // z-value; the skipping win is asserted by the LayoutSpec)
    "layout_zorder" -> ((s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber").cast("bigint").as("l_linenumber"),
        graft.operators.Layout.zValue(Seq(
          graft.operators.Layout.quantize(col("l_partkey"), 0L, 65535L, 16),
          graft.operators.Layout.quantize(col("l_suppkey"), 0L, 65535L, 16)), 16)
          .as("zval"))
        .orderBy("l_orderkey", "l_linenumber")),
    // Hilbert-curve layout key (z-order's stronger-locality sibling,
    // native codegen'd kernel; oracle = the same xy->d walk as a
    // recursive CTE over the bit levels)
    "layout_hilbert" -> ((s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber").cast("bigint").as("l_linenumber"),
        graft.operators.Layout.hilbertValue(
          graft.operators.Layout.quantize(col("l_partkey"), 0L, 65535L, 16),
          graft.operators.Layout.quantize(col("l_suppkey"), 0L, 65535L, 16), 16)
          .as("hval"))
        .orderBy("l_orderkey", "l_linenumber"))
  )

  /** Micro-quantize -> log2 bucket (+3 mantissa bits) -> counts ->
    * cumulative pick at ceil(q*n/1000); same integer spellings as
    * the Spark operator (bin-string bitlen, exact 2^k cast,
    * floor-div). Shared verbatim by the batch and streaming gates
    * (associative counting makes them row-identical). */
  /** Linear replay of the k-slot max-chain-start fold
    * (`functions/FunnelKernel.scala` `advance`): slot j's running
    * value is the max chain-start over depth-(j+1) chains among
    * strictly-earlier events, so each slot is one windowed running
    * max with a `RANGE … 1 PRECEDING` frame (integer µs order —
    * excluding the frame's current timestamp IS the kernel's
    * equal-time-group commit rule). s0_prev = latest view strictly
    * before; vstart = that chain start if the click lands inside the
    * horizon; s1_prev = max vstart over clicks strictly before; a
    * purchase completes iff it lands within horizon of s1_prev.
    * O(n log n) per user vs the old EXISTS spelling's O(n^k) — the
    * spelling that made this oracle sf1-infeasible (>78 GB of DuckDB
    * spill at ~660 events/user). Shared verbatim by the batch kernel
    * gate and the streaming fold gate (identical semantics by the
    * resumable-fold argument). */
  private val FunnelOracle: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS tsm, event_type FROM events
      |           WHERE event_type IN ('view', 'click', 'purchase')),
      |w AS (SELECT user_id, tsm, event_type,
      |        max(CASE WHEN event_type = 'view' THEN tsm END) OVER
      |          (PARTITION BY user_id ORDER BY tsm
      |           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s0_prev
      |      FROM e),
      |w2 AS (SELECT user_id, tsm, event_type,
      |        CASE WHEN event_type = 'click' AND s0_prev IS NOT NULL
      |              AND tsm <= s0_prev + 43200000000 THEN s0_prev END AS vstart
      |       FROM w),
      |w3 AS (SELECT user_id, tsm, event_type, vstart,
      |        max(vstart) OVER (PARTITION BY user_id ORDER BY tsm
      |          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s1_prev
      |       FROM w2),
      |d AS (SELECT user_id,
      |        max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS d1,
      |        max(CASE WHEN vstart IS NOT NULL THEN 1 ELSE 0 END) AS d2,
      |        max(CASE WHEN event_type = 'purchase' AND s1_prev IS NOT NULL
      |              AND tsm <= s1_prev + 43200000000 THEN 1 ELSE 0 END) AS d3
      |      FROM w3 GROUP BY user_id)
      |SELECT * FROM (
      |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
      |         CAST((SELECT count(*) FROM d WHERE d1 = 1) AS BIGINT) AS n_users
      |  UNION ALL
      |  SELECT CAST(2 AS BIGINT), 'click', (SELECT count(*) FROM d WHERE d2 = 1)
      |  UNION ALL
      |  SELECT CAST(3 AS BIGINT), 'purchase', (SELECT count(*) FROM d WHERE d3 = 1))
      |WHERE n_users > 0 ORDER BY step""".stripMargin

  /** Gap rule: strictly-greater breaks (an event exactly `gap` after
    * the previous one extends the session); order (ts, event_id) —
    * both spelled identically in the batch window operator and the
    * streaming event-time-timeout operator, which is what lets the
    * two gates share this oracle verbatim. */
  private val SessionizeOracle: String =
    """WITH s AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s2 AS (
      |  SELECT user_id, value,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM s)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS session_cents
      |FROM s2 GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin

  /** DuckDB CTE chain replaying one sketch round (micro-quantize →
    * log2 bucket + 3 mantissa bits → counts → cumulative pick at
    * ceil(q·n/1000) → exact bucket bounds) over relation `src`, which
    * must expose (grp, vm BIGINT). Emits relations suffixed `tag`;
    * the result relation `picked<tag>` has (grp, q_permille, n,
    * q_rank, bucket_id, lo_micro, hi_micro) — the same integer
    * spellings as the Spark operator (bin-string bitlen, exact 2^k
    * cast, floor-div), so every count and pick matches bit-exactly.
    */
  private def sketchPickCtes(tag: String, src: String, permilles: Seq[Int]): String =
    s"""b$tag AS (SELECT grp,
       |    CASE WHEN vm = 0 THEN 0 WHEN vm > 0 THEN mag ELSE -mag END AS bucket_id
       |  FROM (SELECT grp, vm,
       |          CASE WHEN a <= 15 THEN a
       |               ELSE 16 * bl + ((a - ((a % p) + p) % p) // p) END AS mag
       |        FROM (SELECT grp, vm, a, bl,
       |                CAST(power(2, bl - 4) AS BIGINT) AS p
       |              FROM (SELECT grp, vm, abs(vm) AS a,
       |                      CAST(length(bin(abs(vm))) AS BIGINT) AS bl FROM $src)))),
       |sk$tag AS (SELECT grp, bucket_id, CAST(count(*) AS BIGINT) AS cnt
       |       FROM b$tag GROUP BY grp, bucket_id),
       |cum$tag AS (SELECT grp, bucket_id, cnt,
       |    sum(cnt) OVER (PARTITION BY grp ORDER BY bucket_id) AS cum FROM sk$tag),
       |r$tag AS (SELECT grp, n, q_permille,
       |    ((q_permille * n + 999) - (((q_permille * n + 999) % 1000) + 1000) % 1000) // 1000 AS q_rank
       |  FROM (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n FROM sk$tag GROUP BY grp)
       |  CROSS JOIN (SELECT UNNEST([${permilles.mkString(", ")}]) AS q_permille)),
       |pk$tag AS (SELECT r.grp, r.q_permille, r.n, r.q_rank,
       |    min(c.bucket_id) AS bucket_id
       |  FROM r$tag r JOIN cum$tag c ON r.grp = c.grp AND c.cum >= r.q_rank
       |  GROUP BY r.grp, r.q_permille, r.n, r.q_rank),
       |picked$tag AS (SELECT grp, CAST(q_permille AS BIGINT) AS q_permille, n, q_rank, bucket_id,
       |  CASE WHEN bucket_id < 0 THEN -hi_pos ELSE lo_pos END AS lo_micro,
       |  CASE WHEN bucket_id < 0 THEN -lo_pos ELSE hi_pos END AS hi_micro
       |FROM (SELECT grp, q_permille, n, q_rank, bucket_id,
       |        CASE WHEN mag <= 15 THEN mag ELSE sub * pp END AS lo_pos,
       |        CASE WHEN mag <= 15 THEN mag ELSE sub * pp + (pp - 1) END AS hi_pos
       |      FROM (SELECT grp, q_permille, n, q_rank, bucket_id, mag,
       |              mag % 16 AS sub,
       |              CAST(power(2, (mag // 16) - 4) AS BIGINT) AS pp
       |            FROM (SELECT *, abs(bucket_id) AS mag FROM pk$tag))))""".stripMargin

  /** Floor midpoint of the picked bucket's bounds — the deterministic
    * representative [[graft.operators.Quantiles.bucketMid]] uses;
    * safe floor-div spelling (DuckDB `//` truncates).
    */
  private def midSql(lo: String, hi: String): String =
    s"(($lo + $hi) - ((($lo + $hi) % 2) + 2) % 2) // 2"

  private val QuantileSketchOracle: String =
    s"""WITH v AS (SELECT event_type AS grp,
       |    CAST(round(value * 1000000) AS BIGINT) AS vm FROM events),
       |${sketchPickCtes("", "v", Seq(500, 900, 990))}
       |SELECT grp, q_permille, n, q_rank, bucket_id, lo_micro, hi_micro
       |FROM picked ORDER BY grp, q_permille""".stripMargin

  private val DqEventsOracle: String =
    """WITH n AS (SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_notnull,
        |  CAST(sum(CASE WHEN value IS NOT NULL AND (value < 0 OR value > 400)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
        |  CAST(sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
        |    ('view','click','purchase','signup') THEN 1 ELSE 0 END) AS BIGINT) AS v_vocab,
        |  CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS v_uniq,
        |  CAST(sum(CASE WHEN NOT coalesce(value > 0, false)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS v_pos
        |  FROM events)
        |SELECT * FROM (
        |  SELECT 'accepted_values(event_type)' AS "check", n_rows,
        |    v_vocab AS n_violations, v_vocab = 0 AS passed FROM n
        |  UNION ALL SELECT 'in_range(value,0.0,400.0)', n_rows, v_range, v_range = 0 FROM n
        |  UNION ALL SELECT 'not_null(user_id)', n_rows, v_notnull, v_notnull = 0 FROM n
        |  UNION ALL SELECT 'satisfies(positive_value)', n_rows, v_pos, v_pos = 0 FROM n
        |  UNION ALL SELECT 'unique(event_id)', n_rows, v_uniq, v_uniq = 0 FROM n)
        |ORDER BY "check"""".stripMargin

  val oracles: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(l_quantity) AS DOUBLE) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
        |  count(*) AS count_order,
        |  CAST(round(1000.0 * CAST(CAST(sum(l_quantity) AS DOUBLE) AS BIGINT) / count(*)) AS BIGINT) AS avg_qty_milli
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      """SELECT l_orderkey AS orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue_cents DESC, orderkey
        |LIMIT 10""".stripMargin,
    "q_region_revenue" ->
      """SELECT r_name, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_topk_per_group" ->
      """SELECT p_brand, rnk, p_partkey,
        |  CAST(round(p_retailprice*100) AS BIGINT) AS price_cents
        |FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    CAST(row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rnk
        |  FROM part)
        |WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,
    "q_topk_custom" ->
      """SELECT p_brand, p_partkey,
        |  CAST(round(p_retailprice*100) AS BIGINT) AS price_cents
        |FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey DESC) AS rnk
        |  FROM part)
        |WHERE rnk <= 3 ORDER BY p_brand, p_partkey""".stripMargin,
    "q_supplier_volume" ->
      """SELECT s_name, count(*) AS n_items,
        |  CAST(CAST(sum(l_quantity) AS DOUBLE) AS BIGINT) AS qty_total,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,
    "q_type_stats" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sessionize" -> SessionizeOracle,
    // the online sessionizer closes sessions by the identical gap rule
    // (watermark timeout = the gap, decidably) — oracle shared verbatim
    "stream_sessionize" -> SessionizeOracle,
    // the kernel's one-pass fold == this EXISTS spelling (strict chain,
    // all chain events within the horizon of the chain's FIRST event);
    // steps nobody reaches drop from both sides (n_users > 0)
    "q_funnel" -> FunnelOracle,
    "stream_funnel" -> FunnelOracle,
    // windowed totals: the streamed append-mode rollup equals this
    // batch rollup exactly — ts-ordered staging means nothing is late,
    // and the flush sentinel closes the final windows
    "stream_window_agg" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_us,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // one aggregate computes every constraint's violation count
    "dq_events" -> DqEventsOracle,
    // same conditionals, first match wins (caller's check order)
    "dq_route" ->
      """WITH r AS (SELECT event_id,
        |  CASE WHEN user_id IS NULL THEN 'not_null(user_id)'
        |       WHEN value IS NOT NULL AND (value < 0 OR value > 400)
        |         THEN 'in_range(value,0.0,400.0)'
        |       WHEN event_type IS NOT NULL AND event_type NOT IN
        |         ('view','click','purchase','signup')
        |         THEN 'accepted_values(event_type)'
        |       WHEN NOT coalesce(value > 0, FALSE)
        |         THEN 'satisfies(positive_value)'
        |  END AS dq_reason FROM events)
        |SELECT event_id, dq_reason IS NULL AS dq_passed, dq_reason
        |FROM r ORDER BY event_id""".stripMargin,
    // the online audit drains to the identical report
    "stream_dq" -> DqEventsOracle,
    // the maintained rollup = the clean batch GROUP BY (day, type)
    "stream_incr_rollup" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the upserted store = the newest (tsm, event_id) row per user,
    // whatever order or multiplicity the merges saw
    "stream_upsert" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsm, event_id,
        |  CAST(round(value*100) AS BIGINT) AS cents FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |  ORDER BY tsm DESC, event_id DESC) AS rn FROM e)
        |SELECT user_id, tsm, event_id, cents FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    // session windows: break when the gap REACHES 30 min (Spark merges
    // strictly-within-gap events; window end = last + gap)
    "stream_session_agg" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS eu,
        |  CAST(round(value*100) AS BIGINT) AS cents FROM events),
        |m AS (SELECT *, CASE WHEN lag(eu) OVER w IS NULL
        |    OR eu - lag(eu) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY eu)),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY eu
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, min(eu) AS sess_start_us,
        |  max(eu) + 1800000000 AS sess_end_us, count(*) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, sid ORDER BY 1, 2""".stripMargin,
    // the redelivered stream dedupes back to the clean rollup — the
    // oracle is the SAME hourly rollup over the clean table: any
    // surviving duplicate inflates a count and breaks the hash
    "stream_dedup_window" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_us,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // sliding windows: each event contributes to dur/slide = 2
    // epoch-aligned hourly starts
    "stream_sliding_agg" ->
      """WITH e AS (SELECT epoch_us(ts) AS eu, event_type,
        |  CAST(round(value*100) AS BIGINT) AS cents FROM events)
        |SELECT (eu // 3600000000 - k) * 3600000000 AS win_us, event_type,
        |  count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM e CROSS JOIN range(2) AS t(k)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // per-segment enrichment totals: the streamed broadcast join's
    // landed rows equal this batch join exactly (stateless, nothing
    // to evict or miss)
    "stream_enrich" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // last-touch attribution: the streamed watermarked join's pair set
    // equals this batch join exactly (range staging keeps both sources
    // ts-ordered, so nothing is ever late); argmax picks the last view
    "stream_attribution" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS vtsm FROM events
        |           WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS ptb, epoch_us(ts) AS ptsm
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.ptb, max(v.vtsm) AS view_tsm,
        |       p.ptsm - max(v.vtsm) AS lat_us
        |FROM p JOIN v ON p.user_id = v.user_id AND v.vtsm < p.ptsm
        |  AND p.ptsm <= v.vtsm + 43200000000
        |GROUP BY p.user_id, p.ptb, p.ptsm
        |ORDER BY 1, 2""".stripMargin,
    // LEFT JOIN spelling: max over no views = NULL, lat_us NULL too
    "stream_attribution_outer" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS vtsm FROM events
        |           WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS ptb, epoch_us(ts) AS ptsm
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.ptb, max(v.vtsm) AS view_tsm,
        |       p.ptsm - max(v.vtsm) AS lat_us
        |FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.vtsm < p.ptsm
        |  AND p.ptsm <= v.vtsm + 43200000000
        |GROUP BY p.user_id, p.ptb, p.ptsm
        |ORDER BY 1, 2""".stripMargin,
    "q_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id),
        |o AS (SELECT DISTINCT a.user_id, c.cohort_day,
        |        (a.day - c.cohort_day) // 7 AS offset_week
        |      FROM a JOIN c USING (user_id))
        |SELECT cohort_day, CAST(offset_week AS BIGINT) AS offset_week,
        |  count(*) AS n_users
        |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  CAST(coalesce(sum(CAST(round(o_totalprice*100) AS BIGINT)), 0) AS BIGINT) AS total_cents
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q6_sql" -> graft.analytics.SqlInterface.TpchQ6,
    "q_dedup_sql" -> graft.analytics.SqlInterface.DedupSql,
    "q_joinagg_sql" -> graft.analytics.SqlInterface.JoinAggSql,
    "q_topk_sql" -> graft.analytics.SqlInterface.TopKSql,
    "q_asof_join" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS day_cents
        |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
        |snapshots AS (
        |  SELECT user_id,
        |    CAST(day AS TIMESTAMP) + INTERVAL 1 DAY AS snap_ts,
        |    CAST(sum(day_cents) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |  FROM daily)
        |SELECT e.event_id, e.user_id,
        |  CAST(round(e.value*100) AS BIGINT) AS value_cents,
        |  coalesce(s.cum_cents, 0) AS prev_balance_cents
        |FROM events e
        |ASOF LEFT JOIN snapshots s
        |  ON e.user_id = s.user_id AND e.ts >= s.snap_ts
        |ORDER BY e.event_id""".stripMargin,
    "q_range_join" ->
      """WITH p AS (
        |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
        |w AS (SELECT DISTINCT user_id AS w_user FROM events),
        |i AS (SELECT w_user,
        |        1704067200 + w_user * 17000 AS lo,
        |        1704067200 + w_user * 17000 + 3600 + (w_user % 7200) AS hi
        |      FROM w)
        |SELECT w_user, event_id, t
        |FROM p JOIN i ON p.t >= i.lo AND p.t <= i.hi
        |ORDER BY w_user, event_id""".stripMargin,
    // sketch replay (same integer spellings as the operator), pivoted
    // wide: median/p90 bounds per group from one sketch
    "q_percentiles" ->
      s"""WITH v AS (SELECT event_type AS grp,
         |    CAST(round(value * 1000000) AS BIGINT) AS vm FROM events),
         |${sketchPickCtes("", "v", Seq(500, 900))}
         |SELECT grp, max(n) AS n,
         |  max(CASE WHEN q_permille = 500 THEN lo_micro END) AS med_lo_micro,
         |  max(CASE WHEN q_permille = 500 THEN hi_micro END) AS med_hi_micro,
         |  max(CASE WHEN q_permille = 900 THEN lo_micro END) AS p90_lo_micro,
         |  max(CASE WHEN q_permille = 900 THEN hi_micro END) AS p90_hi_micro
         |FROM picked GROUP BY grp ORDER BY grp""".stripMargin,
    // dense calendar per user; ffill = last non-null observed daily
    "q_resample_ffill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS observed
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1),
        |grid AS (SELECT user_id,
        |  CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span),
        |j AS (SELECT g.user_id, g.day, d.observed
        |  FROM grid g LEFT JOIN daily d USING (user_id, day))
        |SELECT user_id, day,
        |  CAST(last_value(observed IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cents
        |FROM j ORDER BY user_id, day""".stripMargin,
    // two sketch rounds replayed (median of values, then median of
    // abs deviations from the bucket-midpoint representative); every
    // flag decision exact int64
    "q_outlier_mad" ->
      s"""WITH v0 AS (SELECT event_type AS g,
         |    CAST(round(value * 1000000) AS BIGINT) AS vm FROM events),
         |v AS (SELECT g AS grp, vm FROM v0),
         |${sketchPickCtes("1", "v", Seq(500))},
         |med AS (SELECT grp AS g,
         |    ${midSql("lo_micro", "hi_micro")} AS med_micro FROM picked1),
         |d0 AS (SELECT v0.g, v0.vm, m.med_micro,
         |    abs(v0.vm - m.med_micro) AS dev FROM v0 JOIN med m USING (g)),
         |d AS (SELECT g AS grp, dev AS vm FROM d0),
         |${sketchPickCtes("2", "d", Seq(500))},
         |mad AS (SELECT grp AS g,
         |    ${midSql("lo_micro", "hi_micro")} AS mad_micro FROM picked2)
         |SELECT d0.g, count(*) AS n,
         |  max(d0.med_micro) AS med_micro, max(md.mad_micro) AS mad_micro,
         |  CAST(sum(CASE WHEN dev > 5 * md.mad_micro THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         |  min(CASE WHEN dev > 5 * md.mad_micro THEN d0.vm END) AS lo_outlier_micro,
         |  max(CASE WHEN dev > 5 * md.mad_micro THEN d0.vm END) AS hi_outlier_micro
         |FROM d0 JOIN mad md USING (g) GROUP BY d0.g ORDER BY d0.g""".stripMargin,
    // the online sketch equals the batch sketch exactly (associative
    // counting) — the streaming gate shares the oracle verbatim
    "stream_quantile_sketch" -> QuantileSketchOracle,
    // micro-quantize -> log2 bucket (+3 mantissa bits) -> counts ->
    // cumulative pick at ceil(q*n/1000); same integer spellings as the
    // Spark operator (bin-string bitlen, exact 2^k cast, floor-div)
    "q_quantile_sketch" -> QuantileSketchOracle,
    "q_except" ->
      """SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, day""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(n_name, 'ALL') AS nation, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name) ORDER BY nation""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(n_name, 'ALL') AS nation,
        |  coalesce(o_orderstatus, 'ALL') AS status, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE(n_name, o_orderstatus) ORDER BY nation, status""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(n_name, 'ALL') AS nation,
        |  coalesce(o_orderstatus, 'ALL') AS status, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (o_orderstatus))
        |ORDER BY nation, status""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "q_unpivot" ->
      """WITH li AS (SELECT
        |  CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents,
        |  CAST(round(l_discount*1000) AS BIGINT) AS disc_permille,
        |  CAST(round(l_tax*1000) AS BIGINT) AS tax_permille,
        |  CAST(l_quantity AS BIGINT) AS qty FROM lineitem),
        |u AS (
        |  SELECT 'price_cents' AS measure, price_cents AS value FROM li
        |  UNION ALL SELECT 'disc_permille', disc_permille FROM li
        |  UNION ALL SELECT 'tax_permille', tax_permille FROM li
        |  UNION ALL SELECT 'qty', qty FROM li)
        |SELECT measure, count(*) AS n, CAST(sum(value) AS BIGINT) AS total
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_funcs" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsm,
        |  CAST(round(value*100) AS BIGINT) AS cents FROM events)
        |SELECT user_id, event_id,
        |  CAST(row_number() OVER w AS INT) AS rn,
        |  CAST(sum(cents) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
        |  CAST(sum(cents) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS win3_cents,
        |  cents - lag(cents, 1, CAST(0 AS BIGINT)) OVER w AS delta_cents
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id)
        |ORDER BY user_id, rn""".stripMargin,
    "q_skew_topk" ->
      """WITH li AS (
        |  SELECT l_suppkey,
        |    CAST(l_orderkey*10 + l_linenumber AS BIGINT) AS line_id,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
        |  FROM lineitem),
        |r AS (
        |  SELECT l_suppkey, line_id, price_cents,
        |    CAST(row_number() OVER (PARTITION BY l_suppkey ORDER BY price_cents DESC, line_id) AS BIGINT) AS rnk
        |  FROM li)
        |SELECT l_suppkey, rnk, line_id, price_cents FROM r WHERE rnk <= 3
        |ORDER BY l_suppkey, rnk""".stripMargin,
    "q_bucketed_join" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "q_file_roundtrip" ->
      """WITH n AS (
        |  SELECT n_nationkey, n_name, n_regionkey,
        |    n_name || ', ' || CAST(n_regionkey AS VARCHAR) AS n_comment
        |  FROM nation)
        |SELECT src, n_nationkey, n_name, n_regionkey, n_comment FROM (
        |  SELECT 'csv' AS src, * FROM n
        |  UNION ALL
        |  SELECT 'json' AS src, * FROM n)
        |ORDER BY src, n_nationkey""".stripMargin,
    "q_compaction" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    "q_orc_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    // the BATCH filter: every window within the distance bound — the
    // streamed emission must reproduce it exactly
    "stream_ts_match" ->
      """WITH e AS (SELECT user_id, ts, event_id,
        |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |ser AS (SELECT user_id, list(cents ORDER BY ts, event_id) AS vals FROM e GROUP BY user_id),
        |pat AS (SELECT vals[1:8] AS q FROM ser WHERE user_id = 1),
        |win AS (SELECT user_id AS k, UNNEST(generate_series(0, len(vals) - 8)) AS idx,
        |          UNNEST(list_transform(generate_series(1, len(vals) - 7), i -> vals[i:i+7])) AS win
        |        FROM ser WHERE len(vals) >= 8),
        |d AS (SELECT w.k, CAST(w.idx AS BIGINT) AS idx,
        |        CAST(list_sum(list_transform(generate_series(1, 8),
        |          j -> (w.win[j]*8 - list_sum(w.win) - p.q[j]*8 + list_sum(p.q))
        |             * (w.win[j]*8 - list_sum(w.win) - p.q[j]*8 + list_sum(p.q)))) AS BIGINT) AS dist
        |      FROM win w, pat p)
        |SELECT CAST(k AS BIGINT) AS k, idx, dist FROM d
        |WHERE dist <= 20000000000 ORDER BY k, idx""".stripMargin,
    // same sketch (paa*segsum - total, biased >> 14), bucket join,
    // cap, exact distances, total-order rank
    "ts_motif_pairs" ->
      """WITH e AS (SELECT user_id, ts, event_id,
        |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |ser AS (SELECT user_id, list(cents ORDER BY ts, event_id) AS vals FROM e GROUP BY user_id),
        |win AS (SELECT user_id AS k, UNNEST(generate_series(0, len(vals) - 8)) AS idx,
        |          UNNEST(list_transform(generate_series(1, len(vals) - 7), i -> vals[i:i+7])) AS win
        |        FROM ser WHERE len(vals) >= 8),
        |sk AS (SELECT k, idx, win,
        |        list_aggregate(list_transform(generate_series(0, 3),
        |          i -> CAST(((list_sum(win[i*2+1 : i*2+2]) * 4 - list_sum(win)
        |                 + (CAST(1 AS BIGINT) << 40)) >> 12) AS VARCHAR)), 'string_agg', ',') AS b
        |       FROM win),
        |hb AS (SELECT b FROM sk GROUP BY b HAVING count(*) <= 10000),
        |sk2 AS (SELECT sk.* FROM sk JOIN hb USING (b)),
        |c AS (SELECT l.k AS k1, CAST(l.idx AS BIGINT) AS i1, r.k AS k2, CAST(r.idx AS BIGINT) AS i2,
        |        CAST(list_sum(list_transform(generate_series(1, 8),
        |          j -> (l.win[j]*8 - list_sum(l.win) - r.win[j]*8 + list_sum(r.win))
        |             * (l.win[j]*8 - list_sum(l.win) - r.win[j]*8 + list_sum(r.win)))) AS BIGINT) AS dist
        |      FROM sk2 l JOIN sk2 r USING (b)
        |      WHERE l.k < r.k OR (l.k = r.k AND l.idx + 8 <= r.idx)),
        |r AS (SELECT *, row_number() OVER (ORDER BY dist, k1, i1, k2, i2) AS rank FROM c)
        |SELECT CAST(rank AS BIGINT) AS rank, CAST(k1 AS BIGINT) AS k1, i1,
        |  CAST(k2 AS BIGINT) AS k2, i2, dist
        |FROM r WHERE rank <= 15 ORDER BY rank""".stripMargin,
    // same series assembly (ts, event_id order), window explode, and
    // scaled mean-centered SSD in exact integers
    "ts_motif" ->
      """WITH e AS (SELECT user_id, ts, event_id,
        |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |ser AS (SELECT user_id, list(cents ORDER BY ts, event_id) AS vals
        |        FROM e GROUP BY user_id),
        |pat AS (SELECT vals[1:8] AS q FROM ser WHERE user_id = 1),
        |win AS (SELECT user_id, UNNEST(generate_series(0, len(vals) - 8)) AS idx,
        |          UNNEST(list_transform(generate_series(1, len(vals) - 7), i -> vals[i:i+7])) AS win
        |        FROM ser WHERE len(vals) >= 8),
        |d AS (SELECT w.user_id AS k, CAST(w.idx AS BIGINT) AS idx,
        |        CAST(list_sum(list_transform(generate_series(1, 8),
        |          j -> (w.win[j]*8 - list_sum(w.win) - p.q[j]*8 + list_sum(p.q))
        |             * (w.win[j]*8 - list_sum(w.win) - p.q[j]*8 + list_sum(p.q)))) AS BIGINT) AS dist
        |      FROM win w, pat p
        |      WHERE NOT (w.user_id = 1 AND w.idx = 0)),
        |r AS (SELECT k, idx, dist, row_number() OVER (ORDER BY dist, k, idx) AS rank FROM d)
        |SELECT CAST(rank AS BIGINT) AS rank, CAST(k AS BIGINT) AS k, idx, dist
        |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,
    "q_pivot" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
        |  CAST(COALESCE(sum(CASE WHEN event_type = 'click' THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS click,
        |  CAST(COALESCE(sum(CASE WHEN event_type = 'error' THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS error,
        |  CAST(COALESCE(sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS purchase,
        |  CAST(COALESCE(sum(CASE WHEN event_type = 'signup' THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS signup,
        |  CAST(COALESCE(sum(CASE WHEN event_type = 'view' THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS view
        |FROM events GROUP BY user_id % 10 ORDER BY cohort""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the plain join: the bloom filter only prunes, never changes
    // the result
    "q_bloom_join" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    // the classic xy->d Hilbert walk: from the top bit down, pick the
    // quadrant, add its cell count, rotate the frame — one recursion
    // level per bit
    "layout_hilbert" ->
      """WITH RECURSIVE pts AS (
        |  SELECT l_orderkey, l_linenumber,
        |    least(greatest(l_partkey, 0), 65535) AS x0,
        |    least(greatest(l_suppkey, 0), 65535) AS y0
        |  FROM lineitem),
        |h(l_orderkey, l_linenumber, s, x, y, d) AS (
        |  SELECT l_orderkey, l_linenumber, CAST(1 AS BIGINT) << 15, x0, y0, CAST(0 AS BIGINT) FROM pts
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, s >> 1,
        |    CASE WHEN (y & s) > 0 THEN x
        |         WHEN (x & s) > 0 THEN s - 1 - y ELSE y END,
        |    CASE WHEN (y & s) > 0 THEN y
        |         WHEN (x & s) > 0 THEN s - 1 - x ELSE x END,
        |    d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
        |                    CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END)
        |  FROM h WHERE s > 0)
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, d AS hval
        |FROM h WHERE s = 0 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // same 16-bit clamp-quantize + bit-interleave arithmetic
    "layout_zorder" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(list_reduce(list_transform(generate_series(0, 15),
        |    b -> (((least(greatest(l_partkey, 0), 65535) >> b) & 1) << (2*b))
        |       + (((least(greatest(l_suppkey, 0), 65535) >> b) & 1) << (2*b+1))),
        |    (a, c) -> a + c) AS BIGINT) AS zval
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
