package graft.queries

import graft.evaluation.Purchases
import graft.tgraph.IsolationLevel
import graft.tgraph.query.StateQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness queries for the multi-namespace transactional graph —
  * the reference's `evaluation/BuyProducts.java` / `Mixed.java` shape:
  * one transaction, two state operators, one joint 2PC decision.
  */
object PurchaseQueries {

  private def g(s: SparkSession, dir: String) = Purchases.graph(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Both namespaces' committed state under the JOINT vote.
    "t_multi_ns_commit" -> ((s, dir) =>
      Purchases.committedState(g(s, dir)).orderBy("namespace", "key")),
    // Engine-derived proof that namespace A's abort kills namespace B's
    // update (and vice versa).
    "t_multi_ns_abort_coupling" -> ((s, dir) =>
      Purchases.abortCoupling(g(s, dir))),
    // The SAME multi-namespace pipeline ONLINE: both namespace queries
    // run as live streaming jobs over staged micro-batch files (no row
    // through the driver), agreeing on every transaction via the
    // deterministic joint vote; the per-namespace final state must
    // equal the batch close (t_multi_ns_commit's identical oracle).
    "t_streaming_purchases" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("purch-online")
      val purchases = Purchases.fromEvents(
        graft.tables.Tables.load(s, dir, "events"))
      val (bal, inv) = graft.streaming.StreamingPurchases
        .runFromFiles(s, purchases, nBatches = 4, scratch)
      def summarize(df: DataFrame, ns: String) =
        df.groupBy(col("key"))
          .agg(max_by(col("value"), col("tid")).as("value"),
            count(lit(1)).as("n_updates"))
          .select(lit(ns).as("namespace"), col("key"), col("value"), col("n_updates"))
      summarize(bal, "balances").unionAll(summarize(inv, "inventory"))
        .orderBy("namespace", "key")
    }),
    // BOTH namespaces served LIVE from one endpoint (reference
    // MultiStateQuery at the serving tier): the two streaming queries
    // drain off staged files, then a MultiQueryServer fronts BOTH
    // checkpoints' state stores and a wire client walks each namespace
    // with namespace-tagged cursor-paged PRED requests — every page
    // pinned to one committed epoch of its namespace. The final served
    // state per namespace must equal the batch close (the
    // t_query_multistate oracle verbatim).
    "t_query_server_multi" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("purch-multi")
      val purchases = Purchases.fromEvents(
        graft.tables.Tables.load(s, dir, "events"))
      graft.streaming.StreamingPurchases.runFromFiles(
        s, purchases, nBatches = 4, scratch)
      val srv = new graft.tgraph.query.MultiQueryServer(Map(
        "balances" -> new graft.tgraph.query.QueryServer(
          s, s"$scratch/ckpt-balances", refreshMillis = 25),
        "inventory" -> new graft.tgraph.query.QueryServer(
          s, s"$scratch/ckpt-inventory", refreshMillis = 25)))
      try {
        val deadline = System.nanoTime() + 30L * 1_000_000_000L
        while ((srv.servedBatchId("balances") < 0
            || srv.servedBatchId("inventory") < 0)
            && System.nanoTime() < deadline) Thread.sleep(25)
        require(srv.servedBatchId("balances") >= 0
          && srv.servedBatchId("inventory") >= 0,
          "multi query server never pinned both namespaces")
        val client = new graft.tgraph.query.QueryClient("localhost", srv.boundPort)
        val RowRe = """\[(-?\d+),(-?\d+)\]""".r
        def walk(ns: String): Seq[(String, Long, Long)] = {
          val out = Seq.newBuilder[(String, Long, Long)]
          var cursor = Long.MinValue
          var done = false
          while (!done) {
            val resp = client.request(
              s"NS $ns PRED GE ${Long.MinValue} AFTER $cursor")
            require(!resp.contains("\"error\""), s"server error: $resp")
            val rows = RowRe.findAllMatchIn(resp)
              .map(m => (ns, m.group(1).toLong, m.group(2).toLong)).toSeq
            out ++= rows
            if (resp.contains("\"truncated\":true")) cursor = rows.map(_._2).max
            else done = true
          }
          out.result()
        }
        val rows = try walk("balances") ++ walk("inventory") finally client.close()
        import s.implicits._
        rows.toDF("namespace", "key", "value").orderBy("namespace", "key")
      } finally srv.close()
    }),
    // The multi-state query over TWO REAL transactional state streams
    // (reference `tgraph/query/MultiStateQuery.java`).
    "t_query_multistate" -> ((s, dir) => {
      val graph = g(s, dir)
      StateQueries.multiStateQuery(Map(
        Purchases.BalancesNs ->
          graph.result.balances(Purchases.BalancesNs, IsolationLevel.PL3),
        Purchases.InventoryNs ->
          graph.result.balances(Purchases.InventoryNs, IsolationLevel.PL3)))
        .orderBy("namespace", "key")
    })
  )

  /** Shared oracle prefix: events → purchases → per-namespace abort
    * flags → joint commit decision (mirrors Purchases.graph exactly).
    */
  private val OraclePrefix: String =
    """WITH p AS (
      |  SELECT event_id AS tid, ts, CAST(user_id AS BIGINT) AS customer,
      |         CAST(CAST(regexp_extract(props, '([0-9]+)', 1) AS INTEGER) % 50 AS BIGINT) AS product,
      |         CAST(round(value*100) AS BIGINT) AS price_cents
      |  FROM events),
      |v AS (
      |  SELECT *, (price_cents > 12000) AS bal_abort, (product = 7) AS inv_abort,
      |         (price_cents <= 12000 AND product <> 7) AS committed
      |  FROM p)
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    "t_multi_ns_commit" -> (OraclePrefix +
      """SELECT * FROM (
        |  SELECT 'balances' AS namespace, customer AS key,
        |    CAST(sum(-price_cents) AS BIGINT) AS value, count(*) AS n_updates
        |  FROM v WHERE committed GROUP BY customer
        |  UNION ALL
        |  SELECT 'inventory' AS namespace, product AS key,
        |    CAST(sum(-1) AS BIGINT) AS value, count(*) AS n_updates
        |  FROM v WHERE committed GROUP BY product)
        |ORDER BY namespace, key""".stripMargin),
    "t_multi_ns_abort_coupling" -> (OraclePrefix +
      """SELECT count(*) AS n_tx,
        |  CAST(sum(CASE WHEN committed THEN 1 ELSE 0 END) AS BIGINT) AS n_commit,
        |  CAST(sum(CASE WHEN bal_abort AND NOT inv_abort THEN 1 ELSE 0 END) AS BIGINT) AS n_abort_bal_only,
        |  CAST(sum(CASE WHEN inv_abort AND NOT bal_abort THEN 1 ELSE 0 END) AS BIGINT) AS n_abort_inv_only,
        |  CAST(sum(CASE WHEN bal_abort AND inv_abort THEN 1 ELSE 0 END) AS BIGINT) AS n_abort_both,
        |  CAST(sum(CASE WHEN NOT inv_abort AND NOT committed THEN 1 ELSE 0 END) AS BIGINT) AS inv_units_saved_by_bal_abort,
        |  CAST(sum(CASE WHEN NOT bal_abort AND NOT committed THEN price_cents ELSE 0 END) AS BIGINT) AS bal_cents_saved_by_inv_abort
        |FROM v""".stripMargin),
    "t_streaming_purchases" -> (OraclePrefix +
      """SELECT * FROM (
        |  SELECT 'balances' AS namespace, customer AS key,
        |    CAST(sum(-price_cents) AS BIGINT) AS value, count(*) AS n_updates
        |  FROM v WHERE committed GROUP BY customer
        |  UNION ALL
        |  SELECT 'inventory' AS namespace, product AS key,
        |    CAST(sum(-1) AS BIGINT) AS value, count(*) AS n_updates
        |  FROM v WHERE committed GROUP BY product)
        |ORDER BY namespace, key""".stripMargin),
    "t_query_multistate" -> (OraclePrefix +
      """SELECT * FROM (
        |  SELECT 'balances' AS namespace, customer AS key,
        |    CAST(sum(-price_cents) AS BIGINT) AS value
        |  FROM v WHERE committed GROUP BY customer
        |  UNION ALL
        |  SELECT 'inventory' AS namespace, product AS key,
        |    CAST(sum(-1) AS BIGINT) AS value
        |  FROM v WHERE committed GROUP BY product)
        |ORDER BY namespace, key""".stripMargin),
    // the wire-served multi-namespace state replays as the same batch
    // close — the t_query_multistate oracle VERBATIM
    "t_query_server_multi" -> (OraclePrefix +
      """SELECT * FROM (
        |  SELECT 'balances' AS namespace, customer AS key,
        |    CAST(sum(-price_cents) AS BIGINT) AS value
        |  FROM v WHERE committed GROUP BY customer
        |  UNION ALL
        |  SELECT 'inventory' AS namespace, product AS key,
        |    CAST(sum(-1) AS BIGINT) AS value
        |  FROM v WHERE committed GROUP BY product)
        |ORDER BY namespace, key""".stripMargin)
  )
}
