package graft.evaluation

import graft.tables.Tables
import graft.tgraph._
import graft.tgraph.backed.Transfers
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The bank use case — the reference's `evaluation/BankUseCase.java`
  * (transfers → withdrawal+deposit movements → `balances` state →
  * close) plus `evaluation/ConsistencyCheck.java` (money conservation).
  *
  * Invariants (per-branch `StateFunction.invariant` analogs, declared as
  * Columns so votes stay in codegen):
  *  - withdrawal branch aborts when amount > 150 (insufficient-funds
  *    analog of the reference's non-negative-balance invariant, made
  *    stateless so the DuckDB oracle is expressible);
  *  - deposit branch aborts when the destination is the frozen account.
  * A transaction commits iff every branch votes COMMIT (2PC reduce).
  */
object Bank {
  val NameSpace = "balances"
  val FrozenAccount = 13L
  val MaxAmountCents = 15000L

  /** The pipeline's abort condition on a movement row. */
  private def abortIf =
    (col("kind") === "W" && col("delta_cents") < -MaxAmountCents) ||
      (col("kind") === "D" && col("acct") === FrozenAccount)

  final case class Graph(
      env: TransactionEnvironment,
      transfers: DataFrame,
      movements: TStream,
      state: StateStream,
      result: TGraphResult)

  private val memo = GraphMemo[Graph]()

  /** Build the full transactional graph over `events` at `dir`.
    *
    * Memoized per (session, dir) — weakly on the session, see
    * [[GraphMemo]] — with the two small shared intermediates persisted:
    * the final vote table (commit metadata, one row per transaction) and
    * the update log. Every query over the graph reuses them instead of
    * re-reducing votes; the analog of the reference keeping commit state
    * resident in its state servers.
    */
  /** Build the transactional graph over an arbitrary transfers
    * DataFrame (tid, ts, from_acct, to_acct, amount) — the un-memoized
    * core of [[graph]], also driven directly by the synthetic-scale
    * probes (isolation sweep etc.).
    */
  def graphFromTransfers(
      transfers: DataFrame,
      isolation: IsolationLevel = IsolationLevel.PL3): Graph = {
    val env = TransactionEnvironment(isolation = isolation)
    val opened = env.open(transfers, col("tid"))
    val movements = opened.flatMap(Transfers.movements)
    val state = movements
      .keyBy(col("acct"))
      .state(NameSpace, col("acct"), col("delta_cents"), abortIf, Seq("ts"))
    val result = env.close(state)
    state.updates.persist()
    result.finalVotes.persist()
    Graph(env, transfers, movements, state, result)
  }

  /** Release a [[graphFromTransfers]] graph's persisted intermediates. */
  def release(g: Graph): Unit = {
    g.state.updates.unpersist()
    g.result.finalVotes.unpersist()
  }

  def graph(
      spark: SparkSession,
      dir: String,
      isolation: IsolationLevel = IsolationLevel.PL3): Graph = {
    def build: Graph =
      graphFromTransfers(
        Transfers.fromEvents(Tables.load(spark, dir, "events")), isolation)
    if (isolation == IsolationLevel.PL3)
      memo.getOrElseUpdate(spark, dir, build, release)
    else build
  }

  /** Drop + unpersist every graph cached for `spark`. */
  def invalidate(spark: SparkSession): Unit = memo.invalidate(spark)

  /** Account balances at the given isolation level, in exact cents. */
  def balances(g: Graph, isolation: IsolationLevel): DataFrame =
    g.result.balances(NameSpace, isolation)
      .select(
        col("key").as("acct"),
        col("value").as("balance_cents"),
        col("n_updates"))

  /** The reference's true sequential invariant
    * (`evaluation/BankUseCase.java` Balances: start at 100, reject
    * updates driving the balance negative — commit of tx N depends on
    * the state left by tx 1..N-1). Runs on the typed executor
    * ([[graft.tgraph.state.StateOperator.runBatch]]); the DuckDB
    * oracle replays the identical serial schedule with a recursive
    * CTE.
    */
  final case class AcctDelta(acct: Long, tid: Long, delta: Long)

  final class CentsBalances(start: Long)
      extends graft.tgraph.state.StateFunction[AcctDelta, Long] {
    def defaultValue: Long = start
    def copyValue(v: Long): Long = v
    def invariant(v: Long): Boolean = v >= 0
    def apply(d: AcctDelta, h: graft.tgraph.state.ObjectHandler[Long]): Unit =
      h.write(h.read() + d.delta)
  }

  val StartCents = 10000L

  /** The per-key serial fold at the given isolation level. PL3 is the
    * serializable history (invariant reads the running value); PL1
    * validates on the stale open-snapshot read — the lost-update
    * anomaly read-committed admits — so its output provably differs
    * from PL3 on the same input (the PL1-vs-PL3 boundary).
    */
  /** The per-account signed-cents deltas of the events table — the
    * sequential-invariant workload shared by the batch executor, the
    * online pipeline and the isolation-boundary queries.
    */
  def acctDeltas(spark: SparkSession, dir: String): Dataset[AcctDelta] = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .select(
        col("user_id").cast("bigint").as("acct"),
        col("event_id").as("tid"),
        when(col("event_type").isin("purchase", "error"),
          -graft.tgraph.backed.Transfers.cents(col("value")))
          .otherwise(graft.tgraph.backed.Transfers.cents(col("value"))).as("delta"))
      .as[AcctDelta]
  }

  /** key/tid/value/committed transition history → the per-account
    * summary the sequential queries return (final balance, commit
    * counts). Shared by the batch and streaming spellings so both are
    * checked against the identical recursive-CTE oracle.
    */
  def sequentialSummary(history: DataFrame): DataFrame =
    history
      .groupBy(col("key").as("acct"))
      .agg(
        max_by(col("value"), col("tid")).as("balance_cents"),
        sum(when(col("committed"), 1L).otherwise(0L)).as("n_committed"),
        count(lit(1)).as("n_events"))
      .select(col("acct"), col("balance_cents"), col("n_committed"), col("n_events"))

  def sequentialBalances(
      spark: SparkSession,
      dir: String,
      isolation: IsolationLevel = IsolationLevel.PL3): DataFrame = {
    import spark.implicits._
    sequentialSummary(
      graft.tgraph.state.StateOperator
        .runBatch[AcctDelta, Long, Long](
          acctDeltas(spark, dir), _.acct, _.tid,
          new CentsBalances(StartCents), isolation = isolation)
        .toDF())
  }

  /** ConsistencyCheck: committed money must be conserved (net 0). */
  def consistencyCheck(g: Graph): DataFrame = {
    val votes = g.result.voteNames
    val counts = votes.agg(
      count(lit(1)).as("n_tx"),
      sum(when(col("vote") === "COMMIT", 1L).otherwise(0L)).as("n_commit"),
      sum(when(col("vote") =!= "COMMIT", 1L).otherwise(0L)).as("n_abort"))
    val net = g.result
      .visibleUpdates(NameSpace, IsolationLevel.PL3)
      .agg(coalesce(sum(col("delta")), lit(0L)).as("net_cents"))
    counts.crossJoin(net)
  }
}
