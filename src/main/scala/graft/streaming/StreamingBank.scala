package graft.streaming

import graft.evaluation.Bank
import graft.tgraph.Vote
import graft.tgraph.backed.Transfers
import graft.tgraph.state.{ObjectHandler, StateChange, StateFunction, StateOperator}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The bank transactional graph as a live Structured Streaming job —
  * the online analog of `evaluation/BankUseCase.java` wired through
  * `readStream`-compatible operators.
  *
  * Streaming 2PC shape: both branch invariants of a transfer are
  * functions of the transfer row itself, so the vote is computed
  * STATELESS per row (the vote-reduce collapses into a codegen'd
  * expression — no extra stateful stage); committed transfers then fork
  * into movements and fold into keyed state via
  * `flatMapGroupsWithState` ([[StateOperator.runStreaming]]). One
  * stateless stage + one stateful stage = a shape Structured Streaming
  * supports end-to-end with checkpointed state and exactly-once sinks.
  *
  * (When branch invariants genuinely live on different state operators,
  * the reference's online vote round-trip maps to Spark's
  * multiple-stateful-operator chaining — same API, two stateful
  * stages with watermarks.)
  */
object StreamingBank {

  final case class StreamMovement(acct: Long, tid: Long, delta: Long)

  /** Balance fold over exact cents (non-negative invariant handled
    * upstream by the stateless vote — this fold applies committed
    * movements).
    */
  class CentsBalance extends StateFunction[StreamMovement, Long] {
    def defaultValue: Long = 0L
    def copyValue(v: Long): Long = v
    def invariant(v: Long): Boolean = true
    def apply(m: StreamMovement, h: ObjectHandler[Long]): Unit =
      h.write(h.read() + m.delta)
  }

  /** transfers(stream or batch DF with tid/ts/from_acct/to_acct/amount)
    * → per-movement stream of committed movements. Works identically on
    * a streaming or batch input DataFrame (unified Dataset API).
    */
  def committedMovements(spark: SparkSession, transfers: DataFrame): Dataset[StreamMovement] = {
    import spark.implicits._
    val amountCents = Transfers.cents(col("amount"))
    val vote = when(
      (amountCents > Bank.MaxAmountCents) || (col("to_acct") === Bank.FrozenAccount),
      lit(Vote.Abort)).otherwise(lit(Vote.Commit))
    transfers
      .withColumn("__vote", vote)
      .filter(col("__vote") === Vote.Commit)
      .select(col("tid"), col("from_acct"), col("to_acct"), amountCents.as("cents"))
      .select(explode(array(
        struct(col("from_acct").as("acct"), col("tid"), (-col("cents")).as("delta")),
        struct(col("to_acct").as("acct"), col("tid"), col("cents").as("delta"))))
        .as("m"))
      .select(col("m.acct"), col("m.tid"), col("m.delta"))
      .as[StreamMovement]
  }

  /** The streaming state fold: acct → running balance versions. */
  def balances(spark: SparkSession, transfers: DataFrame): Dataset[StateChange[Long, Long]] = {
    import spark.implicits._
    val moves = committedMovements(spark, transfers)
    if (transfers.isStreaming)
      StateOperator.runStreaming[StreamMovement, Long, Long](
        moves, _.acct, _.tid, new CentsBalance)
    else
      StateOperator.runBatch[StreamMovement, Long, Long](
        moves, _.acct, _.tid, new CentsBalance)
  }
}
