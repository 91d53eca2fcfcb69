package graft.tgraph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Output of [[TStream.state]] — the analog of the reference's
  * `tgraph/state/StateStream.java` (updates + votes flowing toward the
  * close operator).
  *
  * `updates` schema:
  * `(__tid, __branch, key, delta, __branch_vote, <order cols...>)`.
  */
final class StateStream private[tgraph] (
    val env: TransactionEnvironment,
    val nameSpace: String,
    val updates: DataFrame,
    val orderCols: Seq[String]) {

  import TStream._

  /** Per-branch votes for this state operator — the reference's
    * `StateOperator` voting on its own invariant before the vote
    * reduction (`twopc/ReduceVotesFunction.java`).
    */
  def branchVotes: DataFrame =
    updates.select(col(TidCol), col("__branch_vote").as(VoteCol))

  /** Updates joined with the graph-wide final votes (tid → vote). */
  private[tgraph] def withFinalVotes(finalVotes: DataFrame): DataFrame =
    updates.join(finalVotes, TidCol)

  /** Updates visible at the given isolation level, given final votes.
    * PL0 sees every write (dirty reads); PL1+ sees committed only.
    */
  private[tgraph] def visible(finalVotes: DataFrame, isolation: IsolationLevel): DataFrame = {
    val joined = withFinalVotes(finalVotes)
    if (isolation.readsUncommitted) joined
    else joined.filter(col(VoteCol) === Vote.Commit)
  }

  /** Version chain per key — the analog of the reference's versioned
    * object store (`tgraph/db/Object.java`, `ObjectVersion.java`):
    * version = position in the per-key serial order, value = running
    * fold of committed deltas. One shuffle (on `key`), window fold is
    * codegen'd.
    */
  private[tgraph] def versionChain(finalVotes: DataFrame, isolation: IsolationLevel): DataFrame = {
    val vis = visible(finalVotes, isolation)
    val order = (orderCols.map(col) :+ col(TidCol) :+ col(BranchCol))
    val w = Window.partitionBy(col("key")).orderBy(order: _*)
    vis
      .withColumn("version", row_number().over(w))
      .withColumn("value", sum(col("delta")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
