package graft.tgraph.backed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bank-transfer workload derived deterministically from the `events`
  * table — the analog of the reference's `tgraph/backed/Transfer.java:26`
  * and `TransferSource.java` (random two-account transfers). Instead of a
  * random generator we map each event to a transfer so the DuckDB oracle
  * can reproduce the exact same workload:
  * tid = event_id, from = user_id, to = k mod 20 (k parsed from the
  * props JSON), amount = value.
  */
object Transfers {
  /** Number of "hot" destination accounts (k mod NumToAccounts). */
  val NumToAccounts = 20

  /** Exact int64 cents — all money math in graft is integer cents so
    * aggregation is bit-exact regardless of partitioning/order (a double
    * sum is order-dependent; an int64 sum is not).
    */
  def cents(c: Column): Column = round(c * lit(100)).cast("bigint")

  /** events → transfers (tid, ts, from_acct, to_acct, amount). */
  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("tid"),
      col("ts"),
      col("user_id").cast("bigint").as("from_acct"),
      (regexp_extract(col("props"), "([0-9]+)", 1).cast("int") % NumToAccounts)
        .cast("bigint").as("to_acct"),
      col("value").as("amount"))

  /** A transfer's two movements (the reference's `Transfer.getDeposit` /
    * `getWithdrawal` → `Movement`): branch 0 = withdrawal (−amount from
    * `from_acct`), branch 1 = deposit (+amount to `to_acct`).
    * Shaped as an array<struct> for [[graft.tgraph.TStream.flatMap]].
    */
  def movements: Column = array(
    struct(
      col("ts"),
      col("from_acct").as("acct"),
      (-cents(col("amount"))).as("delta_cents"),
      lit("W").as("kind")),
    struct(
      col("ts"),
      col("to_acct").as("acct"),
      cents(col("amount")).as("delta_cents"),
      lit("D").as("kind")))
}
