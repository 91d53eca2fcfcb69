package graft.tgraph

import graft.SparkSpec
import graft.evaluation.Bank
import graft.tgraph.durability.{Snapshots, Wal}
import org.apache.spark.sql.functions._

import java.nio.file.Files

class DurabilitySpec extends SparkSpec {
  import spark.implicits._

  test("recovery from persisted snapshot + WAL tail equals direct balances") {
    val tmp = Files.createTempDirectory("graft-durability").toString
    val g = Bank.graph(spark, Sf0001)
    val wm = lit("2024-01-08 00:00:00").cast("timestamp")

    // persist a snapshot at the watermark and the full WAL ("crash")
    Snapshots.write(
      Snapshots.take(g.result, Bank.NameSpace, col("ts"), wm), s"$tmp/snapshot")
    Wal.write(g.result, Bank.NameSpace, s"$tmp/wal")

    // "recover": fold the snapshot with the WAL entries after the watermark
    val snap = Snapshots.read(spark, s"$tmp/snapshot")
    val walTailAgg = Snapshots.tail(g.result, Bank.NameSpace, col("ts"), wm)
    val recovered = Snapshots.recover(snap, walTailAgg)
      .select(col("key"), col("value")).as[(Long, Long)].collect().toMap

    val direct = Bank.balances(g, IsolationLevel.PL3)
      .select("acct", "balance_cents").as[(Long, Long)].collect().toMap
    assert(recovered == direct)

    // the persisted WAL alone also replays to the same state
    val fromWal = Wal.read(spark, s"$tmp/wal")
      .groupBy(col("key")).agg(sum(col("delta")).as("value"))
      .as[(Long, Long)].collect().toMap
    assert(fromWal == direct)

    // WAL lsn is a dense total order
    val lsns = Wal.read(spark, s"$tmp/wal").select("lsn").as[Long].collect().sorted
    assert(lsns.toSeq == (1L to lsns.length).toSeq)

    // a second write CONTINUES the sequence (append-only total order
    // across writes, not just within one)
    Wal.write(g.result, Bank.NameSpace, s"$tmp/wal")
    val lsns2 = Wal.read(spark, s"$tmp/wal").select("lsn").as[Long].collect().sorted
    assert(lsns2.toSeq == (1L to 2L * lsns.length).toSeq)
  }

  test("WAL lsn matches the global (tid, branch) row_number with no global window") {
    val g = Bank.graph(spark, Sf0001)
    val entries = Wal.entries(g.result, Bank.NameSpace)

    // scale check: the plan that PRODUCES the numbering must not funnel
    // through a single partition (range exchange + per-partition sort
    // only; the dense number comes from two-pass zipWithIndex)
    val plan = g.result.visibleUpdates(Bank.NameSpace, IsolationLevel.PL3)
      .repartitionByRange(col(TStream.TidCol), col(TStream.BranchCol))
      .sortWithinPartitions(col(TStream.TidCol), col(TStream.BranchCol))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)

    // bit-identical to the window formula
    val viaZip = entries.select("lsn", "tid", "branch").as[(Long, Long, Int)]
      .collect().sortBy(_._1)
    val expected = viaZip.map { case (_, tid, br) => (tid, br) }.sorted
      .zipWithIndex.map { case ((tid, br), i) => (i + 1L, tid, br) }
    assert(viaZip.toSeq == expected.toSeq)
  }
}
