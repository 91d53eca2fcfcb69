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

  test("online WAL: micro-batch appends keep a dense lsn and survive restart") {
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("graft-online-wal").toString
    // two input files -> maxFilesPerTrigger=1 forces >= 2 micro-batches
    Seq((1L, 10L, 20L, 50.0), (2L, 11L, 21L, 60.0))
      .toDF("tid", "from_acct", "to_acct", "amount").write.json(s"$tmp/in1")
    Seq((3L, 12L, 22L, 70.0), (4L, 13L, 23L, 80.0))
      .toDF("tid", "from_acct", "to_acct", "amount")
      .write.mode("append").json(s"$tmp/in1")
    val schema = StructType(Seq(
      StructField("tid", LongType), StructField("from_acct", LongType),
      StructField("to_acct", LongType), StructField("amount", DoubleType)))
    def movesOf(transfers: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamingBank.committedMovements(spark, transfers).toDF()
        .select(col("tid").as(TStream.TidCol),
          when(col("delta") < 0, 0L).otherwise(1L).as(TStream.BranchCol),
          col("acct").as("key"), col("delta"))
    val stream = graft.sources.FileIO.streamJsonLines(
      spark, s"$tmp/in1", schema, maxFilesPerTrigger = 1)
    val q = Wal.streamingSink(movesOf(stream), s"$tmp/wal", s"$tmp/ckpt").start()
    q.awaitTermination(120000)
    assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))

    val online = Wal.readOnline(spark, s"$tmp/wal")
      .select("lsn", "tid", "branch", "key", "delta")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // dense 1..N lsn across micro-batches
    assert(online.map(_._1).toSeq == (1L to online.length).toSeq)
    assert(online.length == 8) // 4 committed transfers x 2 movements
    // same entry set the batch path would produce from the same input
    val batch = movesOf(spark.read.schema(schema).json(s"$tmp/in1"))
      .select(col(TStream.TidCol), col(TStream.BranchCol), col("key"), col("delta"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(online.map(e => (e._2, e._3, e._4, e._5)).toSet == batch)
    // restart with no new input: checkpoint + idempotent batch dirs
    val q2 = Wal.streamingSink(movesOf(stream), s"$tmp/wal", s"$tmp/ckpt").start()
    q2.awaitTermination(120000)
    assert(Wal.readOnline(spark, s"$tmp/wal").count() == 8)

    // compaction: snapshot written first, fully-covered batch dirs
    // dropped, recovery from disk still equals the full fold
    val full = Wal.readOnline(spark, s"$tmp/wal")
      .groupBy(col("key")).agg(sum(col("delta")).as("value"))
      .as[(Long, Long)].collect().toMap
    val dropped = Snapshots.compactOnline(
      spark, s"$tmp/wal", upToLsn = 4, s"$tmp/snap")
    assert(dropped.nonEmpty)
    assert(Wal.readOnline(spark, s"$tmp/wal")
      .filter(col("lsn") <= 4).count() == 0) // covered entries gone
    val recovered = Snapshots.recoverOnline(
      spark, Snapshots.read(spark, s"$tmp/snap"), s"$tmp/wal", snapshotLsn = 4)
      .as[(Long, Long)].collect().toMap
    assert(recovered == full)
    // incremental full compaction (chained off the lsn-4 snapshot)
    // empties data/ entirely; the log must still read (as empty) and
    // recovery == the snapshot alone
    Snapshots.compactOnline(spark, s"$tmp/wal", upToLsn = 8, s"$tmp/snap2",
      prevSnapshot = Some((s"$tmp/snap", 4L)))
    assert(Wal.readOnline(spark, s"$tmp/wal").isEmpty)
    val recovered2 = Snapshots.recoverOnline(
      spark, Snapshots.read(spark, s"$tmp/snap2"), s"$tmp/wal", snapshotLsn = 8)
      .as[(Long, Long)].collect().toMap
    assert(recovered2 == full)
  }
}
