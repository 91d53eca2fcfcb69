package graft.tgraph

import graft.SparkSpec
import graft.tgraph.state.{ObjectHandler, StateChange, StateFunction, StateOperator}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

final case class Movement(acct: String, tid: Long, delta: Double)

/** The reference's `Balances` StateFunction (BankUseCase): start at 100,
  * reject updates that would drive the balance negative — a SEQUENTIAL
  * invariant (whether tx N commits depends on tx 1..N-1).
  */
class BalancesFn extends StateFunction[Movement, Double] {
  val start = 100.0
  def defaultValue: Double = start
  def copyValue(v: Double): Double = v
  def invariant(v: Double): Boolean = v >= 0
  def apply(m: Movement, h: ObjectHandler[Double]): Unit =
    h.write(h.read() + m.delta)
}

class StateOperatorSpec extends SparkSpec {
  import spark.implicits._

  private val moves = Seq(
    Movement("a", 1, -80.0), // 100 -> 20 commit
    Movement("a", 2, -50.0), // would be -30: ABORT (sequential!)
    Movement("a", 3, 30.0),  // 20 -> 50 commit
    Movement("b", 1, -200.0) // ABORT
  )

  test("batch executor replays per key in tid order with sequential invariants") {
    val out = StateOperator
      .runBatch[Movement, String, Double](
        moves.toDS(), _.acct, _.tid, new BalancesFn)
      .collect().sortBy(c => (c.key, c.tid))
    val a = out.filter(_.key == "a")
    assert(a.map(c => (c.tid, c.committed, c.value)).toSeq ==
      Seq((1L, true, 20.0), (2L, false, 20.0), (3L, true, 50.0)))
    assert(a.map(_.version).toSeq == Seq(1, 1, 2))
    val b = out.filter(_.key == "b")
    assert(b.map(c => (c.committed, c.value)).toSeq == Seq((false, 100.0)))
  }

  test("PL1 validates on the stale open snapshot — the lost-update boundary vs PL3") {
    val pl1 = StateOperator
      .runBatch[Movement, String, Double](
        moves.toDS(), _.acct, _.tid, new BalancesFn,
        isolation = IsolationLevel.PL1)
      .collect().sortBy(c => (c.key, c.tid))
    val a1 = pl1.filter(_.key == "a")
    // tid 2 validates -50 against the SNAPSHOT (100 -> 50 >= 0): it
    // commits under PL1 though PL3 aborted it — and the running balance
    // goes negative (the admitted lost-update anomaly).
    assert(a1.map(c => (c.tid, c.committed, c.value)).toSeq ==
      Seq((1L, true, 20.0), (2L, true, -30.0), (3L, true, 0.0)))
    // PL0 skips validation entirely: even b's -200 lands.
    val pl0 = StateOperator
      .runBatch[Movement, String, Double](
        moves.toDS(), _.acct, _.tid, new BalancesFn,
        isolation = IsolationLevel.PL0)
      .collect()
    assert(pl0.filter(_.key == "b").head.value == -100.0)
    // and the boundary is real: PL1 != PL3 on this input
    val pl3 = StateOperator
      .runBatch[Movement, String, Double](moves.toDS(), _.acct, _.tid, new BalancesFn)
      .collect().sortBy(c => (c.key, c.tid))
    assert(pl1.map(_.committed).toSeq != pl3.map(_.committed).toSeq)
  }

  test("streaming executor matches batch across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Movement]
    val result = StateOperator.runStreaming[Movement, String, Double](
      input.toDS(), _.acct, _.tid, new BalancesFn)
    val q = result.writeStream
      .format("memory").queryName("state_changes")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(moves.take(2)) // batch 1: tids 1,2 on a
      q.processAllAvailable()
      input.addData(moves.drop(2)) // batch 2: a/3, b/1
      q.processAllAvailable()
      val streamed = spark.table("state_changes")
        .as[StateChange[String, Double]]
        .collect().sortBy(c => (c.key, c.tid))
      val batch = StateOperator
        .runBatch[Movement, String, Double](moves.toDS(), _.acct, _.tid, new BalancesFn)
        .collect().sortBy(c => (c.key, c.tid))
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }
}
