package graft.tgraph

import org.scalatest.funsuite.AnyFunSuite

/** Parity with the reference's `tgraph/Vote.java:6` merge matrix:
  * REPLAY wins over everything (`this == REPLAY -> REPLAY`, and
  * `x.merge(REPLAY) -> REPLAY` since REPLAY is not COMMIT), ABORT wins
  * over COMMIT. Replay resolution happens after the merge, at close.
  */
class VoteSpec extends AnyFunSuite {
  import Vote._

  test("merge matrix matches the reference") {
    // reference: this==REPLAY -> REPLAY; other COMMIT -> this; else other
    assert(merge(Commit, Commit) == Commit)
    assert(merge(Commit, Replay) == Replay)
    assert(merge(Replay, Commit) == Replay)
    assert(merge(Replay, Abort) == Replay)
    assert(merge(Abort, Replay) == Replay)
    assert(merge(Abort, Commit) == Abort)
    assert(merge(Abort, Abort) == Abort)
    // associative + commutative (what lets it run as a min-aggregate)
    val vs = Seq(Commit, Replay, Abort)
    for (a <- vs; b <- vs) assert(merge(a, b) == merge(b, a))
    for (a <- vs; b <- vs; c <- vs)
      assert(merge(merge(a, b), c) == merge(a, merge(b, c)))
  }

  test("isolation level ordering matches IsolationLevel.gte") {
    import IsolationLevel._
    assert(PL4.gte(PL0) && PL3.gte(PL3) && !PL1.gte(PL2))
    assert(values.map(_.ordinal) == Seq(0, 1, 2, 3, 4))
    assert(PL0.readsUncommitted && !PL3.readsUncommitted)
  }
}
