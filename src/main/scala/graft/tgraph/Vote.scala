package graft.tgraph

/** Transaction votes, mirroring the reference's `tgraph/Vote.java:6`
  * (COMMIT, ABORT, REPLAY; `merge` = worst-of with REPLAY dominating).
  *
  * The reference matrix: REPLAY.merge(x) = REPLAY for every x (a replay
  * verdict sends the whole transaction back through the graph, even when
  * another branch voted ABORT — the abort is re-evaluated after replay);
  * otherwise ABORT dominates COMMIT. That is a total order
  * REPLAY > ABORT > COMMIT, encoded here as REPLAY=0 < ABORT=1 < COMMIT=2
  * so vote reduction is a plain `min` aggregate (map-side combinable,
  * codegen'd).
  *
  * Replay resolution (what the reference's replay loop converges to) is
  * decided AFTER merge, per transaction: deterministic abort conditions
  * re-fire on replay, transient (replay) conditions clear — see
  * [[TransactionEnvironment.close]].
  */
object Vote {
  val Replay = 0
  val Abort = 1
  val Commit = 2

  def name(v: Int): String = v match {
    case Replay => "REPLAY"
    case Abort  => "ABORT"
    case _      => "COMMIT"
  }

  /** Exactly the reference's `Vote.merge` under the min encoding. */
  def merge(a: Int, b: Int): Int = math.min(a, b)
}
