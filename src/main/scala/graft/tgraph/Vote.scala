package graft.tgraph

/** Transaction votes, mirroring the reference's `tgraph/Vote.java:6`
  * (COMMIT, ABORT, REPLAY; `merge` = worst-of).
  *
  * Encoded as ints so vote reduction is a plain `min` aggregate
  * (map-side combinable, codegen'd): ABORT=0 < REPLAY=1 < COMMIT=2.
  * `Vote.merge(a,b)` in the reference returns REPLAY if either is REPLAY
  * unless the other is ABORT, i.e. exactly `min` under this encoding.
  */
object Vote {
  val Abort = 0
  val Replay = 1
  val Commit = 2

  def name(v: Int): String = v match {
    case Abort  => "ABORT"
    case Replay => "REPLAY"
    case _      => "COMMIT"
  }

  def merge(a: Int, b: Int): Int = math.min(a, b)
}
