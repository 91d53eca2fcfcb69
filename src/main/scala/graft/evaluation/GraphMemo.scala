package graft.evaluation

import org.apache.spark.sql.SparkSession

/** Per-(session, dir) memo for built transactional graphs.
  *
  * Keyed on the SparkSession itself through a WeakHashMap — when a
  * session becomes unreachable its entries (and their persisted blocks,
  * which die with the session) are dropped, so long-lived processes
  * iterating over many sessions don't accumulate stale graphs, and
  * there's no identityHashCode collision window across GC'd sessions.
  * `invalidate` is the explicit unpersist hook for callers that rebuild
  * data under the same session.
  */
final class GraphMemo[G] private () {
  private val memo =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, (G, G => Unit)]]()

  def getOrElseUpdate(spark: SparkSession, dir: String, build: => G, cleanup: G => Unit): G =
    synchronized {
      val per = Option(memo.get(spark)).getOrElse {
        val m = scala.collection.mutable.Map.empty[String, (G, G => Unit)]
        memo.put(spark, m)
        m
      }
      per.getOrElseUpdate(dir, (build, cleanup))._1
    }

  /** Unpersist and drop every graph cached for `spark`. */
  def invalidate(spark: SparkSession): Unit = synchronized {
    Option(memo.remove(spark)).foreach(_.values.foreach { case (g, clean) => clean(g) })
  }
}

object GraphMemo {
  def apply[G](): GraphMemo[G] = new GraphMemo[G]
}
