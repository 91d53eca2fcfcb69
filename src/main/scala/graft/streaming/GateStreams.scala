package graft.streaming

import org.apache.spark.sql.SparkSession
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import scala.jdk.CollectionConverters._

/** Registry that makes gate-started streaming queries STOPPABLE from
  * the outside.
  *
  * Why it exists: Verify's watchdog cancels a query's job group, but a
  * streaming gate's micro-batch jobs are submitted by the stream
  * execution thread of a CLONED session ([[StreamSessions.scoped]]),
  * which never inherits the verify thread's job group — so a cancelled
  * or budget-abandoned gate kept draining its stream and could reach
  * its result write long after Verify had moved on (the round-12
  * double-writer window on the published dump).
  *
  * Mechanism: Verify (or any driver) brackets a gate invocation with
  * [[withTag]]; [[StreamSessions.scoped]] registers every session it
  * clones under the tag active on the calling thread (gates build
  * their sessions synchronously on that thread, so an
  * InheritableThreadLocal is sufficient). [[stopAll]] then stops every
  * active streaming query on the tagged sessions — `StreamingQuery
  * .stop()` interrupts the stream execution thread, which surfaces in
  * the gate as a terminated `awaitTermination`/`processAllAvailable`,
  * unblocking the abandoned future so it errors out instead of racing
  * the retry.
  *
  * Registration with no active tag is a no-op, so specs, probes and
  * production callers of `scoped` are untouched.
  */
object GateStreams {

  private val sessions =
    new ConcurrentHashMap[String, ConcurrentLinkedQueue[SparkSession]]()
  private val tag = new InheritableThreadLocal[String]()

  /** Run `body` with gate tag `t` active on this thread (and threads
    * it spawns): sessions cloned inside are registered under `t`.
    */
  def withTag[T](t: String)(body: => T): T = {
    val prev = tag.get()
    tag.set(t)
    try body
    finally tag.set(prev)
  }

  /** Called by [[StreamSessions.scoped]] for every cloned session. */
  private[streaming] def register(ss: SparkSession): Unit = {
    val t = tag.get()
    if (t != null)
      sessions
        .computeIfAbsent(t, _ => new ConcurrentLinkedQueue[SparkSession]())
        .add(ss)
  }

  /** Stop every active streaming query on sessions registered under
    * `t` and drop the registration. Safe to call for an unknown tag,
    * and safe concurrently with the gate itself (stop() is idempotent
    * and exceptions from already-terminated queries are swallowed —
    * this is a kill path, not a result path).
    */
  def stopAll(t: String): Unit =
    Option(sessions.remove(t)).foreach { q =>
      q.asScala.foreach { ss =>
        try ss.streams.active.foreach { sq =>
          try sq.stop()
          catch { case _: Throwable => () }
        } catch { case _: Throwable => () }
      }
    }

  /** Drop the registration without stopping anything (the gate
    * completed normally and owns its own shutdown).
    */
  def clear(t: String): Unit = { sessions.remove(t); () }
}
