package graft.tgraph.state

import graft.tgraph.{IsolationLevel, Strategy}
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Reference-parity `StateFunction` — `tgraph/state/StateFunction.java`
  * (defaultValue / copyValue / invariant / apply over an ObjectHandler).
  */
trait StateFunction[T, V] extends Serializable {
  def defaultValue: V
  def copyValue(v: V): V
  /** Must hold after `apply` for the update to commit. */
  def invariant(v: V): Boolean
  def apply(element: T, handler: ObjectHandler[V]): Unit
}

/** `tgraph/db/ObjectHandler.java` analog: read/write access to the
  * current version of a state object during `StateFunction.apply`.
  */
final class ObjectHandler[V](initial: V) {
  private var current: V = initial
  var written: Boolean = false
  def read(): V = current
  def write(v: V): Unit = { current = v; written = true }
  private[state] def value: V = current
}

/** One applied (or rejected) state transition — the analog of
  * `tgraph/db/ObjectVersion.java` (version, createdBy, value).
  */
final case class StateChange[K, V](
    key: K, tid: Long, version: Int, value: V, committed: Boolean)

/** Typed transactional-state executors — the closure-based path for
  * arbitrary `StateFunction`s the declarative Column fold can't express
  * (reference: `tgraph/db/OptimisticTransactionExecutor.java` and
  * `PessimisticTransactionExecutor.java`).
  *
  * Unlike the declarative path, invariants here are SEQUENTIAL: whether
  * transaction N commits depends on the state left by 1..N-1 (e.g. the
  * bank's non-negative-balance rule). Both strategies replay each key's
  * updates in deterministic tid order:
  *  - Pessimistic = per-key serial execution (lock-per-key); the fold
  *    IS the serial schedule.
  *  - Optimistic = timestamp-ordering; conflicting writes replay in tid
  *    order, which converges to the same serial schedule — modeled by
  *    sorting. The strategies differ online (aborts vs waits), not in
  *    the committed history, which is what a deterministic engine
  *    materializes.
  *
  * Scale: one shuffle (groupByKey on the state key); each group is
  * folded on its executor with no driver involvement. Hot keys are the
  * usual skew story — salt upstream or split the namespace.
  */
object StateOperator {

  /** Batch: replay per key in tid order, emitting every transition.
    *
    * The isolation level picks WHAT each transaction's invariant reads
    * (the isolation lattice made operational, not decorative):
    *  - PL0: no validation — every write lands (dirty-write history);
    *  - PL1/PL2: read-committed — the invariant is validated against
    *    the committed SNAPSHOT AT OPEN (stale read), but the write
    *    applies to the running value. Lost-update/write-skew anomalies
    *    are admitted, exactly what read-committed permits;
    *  - PL3/PL4: serializable — the invariant reads the running serial
    *    value (tx N sees the state left by 1..N-1).
    */
  def runBatch[T, K, V](
      ds: Dataset[T],
      key: T => K,
      tid: T => Long,
      sf: StateFunction[T, V],
      strategy: Strategy = Strategy.Pessimistic,
      isolation: IsolationLevel = IsolationLevel.PL3)(implicit
      kEnc: Encoder[K],
      outEnc: Encoder[StateChange[K, V]]): Dataset[StateChange[K, V]] =
    ds.groupByKey(key).flatMapGroups { (k: K, it: Iterator[T]) =>
      val ordered = it.toIndexedSeq.sortBy(tid)
      val snapshot = sf.defaultValue // committed state as of open
      var value = sf.defaultValue
      var version = 0
      ordered.iterator.map { t =>
        val h = new ObjectHandler[V](sf.copyValue(value))
        sf.apply(t, h)
        val valid =
          if (isolation.ordinal == 0) h.written
          else if (isolation.ordinal >= 3) h.written && sf.invariant(h.value)
          else { // PL1/PL2: validate on the stale open-snapshot read
            val stale = new ObjectHandler[V](sf.copyValue(snapshot))
            sf.apply(t, stale)
            h.written && sf.invariant(stale.value)
          }
        if (valid) {
          value = h.value
          version += 1
          StateChange(k, tid(t), version, value, committed = true)
        } else {
          StateChange(k, tid(t), version, value, committed = false)
        }
      }
    }

  /** Structured Streaming: same fold, incremental per micro-batch via
    * flatMapGroupsWithState (the reference's online StateOperator).
    * State = (current value, version); emits one StateChange per input.
    * Within a micro-batch, updates are applied in tid order.
    */
  def runStreaming[T, K, V](
      ds: Dataset[T],
      key: T => K,
      tid: T => Long,
      sf: StateFunction[T, V])(implicit
      kEnc: Encoder[K],
      stateEnc: Encoder[(V, Int)],
      outEnc: Encoder[StateChange[K, V]]): Dataset[StateChange[K, V]] =
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (k: K, it: Iterator[T], state: GroupState[(V, Int)]) =>
        var (value, version) =
          state.getOption.getOrElse((sf.defaultValue, 0))
        val out = it.toIndexedSeq.sortBy(tid).map { t =>
          val h = new ObjectHandler[V](sf.copyValue(value))
          sf.apply(t, h)
          if (h.written && sf.invariant(h.value)) {
            value = h.value
            version += 1
            StateChange(k, tid(t), version, value, committed = true)
          } else {
            StateChange(k, tid(t), version, value, committed = false)
          }
        }
        state.update((value, version))
        out.iterator
    }
}
