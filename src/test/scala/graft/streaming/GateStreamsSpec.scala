package graft.streaming

import graft.SparkSpec
import java.util.concurrent.TimeUnit
import java.util.concurrent.CountDownLatch

/** GateStreams: an externally-issued stopAll must terminate streams
  * started on scoped sessions under the tag — the Verify kill path for
  * budget-abandoned streaming gates (job-group cancel can't reach a
  * cloned session's micro-batch jobs).
  */
class GateStreamsSpec extends SparkSpec {

  test("stopAll stops a tagged scoped session's stream and unblocks awaitTermination") {
    val firstBatch = new CountDownLatch(1)
    @volatile var unblocked = false
    @volatile var failure: Throwable = null
    val gate = new Thread(() =>
      try {
        GateStreams.withTag("spec-gate") {
          val ss = StreamSessions.scoped(spark, statePartitions = 2)
          val stream = ss.readStream.format("rate")
            .option("rowsPerSecond", "5").load()
          val q = stream.writeStream
            .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
              firstBatch.countDown()
            }
            .start()
          try q.awaitTermination() // blocks until stop() from outside
          catch { case _: Throwable => () } // stop may surface as exn
          unblocked = true
        }
      } catch { case t: Throwable => failure = t })
    gate.start()
    assert(firstBatch.await(60, TimeUnit.SECONDS),
      "stream never produced a batch")
    GateStreams.stopAll("spec-gate")
    gate.join(60000)
    assert(failure == null, s"gate thread failed: $failure")
    assert(unblocked, "awaitTermination did not unblock after stopAll")
  }

  test("register without an active tag is a no-op; stopAll on unknown tag is safe") {
    val ss = StreamSessions.scoped(spark, statePartitions = 2) // no tag
    assert(ss.streams.active.isEmpty)
    GateStreams.stopAll("no-such-tag") // must not throw
    GateStreams.clear("no-such-tag")
  }

  test("clear drops the registration so a later stopAll leaves the stream alone") {
    GateStreams.withTag("spec-clear") {
      val ss = StreamSessions.scoped(spark, statePartitions = 2)
      val q = ss.readStream.format("rate")
        .option("rowsPerSecond", "1").load()
        .writeStream
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      GateStreams.clear("spec-clear")
      GateStreams.stopAll("spec-clear")
      assert(q.isActive, "cleared tag must not stop the stream")
      q.stop()
    }
  }
}
