package graft.streaming

import graft.SparkSpec
import graft.evaluation.Bank
import graft.tables.Tables
import graft.tgraph.IsolationLevel
import graft.tgraph.backed.Transfers
import graft.metrics.Metrics
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

final case class Tx(tid: Long, from_acct: Long, to_acct: Long, amount: Double)

class StreamingBankSpec extends SparkSpec {
  import spark.implicits._

  test("streaming bank pipeline converges to the batch/declarative balances") {
    implicit val sqlCtx = spark.sqlContext
    val transfers = Transfers.fromEvents(Tables.load(spark, Sf0001, "events"))
      .select(col("tid"), col("from_acct"), col("to_acct"), col("amount"))
      .as[Tx].collect()

    val input = MemoryStream[Tx]
    val stream = StreamingBank.balances(spark, input.toDF())
    val q = stream.writeStream
      .format("memory").queryName("bank_stream")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // feed in three micro-batches to exercise cross-batch state
      transfers.grouped(400).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // last committed version per account = final balance
      val streamed = spark.table("bank_stream")
        .groupBy(col("key"))
        .agg(max_by(col("value"), col("version")).as("balance"))
        .as[(Long, Long)].collect().toMap

      val declarative = Bank.balances(Bank.graph(spark, Sf0001), IsolationLevel.PL3)
        .select("acct", "balance_cents").as[(Long, Long)].collect().toMap
      assert(streamed == declarative)

      // streaming metrics flow straight from QueryProgress
      val reports = q.recentProgress.map(Metrics.fromProgress)
      assert(reports.map(_.inputRows).sum >= transfers.length)
    } finally q.stop()
  }

  test("latency probe reports ordered per-micro-batch AND per-record percentiles") {
    val rep = StreamingBank.latencyProbe(spark, batches = 5, rowsPerBatch = 500)
    val s = rep.batch
    assert(s.batches == 5, s)
    assert(s.p50Ms > 0 && s.p50Ms <= s.p95Ms && s.p95Ms <= s.p99Ms && s.p99Ms <= s.maxMs, s)
    // record-level: every COMMITTED transfer's open→sink latency is
    // tracked (aborted tids never reach the sink and stay open); the
    // record tail can't beat its batch's floor
    // (no cross-metric ordering asserted: the sink-side close stamp
    // fires BEFORE the state-store commit + commit-log writes that
    // batchDuration includes, so record max may undercut batch p50)
    val r = rep.record
    assert(r.records > 0 && r.records <= 5 * 500, r)
    assert(r.p50Ms >= 0 && r.p50Ms <= r.p95Ms && r.p95Ms <= r.p99Ms && r.p99Ms <= r.maxMs, r)
    assert(rep.toJsonFragment.contains("\"record_latency_ms\""), rep.toJsonFragment)
  }

  test("soak: state and latency stay flat under key churn with ttl on") {
    // NeverLastingBank-shaped stability claim at spec scale: 45
    // micro-batches over a sliding key window; keys ever touched grows
    // linearly (~9.5k) while the TTL'd state store must stay bounded by
    // the active window + the not-yet-evicted tail.
    val r = StreamingBank.soak(spark, batches = 45, rowsPerBatch = 400,
      keyWindow = 500, churnStep = 200, ttlMs = 400L, queryLoad = true)
    info(r.toJson)
    // the live query endpoint served throughout, never a torn or
    // epoch-regressing answer
    assert(r.queriesServed > 0 && r.queryErrors == 0,
      s"served=${r.queriesServed} errors=${r.queryErrors}")
    assert(r.stateRows.nonEmpty && r.batchMs.nonEmpty, r.toJson)
    assert(r.totalKeysTouched > 9000L, r.toJson)
    // bounded: far below the keys-ever-touched line an unbounded store
    // would track (window 500 + a few churn steps of TTL tail)
    assert(r.maxStateRows < 4000L, r.toJson)
    // flat, not drifting: the last third's median state size and batch
    // duration stay within loose factors of the first third's
    assert(r.lastThirdStateRows <= math.max(2000L, r.firstThirdStateRows * 3), r.toJson)
    assert(r.lastThirdBatchMs <= r.firstThirdBatchMs * 5, r.toJson)
  }

  test("non-transactional baseline equals PL0-style blind fold") {
    val transfers = Transfers.fromEvents(Tables.load(spark, Sf0001, "events"))
    val noT = StreamingBank.balancesNoT(spark, transfers)
      .select("acct", "balance_cents").as[(Long, Long)].collect().toMap
    val direct = transfers
      .select(explode(array(
        struct(col("from_acct").as("acct"), (-Transfers.cents(col("amount"))).as("d")),
        struct(col("to_acct").as("acct"), Transfers.cents(col("amount")).as("d")))).as("m"))
      .groupBy(col("m.acct")).agg(sum(col("m.d")))
      .as[(Long, Long)].collect().toMap
    assert(noT == direct)
  }

  test("streaming state survives a checkpointed restart (kill mid-stream, recover)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val transfers = Transfers.fromEvents(Tables.load(spark, Sf0001, "events"))
      .select(col("tid"), col("from_acct"), col("to_acct"), col("amount"))
      .as[Tx].collect()
    val (first, second) = transfers.splitAt(transfers.length / 2)

    val input = MemoryStream[Tx]
    def start() = StreamingBank.balances(spark, input.toDF())
      .writeStream
      .format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append())
      .start()

    val q1 = start()
    input.addData(first.toSeq)
    q1.processAllAvailable()
    q1.stop() // "crash"

    val q2 = start() // recover from checkpoint
    input.addData(second.toSeq)
    q2.processAllAvailable()
    q2.stop()

    val recovered = spark.read.parquet(s"$dir/out")
      .groupBy(col("key"))
      .agg(max_by(col("value"), col("version")).as("balance"))
      .as[(Long, Long)].collect().toMap
    val declarative = Bank.balances(Bank.graph(spark, Sf0001), IsolationLevel.PL3)
      .select("acct", "balance_cents").as[(Long, Long)].collect().toMap
    assert(recovered == declarative)

    // queryable LIVE state: read the checkpointed state store directly
    // (the reference's state-server point queries against a running job)
    val live = graft.tgraph.query.StateQueries.streamingState(spark, s"$dir/ckpt")
    assert(live.count() > 0)
    val liveKeys = live.select(col("key.value").cast("long")).as[Long].collect().toSet
    assert(liveKeys == declarative.keySet)
  }

  test("online sequential invariant == batch serial fold (state-dependent votes live)") {
    implicit val sqlCtx = spark.sqlContext
    // tid-ordered feed: the batch executor replays each key in global
    // tid order, so the online run must see the same serial schedule
    val deltas = Bank.acctDeltas(spark, Sf0001).orderBy("tid").collect().toSeq
    val streamed = Bank.sequentialSummary(
      StreamingBank.runSequentialOnline(
        spark, deltas, nBatches = 5, sinkName = "seq_online_spec"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Bank.sequentialBalances(spark, Sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("online PL2 (one micro-batch) == batch PL2: snapshot validation is live too") {
    implicit val sqlCtx = spark.sqlContext
    // in a single micro-batch the online PL2 snapshot (state at batch
    // start) IS the batch path's open snapshot, so the histories match
    val deltas = Bank.acctDeltas(spark, Sf0001).orderBy("tid").collect().toSeq
    val streamed = Bank.sequentialSummary(
      StreamingBank.runSequentialOnline(
        spark, deltas, nBatches = 1, sinkName = "seq_online_pl2_spec",
        isolation = IsolationLevel.PL2))
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Bank.sequentialBalances(spark, Sf0001, IsolationLevel.PL2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    // and the PL2 history provably differs from PL3 on the same input
    val pl3 = Bank.sequentialBalances(spark, Sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed != pl3)
  }

  test("online PL1 dirty chain persists across micro-batches: online == batch PL1") {
    implicit val sqlCtx = spark.sqlContext
    // PL1's read target (the all-writes-applied dirty chain) is part of
    // the streaming state, so online == batch holds at ANY batching —
    // unlike PL2, whose snapshot legitimately advances per micro-batch
    val deltas = Bank.acctDeltas(spark, Sf0001).orderBy("tid").collect().toSeq
    val streamed = Bank.sequentialSummary(
      StreamingBank.runSequentialOnline(
        spark, deltas, nBatches = 4, sinkName = "seq_online_pl1_spec",
        isolation = IsolationLevel.PL1))
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Bank.sequentialBalances(spark, Sf0001, IsolationLevel.PL1)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("REPLAY votes retry in-batch: transient insufficient funds commit on replay") {
    implicit val sqlCtx = spark.sqlContext
    import graft.tgraph.state.StateOperator
    // tid 1 overdraws (transient: tid 2's deposit covers it), tid 3
    // overdraws beyond any recovery (deterministic abort at the fixed
    // point). Start = 10000.
    val txs = Seq(
      Bank.AcctDelta(1L, 1L, -15000L),
      Bank.AcctDelta(1L, 2L, 10000L),
      Bank.AcctDelta(1L, 3L, -99999999L))
    val input = MemoryStream[Bank.AcctDelta]
    val q = StateOperator.runStreaming[Bank.AcctDelta, Long, Long](
      input.toDS(), _.acct, _.tid,
      new StreamingBank.ReplayCentsBalances(Bank.StartCents))
      .writeStream.format("memory").queryName("replay_spec")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(txs)
      q.processAllAvailable()
      val out = spark.table("replay_spec")
        .select("tid", "value", "committed")
        .as[(Long, Long, Boolean)].collect()
        .map { case (t, v, c) => t -> ((v, c)) }.toMap
      // replay order: tid2 commits (20000), then tid1's replay commits
      // (5000); tid3 aborts deterministically
      assert(out(2L) == ((20000L, true)))
      assert(out(1L) == ((5000L, true)))
      assert(out(3L)._2 == false)
      // under plain ABORT semantics tid 1 would have been rejected
      val abortive = StateOperator.runBatch[Bank.AcctDelta, Long, Long](
        txs.toDS(), _.acct, _.tid, new Bank.CentsBalances(Bank.StartCents))
        .collect().map(c => c.tid -> c.committed).toMap
      assert(abortive(1L) == false)
    } finally q.stop()
  }

  test("online sequential pipeline survives a checkpointed restart") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-seq-restart").toString
    val deltas = Bank.acctDeltas(spark, Sf0001).orderBy("tid").collect().toSeq
    val (first, second) = deltas.splitAt(deltas.length / 2)
    val input = MemoryStream[Bank.AcctDelta]
    def start() = StreamingBank.sequentialBalancesOnline(spark, input.toDS())
      .writeStream
      .format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append())
      .start()
    val q1 = start()
    input.addData(first)
    q1.processAllAvailable()
    q1.stop() // "crash"
    val q2 = start() // recover: state store restores every balance
    input.addData(second)
    q2.processAllAvailable()
    q2.stop()
    val recovered = Bank.sequentialSummary(spark.read.parquet(s"$dir/out"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Bank.sequentialBalances(spark, Sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(recovered == batch)
  }

  test("injected crash in the state-committed/sink-uncommitted window: exactly-once + monotone endpoint, both providers") {
    // The awkward crash window: a micro-batch's state store versions
    // are written but neither the sink metadata nor the commit-log
    // entry is — the on-disk shape a kill between state commit and
    // sink commit leaves. Injected by deleting commits/<N> and
    // _spark_metadata/<N> after a clean run of batch N (its part
    // files and state stay, exactly as a crash would leave them).
    // Restart must re-execute batch N idempotently: the recovered
    // history equals the batch serial fold with no duplicate
    // transitions, orphaned part files stay invisible to the
    // metadata-log read path, and a live query endpoint's served
    // epoch only ever advances.
    for (provider <- Seq("rocksdb", "hdfs")) {
      val ss = StreamSessions.scoped(spark, 4, Some(provider))
      implicit val sqlCtx = ss.sqlContext
      import ss.implicits._
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-crash-$provider").toString
      val deltas = Bank.acctDeltas(spark, Sf0001).orderBy("tid").collect().toSeq
      val (first, second) = deltas.splitAt(deltas.length / 2)
      val input = MemoryStream[Bank.AcctDelta]
      def start() = StreamingBank.sequentialBalancesOnline(ss, input.toDS())
        .writeStream
        .format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode(OutputMode.Append())
        .start()
      val q1 = start()
      input.addData(first)
      q1.processAllAvailable()
      q1.stop()
      // stop() returns when the stream thread dies; the shared-state
      // path registry deregisters via an async listener — wait it out
      // before restarting on the same sink path
      val deadline = System.nanoTime() + 20_000_000_000L
      while (ss.streams.active.nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(ss.streams.active.isEmpty, "q1 never fully deregistered")

      // inject the crash: batch N's commit marker and sink metadata
      // vanish; its state versions and part files remain
      val commits = new java.io.File(s"$dir/ckpt/commits")
        .listFiles().filter(_.getName.forall(_.isDigit))
      val lastBatch = commits.map(_.getName.toLong).max
      // drop the marker files AND their local-fs checksum siblings — a
      // stale .crc would make the recovered sink's atomic re-add look
      // like a concurrent writer
      def drop(f: java.io.File): Unit = {
        assert(f.exists() && f.delete(), s"missing ${f}")
        val crc = new java.io.File(f.getParentFile, s".${f.getName}.crc")
        if (crc.exists()) crc.delete()
      }
      drop(new java.io.File(s"$dir/ckpt/commits/$lastBatch"))
      drop(new java.io.File(s"$dir/out/_spark_metadata/$lastBatch"))
      val orphanedParts = new java.io.File(s"$dir/out")
        .listFiles().count(_.getName.startsWith("part-"))

      // endpoint comes up on the crashed checkpoint: it must serve the
      // last COMMITTED epoch (N-1), then only ever advance
      val server = new graft.tgraph.query.QueryServer(
        ss, s"$dir/ckpt", refreshMillis = 25)
      try {
        val observed = scala.collection.mutable.ArrayBuffer[Long]()
        val watcher = new Thread(() => {
          while (!Thread.interrupted()) {
            observed.synchronized { observed += server.servedBatchId }
            try Thread.sleep(10) catch { case _: InterruptedException =>
              Thread.currentThread().interrupt() }
          }
        })
        watcher.start()
        val q2 = start() // recovery re-executes batch N, then continues
        input.addData(second)
        q2.processAllAvailable()
        q2.stop()
        watcher.interrupt(); watcher.join()

        val epochs = observed.synchronized(observed.toSeq)
        assert(epochs.head <= lastBatch - 1,
          s"server started past the crash point: ${epochs.head}")
        assert(epochs == epochs.sorted, "served epoch regressed during recovery")

        // exactly-once: the metadata-log read path sees each
        // transition once and the history equals the batch serial fold
        val out = ss.read.parquet(s"$dir/out")
        val recovered = Bank.sequentialSummary(out)
          .as[(Long, Long, Long, Long)].collect().toSet
        val batch = Bank.sequentialBalances(spark, Sf0001)
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(recovered == batch, s"$provider: recovered history diverged")
        val dupTransitions = out.groupBy(col("key"), col("tid"))
          .count().filter(col("count") > 1).count()
        assert(dupTransitions == 0L, s"$provider: duplicated transitions")
        // the re-executed batch left orphaned part files on disk; the
        // committed read path must NOT count them
        val partsNow = new java.io.File(s"$dir/out")
          .listFiles().count(_.getName.startsWith("part-"))
        assert(partsNow > orphanedParts,
          "re-execution should have written fresh part files")
        assert(out.count() == deltas.size.toLong,
          s"$provider: read path counted orphaned files")

        // and the endpoint's final answers are the committed balances
        val finalState = server.servedBatchId
        assert(finalState > lastBatch, "endpoint never caught up")
      } finally server.close()
    }
  }

  test("torn state changelog (partial upload) at the crash point: recovery replays the last complete chain, both providers") {
    // Harder crash shape than dropped markers: the kill lands MID-
    // UPLOAD of batch N's state version, leaving a truncated
    // N+1.changelog (RocksDB) / N+1.delta (HDFS) on the checkpoint —
    // torn bytes, not a missing file — alongside the missing commit
    // marker and sink metadata. Recovery must load state version N
    // from the still-complete snapshot+changelog chain (the torn
    // version is PAST the last commit, so nothing may read it),
    // re-execute batch N overwriting the torn file, and converge to
    // the exact batch fold.
    for (provider <- Seq("rocksdb", "hdfs")) {
      val ss = StreamSessions.scoped(spark, 4, Some(provider))
      implicit val sqlCtx = ss.sqlContext
      import ss.implicits._
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-torn-$provider").toString
      val deltas = Bank.acctDeltas(spark, Sf0001).orderBy("tid").collect().toSeq
      val (first, second) = deltas.splitAt(deltas.length / 2)
      val input = MemoryStream[Bank.AcctDelta]
      def start() = StreamingBank.sequentialBalancesOnline(ss, input.toDS())
        .writeStream
        .format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode(OutputMode.Append())
        .start()
      val q1 = start()
      input.addData(first)
      q1.processAllAvailable()
      q1.stop()
      val deadline = System.nanoTime() + 20_000_000_000L
      while (ss.streams.active.nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(ss.streams.active.isEmpty, "q1 never fully deregistered")

      val lastBatch = new java.io.File(s"$dir/ckpt/commits")
        .listFiles().filter(_.getName.forall(_.isDigit))
        .map(_.getName.toLong).max
      def drop(f: java.io.File): Unit = {
        assert(f.exists() && f.delete(), s"missing ${f}")
        val crc = new java.io.File(f.getParentFile, s".${f.getName}.crc")
        if (crc.exists()) crc.delete()
      }
      drop(new java.io.File(s"$dir/ckpt/commits/$lastBatch"))
      drop(new java.io.File(s"$dir/out/_spark_metadata/$lastBatch"))

      // tear batch N's state version (N+1 in store numbering) in every
      // partition that has one: keep the first half of the bytes, drop
      // the checksum sibling so the torn payload is really read
      val tornVersion = lastBatch + 1
      val torn = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/ckpt/state"))
        .filter(p => {
          val n = p.getFileName.toString
          n == s"$tornVersion.changelog" || n == s"$tornVersion.delta"
        })
        .toArray.map(_.asInstanceOf[java.nio.file.Path])
      assert(torn.nonEmpty, s"$provider: no version-$tornVersion state files found")
      torn.foreach { p =>
        val size = java.nio.file.Files.size(p)
        assert(size > 2, s"$provider: $p too small to tear")
        val ch = java.nio.channels.FileChannel.open(
          p, java.nio.file.StandardOpenOption.WRITE)
        try ch.truncate(size / 2) finally ch.close()
        val crc = p.getParent.resolve(s".${p.getFileName}.crc")
        java.nio.file.Files.deleteIfExists(crc)
      }

      // recovery: load version N from the complete chain, re-execute
      // batch N (overwriting the torn upload), continue with the rest
      val q2 = start()
      input.addData(second)
      q2.processAllAvailable()
      q2.stop()

      val out = ss.read.parquet(s"$dir/out")
      val recovered = Bank.sequentialSummary(out)
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = Bank.sequentialBalances(spark, Sf0001)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(recovered == batch, s"$provider: recovered history diverged")
      assert(out.groupBy(col("key"), col("tid")).count()
        .filter(col("count") > 1).count() == 0L,
        s"$provider: duplicated transitions after torn-changelog recovery")
      assert(out.count() == deltas.size.toLong,
        s"$provider: read path counted orphaned files")
    }
  }

  test("dynamic salted fold: key turning hot mid-stream promotes, ceiling lifts, result == batch") {
    val hot = 17L
    val transfers = graft.sources.TransferSource
      .batchSkewed(spark, 20000, keySpace = 200, hotAcct = hot, hotPerMille = 50)
    val moves = StreamingBank.committedMovements(spark, transfers)
    val expected = moves.collect().groupBy(_.acct).map { case (k, ms) =>
      k -> ((ms.map(_.delta).sum, ms.size.toLong))
    }
    // threshold sits mid-stream for the hot key (crosses around batch
    // 2-3 of 6) and far above any tail key's total, so promotion must
    // fire exactly once, mid-run
    val threshold = expected(hot)._2 / 3
    assert(expected.filter(_._1 != hot).values.forall(_._2 < threshold),
      "fixture drift: a tail key would cross the promotion threshold")
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(graft.LocalDir.scratch), "dynsalt").toFile
    val (frame, promoted) = StreamingBank.saltedBalancesDynamicFromFiles(
      spark, moves, salts = 8, hotThreshold = threshold,
      nBatches = 6, base.toString)
    val got = frame.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, "dynamic salted stream diverged from batch fold")
    assert(promoted == Set(hot), s"expected exactly the hot key promoted: $promoted")

    // ceiling-lift probe on the raw per-batch sink: pre-promotion the
    // hot key folds in ONE subgroup (salt 0); post-promotion its
    // per-batch work spans many subgroups — the serialization ceiling
    // is really lifted, not just the membership flag flipped
    val batchDirs = new java.io.File(base, "out").listFiles()
      .filter(_.getName.startsWith("batch-")).sortBy(_.getName)
    val saltsPerBatch = batchDirs.toSeq.map { d =>
      spark.read.parquet(d.toString)
        .as[(Long, Int, Long, Long, Long)].collect()
        .filter(_._1 == hot).map(_._2).distinct.sorted.toSeq
    }
    assert(saltsPerBatch.head == Seq(0),
      s"first batch must pre-date promotion: ${saltsPerBatch.head}")
    assert(saltsPerBatch.last.size > 1,
      s"per-batch ceiling never lifted: $saltsPerBatch")
  }

  test("watermarked windowed aggregation over the transfer stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tx]
    // event-time = one synthetic minute per 10 tids
    val withTime = input.toDF()
      .withColumn("ts", expr("timestamp_micros(1704067200000000 + tid * 6000000)"))
    val windowed = withTime
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("to_acct"))
      .agg(count(lit(1)).as("n"), sum(col("amount")).as("total"))
    val q = windowed.writeStream
      .format("memory").queryName("windowed_transfers")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val txs = (0L until 300L).map(i => Tx(i, i % 7, (i + 1) % 20, 10.0 + (i % 5)))
      input.addData(txs.take(150)); q.processAllAvailable()
      input.addData(txs.drop(150)); q.processAllAvailable()
      // close the last window so append mode emits it
      input.addData(Tx(10000L, 0L, 1L, 1.0)); q.processAllAvailable()
      val out = spark.table("windowed_transfers")
      assert(out.count() > 0)
      val n = out.agg(sum(col("n"))).as[Long].head()
      assert(n == 300L) // every pre-watermark transfer landed in a window
    } finally q.stop()
  }

  test("rate-style TransferSource is deterministic and feeds the pipeline") {
    val src = graft.sources.TransferSource.batch(spark, 1000)
    val a = src.agg(sum(col("amount")), countDistinct(col("from_acct"))).head()
    val b = graft.sources.TransferSource.batch(spark, 1000)
      .agg(sum(col("amount")), countDistinct(col("from_acct"))).head()
    assert(a == b) // reproducible workload
    assert(src.filter(col("from_acct") === col("to_acct")).count() == 0)
    val balances = StreamingBank.balances(spark, src).collect()
    assert(balances.nonEmpty)
  }

  test("injected aborts (IncreaseAborts analog) contribute nothing to state") {
    val src = graft.sources.TransferSource.batch(spark, 2000)
    // forcing even tids to abort == running only the odd tids
    val injected = StreamingBank.balances(spark, src, pmod(col("tid"), lit(2)) === 0)
      .collect().map(c => (c.key, c.value)).sorted.toSeq
    val oddOnly = StreamingBank.balances(spark, src.filter(col("tid") % 2 =!= 0))
      .collect().map(c => (c.key, c.value)).sorted.toSeq
    assert(injected == oddOnly)
  }
}
