package graft.tools

import graft.sources.{ConcurrentCommitException, ManifestStore, StoreBusyException, StoreFs}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Multi-writer + vacuum churn soak for the manifest store's r15/r16
  * concurrency protocols (OCC rebase, two-flag writer/vacuum
  * exclusion, fenced lease breaking): an APPENDER, a MERGER, a
  * periodic VACUUM and concurrent PINNED READERS all hammer one store
  * for N rounds, with planted crash-orphans for the vacuum to earn its
  * keep. Healthy =
  *
  *  - ZERO lost edits: the final snapshot holds EVERY appended row
  *    exactly once, and every merged key carries the LAST successful
  *    merge's value;
  *  - ZERO reclaimed-live-file reads: no reader ever hits a missing
  *    file (the atomic-snapshot contract under vacuum);
  *  - ZERO wedges: every operation completes or fails typed
  *    (StoreBusy/ConcurrentCommit), retry counts stay bounded;
  *  - the planted orphans are gone after the closing sweep while every
  *    referenced file survives.
  *
  * `sbt "runMain graft.tools.StoreChurnProbe [rounds] [vacuumEveryMs]"`
  * prints one JSON line of totals.
  */
object StoreChurnProbe {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.length > 0) args(0).toInt else 300
    val vacuumEveryMs = if (args.length > 1) args(1).toLong else 200L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", graft.LocalDir.scratch)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = graft.LocalDir.runDir("store-churn")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", LongType), StructField("p", LongType)))
    val mergeKeys = (0L until 8L).toSeq // p = k % 4
    ManifestStore.init(
      mergeKeys.map(k => (k, 0L, k % 4)).toDF("k", "v", "p"), "p", dir,
      statsCols = Seq("k"), bloomCols = Seq("k"))

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val busyRetries = new java.util.concurrent.atomic.AtomicLong(0)
    val maxAttempt = new java.util.concurrent.atomic.AtomicLong(0)
    val appended = new java.util.concurrent.atomic.AtomicLong(0)
    val mergedRound = new java.util.concurrent.atomic.AtomicLong(0)
    val vacuumOk = new java.util.concurrent.atomic.AtomicLong(0)
    val vacuumBusy = new java.util.concurrent.atomic.AtomicLong(0)
    val vacuumSwept = new java.util.concurrent.atomic.AtomicLong(0)
    val readerTicks = new java.util.concurrent.atomic.AtomicLong(0)

    /** Retry a writer op around typed busy/conflict failures, counting
      * attempts — unbounded retries would mask a wedge, so cap hard.
      */
    def withRetries[T](what: String)(op: => T): Option[T] = {
      var attempt = 0
      while (attempt < 64) {
        try {
          val r = op
          maxAttempt.getAndUpdate(m => math.max(m, attempt + 1L))
          return Some(r)
        } catch {
          case _: StoreBusyException | _: ConcurrentCommitException =>
            busyRetries.incrementAndGet()
            attempt += 1
            Thread.sleep(20L + attempt * 5L)
          case t: Throwable =>
            errors.add(s"$what: ${t.getClass.getSimpleName} ${t.getMessage}")
            return None
        }
      }
      errors.add(s"$what: exhausted 64 retries (wedge?)")
      None
    }

    val appender = new Thread(() => {
      var round = 0
      while (round < rounds && !stop.get()) {
        val base = 1000L + round * 4L
        val rows = (base until base + 4L).map(k => (k, k * 10L, k % 4))
          .toDF("k", "v", "p")
        withRetries("append")(
          ManifestStore.append(rows, "p", dir, statsCols = Seq("k"),
            bloomCols = Seq("k"), tag = Some(s"soak$round")))
          .foreach(_ => appended.addAndGet(4L))
        round += 1
        if (round % 25 == 0) Thread.sleep(400L) // let a vacuum in
      }
    }, "churn-appender")

    val merger = new Thread(() => {
      var round = 1
      while (round <= rounds && !stop.get()) {
        val r = round.toLong
        val ups = mergeKeys.map(k => (k, r, k % 4)).toDF("k", "v", "p")
        withRetries("merge")(
          ManifestStore.merge(spark, dir, schema, "p", "k", ups,
            statsCols = Seq("k"), bloomCols = Seq("k"),
            maxEditRetries = 16))
          .foreach(_ => mergedRound.set(r))
        round += 1
        if (round % 25 == 0) Thread.sleep(400L)
      }
    }, "churn-merger")

    val vacuumer = new Thread(() => {
      while (!stop.get()) {
        // plant a crash-orphan now and then so sweeps have real work
        try {
          val live = ManifestStore.files(dir,
            ManifestStore.latestVersion(dir).get)
          val src = new org.apache.hadoop.fs.Path(s"$dir/${live.head}")
          val orphan = new org.apache.hadoop.fs.Path(
            s"$dir/p=0/corphan-${System.nanoTime()}.parquet")
          val in = StoreFs.fs(src).open(src)
          val out = StoreFs.fs(orphan).create(orphan, true)
          try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
          finally { in.close(); out.close() }
        } catch { case _: Throwable => () }
        try {
          vacuumSwept.addAndGet(ManifestStore.vacuum(dir, "p").toLong)
          vacuumOk.incrementAndGet()
        } catch {
          case _: StoreBusyException => vacuumBusy.incrementAndGet()
          case t: Throwable =>
            errors.add(s"vacuum: ${t.getClass.getSimpleName} ${t.getMessage}")
        }
        Thread.sleep(vacuumEveryMs)
      }
    }, "churn-vacuum")

    @volatile var lastAppendCount = 0L
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val rows = ManifestStore.read(spark, dir, schema, "p")
            .as[(Long, Long, Long)].collect()
          val mk = rows.filter(_._1 < 8L)
          if (mk.length != 8)
            errors.add(s"reader: merge keys not unique/complete: ${mk.length}")
          val appendRows = rows.count(_._1 >= 1000L).toLong
          if (appendRows < lastAppendCount)
            errors.add(s"reader: appended rows went BACKWARDS " +
              s"($lastAppendCount -> $appendRows)")
          lastAppendCount = appendRows
          readerTicks.incrementAndGet()
        } catch {
          case t: Throwable =>
            errors.add(s"reader: ${t.getClass.getSimpleName} ${t.getMessage}")
        }
        Thread.sleep(50L)
      }
    }, "churn-reader")

    val t0 = System.nanoTime()
    Seq(appender, merger, vacuumer, reader).foreach(_.start())
    appender.join(); merger.join()
    stop.set(true)
    vacuumer.join(); reader.join()
    // closing sweep: writers quiet, the lease is free — must succeed
    val finalSwept =
      try ManifestStore.vacuum(dir, "p")
      catch { case t: Throwable =>
        errors.add(s"final vacuum: ${t.getMessage}"); -1 }
    val wallSec = (System.nanoTime() - t0) / 1e9

    // ---- invariants on the quiesced store --------------------------
    val fin = ManifestStore.read(spark, dir, schema, "p")
      .as[(Long, Long, Long)].collect()
    val mergeRows = fin.filter(_._1 < 8L).sortBy(_._1)
    val appendRows = fin.filter(_._1 >= 1000L)
    var lost = 0L
    if (appendRows.length.toLong != appended.get()) {
      lost = appended.get() - appendRows.length
      errors.add(s"append rows lost/extra: have ${appendRows.length}, " +
        s"committed ${appended.get()}")
    }
    if (appendRows.map(_._1).distinct.length != appendRows.length)
      errors.add("duplicate appended keys (replay guard broke)")
    if (mergeRows.length != 8 ||
        mergeRows.exists(_._2 != mergedRound.get()))
      errors.add(s"merge keys must all carry round ${mergedRound.get()}: " +
        mergeRows.mkString(", "))
    // no orphan survives the closing sweep; every manifest file exists
    val latest = ManifestStore.latestVersion(dir).get
    val missing = ManifestStore.files(dir, latest)
      .count(f => !StoreFs.exists(new org.apache.hadoop.fs.Path(s"$dir/$f")))
    if (missing > 0) errors.add(s"$missing referenced files missing")

    val errList = {
      import scala.jdk.CollectionConverters._
      errors.asScala.toSeq
    }
    println(
      s"""{"probe":"store_churn","rounds":$rounds,"wall_sec":${
        f"$wallSec%.1f"},"appended_rows":${appended.get()},""" +
        s""""merge_rounds_landed":${mergedRound.get()},""" +
        s""""busy_retries":${busyRetries.get()},"max_attempts":${
          maxAttempt.get()},""" +
        s""""vacuum_ok":${vacuumOk.get()},"vacuum_busy":${
          vacuumBusy.get()},"vacuum_swept":${vacuumSwept.get()},""" +
        s""""final_swept":$finalSwept,"reader_ticks":${readerTicks.get()},""" +
        s""""lost_rows":$lost,"versions_retained":${
          ManifestStore.history(dir).size},""" +
        s""""errors":${errList.size}}""")
    errList.foreach(e => System.err.println(s"[churn] $e"))
    spark.stop()
    if (errList.nonEmpty) System.exit(1)
  }
}
