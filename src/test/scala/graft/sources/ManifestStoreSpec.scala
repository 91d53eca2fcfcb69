package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

class ManifestStoreSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType),
    StructField("p", LongType)))

  private def rows(kvs: (Long, Long, Long)*) =
    kvs.toSeq.toDF("k", "v", "p")

  private def readAll(dir: String, version: Option[Long] = None) =
    ManifestStore.read(spark, dir, schema, "p", None, version)
      .select("k", "v", "p").as[(Long, Long, Long)].collect().toSet

  private def dataFiles(dir: String): Set[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("p="))
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => s"${d.getName}/${f.getName}")).toSet

  test("commits are atomic snapshots: a rewrite replaces exactly its " +
    "partitions, earlier versions stay readable (time travel), GC " +
    "reclaims past retention") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mstore").toString
    val v0 = ManifestStore.init(
      rows((1L, 10L, 0L), (2L, 20L, 0L), (3L, 30L, 1L)), "p", dir)
    assert(v0 == 0L)
    assert(readAll(dir) == Set((1L, 10L, 0L), (2L, 20L, 0L), (3L, 30L, 1L)))

    // rewrite partition 0 only — partition 1 carried over untouched
    val v1 = ManifestStore.commit(
      rows((1L, 11L, 0L), (4L, 40L, 0L)), "p", Seq(0L), dir)
    assert(v1 == 1L)
    assert(readAll(dir) == Set((1L, 11L, 0L), (4L, 40L, 0L), (3L, 30L, 1L)))
    // the superseded snapshot is STILL exactly readable (time travel)
    assert(readAll(dir, Some(0L)) ==
      Set((1L, 10L, 0L), (2L, 20L, 0L), (3L, 30L, 1L)))

    // empty a partition: its entries leave the snapshot
    val v2 = ManifestStore.commit(rows(), "p", Seq(1L), dir)
    assert(readAll(dir) == Set((1L, 11L, 0L), (4L, 40L, 0L)))
    assert(readAll(dir, Some(1L)) ==
      Set((1L, 11L, 0L), (4L, 40L, 0L), (3L, 30L, 1L)))

    // churn past retention: old manifests AND their exclusive files go
    (0 until 10).foreach { i =>
      ManifestStore.commit(
        rows((1L, 100L + i, 0L)), "p", Seq(0L), dir, retainVersions = 3)
    }
    val latest = ManifestStore.latestVersion(dir).get
    assert(latest == v2 + 10)
    // version 0 is past retention — the TYPED defined error
    intercept[graft.sources.RetentionException](readAll(dir, Some(0L)))
    // within retention: readable and exact (each churn commit REPLACED
    // partition 0 wholly, so only its single row survives)
    assert(readAll(dir, Some(latest - 2)) == Set((1L, 107L, 0L)))
    assert(readAll(dir) == Set((1L, 109L, 0L)))
    // on-disk files = exactly the union of the retained manifests
    val referenced = (latest - 2 to latest)
      .flatMap(v => ManifestStore.files(dir, v)).toSet
    assert(dataFiles(dir) == referenced,
      "GC must delete every unreferenced data file and nothing else")
    // ... including the local filesystem's hidden .crc siblings: every
    // remaining checksum file must belong to a referenced data file
    val orphanCrcs = Option(new java.io.File(dir).listFiles()).get
      .filter(d => d.isDirectory && d.getName.startsWith("p="))
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(".") && f.getName.endsWith(".crc"))
        .map(f => s"${d.getName}/${f.getName.stripPrefix(".").stripSuffix(".crc")}"))
      .filterNot(referenced.contains)
    assert(orphanCrcs.isEmpty, s"orphaned checksum files: ${orphanCrcs.toSeq}")

    // a reader that resolved a manifest BEFORE later commits still
    // reads its full snapshot afterwards, as long as it stays within
    // the retention window (snapshot isolation — the property dynamic
    // overwrite lacks); a version that AGES OUT loses its exclusive
    // files, which is the documented restart signal
    val pinned = ManifestStore.files(dir, latest)
    val aging = ManifestStore.files(dir, latest - 2)
    ManifestStore.commit(rows((9L, 9L, 0L)), "p", Seq(0L), dir, retainVersions = 3)
    assert(pinned.forall(p => new java.io.File(s"$dir/$p").exists()),
      "files of a retained version vanished under a reader")
    assert(!new java.io.File(
      s"$dir/${aging.filterNot(pinned.contains).head}").exists(),
      "an aged-out version's exclusive files must be reclaimed")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("replayed commit (same rows, same touched set) converges: the " +
    "manifest lists only the latest attempt's files and GC reclaims " +
    "the orphans") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mstore-replay").toString
    ManifestStore.init(rows((1L, 10L, 0L), (2L, 20L, 1L)), "p", dir)
    ManifestStore.commit(rows((1L, 11L, 0L)), "p", Seq(0L), dir, retainVersions = 2)
    // the replay: identical commit (the CDC journal discipline re-runs
    // a crashed batch's mutations verbatim)
    ManifestStore.commit(rows((1L, 11L, 0L)), "p", Seq(0L), dir, retainVersions = 2)
    assert(readAll(dir) == Set((1L, 11L, 0L), (2L, 20L, 1L)))
    // both retained versions read exactly; no duplicate rows anywhere
    val latest = ManifestStore.latestVersion(dir).get
    assert(readAll(dir, Some(latest - 1)) == Set((1L, 11L, 0L), (2L, 20L, 1L)))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("the publish fence primitive: rename-no-replace loses when the " +
    "target exists (the CAS a racing second writer hits)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-storefs-cas")
    val target = new org.apache.hadoop.fs.Path(dir.toString, "v1.json")
    assert(StoreFs.writeAtomicNoReplace(target, "first"))
    assert(!StoreFs.writeAtomicNoReplace(target, "second"),
      "second publish of the same version must lose")
    assert(StoreFs.readLines(target) == Seq("first"),
      "the loser must not have replaced the winner's content")
    // no temp litter left behind by the losing attempt
    assert(StoreFs.list(new org.apache.hadoop.fs.Path(dir.toString))
      .map(_.getPath.getName).filter(_.startsWith(".tmp-")).isEmpty)
    graft.sources.FileIO.deleteScratch(dir.toFile)
  }

  test("object-store publish dispatches to the CONDITIONAL PUT: eight " +
    "racers on the mem scheme produce exactly one winner, content is " +
    "all-or-nothing, and no temp litter exists (no tmp hop)") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.mem.impl", classOf[MemObjectFileSystem].getName)
    hconf.set("graft.store.objectstore.schemes", "mem")
    MemObjectFileSystem.clear()
    val target = new org.apache.hadoop.fs.Path(
      "mem:///store/_manifests/v000000000001.json")
    val n = 8
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val wins = new java.util.concurrent.ConcurrentHashMap[Int, Boolean]()
    val ts = (0 until n).map { i =>
      new Thread(() => {
        barrier.await()
        wins.put(i, StoreFs.writeAtomicNoReplace(target, s"writer-$i"))
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join(60000))
    import scala.jdk.CollectionConverters._
    val winners = wins.asScala.collect { case (i, true) => i }.toSeq
    assert(winners.size == 1,
      s"exactly one conditional put must win: $winners")
    // the committed object is the winner's FULL content — objects
    // become visible all-or-nothing at close, never partially
    assert(StoreFs.readLines(target) == Seq(s"writer-${winners.head}"))
    assert(MemObjectFileSystem.contentOf(
      "/store/_manifests/v000000000001.json")
      .contains(s"writer-${winners.head}"))
    // a late sequential duplicate loses at the create precheck
    assert(!StoreFs.writeAtomicNoReplace(target, "late"))
    assert(StoreFs.readLines(target) == Seq(s"writer-${winners.head}"))
    // the seven losers left no temp litter: the object-store claim has
    // no tmp hop (rename is copy+delete there — never part of a claim)
    assert(StoreFs.list(new org.apache.hadoop.fs.Path(
      "mem:///store/_manifests")).map(_.getPath.getName).toSeq ==
      Seq("v000000000001.json"))
    // and the scheme's rename really would have replaced silently —
    // the reason the dispatch exists
    val other = new org.apache.hadoop.fs.Path("mem:///store/tmp.json")
    assert(StoreFs.writeAtomicNoReplace(other, "would-replace"))
    assert(StoreFs.fs(other).rename(other, target),
      "mem rename models S3 copy+delete: it replaces")
    assert(StoreFs.readLines(target) == Seq("would-replace"),
      "drill premise: rename on an object store silently replaces")
    MemObjectFileSystem.clear()
  }

  test("RESTORE rolls back to a retained version metadata-only and " +
    "DESCRIBE HISTORY reads the commit log from metadata alone") {
    val dir = java.nio.file.Files.createTempDirectory("graft-restore").toString
    ManifestStore.init(rows((1L, 10L, 0L), (2L, 20L, 1L)), "p", dir,
      statsCols = Seq("k"))                                           // v0
    ManifestStore.commit(rows((1L, 11L, 0L)), "p", Seq(0L), dir,
      statsCols = Seq("k"))                                           // v1
    ManifestStore.append(rows((3L, 30L, 1L)), "p", dir,
      statsCols = Seq("k"), tag = Some("b00007"))                     // v2
    val v1Content = readAll(dir, Some(1L))
    val filesBefore = dataFiles(dir)
    // restore to v1: a NEW version with exactly v1's content — no data
    // file was written or copied (metadata-only)
    val v3 = ManifestStore.restore(dir, "p", 1L)
    assert(v3 == 3L)
    assert(readAll(dir) == v1Content, "restore must republish v1's content")
    assert(dataFiles(dir) == filesBefore,
      "restore is metadata-only: no data file may appear or vanish")
    // the rolled-back-over v2 stays readable (time travel intact)
    assert(readAll(dir, Some(2L)).contains((3L, 30L, 1L)))
    // the restored files' zone-map bounds carried (metadata aggregates
    // still answer) and the ledger carried from the PREVIOUS head
    assert(ManifestStore.metaMinMax(dir, "k", "p", version = Some(3L))
      .contains((1L, 2L)))
    assert(ManifestStore.tags(dir, 3L) == Seq("b00007"),
      "restore must carry the ledger forward like any publish")
    // restoring the current head is a no-op returning it
    assert(ManifestStore.restore(dir, "p", 3L) == 3L)
    // HISTORY: every retained commit with ts/tags/file/row counts from
    // metadata alone
    val h = ManifestStore.history(dir)
    assert(h.map(_.version) == Seq(0L, 1L, 2L, 3L))
    assert(h.forall(_.ts.nonEmpty) &&
      h.map(_.ts.get) == h.map(_.ts.get).sorted)
    assert(h.map(_.rows) == Seq(Some(2L), Some(2L), Some(3L), Some(2L)),
      s"history row counts must be exact from the sidecars: $h")
    assert(h.last.tags == Seq("b00007"))
    // the operation kind rides in the header: init/commit/append and
    // the restore's source version are all named
    assert(h.map(_.op) == Seq(Some("init"), Some("commit"),
      Some("append"), Some("restore:v1")),
      s"history must name each commit's operation: ${h.map(_.op)}")
    // a restore source past retention answers the typed error
    (0 until 8).foreach(i => ManifestStore.commit(
      rows((1L, 50L + i, 0L)), "p", Seq(0L), dir, retainVersions = 3))
    intercept[RetentionException](ManifestStore.restore(dir, "p", 0L))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("restore interplay with GC and vacuum: re-referenced files " +
    "survive every sweep; the rolled-over version's exclusive files " +
    "reclaim exactly when retention drops it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rgc").toString
    ManifestStore.init(rows((1L, 10L, 0L), (2L, 20L, 1L)), "p", dir)  // v0
    ManifestStore.commit(rows((1L, 11L, 0L)), "p", Seq(0L), dir)      // v1
    ManifestStore.commit(rows((1L, 12L, 0L)), "p", Seq(0L), dir)      // v2
    val v1Files = ManifestStore.files(dir, 1L).toSet
    val v2Only = ManifestStore.files(dir, 2L).toSet -- v1Files
    ManifestStore.restore(dir, "p", 1L)                               // v3 = v1
    // a sweep right after the restore: the restored (re-referenced)
    // files and v2's still-retained files all survive
    assert(ManifestStore.vacuum(dir, "p") == 0,
      "nothing is orphaned right after a restore")
    assert(v1Files.subsetOf(dataFiles(dir)) && v2Only.subsetOf(dataFiles(dir)))
    // churn v2 out of retention: its exclusive files reclaim, the
    // restored head keeps reading v1's content through v1's files
    (0 until 6).foreach(i => ManifestStore.append(
      rows((100L + i, 1L, 1L)), "p", dir, retainVersions = 3))
    intercept[RetentionException](ManifestStore.files(dir, 2L))
    assert((v2Only -- dataFiles(dir)) == v2Only,
      "the rolled-over version's exclusive files must be reclaimed")
    assert(v1Files.subsetOf(dataFiles(dir)),
      "files the restore re-referenced must survive its source aging out")
    assert(readAll(dir).contains((1L, 11L, 0L)),
      "the restored content must keep reading through retention churn")
    assert(ManifestStore.vacuum(dir, "p") == 0, "no orphans linger")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("vacuum/writer exclusion is ENFORCED: vacuum aborts typed " +
    "while a writer marker is live (a moved-but-unmanifested file is " +
    "never reclaimed), a commit aborts typed under a vacuum lease, " +
    "expired leases never wedge, and a second vacuum fails typed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lease").toString
    ManifestStore.init(rows((1L, 10L, 0L), (2L, 20L, 1L)), "p", dir)  // v0
    val mdir = s"$dir/_manifests"
    def path(rel: String) = new org.apache.hadoop.fs.Path(s"$dir/$rel")
    val future = (System.currentTimeMillis() + 600000L).toString
    // "expired" means BEYOND the clock-skew margin — another party's
    // lease is honored for graft.store.clock.skew.ms past its expiry
    val past = (System.currentTimeMillis() - 120000L).toString
    // an in-flight writer: live marker + a moved-but-unmanifested file
    StoreFs.writeOverwrite(path("_manifests/.w-inflight"), future)
    StoreFs.writeOverwrite(path("p=0/cinflight-part-9.parquet"), "x")
    val ve = intercept[StoreBusyException](ManifestStore.vacuum(dir, "p"))
    assert(ve.getMessage.contains("writer"))
    assert(StoreFs.exists(path("p=0/cinflight-part-9.parquet")),
      "vacuum must NEVER reclaim a file a live writer may be publishing")
    assert(!StoreFs.exists(path("_manifests/.vacuum-lock")),
      "an aborted vacuum must release its lease")
    // the writer published (marker gone): the sweep reclaims the file
    // it now knows to be an orphan
    StoreFs.delete(path("_manifests/.w-inflight"))
    assert(ManifestStore.vacuum(dir, "p") == 1)
    assert(!StoreFs.exists(path("p=0/cinflight-part-9.parquet")))
    // a commit starting while vacuum holds the lease aborts typed and
    // leaves no marker litter; the store is untouched
    StoreFs.writeOverwrite(path("_manifests/.vacuum-lock"), future)
    val ce = intercept[StoreBusyException](
      ManifestStore.commit(rows((1L, 11L, 0L)), "p", Seq(0L), dir))
    assert(ce.getMessage.contains("vacuum"))
    assert(readAll(dir) == Set((1L, 10L, 0L), (2L, 20L, 1L)))
    assert(!StoreFs.list(new org.apache.hadoop.fs.Path(mdir))
      .exists(_.getPath.getName.startsWith(".w-")),
      "the refused commit must remove its own marker")
    // a second vacuum while the lease is held fails typed
    val v2e = intercept[StoreBusyException](ManifestStore.vacuum(dir, "p"))
    assert(v2e.getMessage.contains("another vacuum"))
    // EXPIRED leases never wedge: a crashed vacuum's stale lock is
    // broken by the next writer and the next vacuum alike
    StoreFs.writeOverwrite(path("_manifests/.vacuum-lock"), past)
    ManifestStore.commit(rows((1L, 12L, 0L)), "p", Seq(0L), dir)      // v1
    assert(readAll(dir) == Set((1L, 12L, 0L), (2L, 20L, 1L)))
    // (the commit ignores the expired lock but leaves it; vacuum
    // re-claims over it)
    ManifestStore.vacuum(dir, "p")
    // a crashed WRITER's expired marker is reclaimed by the sweep —
    // but ONLY once it is also old by MODTIME: a fresh file whose
    // content reads expired/empty is a marker mid-creation or
    // mid-renewal (the churn soak caught vacuum racing the local FS's
    // create on exactly that window) and must be treated as live
    StoreFs.writeOverwrite(path("_manifests/.w-crashed"), past)
    intercept[StoreBusyException](ManifestStore.vacuum(dir, "p"))
    assert(StoreFs.exists(path("_manifests/.w-crashed")),
      "a content-expired but modtime-fresh marker must survive")
    // an EMPTY marker (a writer between create and content write) is
    // live the same way
    StoreFs.writeOverwrite(path("_manifests/.w-creating"), "")
    intercept[StoreBusyException](ManifestStore.vacuum(dir, "p"))
    assert(StoreFs.exists(path("_manifests/.w-creating")))
    // age both by modtime: now they are genuine crash litter
    Seq(".w-crashed", ".w-creating").foreach { n =>
      assert(new java.io.File(s"$dir/_manifests/$n")
        .setLastModified(System.currentTimeMillis() - 120000L))
    }
    ManifestStore.vacuum(dir, "p")
    assert(!StoreFs.exists(path("_manifests/.w-crashed")))
    assert(!StoreFs.exists(path("_manifests/.w-creating")))
    // after everything, no lease litter and a normal commit works
    assert(!StoreFs.exists(path("_manifests/.vacuum-lock")))
    ManifestStore.commit(rows((2L, 21L, 1L)), "p", Seq(1L), dir)
    assert(!StoreFs.list(new org.apache.hadoop.fs.Path(mdir))
      .exists(_.getPath.getName.startsWith(".w-")),
      "a successful commit must remove its own marker")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("optimistic REWRITE concurrency: a rewrite staged against an " +
    "older version REBASES when the interim commits touched only " +
    "disjoint partitions (content = serial order); an overlapping " +
    "rewrite fails typed; an interim append INTO a touched partition " +
    "is a conflict too") {
    val dir = java.nio.file.Files.createTempDirectory("graft-occ").toString
    ManifestStore.init(
      rows((1L, 10L, 0L), (2L, 20L, 1L), (3L, 30L, 2L)), "p", dir)    // v0
    // X rewrites p=0 at head
    ManifestStore.commit(rows((1L, 11L, 0L)), "p", Seq(0L), dir)      // v1
    // Y was staged against v0 and lands AFTER X: X touched only p=0,
    // Y rewrites p=1 — disjoint, so Y rebases over X's manifest
    val v2 = ManifestStore.commit(rows((2L, 21L, 1L)), "p", Seq(1L),
      dir, baseVersion = Some(0L))
    assert(v2 == 2L)
    assert(readAll(dir) == Set((1L, 11L, 0L), (2L, 21L, 1L), (3L, 30L, 2L)),
      "the rebased commit must carry the winner's rewrite — serial order")
    // Z also staged against v0 and rewrites p=0 — X already rewrote
    // it: a REAL conflict, typed, store untouched
    val e = intercept[ConcurrentCommitException](
      ManifestStore.commit(rows((1L, 99L, 0L)), "p", Seq(0L), dir,
        baseVersion = Some(0L)))
    assert(e.getMessage.contains("conflict"))
    assert(readAll(dir) == Set((1L, 11L, 0L), (2L, 21L, 1L), (3L, 30L, 2L)),
      "a conflicting rewrite must leave the store exactly as it was")
    // an interim APPEND into a partition the stale rewrite touches is
    // a conflict as well: the rewrite's staged rows were derived
    // without the appended rows and would drop them
    ManifestStore.append(rows((9L, 90L, 2L)), "p", dir)               // v3
    intercept[ConcurrentCommitException](
      ManifestStore.commit(rows((3L, 31L, 2L)), "p", Seq(2L), dir,
        baseVersion = Some(2L)))
    assert(readAll(dir) == Set(
      (1L, 11L, 0L), (2L, 21L, 1L), (3L, 30L, 2L), (9L, 90L, 2L)))
    // and interim appends into OTHER partitions rebase fine
    val v4 = ManifestStore.commit(rows((2L, 22L, 1L)), "p", Seq(1L),
      dir, baseVersion = Some(2L))
    assert(v4 == 4L)
    assert(readAll(dir) == Set(
      (1L, 11L, 0L), (2L, 22L, 1L), (3L, 30L, 2L), (9L, 90L, 2L)))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("merge with maxEditRetries: racing merges on the SAME " +
    "partition both land in some serial order (both edits visible); " +
    "without retries the conflict stays typed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mretry").toString
    val sch = schema
    // 4 keys in one partition
    ManifestStore.init(
      rows((1L, 10L, 0L), (2L, 20L, 0L), (3L, 30L, 0L), (4L, 40L, 0L)),
      "p", dir)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def editor(key: Long, v: Long): Thread = new Thread(() => {
      try {
        barrier.await()
        ManifestStore.merge(spark, dir, sch, "p", "k",
          upserts = rows((key, v, 0L)), maxEditRetries = 4)
        ()
      } catch { case t: Throwable => errs.add(t); () }
    })
    val ts = Seq(editor(1L, 111L), editor(2L, 222L))
    ts.foreach(_.start()); ts.foreach(_.join(180000))
    assert(errs.isEmpty,
      s"retrying merges must both land: ${Option(errs.peek())}")
    assert(readAll(dir) == Set(
      (1L, 111L, 0L), (2L, 222L, 0L), (3L, 30L, 0L), (4L, 40L, 0L)),
      "both racing edits must be visible — a serial order, no lost edit")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("two rewrites racing the version CAS on DISJOINT partitions " +
    "both land whatever the interleaving; the result equals the " +
    "serial order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-occ2").toString
    ManifestStore.init(
      rows((1L, 10L, 0L), (2L, 20L, 1L)), "p", dir)                   // v0
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def racer(part: Long, v: Long): Thread = new Thread(() => {
      try {
        barrier.await()
        ManifestStore.commit(
          rows((part + 1L, v, part)), "p", Seq(part), dir,
          baseVersion = Some(0L))
        ()
      } catch { case t: Throwable => errs.add(t); () }
    })
    val ts = Seq(racer(0L, 111L), racer(1L, 222L))
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(errs.isEmpty, s"disjoint racers must both land: ${errs.peek()}")
    assert(ManifestStore.latestVersion(dir).contains(2L))
    assert(readAll(dir) == Set((1L, 111L, 0L), (2L, 222L, 1L)),
      "both racing rewrites must be visible — serial-order content")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("TIMESTAMP AS OF: commit timestamps are strictly increasing, " +
    "versionAt resolves the newest version at-or-before the pin " +
    "(byte-stable mid-churn), too-early pins are the typed retention " +
    "error, and pre-timestamp manifests are skipped, never guessed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-asof").toString
    ManifestStore.init(rows((1L, 10L, 0L)), "p", dir)                 // v0
    ManifestStore.commit(rows((1L, 11L, 0L)), "p", Seq(0L), dir)      // v1
    ManifestStore.commit(rows((1L, 12L, 0L)), "p", Seq(0L), dir)      // v2
    val ts = (0L to 2L).map(v => ManifestStore.commitTs(dir, v).get)
    assert(ts == ts.sorted && ts.distinct == ts,
      s"commit timestamps must be strictly increasing: $ts")
    // exact pin, in-between pin (resolves DOWN), and a pin after all
    assert(ManifestStore.versionAt(dir, ts(1)) == 1L)
    assert(ManifestStore.versionAt(dir, ts(2) - 1L) == 1L)
    assert(ManifestStore.versionAt(dir, ts(2) + 1000L) == 2L)
    val pinned = ManifestStore.readAsOf(spark, dir, schema, "p", ts(1))
      .as[(Long, Long, Long)].collect().toSet
    assert(pinned == Set((1L, 11L, 0L)))
    // churn on top: the as-of read is byte-stable
    ManifestStore.commit(rows((1L, 13L, 0L)), "p", Seq(0L), dir)      // v3
    assert(ManifestStore.readAsOf(spark, dir, schema, "p", ts(1))
      .as[(Long, Long, Long)].collect().toSet == pinned,
      "an as-of pin must not move under a publishing writer")
    // a pin before the first retained commit: typed retention error
    intercept[RetentionException](
      ManifestStore.versionAt(dir, ts(0) - 1L))
    // a manifest WITHOUT a recorded timestamp (pre-upgrade format) is
    // never resolved by a timestamp pin — hand-write one as v4's elder
    val legacy = new org.apache.hadoop.fs.Path(
      s"$dir/_manifests/v000000000099.json")
    StoreFs.writeAtomicNoReplace(legacy, "p=0/nonexistent.parquet")
    // pin at v3's OWN commit time (wall-clock-window-free: a loaded
    // host can stretch any fixed offset): v99 is newer-numbered but
    // timestampless, so the pin must resolve v3, never v99
    val ts3 = ManifestStore.commitTs(dir, 3L).get
    assert(ManifestStore.versionAt(dir, ts3) == 3L,
      "a timestampless manifest must be skipped by versionAt")
    StoreFs.delete(legacy)
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("AGE-based retention: a version older than the bound drops " +
    "even inside the count window — exactly the aged versions go, " +
    "the latest always survives, and their exclusive files are " +
    "reclaimed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-age").toString
    ManifestStore.init(rows((1L, 10L, 0L)), "p", dir)                 // v0
    ManifestStore.commit(rows((1L, 11L, 0L)), "p", Seq(0L), dir)      // v1
    Thread.sleep(60)
    // v2 publishes with a 50 ms age bound: v0/v1 are older -> dropped
    // although retainVersions=8 would have kept them
    ManifestStore.commit(rows((1L, 12L, 0L)), "p", Seq(0L), dir,
      retainVersions = 8, retainAgeMillis = Some(50L))                // v2
    intercept[RetentionException](readAll(dir, Some(0L)))
    intercept[RetentionException](readAll(dir, Some(1L)))
    assert(readAll(dir, Some(2L)) == Set((1L, 12L, 0L)))
    // v0/v1's exclusive files are gone from disk; v2's remain
    assert(dataFiles(dir) == ManifestStore.files(dir, 2L).toSet)
    // the LATEST always survives an age sweep, however old: an
    // immediate next publish with a tiny bound keeps its predecessor
    // only if young — but never drops its own version
    Thread.sleep(60)
    ManifestStore.commit(rows((1L, 13L, 0L)), "p", Seq(0L), dir,
      retainVersions = 8, retainAgeMillis = Some(50L))                // v3
    assert(ManifestStore.latestVersion(dir).contains(3L))
    assert(readAll(dir) == Set((1L, 13L, 0L)))
    intercept[RetentionException](readAll(dir, Some(2L)))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("the tag ledger is ATOMIC with its manifest: tags ride in the " +
    "manifest body (no sidecar ordering window), survive a rewrite, " +
    "and a legacy sidecar still reads for pre-embedding versions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ledger").toString
    ManifestStore.init(rows((1L, 10L, 0L)), "p", dir)                 // v0
    ManifestStore.append(rows((2L, 20L, 1L)), "p", dir,
      tag = Some("b00042"))                                           // v1
    assert(ManifestStore.tags(dir, 1L) == Seq("b00042"))
    // the ledger is IN the manifest file itself — one atomic CAS, and
    // no t-sidecar exists for the new format
    val mLines = StoreFs.readLines(new org.apache.hadoop.fs.Path(
      s"$dir/_manifests/v000000000001.json"))
    assert(mLines.exists(_.startsWith("#tags=b00042")),
      s"the ledger must be embedded: $mLines")
    assert(!StoreFs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_manifests/t000000000001.json")),
      "no sidecar may be written for embedded-ledger manifests")
    // a content rewrite (compaction-shaped commit) carries it forward
    ManifestStore.commit(rows((2L, 21L, 1L)), "p", Seq(1L), dir)      // v2
    assert(ManifestStore.tags(dir, 2L) == Seq("b00042"),
      "rewrites must carry the ledger forward atomically")
    // legacy fallback: a manifest without the header reads its sidecar
    val legacyM = new org.apache.hadoop.fs.Path(
      s"$dir/_manifests/v000000000077.json")
    val legacyT = new org.apache.hadoop.fs.Path(
      s"$dir/_manifests/t000000000077.json")
    StoreFs.writeAtomicNoReplace(legacyM, "p=0/none.parquet")
    StoreFs.writeAtomicNoReplace(legacyT, "old1\nold2")
    assert(ManifestStore.tags(dir, 77L) == Seq("old1", "old2"),
      "pre-embedding versions must fall back to the sidecar ledger")
    StoreFs.delete(legacyM); StoreFs.delete(legacyT)
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("the object-store claim FAILS FAST on unverified connectors: " +
    "no capability + no opt-in throws with guidance; the explicit " +
    "opt-in conf unlocks it; legacy schemes never pass") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.s3a.impl", classOf[MemObjectFileSystem].getName)
    hconf.set("fs.wasb.impl", classOf[MemObjectFileSystem].getName)
    hconf.set("fs.s3a.impl.disable.cache", "true")
    hconf.set("fs.wasb.impl.disable.cache", "true")
    MemObjectFileSystem.clear()
    val target = new org.apache.hadoop.fs.Path(
      "s3a:///gate/_manifests/v000000000001.json")
    // s3a is in the dispatch set, but this connector declares no
    // conditional-create capability and nothing opted in: the claim
    // must fail fast (check-then-act would double-publish), not
    // silently degrade
    val e = intercept[UnsupportedOperationException](
      StoreFs.writeAtomicNoReplace(target, "unverified"))
    assert(e.getMessage.contains("conditional"),
      s"the failure must say WHY and how to opt in: ${e.getMessage}")
    assert(MemObjectFileSystem.contentOf(
      "/gate/_manifests/v000000000001.json").isEmpty,
      "nothing may be written on the failed gate")
    // the operator asserts the deployment supports conditional create:
    // the claim proceeds and stays a true CAS
    hconf.setBoolean("graft.store.objectstore.cas.confirmed", true)
    try {
      assert(StoreFs.writeAtomicNoReplace(target, "verified"))
      assert(!StoreFs.writeAtomicNoReplace(target, "late"))
      assert(StoreFs.readLines(target) == Seq("verified"))
      // legacy connectors (s3n/swift/wasb) NEVER pass — no release of
      // those supports conditional create, opt-in or not
      val lw = intercept[UnsupportedOperationException](
        StoreFs.writeAtomicNoReplace(new org.apache.hadoop.fs.Path(
          "wasb:///gate/_manifests/v000000000001.json"), "legacy"))
      assert(lw.getMessage.contains("no conditional-create support"))
    } finally {
      hconf.unset("graft.store.objectstore.cas.confirmed")
      MemObjectFileSystem.clear()
    }
  }

  test("two interleaved committers serialize or fence — never a mixed " +
    "snapshot, never two writers on one version") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mstore-cas").toString
    ManifestStore.init(rows((1L, 10L, 0L), (2L, 20L, 1L)), "p", dir)
    val latch = new java.util.concurrent.CyclicBarrier(2)
    val outcomes =
      new java.util.concurrent.ConcurrentHashMap[Long, Either[Throwable, Long]]()
    // both rewrite partition 0, started together: depending on timing
    // they either fully serialize (both publish, distinct versions) or
    // overlap (the CAS fences the second publisher) — BOTH are correct;
    // what must never happen is a manifest mixing the two commits'
    // rows or two successes on the same version
    val ts = Seq((5L, 50L), (6L, 60L)).map { case (k, v) =>
      new Thread(() => {
        try {
          latch.await()
          outcomes.put(k, Right(
            ManifestStore.commit(rows((k, v, 0L)), "p", Seq(0L), dir)))
        } catch { case t: Throwable => outcomes.put(k, Left(t)) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    import scala.jdk.CollectionConverters._
    val byKey = outcomes.asScala.toMap
    assert(byKey.size == 2)
    val succeeded = byKey.collect { case (k, Right(v)) => k -> v }
    assert(succeeded.nonEmpty, s"at least one commit must land: $byKey")
    assert(succeeded.values.toSeq.distinct.size == succeeded.size,
      s"two successes on one version: $byKey")
    // the snapshot holds EXACTLY ONE of the two rows at p=0 — the
    // committer that published the highest version — never both
    val finalKv = readAll(dir)
    val p0 = finalKv.filter(_._3 == 0L)
    assert(p0.size == 1, s"mixed snapshot after race: $finalKv")
    val lastKey = succeeded.maxBy(_._2)._1
    assert(p0.head._1 == lastKey,
      s"snapshot row ${p0.head} is not the last publisher's ($lastKey)")
    // a fenced loser surfaced loudly, never as silent data loss
    byKey.values.collect { case Left(t) => t }.foreach { t =>
      assert(t.isInstanceOf[ConcurrentCommitException] || t.getMessage != null)
    }
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("commit rejects rows whose partition value is outside touched " +
    "(they would be appended unlisted and destroyed by GC)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mstore-guard").toString
    ManifestStore.init(rows((1L, 10L, 0L), (2L, 20L, 1L)), "p", dir)
    val e = intercept[IllegalArgumentException] {
      ManifestStore.commit(
        rows((1L, 11L, 0L), (9L, 90L, 7L)), "p", Seq(0L), dir)
    }
    assert(e.getMessage.contains("outside touched"))
    // nothing published, nothing lost
    assert(ManifestStore.latestVersion(dir).contains(0L))
    assert(readAll(dir) == Set((1L, 10L, 0L), (2L, 20L, 1L)))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("store paths work through the Hadoop FileSystem API (file: URI)") {
    val raw = java.nio.file.Files.createTempDirectory("graft-mstore-uri").toString
    val dir = s"file:$raw"
    ManifestStore.init(rows((1L, 10L, 0L), (2L, 20L, 1L)), "p", dir)
    ManifestStore.commit(rows((1L, 11L, 0L)), "p", Seq(0L), dir)
    assert(readAll(dir) == Set((1L, 11L, 0L), (2L, 20L, 1L)))
    assert(ManifestStore.latestVersion(dir).contains(1L))
    graft.sources.FileIO.deleteScratch(new java.io.File(raw))
  }

  test("zone maps: footer-harvested per-file bounds prune a range read " +
    "to the intersecting files only; carried files keep their bounds; " +
    "results never change") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zonemap").toString
    // two partitions, low k values — one file each
    ManifestStore.init(
      rows((1L, 10L, 0L), (2L, 20L, 0L), (3L, 30L, 1L), (4L, 40L, 1L)),
      "p", dir, statsCols = Seq("k"))
    // a second commit adds HIGH-k files into the SAME partitions: each
    // partition now holds a low-range and a high-range file — the case
    // partition pruning alone cannot separate
    ManifestStore.commit(
      rows((1L, 10L, 0L), (2L, 20L, 0L), (100L, 1L, 0L)),
      "p", Seq(0L), dir, statsCols = Seq("k"))
    ManifestStore.commit(
      rows((3L, 30L, 1L), (4L, 40L, 1L), (200L, 2L, 1L), (201L, 3L, 1L)),
      "p", Seq(1L), dir, statsCols = Seq("k"))
    val all = ManifestStore.selectFiles(dir, "p")
    assert(all.size == 2, "one file per rewritten partition")
    // v1 carried partition p=1's INIT file; its bounds must have
    // carried into v1's sidecar (no re-read of an immutable file)
    val v1 = ManifestStore.stats(dir, 1L)
    val carriedP1 = v1.collect {
      case (f, st) if f.startsWith("p=1/") => st("k")
    }.toSeq
    assert(carriedP1 == Seq((3L, 4L)), s"carried bounds wrong: $v1")
    // range [150, 250] intersects only p=1's rewrite (k 3..201)
    val hit = ManifestStore.selectFiles(
      dir, "p", range = Some(("k", 150L, 250L)))
    assert(hit.size == 1 && hit.head.startsWith("p=1/"),
      s"expected only the high-k p=1 file, got $hit")
    // range below every bound selects nothing — the read is an empty
    // frame without opening a single data file
    assert(ManifestStore.selectFiles(
      dir, "p", range = Some(("k", 1000L, 2000L))).isEmpty)
    // the skip path returns exactly what a full read + exact filter
    // does (file-granular pruning + the caller's predicate)
    val viaSkip = ManifestStore.read(
      spark, dir, schema, "p", range = Some(("k", 150L, 250L)))
      .filter(col("k").between(150L, 250L))
      .select("k", "v", "p").as[(Long, Long, Long)].collect().toSet
    assert(viaSkip == Set((200L, 2L, 1L), (201L, 3L, 1L)))
    assert(readAll(dir).filter(r => r._1 >= 150 && r._1 <= 250) == viaSkip)
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("append accumulates files under the same partitions: content is " +
    "the union, earlier versions stay readable, zone maps prune WITHIN " +
    "a partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft-append").toString
    ManifestStore.init(
      rows((1L, 10L, 0L), (2L, 20L, 1L)), "p", dir, statsCols = Seq("k"))
    ManifestStore.append(
      rows((100L, 30L, 0L), (200L, 40L, 1L)), "p", dir,
      statsCols = Seq("k"))
    // union content; both files live under each partition
    assert(readAll(dir) == Set(
      (1L, 10L, 0L), (2L, 20L, 1L), (100L, 30L, 0L), (200L, 40L, 1L)))
    assert(ManifestStore.selectFiles(dir, "p",
      partVals = Some(Seq(0L))).size == 2)
    // v0 time travel still reads the pre-append snapshot
    assert(readAll(dir, Some(0L)) == Set((1L, 10L, 0L), (2L, 20L, 1L)))
    // zone maps prune within p=0: the appended file (k=100) alone
    // intersects [50, 150] — partition pruning alone cannot do this
    val sel = ManifestStore.selectFiles(dir, "p",
      partVals = Some(Seq(0L)), range = Some(("k", 50L, 150L)))
    assert(sel.size == 1, s"expected only the appended p=0 file: $sel")
    // a rewrite commit on top of appends replaces ALL of a partition's
    // accumulated files
    ManifestStore.commit(rows((7L, 70L, 0L)), "p", Seq(0L), dir,
      statsCols = Seq("k"))
    assert(readAll(dir) == Set(
      (7L, 70L, 0L), (2L, 20L, 1L), (200L, 40L, 1L)))
    assert(ManifestStore.selectFiles(dir, "p",
      partVals = Some(Seq(0L))).size == 1)
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("compaction folds an appended partition's files into one: " +
    "content identical, pinned readers untouched, idle when nothing " +
    "is crowded") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    ManifestStore.init(rows((0L, 0L, 0L), (1000L, 0L, 1L)), "p", dir,
      statsCols = Seq("k"))
    (1 to 5).foreach { i =>
      ManifestStore.append(rows((i.toLong, i.toLong, 0L)), "p", dir,
        statsCols = Seq("k"))
    }
    val before = readAll(dir)
    val pinned = ManifestStore.latestVersion(dir).get
    assert(ManifestStore.selectFiles(dir, "p",
      partVals = Some(Seq(0L))).size == 6, "init + 5 appends")
    // p=0 (6 files) compacts; p=1 (1 file) is left alone
    val v = ManifestStore.compact(spark, dir, schema, "p",
      maxFilesPerPartition = 4, statsCols = Seq("k"))
    assert(v.nonEmpty)
    assert(ManifestStore.selectFiles(dir, "p",
      partVals = Some(Seq(0L))).size == 1)
    assert(ManifestStore.selectFiles(dir, "p",
      partVals = Some(Seq(1L))).size == 1)
    assert(readAll(dir) == before, "compaction must not change content")
    // the pre-compaction version still reads (append-only files +
    // retention) — a pinned consumer never notices the rewrite
    assert(readAll(dir, Some(pinned)) == before)
    // the compacted file's bounds are the union of the old files'
    assert(ManifestStore.stats(dir, v.get).collect {
      case (f, st) if f.startsWith("p=0/") => st("k")
    }.toSeq == Seq((0L, 5L)))
    // nothing crowded anymore: compact is a no-op
    assert(ManifestStore.compact(spark, dir, schema, "p",
      maxFilesPerPartition = 4).isEmpty)
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("add-column schema evolution: old files read the new column as " +
    "null under the explicit snapshot schema; appended files carry it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    ManifestStore.init(rows((1L, 10L, 0L), (2L, 20L, 1L)), "p", dir)
    // the store's schema grows a column; new batches carry it
    val widened = StructType(schema.fields :+
      StructField("w", LongType))
    ManifestStore.append(
      Seq((5L, 50L, 0L, 777L)).toDF("k", "v", "p", "w"), "p", dir)
    val got = ManifestStore.read(spark, dir, widened, "p")
      .select("k", "v", "p", "w")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 10L, 0L, None), (2L, 20L, 1L, None),
      (5L, 50L, 0L, Some(777L))),
      "pre-evolution files must read the new column as null")
    // the old schema still reads every file (the column is ignored)
    assert(readAll(dir) == Set((1L, 10L, 0L), (2L, 20L, 1L), (5L, 50L, 0L)))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("appends commute: concurrent appenders racing the version CAS " +
    "all land (optimistic metadata retry), no rows lost, rewrite " +
    "commits keep the typed conflict") {
    val dir = java.nio.file.Files.createTempDirectory("graft-app-race").toString
    ManifestStore.init(rows((0L, 0L, 0L)), "p", dir)
    val threads = 6
    val barrier = new java.util.concurrent.CyclicBarrier(threads)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = (1 to threads).map { th =>
      new Thread(() => {
        try {
          barrier.await()
          ManifestStore.append(
            rows((th.toLong, th.toLong * 10, th.toLong % 2)), "p", dir,
            retainVersions = 100)
          ()
        } catch { case e: Throwable => failures.add(e); () }
      })
    }
    pool.foreach(_.start()); pool.foreach(_.join())
    assert(failures.isEmpty,
      s"racing appends must all succeed: ${failures.peek()}")
    assert(ManifestStore.latestVersion(dir).contains(threads.toLong),
      "each append publishes exactly one version")
    assert(readAll(dir) == (0 to threads).map(i =>
      (i.toLong, i.toLong * 10, i.toLong % 2)).toSet,
      "no append's rows may be lost to the race")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("bloom point-location: a hashed (non-clustered) key locates its " +
    "file through the parquet blooms where zone maps cannot prune; " +
    "point reads stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    // k is arrival-clustered (zone maps work for k); u is a hashed
    // unique key whose per-file min/max span the whole domain — the
    // bloom is the only thing that can exclude files for a u-lookup
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(k => (k, (k * 7919L) % 100003L, k % 2))
        .toDF("k", "u", "p")
    ManifestStore.init(batch(0, 40), "p", dir,
      statsCols = Seq("k", "u"), bloomCols = Seq("u"))
    (1 to 4).foreach(i =>
      ManifestStore.append(batch(i * 40L, i * 40L + 40L), "p", dir,
        statsCols = Seq("k", "u"), bloomCols = Seq("u")))
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("u", LongType), StructField("p", LongType)))
    val total = ManifestStore.selectFiles(dir, "p",
      partVals = Some(Seq(0L))).size
    assert(total == 5, "init + 4 appends, one file per batch in p=0")
    // the lookup key: row k=130 (batch 3), u = 130*7919 % 100003
    val u = (130L * 7919L) % 100003L
    // zone maps alone keep (almost) everything — u is hashed
    val zoneOnly = ManifestStore.selectFiles(dir, "p",
      partVals = Some(Seq(0L)), range = Some(("u", u, u))).size
    assert(zoneOnly >= 4, s"hashed key should defeat min/max pruning: $zoneOnly")
    // the blooms exclude the other batches' files (≤1 false positive
    // tolerated; the true file must survive)
    val located = ManifestStore.locate(dir, "p", "u", u,
      partVals = Some(Seq(0L)))
    assert(located.size <= 2,
      s"blooms must exclude non-holding files: $located")
    assert(located.nonEmpty, "the holding file must survive")
    // the point read is exact regardless of bloom false positives
    assert(ManifestStore.readPoint(spark, dir, schema, "p", "u", u)
      .select("k", "u", "p").as[(Long, Long, Long)].collect().toSet ==
      Set((130L, u, 0L)))
    // an absent key point-reads empty (any false-positive file opens,
    // the exact filter drops it)
    assert(ManifestStore.readPoint(
      spark, dir, schema, "p", "u", 99991L).isEmpty)
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("deleteWhere: the zone maps name the intersecting partitions, " +
    "untouched partitions' files carry byte-identical, emptied " +
    "partitions drop, a non-intersecting range is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft-delrange").toString
    // p=0 holds k 0..9, p=1 holds k 100..109 — a [100, 104] sweep
    // must never touch p=0's file
    ManifestStore.init(
      rows((0L until 10L).map(k => (k, k * 10, 0L)) ++
        (100L until 110L).map(k => (k, k * 10, 1L)): _*),
      "p", dir, statsCols = Seq("k"))
    val p0Files = ManifestStore.files(dir, 0L).filter(_.startsWith("p=0/"))
    val v1 = ManifestStore.deleteWhere(
      spark, dir, schema, "p", "k", 100L, 104L, statsCols = Seq("k"))
    assert(v1 == 1L)
    assert(readAll(dir) ==
      ((0L until 10L).map(k => (k, k * 10, 0L)) ++
        (105L until 110L).map(k => (k, k * 10, 1L))).toSet)
    assert(ManifestStore.files(dir, v1).filter(_.startsWith("p=0/"))
      == p0Files, "the non-intersecting partition's files must carry")
    // a range no file intersects: no-op, no new version
    assert(ManifestStore.deleteWhere(
      spark, dir, schema, "p", "k", 5000L, 6000L) == v1)
    // sweeping a whole partition empties it out of the snapshot
    val v2 = ManifestStore.deleteWhere(
      spark, dir, schema, "p", "k", 105L, 109L, statsCols = Seq("k"))
    assert(readAll(dir) == (0L until 10L).map(k => (k, k * 10, 0L)).toSet)
    assert(!ManifestStore.files(dir, v2).exists(_.startsWith("p=1/")),
      "an emptied partition must leave the manifest")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("change-data-feed: the manifest diff yields exactly the " +
    "row-level edits — rewritten partitions' unchanged rows cancel, " +
    "untouched partitions never enter the diff, appends feed pure " +
    "inserts, a self-diff is empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft-changes").toString
    val v0 = ManifestStore.init(
      rows((1L, 10L, 0L), (2L, 20L, 0L), (3L, 30L, 1L)), "p", dir)
    // rewrite p=0: update k=1, drop k=2, insert k=4 — p=1 untouched
    val v1 = ManifestStore.commit(
      rows((1L, 11L, 0L), (4L, 40L, 0L)), "p", Seq(0L), dir)
    def changes(a: Long, b: Long) =
      ManifestStore.readChanges(spark, dir, schema, "p", a, b)
        .select("k", "v", "p", "change")
        .as[(Long, Long, Long, String)].collect().toSet
    assert(changes(v0, v1) == Set(
      (1L, 10L, 0L, "delete"), (1L, 11L, 0L, "insert"),
      (2L, 20L, 0L, "delete"), (4L, 40L, 0L, "insert")),
      "the feed must carry exactly the edits (k=3's partition is " +
        "untouched and must not appear)")
    // an append-only commit feeds pure inserts
    val v2 = ManifestStore.append(rows((9L, 90L, 1L)), "p", dir)
    assert(changes(v1, v2) == Set((9L, 90L, 1L, "insert")))
    // identity and composition sanity
    assert(changes(v1, v1).isEmpty, "a self-diff must be empty")
    assert(changes(v0, v2) == Set(
      (1L, 10L, 0L, "delete"), (1L, 11L, 0L, "insert"),
      (2L, 20L, 0L, "delete"), (4L, 40L, 0L, "insert"),
      (9L, 90L, 1L, "insert")))
    // a from-version past retention is a defined error, never a guess
    (0 until 8).foreach(i => ManifestStore.append(
      rows((100L + i, 1L, 1L)), "p", dir, retainVersions = 3))
    val err = intercept[graft.sources.RetentionException] {
      ManifestStore.readChanges(spark, dir, schema, "p", v0, v2)
    }
    assert(err.getMessage.contains("past retention"))
    // and the OTHER IllegalArgument path (bad version order) must NOT
    // read as retention — typed dispatch keeps them apart
    val order = intercept[IllegalArgumentException] {
      ManifestStore.readChanges(spark, dir, schema, "p", v2, v1)
    }
    assert(!order.isInstanceOf[graft.sources.RetentionException])
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("OPTIMIZE ZORDER: clustered compaction makes the zone maps " +
    "prune on a SECOND dimension arrival order never sorted by; " +
    "metadata aggregates answer exactly with zero file opens") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // k arrival-clusters per batch; u = (k*37)%400 visits the whole
    // domain inside every batch — per-file u bounds span everything
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(k => (k, (k * 37L) % 400L, k % 2)).toDF("k", "u", "p")
    val sch = StructType(Seq(StructField("k", LongType),
      StructField("u", LongType), StructField("p", LongType)))
    ManifestStore.init(batch(0, 100), "p", dir, statsCols = Seq("k", "u"))
    (1 to 3).foreach(i =>
      ManifestStore.append(batch(i * 100L, i * 100L + 100L), "p", dir,
        statsCols = Seq("k", "u")))
    val expected = batch(0, 400).as[(Long, Long, Long)].collect().toSet
    def readAllZ(version: Option[Long] = None) =
      ManifestStore.read(spark, dir, sch, "p", None, version)
        .select("k", "u", "p").as[(Long, Long, Long)].collect().toSet
    // metadata-only aggregates: exact, no data file opened
    assert(ManifestStore.metaCount(dir, "p").contains(400L))
    assert(ManifestStore.metaMinMax(dir, "k", "p").contains((0L, 399L)))
    assert(ManifestStore.metaMinMax(dir, "u", "p")
      .exists { case (lo, hi) => lo == 0L && hi >= 390L })
    assert(ManifestStore.metaCount(dir, "p", partVals = Some(Seq(0L)))
      .contains(200L), "partition-pruned metadata count")
    // BEFORE clustering a u-slice keeps (nearly) every file
    val total0 = ManifestStore.selectFiles(dir, "p").size
    val uBefore = ManifestStore.selectFiles(dir, "p",
      range = Some(("u", 0L, 99L))).size
    assert(uBefore >= total0 - 1,
      s"drill premise: arrival order must not bound u: $uBefore/$total0")
    val pinned = ManifestStore.latestVersion(dir).get
    // 8 files/partition: sequential row-count cuts land INSIDE the
    // z-quadrants (a 4-way cut straddles quadrant boundaries, which
    // widens the secondary dim's bounds on the straddling files)
    ManifestStore.compactClustered(spark, dir, sch, "p",
      dims = Seq("k", "u"), bits = 8, filesPerPartition = 8,
      statsCols = Seq("k", "u"))
    // content-identical rewrite; the pinned pre-cluster version intact
    assert(readAllZ() == expected, "clustering must not change content")
    assert(readAllZ(Some(pinned)) == expected)
    // AFTER: both a u-slice AND a k-slice prune at the manifest
    val total1 = ManifestStore.selectFiles(dir, "p").size
    assert(total1 > 2, s"clustered rewrite should cut several files: $total1")
    val uAfter = ManifestStore.selectFiles(dir, "p",
      range = Some(("u", 0L, 99L))).size
    val kAfter = ManifestStore.selectFiles(dir, "p",
      range = Some(("k", 0L, 49L))).size
    assert(uAfter < total1,
      s"z-clustering must bound the second dim: $uAfter/$total1")
    assert(kAfter < total1,
      s"z-clustering must still bound the first dim: $kAfter/$total1")
    // the sliced read stays exact
    assert(ManifestStore.read(spark, dir, sch, "p",
      range = Some(("u", 0L, 99L)))
      .filter(col("u").between(0L, 99L))
      .as[(Long, Long, Long)].collect().toSet ==
      expected.filter(r => r._2 <= 99L))
    // a CONJUNCTIVE 2-D slice prunes at least as hard as either dim
    // alone and reads exactly
    val both = ManifestStore.selectFiles(dir, "p",
      ranges = Seq(("u", 0L, 99L), ("k", 0L, 49L))).size
    assert(both <= math.min(uAfter, kAfter),
      s"conjunction must intersect the per-dim selections: $both")
    assert(ManifestStore.read(spark, dir, sch, "p",
      ranges = Seq(("u", 0L, 99L), ("k", 0L, 49L)))
      .filter(col("u").between(0L, 99L) && col("k") <= 49L)
      .as[(Long, Long, Long)].collect().toSet ==
      expected.filter(r => r._2 <= 99L && r._1 <= 49L))
    // metadata aggregates survive the rewrite
    assert(ManifestStore.metaCount(dir, "p").contains(400L))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("OPTIMIZE ZORDER with curve = HILBERT: strictly-contiguous " +
    "file boxes prune a 2-D slice grid at least as hard as Z on the " +
    "same data, content stays identical, and 1 dim rejects typed") {
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(k => (k, (k * 37L) % 400L, k % 2)).toDF("k", "u", "p")
    val sch = StructType(Seq(StructField("k", LongType),
      StructField("u", LongType), StructField("p", LongType)))
    val expected = batch(0, 400).as[(Long, Long, Long)].collect().toSet
    def build(curve: graft.operators.Layout.Curve): String = {
      val dir = java.nio.file.Files.createTempDirectory(
        s"graft-curve-$curve").toString
      ManifestStore.init(batch(0, 100), "p", dir, statsCols = Seq("k", "u"))
      (1 to 3).foreach(i =>
        ManifestStore.append(batch(i * 100L, i * 100L + 100L), "p", dir,
          statsCols = Seq("k", "u")))
      ManifestStore.compactClustered(spark, dir, sch, "p",
        dims = Seq("k", "u"), bits = 8, filesPerPartition = 8,
        statsCols = Seq("k", "u"), curve = curve)
      dir
    }
    val zDir = build(graft.operators.Layout.Z)
    val hDir = build(graft.operators.Layout.Hilbert)
    // identical content either way (clustering is layout, not data)
    assert(ManifestStore.read(spark, hDir, sch, "p")
      .as[(Long, Long, Long)].collect().toSet == expected)
    // the same 4x4 slice grid over (k, u): hilbert's contiguous boxes
    // must prune at least as well as z's in total, and every slice
    // still reads exactly
    def gridCost(dir: String): Int =
      (for { i <- 0 until 4; j <- 0 until 4 } yield
        ManifestStore.selectFiles(dir, "p", ranges = Seq(
          ("k", i * 100L, i * 100L + 99L),
          ("u", j * 100L, j * 100L + 99L))).size).sum
    val (zCost, hCost) = (gridCost(zDir), gridCost(hDir))
    assert(hCost <= zCost,
      s"hilbert must prune the slice grid at least as hard as z: " +
        s"hilbert=$hCost z=$zCost")
    assert(ManifestStore.read(spark, hDir, sch, "p",
      ranges = Seq(("k", 0L, 99L), ("u", 100L, 199L)))
      .filter(col("k") <= 99L && col("u").between(100L, 199L))
      .as[(Long, Long, Long)].collect().toSet ==
      expected.filter(r => r._1 <= 99L && r._2 >= 100L && r._2 <= 199L))
    // hilbert needs at least two dims — typed, not silent
    intercept[IllegalArgumentException](
      ManifestStore.compactClustered(spark, hDir, sch, "p",
        dims = Seq("k"), bits = 8,
        curve = graft.operators.Layout.Hilbert))
    graft.sources.FileIO.deleteScratch(new java.io.File(zDir))
    graft.sources.FileIO.deleteScratch(new java.io.File(hDir))
  }

  test("HILBERT clustering in 3-D (the d-dim Skilling kernel): the " +
    "4x4x4 slice grid prunes at least as hard as Z on identical " +
    "data, and content stays identical") {
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(k => (k, (k * 37L) % 400L, (k * 91L) % 400L, k % 2))
        .toDF("k", "u", "w", "p")
    val sch = StructType(Seq(StructField("k", LongType),
      StructField("u", LongType), StructField("w", LongType),
      StructField("p", LongType)))
    val expected = batch(0, 400).as[(Long, Long, Long, Long)].collect().toSet
    def build(curve: graft.operators.Layout.Curve): String = {
      val dir = java.nio.file.Files.createTempDirectory(
        s"graft-curve3-$curve").toString
      ManifestStore.init(batch(0, 100), "p", dir,
        statsCols = Seq("k", "u", "w"))
      (1 to 3).foreach(i =>
        ManifestStore.append(batch(i * 100L, i * 100L + 100L), "p", dir,
          statsCols = Seq("k", "u", "w")))
      ManifestStore.compactClustered(spark, dir, sch, "p",
        dims = Seq("k", "u", "w"), bits = 8, filesPerPartition = 8,
        statsCols = Seq("k", "u", "w"), curve = curve)
      dir
    }
    val zDir = build(graft.operators.Layout.Z)
    val hDir = build(graft.operators.Layout.Hilbert)
    assert(ManifestStore.read(spark, hDir, sch, "p")
      .as[(Long, Long, Long, Long)].collect().toSet == expected)
    def gridCost(dir: String): Int =
      (for { i <- 0 until 4; j <- 0 until 4; l <- 0 until 4 } yield
        ManifestStore.selectFiles(dir, "p", ranges = Seq(
          ("k", i * 100L, i * 100L + 99L),
          ("u", j * 100L, j * 100L + 99L),
          ("w", l * 100L, l * 100L + 99L))).size).sum
    val (zCost, hCost) = (gridCost(zDir), gridCost(hDir))
    assert(hCost <= zCost,
      s"3-D hilbert must prune the slice grid at least as hard as z: " +
        s"hilbert=$hCost z=$zCost")
    // a sliced read still answers exactly through the pruned files
    assert(ManifestStore.read(spark, hDir, sch, "p",
      ranges = Seq(("k", 0L, 99L), ("u", 100L, 199L), ("w", 200L, 299L)))
      .filter(col("k") <= 99L && col("u").between(100L, 199L) &&
        col("w").between(200L, 299L))
      .as[(Long, Long, Long, Long)].collect().toSet ==
      expected.filter(r => r._1 <= 99L && r._2 >= 100L && r._2 <= 199L &&
        r._3 >= 200L && r._3 <= 299L))
    graft.sources.FileIO.deleteScratch(new java.io.File(zDir))
    graft.sources.FileIO.deleteScratch(new java.io.File(hDir))
  }

  test("INT32 bloom columns probe with 4-byte hashes: a Long-valued " +
    "lookup against an int column still finds its file (the Long hash " +
    "would be a guaranteed false negative), multi-key location answers " +
    "all keys in one pass, out-of-int32 values exclude exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom32").toString
    // u is INT32 physical (IntegerType): its blooms were fed 4-byte
    // hashes — probing them with hash(Long) finds nothing, ever
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(k =>
        (k, ((k * 7919L) % 100003L).toInt, k % 2)).toDF("k", "u", "p")
    ManifestStore.init(batch(0, 40), "p", dir,
      statsCols = Seq("k", "u"), bloomCols = Seq("u"))
    (1 to 4).foreach(i =>
      ManifestStore.append(batch(i * 40L, i * 40L + 40L), "p", dir,
        statsCols = Seq("k", "u"), bloomCols = Seq("u")))
    val schema32 = StructType(Seq(StructField("k", LongType),
      StructField("u", org.apache.spark.sql.types.IntegerType),
      StructField("p", LongType)))
    val u = (130L * 7919L) % 100003L // row k=130 lives in batch 3, p=0
    val located = ManifestStore.locate(dir, "p", "u", u,
      partVals = Some(Seq(0L)))
    assert(located.nonEmpty,
      "the holding file must survive an INT32 bloom probe")
    assert(located.size <= 2,
      s"blooms must still exclude non-holding files: $located")
    assert(ManifestStore.readPoint(spark, dir, schema32, "p", "u", u)
      .select("k", "p").as[(Long, Long)].collect().toSet ==
      Set((130L, 0L)))
    // several keys at once: one footer pass answers all of them — the
    // present keys locate their files, the absent key locates none
    // (bloom-excluded) and the out-of-int32 key is EXACTLY excluded
    // (an INT32 column cannot hold it)
    val u2 = (131L * 7919L) % 100003L // batch 3, p=1
    val all = ManifestStore.locateAll(dir, "p", "u",
      Seq(u, u2, Int.MaxValue.toLong + 5L))
    assert(all.getOrElse(u, Nil).nonEmpty && all.getOrElse(u2, Nil).nonEmpty)
    assert(all.getOrElse(Int.MaxValue.toLong + 5L, Nil).isEmpty,
      "a value outside int32 cannot be in an INT32 column")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("merge by key: upserts replace and insert, deletes are LOCATED " +
    "through the blooms without a store scan, untouched partitions' " +
    "files survive byte-identical, pinned readers unaffected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-merge").toString
    // k is the key; p = k % 4 (partition-stable); blooms on k
    def kRows(ks: Long*) = ks.map(k => (k, k * 10, k % 4))
      .toDF("k", "v", "p")
    ManifestStore.init(kRows(0L to 15L: _*), "p", dir,
      statsCols = Seq("k"), bloomCols = Seq("k"))
    val pinned = ManifestStore.latestVersion(dir).get
    val before = readAll(dir)
    val untouchedFiles = ManifestStore.files(dir, pinned)
      .filter(f => f.startsWith("p=2/") || f.startsWith("p=3/"))
    // merge: update k=1 (p=1), insert k=100 (p=0), delete k=5 (p=1 —
    // located via bloom, NOT passed a partition)
    val v = ManifestStore.merge(spark, dir, schema, "p", "k",
      upserts = kRows(1L).withColumn("v", lit(999L))
        .unionByName(kRows(100L)),
      deleteKeys = Seq(5L),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    val expected = before - ((1L, 10L, 1L)) - ((5L, 50L, 1L)) +
      ((1L, 999L, 1L)) + ((100L, 1000L, 0L))
    assert(readAll(dir) == expected)
    // only p=0 and p=1 rewrote: p=2/p=3 entries carried verbatim
    assert(ManifestStore.files(dir, v)
      .filter(f => f.startsWith("p=2/") || f.startsWith("p=3/"))
      == untouchedFiles, "untouched partitions must carry, not rewrite")
    // the pinned pre-merge snapshot still reads the old rows
    assert(readAll(dir, Some(pinned)) == before)
    // a delete-only merge whose key is nowhere touches nothing
    val v2 = ManifestStore.merge(spark, dir, schema, "p", "k",
      upserts = kRows().limit(0), deleteKeys = Seq(777777L),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    assert(readAll(dir) == expected)
    assert(v2 <= v + 1, s"absent-key delete published $v2 after $v")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("commit-time expectations: a violating publish fails typed " +
    "BEFORE anything stages, the store is untouched; passing commits " +
    "and null predicates (SQL CHECK semantics) go through") {
    val dir = java.nio.file.Files.createTempDirectory("graft-expect").toString
    ManifestStore.init(rows((1L, 10L, 0L)), "p", dir)
    val checks = Seq(
      "v_positive" -> (col("v") > 0L),
      "k_not_null" -> col("k").isNotNull)
    // a passing commit goes through
    ManifestStore.commit(rows((2L, 20L, 0L)), "p", Seq(0L), dir,
      expectations = checks)
    assert(readAll(dir) == Set((2L, 20L, 0L)))
    // a violating append fails typed with the counts; nothing changes
    val e = intercept[ExpectationViolation] {
      ManifestStore.append(
        rows((3L, -5L, 0L), (4L, -6L, 0L), (5L, 50L, 0L)), "p", dir,
        expectations = checks)
    }
    assert(e.getMessage.contains("v_positive: 2 rows"), e.getMessage)
    assert(readAll(dir) == Set((2L, 20L, 0L)), "store must be untouched")
    assert(ManifestStore.latestVersion(dir).contains(1L))
    // NULL predicate results PASS (SQL CHECK): a null v is not a
    // violation of v > 0 — constrain nullability explicitly
    val withNull = Seq((6L, Some(60L), 0L), (7L, None, 0L))
      .toDF("k", "v", "p")
    ManifestStore.append(withNull, "p", dir, expectations = checks)
    assert(ManifestStore.read(spark, dir,
      StructType(Seq(StructField("k", LongType),
        StructField("v", LongType), StructField("p", LongType))), "p")
      .count() == 3L)
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("zone maps degrade safely: a stats-free version prunes nothing; " +
    "GC drops sidecars with their manifests") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zonemap-deg").toString
    // v0 without stats: range reads keep every file (correct, unpruned)
    ManifestStore.init(rows((1L, 10L, 0L), (50L, 20L, 1L)), "p", dir)
    assert(ManifestStore.stats(dir, 0L).isEmpty)
    assert(ManifestStore.selectFiles(
      dir, "p", range = Some(("k", 40L, 60L))).size == 2)
    // stats appear from the first stats-carrying commit; the carried
    // stat-less file stays unprunable (kept on any range)
    ManifestStore.commit(rows((1L, 11L, 0L)), "p", Seq(0L), dir,
      statsCols = Seq("k"))
    val sel = ManifestStore.selectFiles(
      dir, "p", range = Some(("k", 40L, 60L)))
    assert(sel.size == 1 && sel.head.startsWith("p=1/"),
      "the new p=0 file (k=1..1) prunes; the carried stat-less p=1 " +
        s"file must stay — got $sel")
    // retention GC reclaims sidecars alongside manifests
    (0 until 9).foreach { i =>
      ManifestStore.commit(rows((1L, 20L + i, 0L)), "p", Seq(0L), dir,
        statsCols = Seq("k"))
    }
    val mdir = new java.io.File(dir, "_manifests")
    val names = mdir.listFiles().map(_.getName).toSet
    assert(!names.contains("v000000000000.json")
      && !names.contains("s000000000001.json"),
      s"dropped versions must lose manifest AND sidecar — got $names")
    assert(names.exists(_.startsWith("s0000000000")), "retained sidecars stay")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("#fmt= protocol gate: a manifest from a FUTURE format generation " +
    "refuses typed instead of misparsing; unknown extra # headers are " +
    "forward-compatible (skipped)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    ManifestStore.init(rows((1L, 10L, 0L)), "p", dir)
    // written manifests carry the current generation
    val v0 = new java.io.File(dir, "_manifests/v000000000000.json")
    val lines = java.nio.file.Files.readAllLines(v0.toPath)
    assert(lines.get(0) == s"#fmt=${ManifestStore.CurrentFormat}")
    // rewriting the manifest bytes in place invalidates the local FS's
    // hidden checksum sibling — drop it (absence only disables the check)
    def dropCrc(): Unit = {
      new java.io.File(dir, "_manifests/.v000000000000.json.crc").delete()
      ()
    }
    // an unknown EXTRA header from a same-generation future writer is
    // skipped as a comment — never read as a data-file path
    val withExtra = new java.util.ArrayList(lines)
    withExtra.add(1, "#shiny-new-header=whatever")
    java.nio.file.Files.write(v0.toPath, withExtra)
    dropCrc()
    assert(readAll(dir) == Set((1L, 10L, 0L)))
    assert(!ManifestStore.files(dir, 0L).exists(_.startsWith("#")))
    // a HIGHER generation refuses typed on every metadata read
    val future = new java.util.ArrayList(lines)
    future.set(0, s"#fmt=${ManifestStore.CurrentFormat + 1}")
    java.nio.file.Files.write(v0.toPath, future)
    dropCrc()
    intercept[UnsupportedFormatException](ManifestStore.files(dir, 0L))
    intercept[UnsupportedFormatException](ManifestStore.commitTs(dir, 0L))
    intercept[UnsupportedFormatException](readAll(dir))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("restore applies AGE-based retention: its GC honors " +
    "retainAgeMillis exactly like any commit's (r15 omission)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-restore-age").toString
    ManifestStore.init(rows((1L, 10L, 0L)), "p", dir)                 // v0
    ManifestStore.commit(rows((1L, 11L, 0L)), "p", Seq(0L), dir)      // v1
    Thread.sleep(60)
    // restore to v0 with a 50 ms age bound: v0/v1 are both older than
    // the bound -> dropped even though retainVersions=8 keeps them by
    // count; the restored v2 (latest) always survives, and it carries
    // v0's CONTENT even as v0's manifest ages out (files re-referenced)
    val v2 = ManifestStore.restore(dir, "p", 0L,
      retainVersions = 8, retainAgeMillis = Some(50L))
    assert(v2 == 2L)
    intercept[RetentionException](readAll(dir, Some(0L)))
    intercept[RetentionException](readAll(dir, Some(1L)))
    assert(readAll(dir) == Set((1L, 10L, 0L)))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("writer-marker renewal: a commit whose data write outlives the " +
    "marker TTL still publishes — the heartbeat keeps the marker live " +
    "(a fixed TTL would let a concurrent vacuum reclaim in-flight files)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-renew").toString
    ManifestStore.init(rows((1L, 10L, 0L)), "p", dir)
    // the batch takes ~4 s to evaluate against a 1.5 s marker TTL, so
    // WITHOUT renewal the pre-CAS liveness check would abort typed.
    // (TTL is deliberately several heartbeats wide: a too-tight TTL
    // makes the test assert the suite host's scheduling latency, not
    // the renewal mechanism — it flaked at 250 ms under full-suite
    // load.)
    val slow = spark.range(0, 4, 1, 1).map { i =>
      Thread.sleep(1000); i
    }.toDF("k").withColumn("v", col("k") * 10L)
      .withColumn("p", pmod(col("k"), lit(2L)))
    val v = ManifestStore.commit(slow, "p", Seq(0L, 1L), dir,
      writerLeaseTtlMillis = 1500L)
    assert(v == 1L)
    assert(readAll(dir) == Set((0L, 0L, 0L), (1L, 10L, 1L),
      (2L, 20L, 0L), (3L, 30L, 1L)))
    // the marker is gone after publish (no leak to wedge maintenance)
    assert(!new java.io.File(dir, "_manifests").listFiles()
      .exists(_.getName.startsWith(".w-")))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("clock-skew margin: another party's lease reads as HELD until " +
    "the margin past its expiry — a slightly-ahead clock cannot " +
    "vacuum a writer's files or write under a vacuum") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    ManifestStore.init(rows((1L, 10L, 0L)), "p", dir)
    val lock = new org.apache.hadoop.fs.Path(s"$dir/_manifests/.vacuum-lock")
    // expired 5 s ago — INSIDE the 60 s skew margin: still held
    StoreFs.writeOverwrite(lock,
      s"${System.currentTimeMillis() - 5000L}|sometoken")
    intercept[StoreBusyException](
      ManifestStore.commit(rows((1L, 11L, 0L)), "p", Seq(0L), dir))
    // expired beyond the margin: treated as dead, the commit proceeds
    StoreFs.writeOverwrite(lock,
      s"${System.currentTimeMillis() - 120000L}|sometoken")
    assert(ManifestStore.commit(
      rows((1L, 11L, 0L)), "p", Seq(0L), dir) == 1L)
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("vacuum lease-break is FENCED: an expired lease is broken by " +
    "exactly one racer (rename tombstone + token verify); a live " +
    "lease never breaks") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fence").toString
    val v0 = ManifestStore.init(
      rows((1L, 10L, 0L), (2L, 20L, 1L)), "p", dir)
    // plant an orphan (a crashed attempt's never-manifested file)
    val orphan = new java.io.File(dir, "p=0/corphan-part-0.parquet")
    java.nio.file.Files.copy(
      new java.io.File(dir, ManifestStore.files(dir, v0).head).toPath,
      orphan.toPath)
    // a LIVE foreign lease: vacuum aborts typed, nothing swept
    val lock = new org.apache.hadoop.fs.Path(s"$dir/_manifests/.vacuum-lock")
    StoreFs.writeOverwrite(lock,
      s"${System.currentTimeMillis() + 60000L}|foreign")
    intercept[StoreBusyException](ManifestStore.vacuum(dir, "p"))
    assert(orphan.exists())
    // an EXPIRED foreign lease (beyond the skew margin): racers break
    // it fenced — every thread either sweeps or aborts typed; the
    // orphan is reclaimed, referenced files stay, the lock is released
    StoreFs.writeOverwrite(lock,
      s"${System.currentTimeMillis() - 120000L}|foreign")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map { _ =>
      new Thread(() =>
        try { ManifestStore.vacuum(dir, "p"); () }
        catch {
          case _: StoreBusyException => ()
          case t: Throwable => errs.add(t); ()
        })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"unexpected failures: $errs")
    assert(!orphan.exists(), "the orphan must be reclaimed")
    assert(readAll(dir) == Set((1L, 10L, 0L), (2L, 20L, 1L)))
    assert(!StoreFs.exists(lock), "the lease must be released")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("an aged-out rewrite BASE surfaces as the retryable conflict: " +
    "the conflict check translates RetentionException into " +
    "ConcurrentCommitException (merge's retry loop re-reads; a " +
    "retention error would abort it)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-agedbase").toString
    ManifestStore.init(rows((1L, 10L, 0L)), "p", dir)
    // churn v0 out of retention
    (0 until 4).foreach { i =>
      ManifestStore.commit(rows((1L, 20L + i, 0L)), "p", Seq(0L), dir,
        retainVersions = 2)
    }
    assert(intercept[ConcurrentCommitException] {
      ManifestStore.commit(rows((1L, 99L, 0L)), "p", Seq(0L), dir,
        baseVersion = Some(0L))
    }.getMessage.contains("aged out"))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("TIMESTAMP AS OF resolves in O(1) metadata reads: the latest " +
    "manifest's #tsidx ledger carries every recent version's commit " +
    "time — one GET + the listing, not a GET per retained version; " +
    "a ledger-less legacy head falls back to per-version reads with " +
    "identical answers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tsidx").toString
    ManifestStore.init(rows((1L, 10L, 0L)), "p", dir)                 // v0
    (1 to 5).foreach(i =>
      ManifestStore.commit(rows((1L, 10L + i, 0L)), "p", Seq(0L), dir))
    val pin = ManifestStore.commitTs(dir, 3L).get
    val before = StoreFs.metadataReads.get()
    assert(ManifestStore.versionAt(dir, pin) == 3L)
    val reads = StoreFs.metadataReads.get() - before
    assert(reads <= 2L,
      s"AS OF must resolve from the latest manifest's ledger alone, " +
        s"paid $reads metadata reads over 6 retained versions")
    // strip the ledger from the head (a legacy writer's manifest):
    // resolution falls back to one read per retained version — same
    // answer, never a guess
    val head = new java.io.File(dir, "_manifests/v000000000005.json")
    val lines = java.nio.file.Files.readAllLines(head.toPath)
    java.nio.file.Files.write(head.toPath,
      new java.util.ArrayList(
        java.util.List.copyOf(lines.stream
          .filter((l: String) => !l.startsWith("#tsidx=")).toList)))
    new java.io.File(dir, "_manifests/.v000000000005.json.crc").delete()
    val before2 = StoreFs.metadataReads.get()
    assert(ManifestStore.versionAt(dir, pin) == 3L)
    assert(StoreFs.metadataReads.get() - before2 > 2L,
      "the fallback really is per-version (proves the ledger was load-bearing)")
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("HISTORY under churn: a version dropped between the listing and " +
    "its read leaves the log silently — the retained set reports, " +
    "never a transient error") {
    val dir = java.nio.file.Files.createTempDirectory("graft-histchurn").toString
    ManifestStore.init(rows((1L, 10L, 0L)), "p", dir)
    ManifestStore.commit(rows((1L, 11L, 0L)), "p", Seq(0L), dir)
    ManifestStore.commit(rows((1L, 12L, 0L)), "p", Seq(0L), dir)
    // simulate the race: v1's manifest vanishes after listing would
    // have seen it (a concurrent commit's GC)
    assert(new java.io.File(dir, "_manifests/v000000000001.json").delete())
    val h = ManifestStore.history(dir)
    assert(h.map(_.version) == Seq(0L, 2L))
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }
}
