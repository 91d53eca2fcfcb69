package graft.serving

import graft.SparkSpec
import graft.sources.ManifestStore
import org.apache.spark.sql.DataFrame

/** PackedStoreServer — AT VERSION reads over the wire: a pinned
  * client keeps a consistent snapshot under a publishing writer;
  * past retention is a defined error.
  */
class PackedStoreServerSpec extends SparkSpec {
  import spark.implicits._

  private def packedRows(
      tag: Long, grps: Long*): DataFrame =
    grps.flatMap(g => (0 until 3).map(i =>
      (tag * 100 + g * 10 + i, g, g * 10 + i, 0L, 255L, 0L, 4L, true)))
      .toDF("doc_id", "grp", "seq_id", "begin_in_seq", "end_in_seq",
        "doc_begin", "n_piece", "starts_doc")

  test("a client pinned to an old version reads a consistent snapshot " +
    "while the writer publishes; past retention is a defined error") {
    val dir = java.nio.file.Files.createTempDirectory("packed-serve").toString
    ManifestStore.init(packedRows(0, 0L, 1L), "grp", dir)
    val srv = new PackedStoreServer(spark, dir)
    try {
      val client = new PackedStoreClient("localhost", srv.boundPort)
      try {
        val pinned = client.version()
        assert(pinned == 0L)
        val snap0 = client.scan(0L, Some(pinned))
        assert(snap0.contains("\"rows\":[[") && !snap0.contains("error"))
        assert(client.count(Some(pinned)) == 6L)

        // the writer rewrites grp 0 and publishes v1: the pinned read
        // is BYTE-identical to before, the latest read sees the new rows
        ManifestStore.commit(packedRows(9, 0L), "grp", Seq(0L), dir)
        assert(client.version() == 1L)
        assert(client.scan(0L, Some(pinned)) == snap0,
          "pinned snapshot changed under a publishing writer")
        assert(client.scan(0L, Some(1L)) != snap0)
        assert(client.count(Some(pinned)) == 6L)
        assert(client.count(None) == 6L) // 3 rewritten + 3 of grp 1

        // churn past retention: v0's manifest ages out; the pinned
        // read becomes a typed error, never a wrong answer
        (0 until 4).foreach { i =>
          ManifestStore.commit(
            packedRows(10L + i, 0L), "grp", Seq(0L), dir, retainVersions = 2)
        }
        val err = client.scan(0L, Some(pinned))
        assert(err.contains("error") && err.contains("past retention"),
          s"expected a defined past-retention error, got $err")
        // the latest version still serves
        assert(client.count(None) == 6L)
      } finally client.close()
    } finally srv.close()
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("TX resolution over the wire: a client pins one cross-store tx " +
    "and its packed SCAN stays consistent while the writer publishes " +
    "new txs on top") {
    val dir = java.nio.file.Files.createTempDirectory("packed-tx").toString
    val txd = s"$dir-txlog"
    ManifestStore.init(packedRows(0, 0L), "grp", dir)
    graft.sources.TxLog.publish(txd, -1L, Map("packed" -> 0L, "corpus" -> 0L))
    val srv = new PackedStoreServer(spark, dir, txDir = Some(txd))
    try {
      val client = new PackedStoreClient("localhost", srv.boundPort)
      try {
        val (txId, vs) = client.tx()
        assert(txId == 0L && vs == Map("packed" -> 0L, "corpus" -> 0L))
        val pinnedScan = client.scan(0L, Some(vs("packed")))
        // the writer commits a batch and publishes the next tx
        val v1 = ManifestStore.commit(packedRows(9, 0L), "grp", Seq(0L), dir)
        graft.sources.TxLog.publish(txd, 0L,
          Map("packed" -> v1, "corpus" -> 3L))
        // the pinned tx still resolves and its scan is byte-identical
        assert(client.tx(Some(txId))._2("packed") == 0L)
        assert(client.scan(0L, Some(0L)) == pinnedScan)
        // the latest tx names the new combination
        val (tx1, vs1) = client.tx()
        assert(tx1 == 1L && vs1 == Map("packed" -> v1, "corpus" -> 3L))
        assert(client.scan(0L, Some(vs1("packed"))) != pinnedScan)
      } finally client.close()
    } finally srv.close()
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
    graft.sources.FileIO.deleteScratch(new java.io.File(txd))
  }

  test("every rows response is bounded: a partition larger than the " +
    "bound pages exactly and byte-stably at a pinned version; LIMIT " +
    "pages below the bound; AT TX resolves the pin server-side") {
    val dir = java.nio.file.Files.createTempDirectory("packed-page").toString
    val txd = s"$dir-txlog"
    val rows20 = (0 until 20).map(i =>
      (100L + i, 0L, i.toLong, 0L, 255L, 0L, 4L, true))
      .toDF("doc_id", "grp", "seq_id", "begin_in_seq", "end_in_seq",
        "doc_begin", "n_piece", "starts_doc")
    ManifestStore.init(rows20, "grp", dir)
    graft.sources.TxLog.publish(txd, -1L, Map("packed" -> 0L))
    val srv = new PackedStoreServer(
      spark, dir, txDir = Some(txd), maxResponseRows = 7)
    val srvBig = new PackedStoreServer(spark, dir, maxResponseRows = 1000)
    try {
      val client = new PackedStoreClient("localhost", srv.boundPort)
      val ref = new PackedStoreClient("localhost", srvBig.boundPort)
      try {
        val (refRows, refTrunc) =
          PackedStoreClient.parseRows(ref.scan(0L, Some(0L)))
        assert(refRows.size == 20 && !refTrunc)
        // a single bounded response: exactly maxResponseRows + truncated
        val (p1, t1) = PackedStoreClient.parseRows(client.scan(0L, Some(0L)), paging = true)
        assert(p1.size == 7 && t1,
          s"bound must cap the page and mark truncation: ${p1.size}/$t1")
        // cursor-following concatenation == the unbounded reference,
        // and repeats byte-stably at the pinned version
        val all1 = client.scanAll(0L, Some(0L))
        assert(all1 == refRows, "paged concatenation must equal the full scan")
        assert(client.scanAll(0L, Some(0L)) == all1, "paging must be stable")
        // a request LIMIT below the bound pages at the LIMIT; above it,
        // the server clamps to its own bound
        val (p3, t3) =
          PackedStoreClient.parseRows(client.scan(0L, Some(0L), Some(3)), paging = true)
        assert(p3.size == 3 && t3 && p3 == refRows.take(3))
        val (p100, _) =
          PackedStoreClient.parseRows(
            client.scan(0L, Some(0L), Some(100)), paging = true)
        assert(p100.size == 7, "LIMIT above the bound must clamp")
        // RANGE pages under the same discipline
        val (pr, tr) = PackedStoreClient.parseRows(
          client.scanRange(0L, 100L, 119L, Some(0L)), paging = true)
        assert(pr.size == 7 && tr)
        // AT TX: server-side pin resolution — byte-identical to the
        // per-version spelling, and stable mid-churn
        val viaTx = client.scanAtTx(0L, Some(0L))
        assert(viaTx == client.scan(0L, Some(0L)),
          "SCAN AT TX must equal the per-version spelling byte-for-byte")
        val v1 = ManifestStore.commit(
          packedRows(9, 0L), "grp", Seq(0L), dir)
        graft.sources.TxLog.publish(txd, 0L, Map("packed" -> v1))
        assert(client.scanAtTx(0L, Some(0L)) == viaTx,
          "a pinned tx scan must not move under a publishing writer")
        assert(client.scanAtTx(0L).contains(s""""version":$v1"""),
          "AT TX without an id must resolve the LATEST tx's pin")
        // paged AT TX composes with cursors
        val (ptx, ttx) = PackedStoreClient.parseRows(
          client.scanAtTx(0L, Some(0L), Some(3)), paging = true)
        assert(ptx.size == 3 && ttx && ptx == refRows.take(3))
        // AT TS: the server resolves the commit-time pin — byte-equal
        // to the per-version spelling of whatever version it names,
        // and a pre-history pin is a defined error
        val ts0 = ManifestStore.commitTs(dir, 0L).get
        assert(client.scanAtTs(0L, ts0) == client.scan(0L, Some(0L)),
          "SCAN AT TS must equal the per-version spelling byte-for-byte")
        val tooEarly = client.scanAtTs(0L, ts0 - 1L)
        assert(tooEarly.contains("error") && tooEarly.contains("before"),
          s"a pre-history AT TS pin must be a defined error: $tooEarly")
        // HISTORY: the retained commit log over the wire, oldest first
        val hist = client.history()
        assert(hist.contains("\"history\":[") &&
          hist.contains("\"version\":0") &&
          hist.contains(s""""version":${ManifestStore.latestVersion(dir).get}""") &&
          hist.contains("\"ts\":") && hist.contains("\"files\":"),
          s"HISTORY must list retained commits with metadata: $hist")
      } finally { client.close(); ref.close() }
    } finally { srv.close(); srvBig.close() }
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
    graft.sources.FileIO.deleteScratch(new java.io.File(txd))
  }

  test("scanAll with at=None pins the FIRST page's version: a publish " +
    "landing between pages cannot produce a mixed-version " +
    "concatenation; an un-paging parse of a truncated response fails " +
    "loudly") {
    val dir = java.nio.file.Files.createTempDirectory("packed-pin").toString
    val rows9 = (0 until 9).map(i =>
      (100L + i, 0L, i.toLong, 0L, 255L, 0L, 4L, true))
      .toDF("doc_id", "grp", "seq_id", "begin_in_seq", "end_in_seq",
        "doc_begin", "n_piece", "starts_doc")
    ManifestStore.init(rows9, "grp", dir)
    val srv = new PackedStoreServer(spark, dir, maxResponseRows = 4)
    try {
      val plain = new PackedStoreClient("localhost", srv.boundPort)
      try {
        val expected = plain.scanAll(0L, Some(0L))
        assert(expected.size == 9)
        // a truncated response parsed WITHOUT paging opt-in is a loud
        // failure, never a silently partial partition
        val truncated = plain.scan(0L, Some(0L))
        intercept[IllegalArgumentException](
          PackedStoreClient.parseRows(truncated))
        // a client whose first page triggers a grp-0 REWRITE: unpinned
        // paging would resume against the new snapshot and mix versions
        var fired = false
        val racy = new PackedStoreClient("localhost", srv.boundPort) {
          override def scan(grp: Long, at: Option[Long],
              limit: Option[Int], after: Option[(Long, Long)]): String = {
            val r = super.scan(grp, at, limit, after)
            if (!fired) {
              fired = true
              ManifestStore.commit(packedRows(7, 0L), "grp", Seq(0L), dir)
              ()
            }
            r
          }
        }
        try {
          val got = racy.scanAll(0L, None)
          assert(got == expected,
            s"scanAll must pin the first page's version: got ${got.size} " +
              s"rows vs ${expected.size} expected")
        } finally racy.close()
      } finally plain.close()
    } finally srv.close()
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }

  test("COUNT serves from the metadata tier when the sidecar carries " +
    "row counts, and falls back to the exact scan when it does not") {
    // stats-bearing store: the sidecar's #rows answers with zero jobs
    val dirA = java.nio.file.Files.createTempDirectory("packed-cnt-a").toString
    ManifestStore.init(packedRows(0, 0L, 1L), "grp", dirA,
      statsCols = Seq("doc_id"))
    assert(ManifestStore.metaCount(dirA, "grp").contains(6L),
      "spec premise: the sidecar must carry row counts")
    val srvA = new PackedStoreServer(spark, dirA)
    try {
      val c = new PackedStoreClient("localhost", srvA.boundPort)
      try assert(c.count() == 6L) finally c.close()
    } finally srvA.close()
    // stats-free store: no sidecar — the exact scan still answers
    val dirB = java.nio.file.Files.createTempDirectory("packed-cnt-b").toString
    ManifestStore.init(packedRows(0, 0L), "grp", dirB)
    assert(ManifestStore.metaCount(dirB, "grp").isEmpty)
    val srvB = new PackedStoreServer(spark, dirB)
    try {
      val c = new PackedStoreClient("localhost", srvB.boundPort)
      try assert(c.count() == 3L) finally c.close()
    } finally srvB.close()
    graft.sources.FileIO.deleteScratch(new java.io.File(dirA))
    graft.sources.FileIO.deleteScratch(new java.io.File(dirB))
  }

  test("RANGE serves a doc_id slice through the zone maps: answers " +
    "match the exact filter, and the manifest-level selection opens " +
    "only the intersecting files") {
    val dir = java.nio.file.Files.createTempDirectory("packed-range").toString
    // grp 0 accumulates two FILES with DISJOINT doc_id bands (the
    // arrival-ordered ingest shape): ids 0..2 at init, 900..902
    // APPENDED on top — partition pruning alone cannot separate them
    ManifestStore.init(packedRows(0, 0L, 1L), "grp", dir,
      statsCols = Seq("doc_id"))
    ManifestStore.append(packedRows(9, 0L), "grp", dir,
      statsCols = Seq("doc_id"))
    val srv = new PackedStoreServer(spark, dir)
    try {
      val client = new PackedStoreClient("localhost", srv.boundPort)
      try {
        // the full scan sees both bands; the range slices the high one
        val all = client.scan(0L)
        assert(all.contains("[900,") && all.contains("[0,"))
        val hi = client.scanRange(0L, 850L, 1000L)
        assert(hi.contains("[900,") && hi.contains("[901,")
          && hi.contains("[902,") && !hi.contains("[0,"),
          s"range must return exactly the high band: $hi")
        // an empty slice answers no rows, not an error
        assert(client.scanRange(0L, 5000L, 6000L).contains("\"rows\":[]"))
        // pruning proof at the manifest: one commit's file intersects
        assert(ManifestStore.selectFiles(dir, "grp",
          partVals = Some(Seq(0L)),
          range = Some(("doc_id", 850L, 1000L))).size <
          ManifestStore.selectFiles(dir, "grp",
            partVals = Some(Seq(0L))).size)
      } finally client.close()
    } finally srv.close()
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }
}
