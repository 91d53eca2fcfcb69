package graft.sources

import org.apache.hadoop.fs.Path

/** A CROSS-STORE transaction log — one atomic record per CDC batch
  * pinning every member store's manifest version, so a reader can
  * resolve a single tx id and scan N stores as ONE consistent
  * snapshot.
  *
  * Why it exists: [[ManifestStore]] gives each store atomic snapshots
  * in isolation, but the CDC pipeline (graft.operators.IncrementalCdc)
  * commits FOUR stores per batch — corpus, dedup index, keeps, packed
  * — each versioning independently. A consumer joining two of them
  * (e.g. "which corpus row backs this packed sequence?") can observe
  * store A post-batch-N and store B post-batch-N-1: each read is
  * atomic, the COMBINATION is not. The reference engine solves exactly
  * this class of problem with cross-state transactions (t-spoon's
  * multi-state 2PC — compare `t_multi_ns_commit`); this is the
  * lakehouse-side analog for the store tier.
  *
  * Discipline (mirrors ManifestStore's):
  *  - a tx record is published ONLY after every member store's commit
  *    for the batch has published — so any readable tx points at fully
  *    committed store versions;
  *  - the record itself publishes via the same no-replace CAS
  *    ([[StoreFs.writeAtomicNoReplace]]): a second writer racing the
  *    same tx id gets [[ConcurrentCommitException]], never a silent
  *    overwrite;
  *  - readers resolve a tx FIRST (latest or pinned), then read each
  *    store `AT` the recorded version — however many batches the
  *    writer publishes mid-scan, the combination stays the one the tx
  *    froze;
  *  - retention: tx records older than `retainTx` are dropped at
  *    publish time. A tx must not outlive its stores' manifests, so
  *    keep `retainTx` ≤ the stores' `retainVersions` (both default 8
  *    here and in ManifestStore) — a reader pinned to a retained tx
  *    never loses a manifest under it. ENFORCED at [[publish]] when
  *    the caller declares `memberRetention`: a violating
  *    configuration is rejected before any tx record exists.
  *
  * CRASH-replay: a batch replayed after a crash re-commits its stores
  * (journal/fixpoint discipline, see IncrementalCdc) and then publishes
  * a FRESH tx id pinning the re-committed versions. The crashed
  * attempt's tx — if it published at all — points at equivalent
  * content; if it never published, no reader could name the torn
  * combination. Either way every READABLE tx is consistent.
  */
object TxLog {

  /** One committed cross-store snapshot: member store name → the
    * manifest version the tx pinned. `ts` is the publish wall-time
    * (strictly increasing across tx ids, like manifest commit times);
    * None for records published before timestamps existed.
    */
  final case class Tx(
      txId: Long, batchId: Long, versions: Map[String, Long],
      ts: Option[Long] = None)

  private val TxRe = """tx(\d{12})\.txt""".r

  private def txPath(txDir: String, id: Long): Path =
    new Path(txDir, f"tx$id%012d.txt")

  private def ids(txDir: String): Seq[Long] =
    StoreFs.list(new Path(txDir)).flatMap(s =>
      s.getPath.getName match {
        case TxRe(n) => Some(n.toLong)
        case _ => None
      })

  /** Highest published tx id, or None for an empty log. */
  def latestId(txDir: String): Option[Long] = {
    val all = ids(txDir)
    if (all.isEmpty) None else Some(all.max)
  }

  /** Publish the next tx record pinning `versions` (store → manifest
    * version just committed for `batchId`). CAS on the tx id: a racing
    * second publisher fails typed. Returns the published id.
    *
    * `memberRetention` (store → that store's `retainVersions`)
    * ENFORCES the retention coupling the class doc states: a store
    * commits ≤1 version per batch, so a tx ≤ `retainTx` behind pins
    * versions each ≤ `retainVersions` behind — but only when
    * `retainTx` ≤ every member's retention. A violating configuration
    * fails FAST here, at publish, instead of surfacing later as a
    * pinned reader's missing-manifest error.
    */
  def publish(
      txDir: String, batchId: Long, versions: Map[String, Long],
      retainTx: Int = 8,
      memberRetention: Map[String, Int] = Map.empty): Long = {
    memberRetention.foreach { case (store, keep) =>
      require(retainTx <= keep,
        s"retainTx=$retainTx outlives member store '$store' " +
          s"(retainVersions=$keep): a reader pinned to a retained tx " +
          "would resolve a GC'd manifest — lower retainTx or raise " +
          "the store's retention")
    }
    StoreFs.mkdirs(new Path(txDir))
    val prev = latestId(txDir)
    val id = prev.getOrElse(-1L) + 1L
    // publish wall-time, strictly increasing across records (a burst
    // inside one ms nudges +1) — `TIMESTAMP AS OF` over the whole
    // cross-store combination resolves unambiguously
    val ts = math.max(System.currentTimeMillis(),
      prev.flatMap(pv =>
        try read(txDir, Some(pv)).ts catch { case _: Exception => None })
        .getOrElse(0L) + 1L)
    val body = (s"#ts=$ts" +: s"batch=$batchId" +:
      versions.toSeq.sortBy(_._1).map { case (s, v) => s"$s=$v" })
      .mkString("\n")
    if (!StoreFs.writeAtomicNoReplace(txPath(txDir, id), body))
      throw new ConcurrentCommitException(
        s"tx$id already published at $txDir — a second writer won the race")
    ids(txDir).filter(_ < id - (retainTx - 1))
      .foreach(old => StoreFs.delete(txPath(txDir, old)))
    id
  }

  /** Resolve a tx record (default: latest). Fails with a defined error
    * for an id past retention — never a wrong combination.
    */
  def read(txDir: String, txId: Option[Long] = None): Tx = {
    val id = txId.orElse(latestId(txDir)).getOrElse(
      throw new IllegalArgumentException(s"no tx published at $txDir"))
    val p = txPath(txDir, id)
    if (!StoreFs.exists(p))
      throw new RetentionException(s"no tx$id at $txDir (past retention?)")
    val lines = StoreFs.readLines(p).filter(_.nonEmpty)
    val ts = lines.find(_.startsWith("#ts="))
      .map(_.stripPrefix("#ts=").toLong)
    val kv = lines.filterNot(_.startsWith("#")).map { l =>
      val i = l.indexOf('=')
      l.substring(0, i) -> l.substring(i + 1).toLong
    }.toMap
    Tx(id, kv("batch"), kv - "batch", ts)
  }

  /** `TIMESTAMP AS OF` over the cross-store combination: the newest
    * RETAINED tx whose publish time is <= `asOfTs` — so a reader can
    * pin "the pipeline as of 14:00" and scan every member store at
    * that one consistent moment. Typed [[RetentionException]] when
    * every retained record is newer (that moment aged out);
    * timestampless legacy records are skipped, never guessed.
    */
  def readAsOf(txDir: String, asOfTs: Long): Tx = {
    val all = ids(txDir).sorted
    require(all.nonEmpty, s"no tx published at $txDir")
    val eligible = all.reverseIterator.map(id => read(txDir, Some(id)))
      .find(_.ts.exists(_ <= asOfTs))
    eligible.getOrElse(throw new RetentionException(
      s"no retained tx at $txDir at or before ts=$asOfTs (past retention?)"))
  }
}
