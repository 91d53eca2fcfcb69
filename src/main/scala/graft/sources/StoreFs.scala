package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession
import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

/** Hadoop-FileSystem access for the store layer (ManifestStore,
  * IncrementalCdc journals/stores, streaming sink commit logs).
  *
  * Why: the 100 TB deployment target is HDFS / object storage, where a
  * `java.io.File` walk silently sees nothing. Every store-layer
  * listing/read/rename goes through the `FileSystem` resolved from the
  * path's scheme + the active session's Hadoop configuration, so the
  * same code runs against `file:`, `hdfs:` and `s3a:` URIs (plain
  * local paths resolve to the local FS exactly as before).
  *
  * Atomicity notes per scheme — relied on by [[ManifestStore]]'s
  * manifest publish (`renameNoReplace`):
  *  - HDFS: `rename` is atomic and fails when the destination exists —
  *    a true compare-and-swap; concurrent publishers race safely.
  *  - Local FS: the claim is `link(2)` (hard link), which fails
  *    atomically with EEXIST — POSIX `rename(2)` would silently
  *    REPLACE an existing destination, which a race drill surfaced as
  *    two "successful" publishes of one version.
  *  - S3/object stores: rename is copy+delete (NOT atomic) — the
  *    publish dispatches to a CONDITIONAL PUT instead: one
  *    `create(target, overwrite = false)` straight at the target,
  *    which S3A maps to `If-None-Match: *` and object stores commit
  *    all-or-nothing at close (see `conditionalPutClaim`; spec'd
  *    against an in-memory object FileSystem whose duplicate creates
  *    are rejected at create AND at close). Data files are
  *    append-only/uniquely named, so they need no atomicity anywhere.
  */
object StoreFs {

  /** The active session's Hadoop conf (falls back to a default conf —
    * store helpers are also called from plain JVM tools/specs before a
    * session exists).
    */
  def conf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def fs(p: Path): FileSystem = p.getFileSystem(conf)

  def exists(p: Path): Boolean = fs(p).exists(p)

  /** Children of `dir`; empty for a missing dir (the java.io
    * `listFiles -> null` idiom, without the null).
    */
  def list(dir: Path): Seq[FileStatus] = {
    val f = fs(dir)
    if (f.exists(dir)) f.listStatus(dir).toSeq else Seq.empty
  }

  /** Metadata GETs served since JVM start — the observable the O(1)
    * resolution specs pin (an "AS OF reads one manifest" claim is a
    * counting claim; asserting it beats trusting it).
    */
  val metadataReads = new java.util.concurrent.atomic.AtomicLong(0)

  /** All lines of a (small, metadata-sized) file, stream closed on
    * every path — commit logs and manifests are parsed on hot loops,
    * where a leaked InputStream per tick accumulates descriptors.
    */
  def readLines(p: Path): Seq[String] = {
    metadataReads.incrementAndGet()
    val in = new BufferedReader(
      new InputStreamReader(fs(p).open(p), StandardCharsets.UTF_8))
    try Iterator.continually(in.readLine()).takeWhile(_ != null).toVector
    finally in.close()
  }

  /** Object-store schemes — where RENAME is copy+delete and silently
    * replaces, so a publish claim must go through the conditional-PUT
    * path instead (and [[requireVerifiedCas]] decides whether that
    * path is actually trustworthy on this connector). The set decides
    * DISPATCH only: membership never grants the claim by itself.
    * Extend per-deployment with the Hadoop conf key
    * `graft.store.objectstore.schemes` (comma-separated) — a
    * conf-registered scheme is an explicit operator opt-in and is
    * trusted for the claim.
    */
  private val ObjectStoreSchemes: Set[String] = Set(
    "s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs",
    "oss", "cos", "swift")

  /** Legacy connectors with NO conditional-create support in any
    * Hadoop release — create(overwrite=false) is a HEAD precheck then
    * an unconditional PUT (check-then-act), so two racing publishers
    * can both "succeed". The claim on these always fails fast.
    */
  private val LegacyObjectSchemes: Set[String] =
    Set("s3n", "swift", "wasb", "wasbs")

  private def schemeOf(f: FileSystem, target: Path): String =
    Option(target.toUri.getScheme).getOrElse(f.getScheme)

  private def isObjectStore(f: FileSystem, target: Path): Boolean = {
    val scheme = schemeOf(f, target)
    scheme != null && (ObjectStoreSchemes(scheme) ||
      conf.getTrimmedStrings("graft.store.objectstore.schemes")
        .contains(scheme))
  }

  /** Conditional-create path capabilities a connector may declare
    * (HADOOP-19256 family — S3A publishes conditional-overwrite
    * support on Hadoop 3.4.1+ when `fs.s3a.create.conditional.enabled`
    * is on). Probed best-effort: an older connector that doesn't know
    * the key simply answers false.
    */
  private val ConditionalCreateCapabilities = Seq(
    "fs.capability.create.conditional.overwrite",
    "fs.option.create.conditional.overwrite",
    "fs.s3a.capability.conditional.create")

  /** FAIL FAST unless this connector's `create(target, overwrite =
    * false)` is a TRUE close-time conditional PUT — the claim must be
    * compare-and-swap, and on a connector that prechecks-then-PUTs
    * unconditionally (default/older S3A, every legacy connector) two
    * racing publishers would both "succeed", silently replacing a
    * published manifest. Trusted when ANY of:
    *  - the FileSystem declares a conditional-create path capability
    *    ([[ConditionalCreateCapabilities]]);
    *  - the scheme was conf-registered via
    *    `graft.store.objectstore.schemes` (explicit operator opt-in,
    *    e.g. a custom connector known to behave);
    *  - `graft.store.objectstore.cas.confirmed = true` (the operator
    *    asserts the deployment runs Hadoop >= 3.4.1 with S3A
    *    conditional create enabled — `fs.s3a.create.conditional.enabled`
    *    — or an equivalent connector).
    * Legacy schemes (s3n/swift/wasb/wasbs) never pass: no release of
    * those connectors supports conditional create.
    */
  private def requireVerifiedCas(f: FileSystem, target: Path): Unit = {
    val scheme = schemeOf(f, target)
    if (LegacyObjectSchemes(scheme))
      throw new UnsupportedOperationException(
        s"scheme '$scheme' has no conditional-create support in any " +
          "Hadoop release — its create(overwrite=false) is check-then-act " +
          "and cannot serve as a publish CAS; migrate the store to a " +
          "connector with conditional create (s3a on Hadoop >= 3.4.1, " +
          "gs, abfs)")
    val declared =
      try ConditionalCreateCapabilities.exists(f.hasPathCapability(target, _))
      catch { case _: Throwable => false }
    val optedIn =
      conf.getBoolean("graft.store.objectstore.cas.confirmed", false) ||
        conf.getTrimmedStrings("graft.store.objectstore.schemes")
          .contains(scheme)
    if (!declared && !optedIn)
      throw new UnsupportedOperationException(
        s"connector for scheme '$scheme' does not declare conditional-" +
          "create support (checked path capabilities: " +
          s"${ConditionalCreateCapabilities.mkString(", ")}) — a publish " +
          "claim through it would be check-then-act, not CAS. On S3A " +
          "this needs Hadoop >= 3.4.1 with " +
          "fs.s3a.create.conditional.enabled=true; once verified, set " +
          "graft.store.objectstore.cas.confirmed=true (or register the " +
          "scheme in graft.store.objectstore.schemes) to opt in")
  }

  /** Write `content` to the target without replace — returns false if
    * the destination already exists (the loser of a concurrent
    * publish). The claim DISPATCHES per scheme, and must be a true
    * compare-and-swap, not check-then-act:
    *  - local FS: write a temp sibling, claim via `link(2)`
    *    (`Files.createLink`) — fails atomically with EEXIST when a
    *    racer won (POSIX `rename(2)` silently REPLACES, which a race
    *    drill caught as two "successful" publishes of one version);
    *  - HDFS (and any rename-atomic FS): temp sibling + `rename`,
    *    which fails atomically on an existing destination. The temp
    *    hop matters here: a direct `create` is VISIBLE empty while
    *    content streams — a reader could parse a partial manifest;
    *  - object stores ([[ObjectStoreSchemes]] + conf-registered):
    *    CONDITIONAL PUT straight at the target — `create(target,
    *    overwrite = false)`, which S3A maps to `If-None-Match: *`
    *    (conditional create, Hadoop 3.4+) and every object store
    *    commits all-or-nothing at close, so there is no partial
    *    visibility and no temp hop. A duplicate surfaces as
    *    FileAlreadyExistsException — at create time (the fast
    *    precheck) or at CLOSE time (the commit-side conditional
    *    losing the race) — both map to false. Rename on these stores
    *    is copy+delete and silently replaces: never a claim.
    */
  def writeAtomicNoReplace(target: Path, content: String): Boolean = {
    val f = fs(target)
    if (isObjectStore(f, target)) {
      requireVerifiedCas(f, target)
      return conditionalPutClaim(f, target, content)
    }
    // temp name unique PER CALL: two racers sharing one temp path
    // interleave data/.crc writes and the survivor fails checksum
    val tmp = new Path(target.getParent,
      s".tmp-${java.util.UUID.randomUUID().toString.take(12)}-${target.getName}")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val claimed = localNioPath(f, target) match {
      case Some(localTarget) =>
        val localTmp = localNioPath(f, tmp).get
        try {
          java.nio.file.Files.createLink(localTarget, localTmp)
          // carry the checksum sibling so the winner's manifest stays
          // checksummed (best effort — absence only disables the check)
          try java.nio.file.Files.createLink(
            localTarget.resolveSibling(s".${target.getName}.crc"),
            localTmp.resolveSibling(s".${tmp.getName}.crc"))
          catch { case _: Throwable => () }
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: UnsupportedOperationException =>
            // no hard links on this mount: degrade to check-then-rename
            !f.exists(target) && f.rename(tmp, target)
        }
      case None =>
        if (f.exists(target)) false
        else f.rename(tmp, target)
    }
    f.delete(tmp, false) // no-op when a rename already moved it
    claimed
  }

  /** The object-store claim: one conditional create AT the target.
    * Visibility is all-or-nothing at close (object semantics), and the
    * duplicate rejection may fire at `create` (precheck) or at `close`
    * (the store's conditional commit — S3 `If-None-Match: *` evaluates
    * when the PUT completes) — both are the CAS loss, both → false.
    */
  private def conditionalPutClaim(
      f: FileSystem, target: Path, content: String): Boolean =
    try {
      val out = f.create(target, false)
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
    }

  /** The java.nio spelling of `p` when it lives on the local
    * filesystem (scheme absent or `file`), None otherwise.
    */
  private def localNioPath(
      f: FileSystem, p: Path): Option[java.nio.file.Path] = {
    val scheme = Option(p.toUri.getScheme).getOrElse(f.getScheme)
    if (scheme == null || scheme == "file")
      Some(java.nio.file.Paths.get(f.makeQualified(p).toUri.getPath))
    else None
  }

  /** Plain overwrite write for small PRESENCE files (writer markers):
    * visibility is whole-file on object stores (all-or-nothing at
    * close) and effectively so for the metadata-sized content on
    * POSIX; no CAS — markers are commit-unique flags, not claims.
    */
  def writeOverwrite(target: Path, content: String): Unit = {
    val out = fs(target).create(target, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Atomic rename used as a FENCE (lease breaking): returns false when
    * the source vanished or the destination exists — on HDFS/local,
    * rename is atomic, so exactly ONE of several racers renaming the
    * same source succeeds. NOT a fence on object stores (copy+delete);
    * callers there must verify ownership by content after claiming.
    */
  def rename(src: Path, dst: Path): Boolean =
    try fs(src).rename(src, dst)
    catch { case _: java.io.IOException => false }

  def delete(p: Path, recursive: Boolean = false): Boolean = {
    val f = fs(p)
    f.exists(p) && f.delete(p, recursive)
  }

  def mkdirs(p: Path): Unit = { fs(p).mkdirs(p); () }
}
