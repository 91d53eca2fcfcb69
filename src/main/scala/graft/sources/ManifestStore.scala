package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Thrown when a manifest publish loses a version race — a second
  * writer published the same version first. The store is untouched
  * (this writer's data files are unreferenced and will be GC'd by the
  * winner); the caller should treat the commit as failed and re-read.
  */
final class ConcurrentCommitException(msg: String)
  extends RuntimeException(msg)

/** A MANIFEST-COMMITTED partitioned parquet store — snapshot-isolated
  * reads under a continuously rewriting writer, the capability the
  * CDC soak measured dynamic partition overwrite to lack (a raw
  * concurrent reader sees transient FileNotFound while a partition's
  * files swap). The standard lakehouse-table discipline (Delta/
  * Iceberg's core idea) built minimally and Spark-first:
  *
  *  - data files are APPEND-ONLY: a partition rewrite writes new
  *    uniquely-named files next to the old ones and never deletes in
  *    place;
  *  - each commit publishes `_manifests/v<NNN>.json` ATOMICALLY
  *    (temp + rename-no-replace): the file list of the new snapshot =
  *    the previous manifest minus the rewritten partitions' entries
  *    plus the just-written files. The no-replace rename doubles as a
  *    version CAS: if two writers race to the same version, exactly
  *    one publishes and the other gets [[ConcurrentCommitException]]
  *    (single-writer is the documented contract — the fence turns the
  *    "two streams pointed at one store" operator error into a typed
  *    failure instead of silent corruption);
  *  - readers resolve a manifest FIRST and read exactly its files —
  *    an atomic snapshot however many commits land mid-read; reading
  *    an older retained version is time travel for free;
  *  - GC (run by the single writer, after publish) deletes files no
  *    retained manifest references — a reader pinned up to
  *    `retainVersions` behind never loses a file under it.
  *
  * Partition pruning survives: manifests carry relative paths rooted
  * at the partition dirs, so a pruned read selects the listed files
  * of exactly the requested partition values.
  *
  * All metadata I/O goes through the Hadoop FileSystem of the store
  * path's scheme ([[StoreFs]]) — `file:`/local for the sandbox, HDFS/
  * object stores in a deployment (see [[StoreFs]] for the per-scheme
  * rename-atomicity story).
  */
object ManifestStore {

  private val ManifestDir = "_manifests"
  private val VersionRe = """v(\d{12})\.json""".r

  private def manifestPath(storeDir: String, v: Long): Path =
    new Path(new Path(storeDir, ManifestDir), f"v$v%012d.json")

  /** Highest published version, or None for an uninitialized store. */
  def latestVersion(storeDir: String): Option[Long] = {
    val vs = StoreFs.list(new Path(storeDir, ManifestDir)).flatMap(s =>
      s.getPath.getName match {
        case VersionRe(n) => Some(n.toLong)
        case _ => None
      })
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** The relative data-file paths a version's snapshot consists of. */
  def files(storeDir: String, version: Long): Seq[String] = {
    val p = manifestPath(storeDir, version)
    require(StoreFs.exists(p),
      s"no manifest v$version at $storeDir (past retention?)")
    StoreFs.readLines(p).filter(_.nonEmpty)
  }

  private def listDataFiles(storeDir: String, partDir: String): Seq[String] =
    StoreFs.list(new Path(storeDir, partDir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")
        && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(s => s"$partDir/${s.getPath.getName}").sorted

  /** Initialize the store: write `rows` partitioned by `partCol` and
    * publish manifest v0.
    */
  def init(rows: DataFrame, partCol: String, storeDir: String): Long = {
    rows.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(storeDir)
    val parts = StoreFs.list(new Path(storeDir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partCol="))
      .map(_.getPath.getName).sorted
    writeManifest(storeDir, 0L, parts.flatMap(listDataFiles(storeDir, _)))
    0L
  }

  /** COMMIT one rewrite of the partitions holding `touched` values:
    * append `rows` (new files only — nothing deleted), publish the
    * next manifest (previous snapshot minus the touched partitions'
    * entries, plus the files this call added), GC unreferenced files
    * past `retainVersions`. Single-writer discipline (the CDC
    * foreachBatch contract); a racing second writer fails the version
    * CAS with [[ConcurrentCommitException]]. Returns the published
    * version.
    *
    * INVARIANT: every row's `partCol` value must be in `touched` — a
    * row outside would land in an unlisted partition dir, stay out of
    * the manifest, and be destroyed by a later sweep. Enforced for
    * free: the staged write exposes exactly which partitions got rows,
    * so an outside value fails fast before anything touches the live
    * tree (no extra Spark job).
    *
    * The commit's own files are KNOWN, not diffed: `rows` lands in a
    * commit-private staging dir and each data file moves into its live
    * partition dir under a commit-unique name. A concurrent commit's
    * in-flight files can therefore never leak into this manifest (a
    * before/after listing diff would absorb them — spec-caught), and
    * the hot path does zero live-dir listings.
    *
    * REPLAY-safe: re-running a crashed commit stages fresh files, but
    * the manifest lists only the LATEST attempt's files for each
    * touched partition; a crashed attempt's never-manifested orphans
    * are swept by [[vacuum]] (per-commit GC is manifest-diff-based and
    * never lists the whole store — see [[gc]]).
    */
  def commit(
      rows: DataFrame, partCol: String, touched: Seq[Long],
      storeDir: String, retainVersions: Int = 8): Long = {
    // an un-manifested store must fail fast: treating it as empty
    // would make the GC below delete every pre-existing data file
    require(latestVersion(storeDir).nonEmpty,
      s"$storeDir holds no manifest — initialize with ManifestStore.init")
    val commitId = java.util.UUID.randomUUID().toString.take(12)
    val staging = new Path(storeDir, s".staging-c$commitId")
    val fs = StoreFs.fs(staging)
    val added = try {
      rows.repartition(col(partCol))
        .write.mode("overwrite").partitionBy(partCol)
        .parquet(staging.toString)
      val touchedDirs = touched.map(v => s"$partCol=$v").toSet
      val stagedDirs = StoreFs.list(staging)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partCol="))
      val outside = stagedDirs.map(_.getPath.getName).filterNot(touchedDirs)
      require(outside.isEmpty,
        s"commit rows landed in partition(s) ${outside.mkString(", ")} " +
          s"outside touched=${touched.mkString(", ")} — they would be " +
          "unlisted in the manifest and destroyed by a later sweep")
      stagedDirs.sortBy(_.getPath.getName).flatMap { d =>
        val liveDir = new Path(storeDir, d.getPath.getName)
        fs.mkdirs(liveDir)
        StoreFs.list(d.getPath)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.getName)
          .map { s =>
            val name = s"c$commitId-${s.getPath.getName}"
            require(fs.rename(s.getPath, new Path(liveDir, name)),
              s"staging move failed for ${s.getPath}")
            s"${d.getPath.getName}/$name"
          }
      }
    } finally {
      StoreFs.delete(staging, recursive = true)
      ()
    }
    val touchedDirs = touched.map(v => s"$partCol=$v").toSet
    val prev = latestVersion(storeDir)
    val carry = prev.map(files(storeDir, _)).getOrElse(Nil)
      .filterNot(p => touchedDirs.exists(d => p.startsWith(d + "/")))
    val v = prev.getOrElse(-1L) + 1L
    writeManifest(storeDir, v, (carry ++ added).sorted)
    gc(storeDir, partCol, v, retainVersions)
    v
  }

  private def writeManifest(
      storeDir: String, v: Long, fileList: Seq[String]): Unit = {
    StoreFs.mkdirs(new Path(storeDir, ManifestDir))
    val target = manifestPath(storeDir, v)
    if (!StoreFs.writeAtomicNoReplace(target, fileList.mkString("\n")))
      throw new ConcurrentCommitException(
        s"manifest v$v already published at $storeDir — a second writer " +
          "won the version race; this commit's files are unreferenced " +
          "and will be GC'd by the winner")
  }

  /** Retention GC, MANIFEST-DIFF based: drop manifests older than the
    * retention window and delete exactly the files they reference that
    * no retained manifest still does. Cost is O(manifest lines), never
    * a listing of the store's partition dirs — at 100 TB-scale
    * partition counts, a per-micro-batch full-store LIST (thousands of
    * object-store calls) would dominate the commit; the diff touches
    * only metadata the commit already read. Files that never made a
    * manifest (a crashed attempt's orphans) are invisible to the diff
    * by construction — [[vacuum]] sweeps those in a maintenance pass.
    */
  private def gc(
      storeDir: String, partCol: String, latest: Long,
      retainVersions: Int): Unit = {
    val keepFrom = latest - (retainVersions - 1)
    val versions = StoreFs.list(new Path(storeDir, ManifestDir)).flatMap(s =>
      s.getPath.getName match {
        case VersionRe(n) => Some(n.toLong)
        case _ => None
      })
    val (dropped, retained) = versions.partition(_ < keepFrom)
    if (dropped.isEmpty) return
    val referenced = retained.iterator.flatMap(files(storeDir, _)).toSet
    val dead = dropped.iterator.flatMap(files(storeDir, _)).toSet -- referenced
    dead.foreach { p =>
      // ChecksumFileSystem (local) reclaims the hidden .crc sibling
      // with the data file; HDFS/S3 have none
      StoreFs.delete(new Path(storeDir, p)); ()
    }
    dropped.foreach(v => StoreFs.delete(manifestPath(storeDir, v)))
    // a partition dir emptied by the diff drops (recursive: only
    // hidden checksum leftovers can remain under it)
    dead.map(_.takeWhile(_ != '/')).toSeq.distinct.foreach { dirName =>
      val d = new Path(storeDir, dirName)
      if (StoreFs.list(d).isEmpty) { StoreFs.delete(d, recursive = true); () }
    }
  }

  /** Maintenance sweep: LIST every partition dir and delete data files
    * no retained manifest references — the crashed-attempt orphans the
    * per-commit diff GC cannot see. O(partition dirs) listings: run it
    * from a maintenance window or every N batches, not per commit.
    * Writer-side only (same single-writer contract as [[commit]]).
    * Returns the number of files deleted.
    */
  def vacuum(storeDir: String, partCol: String): Int = {
    val versions = StoreFs.list(new Path(storeDir, ManifestDir)).flatMap(s =>
      s.getPath.getName match {
        case VersionRe(n) => Some(n.toLong)
        case _ => None
      })
    require(versions.nonEmpty,
      s"$storeDir holds no manifest — nothing is safely referenced")
    val referenced: Set[String] =
      versions.iterator.flatMap(files(storeDir, _)).toSet
    var deleted = 0
    // crashed commits can leave staging dirs behind their finally —
    // (hard kill mid-move); they are never referenced, sweep whole
    StoreFs.list(new Path(storeDir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".staging-c"))
      .foreach { s => StoreFs.delete(s.getPath, recursive = true); () }
    StoreFs.list(new Path(storeDir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partCol="))
      .foreach { d =>
        val dirName = d.getPath.getName
        StoreFs.list(d.getPath)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .filter(s => !referenced.contains(s"$dirName/${s.getPath.getName}"))
          .foreach { s => StoreFs.delete(s.getPath); deleted += 1 }
        if (StoreFs.list(d.getPath).isEmpty) {
          StoreFs.delete(d.getPath, recursive = true)
          ()
        }
      }
    deleted
  }

  /** Snapshot read: exactly the files of `version` (default latest),
    * optionally pruned to the partitions holding `partVals`. An empty
    * store (or an empty pruned selection) reads as an empty frame.
    */
  def read(
      spark: SparkSession, storeDir: String, schema: StructType,
      partCol: String, partVals: Option[Seq[Long]] = None,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(storeDir))
    val all = v.map(files(storeDir, _)).getOrElse(Nil)
    val wanted = partVals match {
      case None => all
      case Some(vs) =>
        val dirs = vs.map(x => s"$partCol=$x/").toSet
        all.filter(p => dirs.exists(p.startsWith))
    }
    if (wanted.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else
      spark.read.schema(schema).option("basePath", storeDir)
        .parquet(wanted.map(p => s"$storeDir/$p"): _*)
  }
}
