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
    * the manifest, and be deleted by this very call's GC. Checked by
    * default (one small job over the edit-sized `rows`);
    * `verifyTouched = false` opts a hot caller out when the slices are
    * touched-bucketed by construction.
    *
    * REPLAY-safe: re-running a crashed commit appends duplicate-
    * content files, but the manifest lists only the LATEST attempt's
    * files for each touched partition; earlier attempts' files are
    * unreferenced and GC'd.
    */
  def commit(
      rows: DataFrame, partCol: String, touched: Seq[Long],
      storeDir: String, retainVersions: Int = 8,
      verifyTouched: Boolean = true): Long = {
    // an un-manifested store must fail fast: treating it as empty
    // would make the GC below delete every pre-existing data file
    require(latestVersion(storeDir).nonEmpty,
      s"$storeDir holds no manifest — initialize with ManifestStore.init")
    if (verifyTouched) {
      val outside = rows.select(col(partCol)).distinct()
        .filter(!col(partCol).isin(touched: _*)).limit(5)
        .collect().map(_.get(0))
      require(outside.isEmpty,
        s"commit rows carry $partCol value(s) ${outside.mkString(", ")} " +
          s"outside touched=${touched.mkString(", ")} — they would be " +
          "appended unlisted and destroyed by GC")
    }
    val touchedDirs = touched.map(v => s"$partCol=$v").toSet
    val before: Map[String, Set[String]] =
      touchedDirs.iterator.map(d => d -> listDataFiles(storeDir, d).toSet).toMap
    rows.repartition(col(partCol))
      .write.mode("append").partitionBy(partCol).parquet(storeDir)
    val added = touchedDirs.toSeq.sorted.flatMap { d =>
      (listDataFiles(storeDir, d).toSet -- before(d)).toSeq.sorted
    }
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

  /** Drop manifests older than the retention window and every data
    * file no retained manifest references. Runs on the writer after
    * publish — no append is in flight, so an unreferenced file is
    * either superseded or an orphan of a crashed attempt.
    */
  private def gc(
      storeDir: String, partCol: String, latest: Long,
      retainVersions: Int): Unit = {
    val keepFrom = latest - (retainVersions - 1)
    StoreFs.list(new Path(storeDir, ManifestDir)).foreach { s =>
      s.getPath.getName match {
        case VersionRe(n) if n.toLong < keepFrom =>
          StoreFs.delete(s.getPath); ()
        case _ => ()
      }
    }
    val referenced: Set[String] =
      (math.max(0L, keepFrom) to latest).iterator
        .filter(v => StoreFs.exists(manifestPath(storeDir, v)))
        .flatMap(v => files(storeDir, v)).toSet
    StoreFs.list(new Path(storeDir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partCol="))
      .foreach { d =>
        val dirName = d.getPath.getName
        StoreFs.list(d.getPath)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .filter(s => !referenced.contains(s"$dirName/${s.getPath.getName}"))
          .foreach { s =>
            // ChecksumFileSystem (local) reclaims the hidden .crc
            // sibling with the data file; HDFS/S3 have none
            StoreFs.delete(s.getPath); ()
          }
        // a partition emptied by its rewrites and GC'd clean drops its
        // dir (recursive: only hidden checksum leftovers can remain)
        if (StoreFs.list(d.getPath).isEmpty) {
          StoreFs.delete(d.getPath, recursive = true)
          ()
        }
      }
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
