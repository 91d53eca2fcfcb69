package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

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
  *    (temp + rename): the file list of the new snapshot = the
  *    previous manifest minus the rewritten partitions' entries plus
  *    the just-written files;
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
  */
object ManifestStore {

  private val ManifestDir = "_manifests"
  private val VersionRe = """v(\d{12})\.json""".r

  private def manifestFile(storeDir: String, v: Long): java.io.File =
    new java.io.File(new java.io.File(storeDir, ManifestDir), f"v$v%012d.json")

  /** Highest published version, or None for an uninitialized store. */
  def latestVersion(storeDir: String): Option[Long] = {
    val d = new java.io.File(storeDir, ManifestDir)
    val vs = Option(d.listFiles()).getOrElse(Array.empty).flatMap(f =>
      f.getName match {
        case VersionRe(n) => Some(n.toLong)
        case _ => None
      })
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** The relative data-file paths a version's snapshot consists of. */
  def files(storeDir: String, version: Long): Seq[String] = {
    val f = manifestFile(storeDir, version)
    require(f.exists(), s"no manifest v$version at $storeDir (past retention?)")
    scala.io.Source.fromFile(f, "UTF-8").getLines()
      .filter(_.nonEmpty).toSeq
  }

  private def listDataFiles(storeDir: String, partDir: String): Seq[String] = {
    val d = new java.io.File(storeDir, partDir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")
        && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => s"$partDir/${f.getName}").sorted.toSeq
  }

  /** Initialize the store: write `rows` partitioned by `partCol` and
    * publish manifest v0.
    */
  def init(rows: DataFrame, partCol: String, storeDir: String): Long = {
    rows.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(storeDir)
    val parts = Option(new java.io.File(storeDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(s"$partCol="))
      .map(_.getName).sorted
    writeManifest(storeDir, 0L, parts.flatMap(listDataFiles(storeDir, _)).toSeq)
    0L
  }

  /** COMMIT one rewrite of the partitions holding `touched` values:
    * append `rows` (new files only — nothing deleted), publish the
    * next manifest (previous snapshot minus the touched partitions'
    * entries, plus the files this call added), GC unreferenced files
    * past `retainVersions`. Single-writer discipline (the CDC
    * foreachBatch contract). Returns the published version.
    *
    * REPLAY-safe: re-running a crashed commit appends duplicate-
    * content files, but the manifest lists only the LATEST attempt's
    * files for each touched partition; earlier attempts' files are
    * unreferenced and GC'd.
    */
  def commit(
      rows: DataFrame, partCol: String, touched: Seq[Long],
      storeDir: String, retainVersions: Int = 8): Long = {
    // an un-manifested store must fail fast: treating it as empty
    // would make the GC below delete every pre-existing data file
    require(latestVersion(storeDir).nonEmpty,
      s"$storeDir holds no manifest — initialize with ManifestStore.init")
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
    val dir = new java.io.File(storeDir, ManifestDir)
    dir.mkdirs()
    val tmp = new java.io.File(dir, s".tmp-v$v")
    java.nio.file.Files.write(
      tmp.toPath, fileList.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(
      tmp.toPath, manifestFile(storeDir, v).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
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
    val mdir = new java.io.File(storeDir, ManifestDir)
    Option(mdir.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case VersionRe(n) if n.toLong < keepFrom => f.delete(); ()
        case _ => ()
      }
    }
    val referenced: Set[String] =
      (math.max(0L, keepFrom) to latest).iterator
        .filter(v => manifestFile(storeDir, v).exists())
        .flatMap(v => files(storeDir, v)).toSet
    Option(new java.io.File(storeDir).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(s"$partCol="))
      .foreach { d =>
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .filter(f => !referenced.contains(s"${d.getName}/${f.getName}"))
          .foreach { f =>
            f.delete()
            // the local ChecksumFileSystem leaves a hidden .crc sibling
            // per data file — reclaim it too or the dir grows forever
            new java.io.File(d, s".${f.getName}.crc").delete()
            ()
          }
        // a partition emptied by its rewrites and GC'd clean drops its
        // dir (sweep orphaned checksum files first)
        val left = Option(d.listFiles()).getOrElse(Array.empty)
        if (left.forall(f => f.getName.startsWith(".") && f.getName.endsWith(".crc"))) {
          left.foreach(_.delete())
          d.delete()
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
