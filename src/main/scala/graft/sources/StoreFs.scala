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
  *  - Local FS: `rename` is an atomic `rename(2)` on the same mount;
  *    the no-replace check is check-then-act (a microsecond window) —
  *    adequate for the single-writer contract, and the loser of a true
  *    race still surfaces as a failed rename or a version collision on
  *    the next publish.
  *  - S3/object stores: rename is copy+delete (NOT atomic). Deploying
  *    there, publish the manifest pointer through a conditional put
  *    (S3 `If-None-Match: *`) or a small DynamoDB/metastore CAS — the
  *    manifest FILE content can still live on S3; only the version
  *    pointer needs the conditional primitive. Data files are
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

  /** All lines of a (small, metadata-sized) file, stream closed on
    * every path — commit logs and manifests are parsed on hot loops,
    * where a leaked InputStream per tick accumulates descriptors.
    */
  def readLines(p: Path): Seq[String] = {
    val in = new BufferedReader(
      new InputStreamReader(fs(p).open(p), StandardCharsets.UTF_8))
    try Iterator.continually(in.readLine()).takeWhile(_ != null).toVector
    finally in.close()
  }

  /** Write `content` to a temp sibling then rename WITHOUT replace —
    * returns false if the destination already exists (the loser of a
    * concurrent publish). See the class doc for per-scheme semantics.
    */
  def writeAtomicNoReplace(target: Path, content: String): Boolean = {
    val f = fs(target)
    val tmp = new Path(target.getParent, s".tmp-${target.getName}")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (f.exists(target)) { f.delete(tmp, false); false }
    else {
      val ok = f.rename(tmp, target)
      if (!ok) f.delete(tmp, false)
      ok
    }
  }

  def delete(p: Path, recursive: Boolean = false): Boolean = {
    val f = fs(p)
    f.exists(p) && f.delete(p, recursive)
  }

  def mkdirs(p: Path): Unit = { fs(p).mkdirs(p); () }
}
