package graft

/** Shuffle/spill scratch for LOCAL sessions: tmpfs when present.
  *
  * The sandbox's virtual disk degrades to multi-hundred-ms fsyncs under
  * host contention (measured 6.7 MB/s bulk, ~180 ms per small fsync),
  * which turns tiny 32-partition shuffles into minutes and is the real
  * source of the "sporadic multi-minute outliers on trivial queries".
  * Shuffle data at the bench SFs is megabytes and belongs in RAM.
  *
  * Cluster deployments are unaffected: `SPARK_LOCAL_DIRS` (or the
  * resource manager's dir list) takes precedence, and a real cluster
  * sizes local disks for its shuffle volume.
  */
object LocalDir {
  val scratch: String =
    sys.env.getOrElse("SPARK_LOCAL_DIRS",
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
      else System.getProperty("java.io.tmpdir"))

  /** A fresh run directory under `scratch/<group>`, sweeping stale
    * sibling runs first (older than `maxAgeMs`). The FromFiles gate
    * helpers can't delete their own run dir — the returned lazy frame
    * reads its out/ parquet after the helper returns — so each NEW run
    * reclaims its predecessors instead: repeated gate runs hold O(1)
    * scratch rather than accumulating run dirs. A concurrent run in
    * the same group is never swept (age ≈ 0 under any sane budget; the
    * verify watchdog caps a query at minutes).
    */
  def runDir(group: String, maxAgeMs: Long = 3_600_000L): String = {
    val base = new java.io.File(scratch, group)
    base.mkdirs()
    val cutoff = System.currentTimeMillis() - maxAgeMs
    Option(base.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.lastModified() < cutoff)
      .foreach(deleteRecursively)
    java.nio.file.Files.createTempDirectory(base.toPath, "run").toString
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteRecursively)
    f.delete()
  }
}
