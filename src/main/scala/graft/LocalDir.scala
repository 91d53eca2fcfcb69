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
}
