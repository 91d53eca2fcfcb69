package graft.streaming

import graft.sources.{FileIO, ManifestStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** STREAMING lakehouse ingest — the full append-store lifecycle under
  * Structured Streaming: micro-batches land as EXACTLY-ONCE tagged
  * appends into a [[ManifestStore]] (zone-map stats harvested per
  * batch), crowded partitions fold through [[ManifestStore.compact]]
  * on a cadence, and consumers answer range reads through the
  * manifest-level skip at any point — snapshot-isolated from the
  * ingest.
  *
  * Exactly-once: the batch id IS the append tag (`b<id>`), recorded in
  * the manifest's DURABLE tag ledger ([[ManifestStore.tags]]), so a
  * foreachBatch replay after a crash finds its batch applied and
  * skips — including after a same-batch COMPACTION, which republishes
  * data files under a fresh commit id and so erases the `c<tag>-`
  * filename markers the pre-ledger dedup relied on (crash after
  * compact, before the checkpoint commit, used to replay as a
  * duplicate append). A crash mid-append leaves unmanifested orphans
  * (invisible, vacuum-swept) and the replay appends cleanly. No state
  * beyond the store itself — the manifest is the ledger.
  *
  * This is the ingest shape where the zone maps pay: each arrival-
  * ordered batch's files carry tight bounds on the arrival key, so a
  * range-predicated consumer skips historic files at the manifest,
  * and compaction bounds per-partition file counts (the fewer-opens
  * vs coarser-skipping trade, taken deliberately every
  * `compactEvery` batches).
  */
object StreamingIngest {

  /** Drain `rows` (staged as `orderCol`-ranged micro-batch files) into
    * a fresh manifest store at `storeDir` via tagged appends; compact
    * partitions holding more than `maxFilesPerPartition` files every
    * `compactEvery` batches. Returns the drained store's latest
    * version.
    */
  def appendStoreFromFiles(
      spark: SparkSession,
      rows: DataFrame,
      orderCol: String,
      partCol: String,
      nBatches: Int,
      scratch: String,
      storeDir: String,
      statsCols: Seq[String],
      compactEvery: Int = 0,
      maxFilesPerPartition: Int = 4,
      statePartitions: Int = 4,
      bloomCols: Seq[String] = Nil,
      clusterBy: Seq[String] = Nil,
      curve: graft.operators.Layout.Curve = graft.operators.Layout.Z):
      Long = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    FileIO.stageRangeBatches(
      rows, col(orderCol), nBatches, new java.io.File(base, "stage"), inDir)
    // bootstrap an EMPTY v0 so every data batch goes through the one
    // exactly-once append path (an init'd first batch would have no
    // replay marker)
    ManifestStore.init(rows.limit(0), partCol, storeDir, statsCols, bloomCols)
    val ss = StreamSessions.scoped(spark, statePartitions)
    val stream = FileIO.streamParquet(
      ss, inDir.toString, rows.schema, maxFilesPerTrigger = 1)
    val q = stream.writeStream
      .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ManifestStore.append(
          batch, partCol, storeDir, statsCols = statsCols,
          tag = Some(f"b$id%05d"), bloomCols = bloomCols)
        if (compactEvery > 0 && id > 0 && id % compactEvery == 0) {
          // the maintenance rung on a cadence: plain small-file folding
          // by default; with `clusterBy` set, the fold is an OPTIMIZE
          // ZORDER — crowded partitions rewrite curve-clustered (Z, or
          // HILBERT for 2-D) so the zone maps bound EVERY listed
          // dim, not just arrival order
          if (clusterBy.isEmpty) {
            ManifestStore.compact(
              ss, storeDir, batch.schema, partCol,
              maxFilesPerPartition, statsCols = statsCols,
              bloomCols = bloomCols)
            ()
          } else {
            ManifestStore.compactClustered(
              ss, storeDir, batch.schema, partCol, clusterBy,
              filesPerPartition = maxFilesPerPartition,
              statsCols = statsCols, bloomCols = bloomCols,
              onlyPartitionsOver = Some(maxFilesPerPartition),
              curve = curve)
            ()
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
    FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    FileIO.deleteScratchOnExit(base)
    ManifestStore.latestVersion(storeDir).getOrElse(0L)
  }

  /** The same drain through the NAMED SINK — `writeStream
    * .format("graft")` ([[GraftSink]]) instead of `foreachBatch`: the
    * whole exactly-once ingest lifecycle (empty-v0 bootstrap, tagged
    * appends, per-batch stats, cadenced compaction) reachable with
    * nothing but format names and options. Returns the drained store's
    * latest version.
    */
  def sinkStoreFromFiles(
      spark: SparkSession,
      rows: DataFrame,
      orderCol: String,
      partCol: String,
      nBatches: Int,
      scratch: String,
      storeDir: String,
      statsCols: Seq[String],
      compactEvery: Int = 0,
      maxFilesPerPartition: Int = 4,
      statePartitions: Int = 4): Long = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    FileIO.stageRangeBatches(
      rows, col(orderCol), nBatches, new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    val stream = FileIO.streamParquet(
      ss, inDir.toString, rows.schema, maxFilesPerTrigger = 1)
    val q = stream.writeStream.format("graft")
      .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
      .option("path", storeDir)
      .option("partCol", partCol)
      .option("statsCols", statsCols.mkString(","))
      .option("compactEvery", compactEvery.toString)
      .option("maxFilesPerPartition", maxFilesPerPartition.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    FileIO.deleteScratchOnExit(base)
    ManifestStore.latestVersion(storeDir).getOrElse(0L)
  }
}
