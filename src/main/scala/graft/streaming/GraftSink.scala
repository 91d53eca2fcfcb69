package graft.streaming

import graft.sources.{GraftWriter, ManifestStore}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.GraftSqlShims

/** `df.writeStream.format("graft")` — the manifest store as a
  * first-class Structured Streaming SINK, completing the loop the
  * `graft-cdf` source opened: a store can now sit on BOTH ends of a
  * streaming pipeline through nothing but format names.
  *
  * Each micro-batch lands as one EXACTLY-ONCE tagged append
  * ([[ManifestStore.append]] with `b<batchId>` as the tag): the batch
  * id is recorded in the manifest's durable tag ledger, so a replay
  * after a crash — Spark re-delivers the last uncommitted batch from
  * its offset log — finds its batch applied and skips, including after
  * a same-batch compaction rewrote the data files (the ledger is
  * embedded in the manifest, not the filenames). A crash mid-append
  * leaves only unmanifested orphans: invisible to readers, swept by
  * [[ManifestStore.vacuum]]. No state beyond the store itself — the
  * manifest is the ledger, exactly the [[StreamingIngest]] contract
  * behind `stream_append_store`, now reachable without `foreachBatch`.
  *
  * `option("compactEvery", n)` folds partitions holding more than
  * `maxFilesPerPartition` files every n batches — the maintenance rung
  * on a cadence, so a long-running ingest bounds per-partition file
  * counts without an external compactor.
  *
  * The sink is APPEND-ONLY by construction (each batch is an
  * independent manifest append; update/complete modes would need a
  * keyed rewrite — that is [[ManifestStore.merge]] under
  * `foreachBatch`, or the CDC pipeline of `stream_pipeline_cdc`).
  */
final class GraftSink(opts: GraftWriter.Opts, partCol: String)
  extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming plan is owned by the streaming IncrementalExecution —
    // re-wrap its executed rows as a batch frame before handing them to
    // the batch write path (the V1-sink idiom; see GraftSqlShims)
    val batch = GraftSqlShims.asBatch(data)
    val spark = data.sparkSession
    if (ManifestStore.latestVersion(opts.storeDir).isEmpty) {
      // bootstrap an EMPTY v0 so every data batch — including batch 0 —
      // goes through the one exactly-once tagged-append path
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], data.schema)
      ManifestStore.init(
        empty, partCol, opts.storeDir, opts.statsCols, opts.bloomCols)
    }
    ManifestStore.append(
      batch, partCol, opts.storeDir, opts.retainVersions, opts.statsCols,
      tag = Some(f"b$batchId%05d"), bloomCols = opts.bloomCols,
      retainAgeMillis = opts.retainAgeMillis)
    if (opts.compactEvery > 0 && batchId > 0 &&
        batchId % opts.compactEvery == 0) {
      ManifestStore.compact(
        spark, opts.storeDir, data.schema, partCol,
        opts.maxFilesPerPartition, statsCols = opts.statsCols,
        bloomCols = opts.bloomCols,
        retainAgeMillis = opts.retainAgeMillis)
      ()
    }
    // a CREATE TABLE ... USING graft name over this store re-pins to
    // the freshly appended version on its next resolution
    GraftWriter.refreshPath(batch, opts.storeDir)
  }

  override def toString: String = s"GraftSink[${opts.storeDir}]"
}
