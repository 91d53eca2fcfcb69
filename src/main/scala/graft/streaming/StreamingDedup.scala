package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection: the minhash-LSH candidate
  * pipeline ([[Dedup.nearDuplicateCandidatesPortable]]) as an
  * INCREMENTAL Structured Streaming operator — every arriving document
  * is checked against the whole corpus seen so far, the shape a live
  * training-data ingest needs (is this crawl page a near-dup of
  * anything ever ingested?).
  *
  * Spark-first mechanics: the batch pipeline's band equi-join becomes a
  * `groupByKey` on the SAME band key with per-bucket state — the
  * signatures previously seen in that bucket (`flatMapGroupsWithState`,
  * keyed state sharded by bucket hash across executors; nothing passes
  * through the driver). A new document emits one candidate pair per
  * state document whose FIRST agreeing band is this bucket's band —
  * the identical exactly-once rule as the batch operator, decided from
  * the two carried signatures with no cross-bucket coordination.
  *
  * Equivalence contract (oracle-gated): fed the corpus in tid order —
  * any micro-batch partitioning — the emitted pair set is EXACTLY the
  * batch operator's (doc_a < doc_b, first-agreeing-band, same
  * estimated-jaccard milli), because the pair rule is a pure function
  * of the two signatures. The `stream_neardup` gate entry runs the
  * DuckDB oracle of `dedup_minhash_pairs` against the streamed output.
  *
  * Scale notes: per-bucket state grows with the docs that hash there —
  * that is the inherent cost of dedup-against-everything (the batch
  * join re-reads the same volume every run; the stream pays it once,
  * incrementally). `maxBucketDocs` caps flooded buckets (the streaming
  * analog of [[graft.operators.Similarity.capBuckets]]): past the cap
  * a bucket stops INDEXING new signatures (still probes), bounding
  * state and per-record work at the cost of possibly missing pairs
  * inside a degenerate flood — same trade the batch cap makes.
  */
object StreamingDedup {

  final case class BandedDoc(bucket: String, doc_id: Long, sig: Seq[Long], band_id: Int)
  final case class StoredDoc(doc_id: Long, sig: Seq[Long])
  final case class NearDupPair(doc_a: Long, doc_b: Long, est_jaccard_milli: Long)

  private def firstAgreeingBand(
      a: Seq[Long], b: Seq[Long], bands: Int, r: Int): Int = {
    var bi = 0
    while (bi < bands) {
      var i = 0
      var eq = true
      while (i < r && eq) {
        if (a(bi * r + i) != b(bi * r + i)) eq = false
        i += 1
      }
      if (eq) return bi
      bi += 1
    }
    -1
  }

  private def estJaccardMilli(a: Seq[Long], b: Seq[Long], numHashes: Int): Long = {
    var m = 0
    var i = 0
    while (i < numHashes) {
      if (a(i) == b(i)) m += 1
      i += 1
    }
    math.round(m * 1000.0 / numHashes)
  }

  /** Near-dup candidate pairs of a (streaming or batch) document frame
    * against everything seen before — (earlier id, later id, estimated
    * jaccard milli), each pair exactly once.
    */
  def nearDupPairs(
      docs: DataFrame,
      textCol: Column,
      idCol: Column,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      maxBucketDocs: Int = 100000): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val r = numHashes / bands
    val withSig = docs.select(
      idCol.cast("long").as("doc_id"),
      Dedup.minHashSignature(textCol, numHashes, shingleSize).as("sig"))
      .as[(Long, Seq[Long])]
    val banded = withSig.flatMap { case (id, sig) =>
      (0 until bands).map { b =>
        BandedDoc(
          b + ":" + sig.slice(b * r, (b + 1) * r).mkString(","), id, sig, b)
      }
    }
    banded.groupByKey(_.bucket).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: String, it: Iterator[BandedDoc],
       state: org.apache.spark.sql.streaming.GroupState[Seq[StoredDoc]]) =>
        val prior = state.getOption.getOrElse(Seq.empty)
        val seen = scala.collection.mutable.ArrayBuffer[StoredDoc](prior: _*)
        val out = scala.collection.mutable.ArrayBuffer[NearDupPair]()
        // deterministic within-batch order: by doc id, so "earlier" is
        // always the smaller id whatever the shuffle delivered
        it.toIndexedSeq.sortBy(_.doc_id).foreach { d =>
          // at-least-once redelivery guard: an id already indexed in
          // this bucket was fully processed by an earlier delivery
          var i = 0
          var isRedelivery = false
          while (i < seen.length && !isRedelivery) {
            if (seen(i).doc_id == d.doc_id) isRedelivery = true
            i += 1
          }
          if (!isRedelivery) {
            i = 0
            while (i < seen.length) {
              val e = seen(i)
              if (firstAgreeingBand(e.sig, d.sig, bands, r) == d.band_id) {
                val (a, b) =
                  if (e.doc_id < d.doc_id) (e.doc_id, d.doc_id)
                  else (d.doc_id, e.doc_id)
                out += NearDupPair(a, b, estJaccardMilli(e.sig, d.sig, numHashes))
              }
              i += 1
            }
            if (seen.length < maxBucketDocs) seen += StoredDoc(d.doc_id, d.sig)
          }
        }
        // a capped (or probe-only) invocation that indexed nothing new
        // skips the state-store rewrite — the write is O(bucket)
        if (seen.length != prior.length) state.update(seen.toSeq)
        out.iterator
    }
  }

  /** File-fed end-to-end run (the gate-query spelling): documents are
    * range-partitioned by id into `nBatches` micro-batch files, streamed
    * through [[nearDupPairs]], appended exactly-once to a parquet sink,
    * and returned as a batch frame. Driver moves file metadata only.
    */
  def nearDupPairsFromFiles(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame,
      textCol: String,
      idCol: String,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    graft.sources.FileIO.stageRangeBatches(
      docs.select(col(idCol), col(textCol)), col(idCol), nBatches,
      new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, docs.select(col(idCol), col(textCol)).schema,
      maxFilesPerTrigger = 1)
    val q = graft.sources.FileIO.streamingParquetSink(
      nearDupPairs(stream, col(textCol), col(idCol)).toDF(),
      outDir.toString, new java.io.File(base, "ckpt").toString).start()
    q.awaitTermination()
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    spark.read.parquet(outDir.toString)
  }

  /** SEMANTIC decontamination maintained ONLINE — the streaming
    * sibling of [[graft.operators.Dedup.semanticContamination]]: new
    * corpus embeddings arrive as micro-batch files and check against a
    * FROZEN eval set (model-sized by definition — a benchmark suite —
    * pinned to the scoped session once, broadcast into every batch).
    * The check is STATELESS per row, so any micro-batch split lands
    * flags row-identical to the batch operator; each batch's output
    * lands under its own batch dir with overwrite (exactly-once on
    * foreachBatch replay — the [[StreamingQuality]] partials
    * discipline). The drained union IS the batch report.
    */
  def semanticContaminationFromFiles(
      spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame, // (vec_id, embedding)
      evalSet: DataFrame, // (vec_id, embedding)
      minCosineMilli: Long, bits: Int, tables: Int,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    val narrow = corpus.select(col("vec_id"), col("embedding"))
    graft.sources.FileIO.stageRangeBatches(
      narrow, col("vec_id"), nBatches, new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    // the frozen eval model, re-pinned on the scoped session (frames
    // from different sessions must not meet in one plan)
    val evalNarrow = evalSet.select(col("vec_id"), col("embedding"))
    val evalLocal = ss.createDataFrame(
      ss.sparkContext.parallelize(evalNarrow.collect().toSeq, 1),
      evalNarrow.schema).localCheckpoint(true)
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, narrow.schema, maxFilesPerTrigger = 1)
    val q = stream.writeStream
      .option("checkpointLocation", new java.io.File(base, "ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.operators.Dedup.semanticContamination(
          batch, col("vec_id"), col("embedding"),
          evalLocal, col("vec_id"), col("embedding"),
          minCosineMilli, bits, tables)
          .write.mode("overwrite") // exactly-once per batch id on replay
          .parquet(new java.io.File(outDir, f"batch-$id%05d").toString)
      }
      .start()
    q.awaitTermination()
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    graft.sources.FileIO.deleteScratchOnExit(base)
    spark.read.option("recursiveFileLookup", "true").parquet(outDir.toString)
  }

  final case class BandedSig(bucket: String, id: Long, sig: Long)
  final case class StoredSig(id: Long, sig: Long)
  final case class HammingPair(doc_a: Long, doc_b: Long, hamming: Long)

  /** Index of the FIRST of the 4 16-bit words where two packed 64-bit
    * signatures agree, or -1 — the exactly-once rule shared with the
    * batch [[graft.operators.Dedup.hamming64NearDups]].
    */
  private def firstAgreeingWord(a: Long, b: Long): Int = {
    val x = a ^ b
    var q = 0
    while (q < 4) {
      if ((x & (0xffffL << (16 * q))) == 0L) return q
      q += 1
    }
    -1
  }

  /** STREAMING near-dup over ANY packed 64-bit signature stream —
    * the incremental sibling of
    * [[graft.operators.Dedup.hamming64NearDups]], and (composed with
    * the multimodal hashers) live image/audio dedup-against-everything:
    * every arriving signature probes the per-word-bucket keyed state
    * (signatures previously seen in that 16-bit bucket), emits a pair
    * exactly once — from the FIRST agreeing word, decided from the two
    * carried signatures with no cross-bucket coordination — and
    * indexes itself. Equivalence contract, scoped: for inputs where no
    * 16-bit bucket exceeds `maxBucketDocs` (default aligned with the
    * batch operator's 10k `maxBucketSize`), any micro-batch
    * partitioning drains to EXACTLY the batch pair set. Above the cap
    * the two necessarily diverge — the batch pass sees the full bucket
    * and drops it atomically, while an incremental index cannot retract
    * pairs it already emitted, so the stream freezes the bucket at the
    * cap (stops indexing, keeps probing) instead.
    *
    * At-least-once upstream redelivery of a (id, sig) row is absorbed:
    * an id already present in the bucket's state neither re-probes nor
    * re-indexes, so replayed micro-batches emit no duplicate pairs.
    * (Probe-only ids in an already-frozen bucket are not remembered and
    * would re-emit on redelivery — the cap bounds state by design.)
    *
    * `ttl`: optional idle-BUCKET eviction (the `runStreaming(ttl=…)`
    * pattern, SURVEY §2 row 12b): a 16-bit bucket no signature landed
    * in for `ttl` drops its index, bounding the store by buckets
    * active within the window instead of signatures-ever-seen. The
    * tradeoff is explicit: a new signature cannot pair with
    * pre-eviction residents of that bucket — dedup-against-RECENT
    * rather than dedup-against-everything. Leave off when the full
    * history must stay probe-able.
    */
  def hammingPairs(
      sigs: Dataset[(Long, Long)], // (id, sig)
      maxHamming: Int,
      maxBucketDocs: Int = 10000,
      ttl: Option[scala.concurrent.duration.FiniteDuration] = None): Dataset[HammingPair] = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val banded = sigs.flatMap { case (id, sig) =>
      (0 until 4).map { q =>
        BandedSig(q + ":" + ((sig >>> (16 * q)) & 0xffffL), id, sig)
      }
    }
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    banded.groupByKey(_.bucket).flatMapGroupsWithState(
      OutputMode.Append(), timeoutConf) {
      (bucket: String, it: Iterator[BandedSig],
       state: org.apache.spark.sql.streaming.GroupState[Seq[StoredSig]]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
        val word = bucket.takeWhile(_ != ':').toInt
        val prior = state.getOption.getOrElse(Seq.empty)
        val seen = scala.collection.mutable.ArrayBuffer[StoredSig](prior: _*)
        val out = scala.collection.mutable.ArrayBuffer[HammingPair]()
        it.toIndexedSeq.sortBy(_.id).foreach { d =>
          // at-least-once redelivery guard: an id already indexed in
          // this bucket was fully processed by an earlier delivery —
          // probing again would re-emit every pair it participates in
          var i = 0
          var isRedelivery = false
          while (i < seen.length && !isRedelivery) {
            if (seen(i).id == d.id) isRedelivery = true
            i += 1
          }
          if (!isRedelivery) {
            i = 0
            while (i < seen.length) {
              val e = seen(i)
              if (firstAgreeingWord(e.sig, d.sig) == word &&
                  java.lang.Long.bitCount(e.sig ^ d.sig) <= maxHamming) {
                val (a, b) = if (e.id < d.id) (e.id, d.id) else (d.id, e.id)
                out += HammingPair(a, b,
                  java.lang.Long.bitCount(e.sig ^ d.sig).toLong)
              }
              i += 1
            }
            if (seen.length < maxBucketDocs) seen += StoredSig(d.id, d.sig)
          }
        }
        if (seen.length != prior.length) state.update(seen.toSeq)
        // refresh the idle timer on every touch (data arrival beats
        // the timer); state is always defined here — the first doc of
        // a bucket indexes itself before this point
        if (seen.nonEmpty) ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
        out.iterator
        }
    }
  }

  /** File-fed streaming image near-dup (the gate-query spelling):
    * media rows stage as micro-batch files, frames decode + dHash on
    * executors per batch, pairs stream out of the stateful pigeonhole
    * index exactly-once.
    */
  def imageNearDupsFromFiles(
      spark: org.apache.spark.sql.SparkSession,
      media: DataFrame, // (doc_id, payload, mime)
      maxHamming: Int,
      nBatches: Int,
      scratch: String,
      statePartitions: Int = 4): DataFrame = {
    val base = new java.io.File(scratch)
    val inDir = new java.io.File(base, "in")
    val outDir = new java.io.File(base, "out")
    graft.sources.FileIO.stageRangeBatches(
      media, col("doc_id"), nBatches, new java.io.File(base, "stage"), inDir)
    val ss = StreamSessions.scoped(spark, statePartitions)
    import ss.implicits._
    val stream = graft.sources.FileIO.streamParquet(
      ss, inDir.toString, media.schema, maxFilesPerTrigger = 1)
    val sigs = stream
      .as[graft.operators.Multimodal.MediaRecord]
      .map(r => (r.doc_id, graft.operators.Multimodal.dhash64(r.payload)))
    val q = graft.sources.FileIO.streamingParquetSink(
      hammingPairs(sigs, maxHamming).toDF(),
      outDir.toString, new java.io.File(base, "ckpt").toString).start()
    q.awaitTermination()
    graft.sources.FileIO.deleteScratch(
      new java.io.File(base, "stage"), inDir, new java.io.File(base, "ckpt"))
    spark.read.parquet(outDir.toString)
  }
}
