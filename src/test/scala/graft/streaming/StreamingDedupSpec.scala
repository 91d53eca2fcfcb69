package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The incremental LSH near-dup operator's equivalence contract:
  * whatever the micro-batch partitioning, the emitted pair set equals
  * the batch portable-LSH candidate set (same signatures, same
  * first-agreeing-band exactly-once rule, same estimate).
  */
final case class NearDupDoc(doc_id: Long, text: String)

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private type Doc = NearDupDoc
  private def Doc(id: Long, text: String): NearDupDoc = NearDupDoc(id, text)

  private def corpus(seed: Int, n: Int): Seq[Doc] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "the", "of", "and")
    (0 until n).map { i =>
      // every 5th doc: a near-copy of an earlier doc with one token
      // appended — high jaccard, guaranteed band agreement
      if (i % 5 == 0 && i > 0) {
        val base = i - (1 + rnd.nextInt(math.min(4, i)))
        val baseRnd = new scala.util.Random(seed + base)
        val toks = Seq.fill(12)(vocab(baseRnd.nextInt(vocab.length)))
        Doc(i.toLong, (toks :+ "extra").mkString(" "))
      } else {
        val docRnd = new scala.util.Random(seed + i)
        Doc(i.toLong, Seq.fill(12)(vocab(docRnd.nextInt(vocab.length))).mkString(" "))
      }
    }
  }

  private def runStreamed(docs: Seq[Doc], nBatches: Int): Set[(Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val sink = s"neardup_out_${nBatches}_${docs.length}"
    val q = StreamingDedup.nearDupPairs(
      input.toDF(), col("text"), col("doc_id"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      val chunk = math.max(1, math.ceil(docs.size.toDouble / nBatches).toInt)
      docs.grouped(chunk).foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()
    spark.table(sink).as[(Long, Long, Long)].collect().toSet
  }

  test("streamed pair set == batch portable LSH candidates, any batch split") {
    val docs = corpus(7, 60)
    val batch = Dedup.nearDuplicateCandidatesPortable(
      docs.toDF(), col("text"), col("doc_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "fixture must produce candidate pairs")
    // 1 batch (everything at once) and 4 batches (incremental) both
    // reproduce the batch operator exactly
    assert(runStreamed(docs, 1) == batch)
    assert(runStreamed(docs, 4) == batch)
  }

  test("streamed semantic decontamination == the batch flag under any " +
    "split (stateless per row against the frozen eval set)") {
    val e = graft.tables.Tables.load(spark, Sf0001, "embeddings")
    val corpusSide = e.filter(col("vec_id") % 20 =!= 0)
    val evalSide = e.filter(col("vec_id") % 20 === 0)
    val batch = Dedup.semanticContamination(
      corpusSide, col("vec_id"), col("embedding"),
      evalSide, col("vec_id"), col("embedding"),
      minCosineMilli = 350, bits = 6, tables = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.exists(_._3 == 1L), "fixture must plant semantic leakage")
    for (nBatches <- Seq(1, 4)) {
      val scratch = java.nio.file.Files
        .createTempDirectory(s"graft-sdecon-$nBatches").toString
      val streamed = StreamingDedup.semanticContaminationFromFiles(
        spark, corpusSide, evalSide,
        minCosineMilli = 350, bits = 6, tables = 8,
        nBatches = nBatches, scratch)
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"split into $nBatches batches diverged")
      graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    }
  }

  test("new arrivals pair against state from EARLIER micro-batches") {
    val a = Doc(1L, "one two three four five six seven eight nine ten eleven twelve")
    val b = Doc(2L, "one two three four five six seven eight nine ten eleven twelve extra")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.nearDupPairs(input.toDF(), col("text"), col("doc_id"))
      .writeStream.format("memory").queryName("neardup_cross")
      .outputMode("append").start()
    try {
      input.addData(Seq(a)); q.processAllAvailable()
      assert(spark.table("neardup_cross").isEmpty)
      input.addData(Seq(b)); q.processAllAvailable()
      val rows = spark.table("neardup_cross").as[(Long, Long, Long)].collect().toSeq
      assert(rows.map(r => (r._1, r._2)) == Seq((1L, 2L)))
      assert(rows.head._3 >= 500L, s"near-copy estimate too low: $rows")
    } finally q.stop()
  }

  test("flooded bucket stops indexing at the cap but keeps serving") {
    // 30 identical docs: uncapped they form 435 pairs; cap 5 bounds the
    // index so only pairs against the first 5 stored docs emit
    val docs = (0 until 30).map(i =>
      Doc(i.toLong, "same exact text repeated over and over again here twelve tokens"))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.nearDupPairs(
      input.toDF(), col("text"), col("doc_id"), maxBucketDocs = 5)
      .writeStream.format("memory").queryName("neardup_cap")
      .outputMode("append").start()
    try {
      input.addData(docs); q.processAllAvailable()
      val n = spark.table("neardup_cap").count()
      // stored = first 5 docs; each of the other 25 pairs with those 5
      // (+ the 10 pairs inside the stored set)
      assert(n == 10L + 25L * 5L, s"got $n pairs")
    } finally q.stop()
  }

  test("at-least-once redelivery of the same docs emits no duplicate pairs") {
    val a = Doc(1L, "one two three four five six seven eight nine ten eleven twelve")
    val b = Doc(2L, "one two three four five six seven eight nine ten eleven twelve extra")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.nearDupPairs(input.toDF(), col("text"), col("doc_id"))
      .writeStream.format("memory").queryName("neardup_redeliver")
      .outputMode("append").start()
    try {
      input.addData(Seq(a, b)); q.processAllAvailable()
      assert(spark.table("neardup_redeliver").count() == 1L)
      // an upstream replay re-sends the identical rows in a later batch
      input.addData(Seq(a, b)); q.processAllAvailable()
      assert(spark.table("neardup_redeliver").count() == 1L,
        "redelivered rows re-emitted pairs")
    } finally q.stop()
  }

  test("hamming redelivery: replayed (id, sig) rows neither re-pair nor re-index") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = StreamingDedup.hammingPairs(input.toDS(), maxHamming = 3)
      .writeStream.format("memory").queryName("hamming_redeliver")
      .outputMode("append").start()
    try {
      // sigs differ in 1 bit → 3 agreeing words → one pair, once
      input.addData(Seq((1L, 0x1234567890abcdefL), (2L, 0x1234567890abcdeeL)))
      q.processAllAvailable()
      assert(spark.table("hamming_redeliver").count() == 1L)
      input.addData(Seq((1L, 0x1234567890abcdefL), (2L, 0x1234567890abcdeeL)))
      q.processAllAvailable()
      assert(spark.table("hamming_redeliver").count() == 1L,
        "redelivered signatures re-emitted pairs")
      // a genuinely new neighbor still pairs against both stored docs
      input.addData(Seq((3L, 0x1234567890abcdecL))); q.processAllAvailable()
      assert(spark.table("hamming_redeliver").count() == 3L)
    } finally q.stop()
  }

  test("hamming ttl: idle buckets evict (bounded store under bucket " +
    "churn); post-eviction arrivals probe only recent residents") {
    import scala.concurrent.duration._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val ckpt = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(graft.LocalDir.scratch), "hamttl-ckpt").toString
    // each sig uses 4 distinct words no other sig shares -> 4 unique
    // buckets per sig, no cross-sig pairs
    def sig(i: Long): Long =
      i | ((100L + i) << 16) | ((200L + i) << 32) | ((300L + i) << 48)
    val input = MemoryStream[(Long, Long)]
    val q = StreamingDedup.hammingPairs(
      input.toDS(), maxHamming = 3, ttl = Some(3.seconds))
      .writeStream.format("memory").queryName("hamttl")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // batch 1: 50 sigs -> 200 bucket states
      input.addData((0 until 50).map(i => (i.toLong, sig(i.toLong))))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 200L)
      Thread.sleep(8000) // well past the 3 s ttl even under load
      // batch 2: one fresh sig; every batch-1 bucket idles out
      input.addData(Seq((1000L, sig(1000L))))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 4L,
        "expected only the fresh sig's buckets after ttl eviction")
      // batch 3: an EXACT duplicate of evicted sig 5 — its buckets
      // were dropped, so no pair emits (dedup-against-recent, the
      // documented ttl tradeoff), and it re-indexes fresh
      input.addData(Seq((2000L, sig(5L))))
      q.processAllAvailable()
      assert(spark.table("hamttl").count() == 0L,
        "evicted residents must not pair")
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 8L)
      // batch 4: a 1-bit neighbor of the re-indexed sig pairs normally
      input.addData(Seq((3000L, sig(5L) ^ 1L)))
      q.processAllAvailable()
      assert(spark.table("hamttl").count() == 1L)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      graft.sources.FileIO.deleteScratch(new java.io.File(ckpt))
    }
  }

  test("streamed 64-bit hamming pairs == batch pigeonhole, any batch split") {
    import graft.operators.{Dedup, Multimodal}
    // 40 gradient images, every 4th with a brightness-shifted twin
    val media = (0L until 40L).flatMap { id =>
      def png(shift: Int) = Multimodal.syntheticGradientPng(
        18, 16, (1 + id % 13).toInt, (1 + (id * 3) % 11).toInt,
        ((id * 11) % 128).toInt, shift)
      val base = (id, png(0), "image/png")
      if (id % 4 == 0) Seq(base, (id + 1000L, png(8), "image/png")) else Seq(base)
    }.toDF("doc_id", "payload", "mime")
    val batch = Dedup.hamming64NearDups(
      Multimodal.imageDHash(spark, media), maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    for (nBatches <- Seq(1, 3)) {
      val scratch = java.nio.file.Files
        .createTempDirectory(s"graft-simg-$nBatches").toString
      val streamed = graft.streaming.StreamingDedup.imageNearDupsFromFiles(
        spark, media, maxHamming = 3, nBatches = nBatches, scratch,
        statePartitions = 4)
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"split into $nBatches batches diverged")
      graft.sources.FileIO.deleteScratch(new java.io.File(scratch))
    }
  }
}
