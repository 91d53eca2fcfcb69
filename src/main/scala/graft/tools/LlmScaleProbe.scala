package graft.tools

import graft.metrics.Metrics
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-dominated throughput probe for the LLM-data operators — the
  * analog of [[ScaleProbe]] (bank path) for the document/embedding
  * path. The sf0.1 bench is fixed-cost dominated; here the corpora are
  * synthesized at millions of rows and CACHED before timing, so wall
  * time is the operators' per-row work. Run:
  *   sbt "runMain graft.tools.LlmScaleProbe [nDocs] [nVecs]"
  */
object LlmScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nVecs = args.drop(1).headOption.map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", graft.LocalDir.scratch)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic corpus: ~30-80 tokens/doc from a small
    // vocab; every 10th doc duplicates an earlier one (dedup work)
    val vocab = (0 until 997).map(i => s"w$i") :+ "the"
    val docs = spark.range(nDocs).toDF("doc_id")
      .withColumn("base",
        when(col("doc_id") % 10 === 0, col("doc_id") / 10).otherwise(col("doc_id")).cast("long"))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), (pmod(col("base"), lit(50)) + 30).cast("int")),
          i => element_at(lit(vocab.toArray), (pmod(col("base") * 31 + i * 7, lit(998)) + 1).cast("int")))))
      .select("doc_id", "text")
      .cache()
    docs.count()

    def report(name: String, rows: Long)(body: => Long): Unit = {
      val t = Metrics.measure { body }
      println(Metrics.reportJson(s"llm_${name}_${rows}_rows", t))
      println(f"[llm-probe] $name: ${rows / t.seconds}%,.0f rows/s (${t.seconds}%.2f s)")
    }

    report("features", nDocs) {
      graft.streaming.StreamingDocs.features(docs, col("text"))
        .agg(sum(col("n_tokens")), count(col("fingerprint"))).head()
      nDocs
    }
    report("exact_dedup", nDocs) {
      Dedup.exact(docs, col("text"), col("doc_id")).count()
    }
    report("minhash_sigs", nDocs) {
      docs.select(Dedup.minHashSignature(col("text"), 16, 3).as("sig"))
        // modular so the ANSI int64 checksum fold can't overflow
        .agg(sum(pmod(element_at(col("sig"), 1), lit(1000000007L)))).head()
      nDocs
    }
    report("simhash_sigs", nDocs) {
      docs.select(Dedup.simHash(col("text")).as("sh"))
        .agg(sum(col("sh"))).head()
      nDocs
    }
    // benchmark decontamination: every 100th doc plays the eval set
    // (bench shingle set broadcast; corpus side is one kernel pass)
    report("decontaminate", nDocs) {
      graft.operators.Corpus.contamination(
        docs.filter(col("doc_id") % 100 =!= 0), col("doc_id"), col("text"),
        docs.filter(col("doc_id") % 100 === 0), col("text"), k = 3).count()
      nDocs
    }
    docs.unpersist()

    // connected components over a synthetic near-dup pair graph:
    // half pair-clusters (diameter 1), half 8-node chains (the
    // pointer-jumping workout) — nEdges edges over ~1.6·nEdges nodes
    val nEdges = nDocs
    val edges = spark.range(nEdges).toDF("e")
      .select(
        when(col("e") % 2 === 0, col("e") * 2) // pair: (4k, 4k+2)
          .otherwise(col("e") * 2 + (col("e") % 8)) // chain links
          .as("a"),
        when(col("e") % 2 === 0, col("e") * 2 + 1)
          .otherwise(col("e") * 2 + (col("e") % 8) + 1)
          .as("b"))
      .cache()
    edges.count()
    report("dup_clusters", nEdges) {
      graft.operators.Clusters.connectedComponents(
        edges, col("a"), col("b")).count()
      nEdges
    }
    edges.unpersist()

    // synthetic embeddings: 64-dim deterministic pseudo-random floats;
    // every 50th vector is a planted near-duplicate of an earlier one
    val vecs = spark.range(nVecs).toDF("vec_id")
      .withColumn("base",
        when(col("vec_id") % 50 === 0, col("vec_id") / 50).otherwise(col("vec_id")).cast("long"))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(63)),
          p => ((pmod(hash(col("base"), p), lit(2001)) - 1000).cast("float") / 1000f).cast("float")))
      .select("vec_id", "embedding")
      .cache()
    vecs.count()

    // 15 bits x 4 tables: ~32k buckets/table keeps candidate volume
    // O(n·tables) at this density, the 100 TB-shape configuration
    report("embedding_neardup", nVecs) {
      Dedup.embeddingNearDups(
        vecs, col("vec_id"), col("embedding"),
        minCosineMilli = 900, bits = 15, tables = 4).count()
      nVecs
    }
    report("ann_allpairs_top3", nVecs) {
      graft.operators.Similarity.lshTopKAll(
        vecs, col("vec_id"), col("embedding"), k = 3, bits = 15, tables = 4).count()
      nVecs
    }

    // compressed-embedding scan ladder: SQ8 encode+ADC and PQ
    // train+encode+LUT-scan throughput over the cached corpus
    report("sq8_topk", nVecs) {
      graft.operators.Similarity.sq8TopK(
        vecs.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        graft.operators.Similarity.sq8Encode(vecs, col("vec_id"), col("embedding")),
        k = 5).count()
      nVecs
    }
    report("pq_topk", nVecs) {
      val (cb, enc) = graft.operators.Similarity.pqTrainEncode(
        vecs, col("vec_id"), col("embedding"), m = 8, subDim = 8)
      graft.operators.Similarity.pqTopK(
        vecs.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        enc, cb, k = 5, m = 8, subDim = 8).count()
      nVecs
    }
    // sample-trained PQ at the production sample floor (the gate
    // recipe at real n: training cost sample-sized, one encode pass)
    report("pq_sample_topk", nVecs) {
      val (cb, enc) = graft.operators.Similarity.pqTrainSampleEncode(
        vecs, col("vec_id"), col("embedding"), m = 8, subDim = 8,
        iters = 2, sampleN = graft.operators.Similarity.recommendedPqSample(8, 39))
      graft.operators.Similarity.pqTopK(
        vecs.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        enc, cb, k = 5, m = 8, subDim = 8).count()
      nVecs
    }
    // trained IVF at the sqrt(n) sizing rule — the codegen stress case:
    // cells ~ sqrt(n) inlined kernel literals per row in the
    // assignment/probe projections (447 at 200k vectors)
    report("ivf_topk_sized", nVecs) {
      val cells = graft.operators.Similarity.recommendedCells(nVecs)
      val nprobe = graft.operators.Similarity.recommendedNprobe(cells, 0.05)
      val cb = graft.operators.Similarity.kmeansCodebook(
        vecs, pmod(col("vec_id"), lit(cells.toLong)), col("embedding"), iters = 1)
      graft.operators.Similarity.ivfTopK(
        vecs.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        vecs.select(col("vec_id").as("cid"), col("embedding").as("cvec")),
        cb, k = 5, nprobe = nprobe, cassign = 2).count()
      nVecs
    }

    // degenerate-bucket skew: 5% of the corpus is ONE identical vector,
    // so in EVERY table those rows share a single bucket (50k rows at
    // nVecs = 1M). Uncapped, that bucket alone is ~1.25e9 candidate
    // pairs per table — the quadratic blowup a real near-duplicate
    // flood produces. The default-on cap (10k) drops the flooded
    // buckets; pair volume and wall time stay bounded by the healthy
    // buckets (Σ bucket² ≤ cap·n·tables).
    val nSkew = nVecs / 20
    val flood = spark.range(nSkew)
      .select((col("id") + 100000000L).as("vec_id"),
        transform(sequence(lit(0), lit(63)), _ => lit(0.5f)).as("embedding"))
    val skewed = vecs.unionByName(flood).cache()
    skewed.count()
    report("neardup_skewed_capped", nVecs + nSkew) {
      val pairs = Dedup.embeddingNearDups(
        skewed, col("vec_id"), col("embedding"),
        minCosineMilli = 900, bits = 15, tables = 4).count()
      println(s"[llm-probe] skewed corpus candidate pairs surviving: $pairs")
      nVecs + nSkew
    }
    skewed.unpersist()
    vecs.unpersist()

    // shuffle-heavy corpus ops at scale: integer-exact tf-idf top-3
    // (tf join df on token) and token-budget sequence packing (running
    // sum window per group)
    val docs2 = spark.range(nDocs / 10).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), (pmod(col("doc_id"), lit(50)) + 30).cast("int")),
          i => element_at(lit(vocab.toArray), (pmod(col("doc_id") * 31 + i * 7, lit(998)) + 1).cast("int")))))
      .withColumn("lang", element_at(lit(Array("en", "fr", "zh")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
      .cache()
    docs2.count()
    report("tfidf_top3", nDocs / 10) {
      graft.operators.Corpus.topKeywords(docs2, col("doc_id"), col("text"), k = 3).count()
      nDocs / 10
    }
    report("pack_chunks", nDocs / 10) {
      graft.operators.Corpus.packChunks(
        docs2.select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens")),
        col("doc_id"), col("lang"), col("n_tokens"), budgetTokens = 4096).count()
      nDocs / 10
    }

    // inverted-index n-gram Jaccard under PLANTED boilerplate skew:
    // every doc carries the same 8-token footer, so its shingles have
    // df = |corpus| — the exact hot-key case the df cap exists for. The
    // aggregate+anti-join spelling collapses each hot shingle map-side;
    // the windowed spelling this replaced would pin |corpus| rows in
    // ONE task per hot shingle before discarding them.
    report("ngram_jaccard_boilerplate", nDocs / 10) {
      val withFooter = docs2.select(col("doc_id"),
        concat(col("text"),
          lit(" subscribe to our newsletter for updates today now")).as("text"))
      Dedup.ngramJaccard(withFooter, col("text"), col("doc_id"),
        shingleSize = 3, minJaccardMilli = 500, maxShingleDf = 64).count()
      nDocs / 10
    }

    // duplicated-span removal under the same planted boilerplate: the
    // footer is ONE 8-token span with |corpus| occurrences. The span
    // count + first-occurrence choice is a map-side-combinable
    // aggregate (the hot hash collapses per task); the coverage join
    // back then touches every non-first occurrence — that expansion IS
    // the workload (those positions must be cut), linear in corpus
    // size, never quadratic.
    report("span_dedup_boilerplate", nDocs / 10) {
      val withFooter = docs2.select(col("doc_id"),
        concat(col("text"),
          lit(" subscribe to our newsletter for updates today now")).as("text"))
      graft.operators.Spans.spanDedup(
        withFooter, col("doc_id"), col("text"), k = 8, minCount = 2)
        .agg(sum(col("n_dropped"))).head()
      nDocs / 10
    }

    // pathological span-dedup corner: long documents duplicated
    // WHOLESALE (coverage ~ doc length). The two-pointer reassembly
    // kernel is O(len + cov) per doc; the HOF array_contains spelling
    // was O(len·cov) — minutes, not seconds, on this shape.
    val longDocs = spark.range(2000).toDF("doc_id")
      .withColumn("base",
        when(col("doc_id") % 2 === 1, col("doc_id") - 1).otherwise(col("doc_id")))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(4999)),
          i => element_at(lit(vocab.toArray),
            (pmod(col("base") * 13 + i * 11, lit(998)) + 1).cast("int")))))
      .select("doc_id", "text")
      .cache()
    longDocs.count()
    report("span_dedup_long_dups", 2000) {
      graft.operators.Spans.spanDedup(
        longDocs, col("doc_id"), col("text"), k = 8, minCount = 2)
        .agg(sum(col("n_dropped"))).head()
      2000
    }
    longDocs.unpersist()

    // BPE: 16 training merges on the capped word-frequency table (the
    // corpus collapses to <=4096 rows after ONE pass — rounds are
    // corpus-size-independent), then the full-corpus encode through
    // the native kernel (fold paid once per DISTINCT word)
    report("bpe_train_encode", nDocs / 10) {
      val merges = graft.operators.Bpe.train(
        docs2, col("text"), numMerges = 16, maxWords = 4096)
      graft.operators.Bpe.encodeDocs(docs2, col("doc_id"), col("text"), merges)
        .agg(sum(col("n_pieces"))).head()
      nDocs / 10
    }

    // heavy-hitter 3-grams over the Zipf-ish synthetic vocab: the hot
    // head collapses in map-side partial aggregation; the global top-k
    // is TakeOrderedAndProject (per-partition heaps), never a sort
    report("heavy_ngrams", nDocs / 10) {
      graft.operators.CorpusStats.heavyNgrams(docs2, col("text"), n = 3, k = 100)
        .count()
      nDocs / 10
    }

    // hashed linear classifier: broadcast 4096-row model, one narrow
    // pass, per-doc combinable sum — the fasttext-filter shape
    report("classifier_score", nDocs / 10) {
      graft.operators.CorpusStats.classifierScore(
        docs2, col("doc_id"), col("text"),
        graft.operators.CorpusStats.syntheticWeights(spark, 4096), 4096)
        .agg(sum(col("score_sum"))).head()
      nDocs / 10
    }
    docs2.unpersist()
    spark.stop()
  }
}
