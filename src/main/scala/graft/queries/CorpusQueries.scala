package graft.queries

import graft.operators.{Bpe, Clusters, Corpus, CorpusStats, Dedup, Spans, TextAnalysis}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation correctness queries (SURVEY.md §2 rows 50-53):
  * duplicate-cluster resolution (connected components over near-dup
  * pairs), benchmark decontamination, deterministic stratified
  * sampling, token-budget packing. Every query is fully DuckDB-oracle
  * checked — including the iterative connected components, whose
  * oracle is a recursive-CTE transitive closure.
  */
object CorpusQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  /** The shared incremental-gate perturbation: doc_id % 11 flips lang
    * to 'xx' (METADATA-ONLY change — text untouched), % 7 deletes,
    * % 10 edits text, % 13 duplicates under id + 10^7. The lang flip
    * applies BEFORE the re-id, so a duplicated doc carries its
    * original id's flip (the oracle's nd0 CTE, verbatim).
    */
  private def incrPerturbed(old: DataFrame): DataFrame = {
    val relabeled = old.withColumn("lang",
      when(col("doc_id") % 11 === 0, lit("xx")).otherwise(col("lang")))
    relabeled.filter(col("doc_id") % 7 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 10 === 0, concat(col("text"), lit(" edited")))
          .otherwise(col("text")))
      .unionByName(relabeled.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
  }

  /** One drained CDC pipeline run per (session, sf dir), shared by the
    * gates that read its stores (`stream_pipeline_cdc` reads the
    * packed store, `cdc_tx_corpus` the corpus store at the final tx):
    * each consumer is oracled independently, the 4-store churn runs
    * once.
    */
  private val cdcRuns =
    graft.evaluation.GraphMemo[graft.operators.IncrementalCdc.CdcDirs]()

  /** Drop memoized gate runs for `spark`. Bench calls this at each
    * pass start so the shared CDC drain is RE-PAID every pass — a
    * cross-pass memo would let min-of-2 report the ~20 s pipeline as
    * its consumers' near-zero read costs (measured benchmark-gaming
    * hazard, not a hypothetical). Within one pass the drain is still
    * paid once and attributed to whichever consumer runs first.
    */
  def invalidateMemos(spark: SparkSession): Unit =
    cdcRuns.invalidate(spark)

  private def cdcRun(
      s: SparkSession, dir: String): graft.operators.IncrementalCdc.CdcDirs =
    cdcRuns.getOrElseUpdate(s, dir, {
      val old = docs(s, dir)
      val scratch = graft.LocalDir.runDir("pipeline-cdc")
      def ev(df: DataFrame, del: Boolean) =
        df.select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars").cast("long").as("n_chars"),
          lit(del).as("is_delete"))
      val relabeled = old.withColumn("lang",
        when(col("doc_id") % 11 === 0, lit("xx")).otherwise(col("lang")))
      val events = ev(old.filter(col("doc_id") % 7 === 0), del = true)
        .unionByName(ev(relabeled.filter(col("doc_id") % 7 =!= 0
            && (col("doc_id") % 10 === 0 || col("doc_id") % 11 === 0))
          .withColumn("text",
            when(col("doc_id") % 10 === 0, concat(col("text"), lit(" edited")))
              .otherwise(col("text"))), del = false))
        .unionByName(ev(relabeled.filter(col("doc_id") % 13 === 0)
          .withColumn("doc_id", col("doc_id") + 10000000L), del = false))
        .withColumn("ev_seq", col("doc_id"))
      graft.operators.IncrementalCdc.pipelineFromDocEventsFromFiles(
        s, events, old, nBatches = 3, scratch, nShards = 16, seqLen = 256L)
      graft.operators.IncrementalCdc.CdcDirs(scratch)
    }, _ => ())

  /** The store-gates' events projection: (event_id, user_id, ub). */
  private def eventsForStore(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"))
      .withColumn("ub", pmod(col("user_id"), lit(8L)))

  private val EventsStoreSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("user_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ub",
      org.apache.spark.sql.types.LongType)))

  /** The store-gates' shared consumer: the top-2/5 event_id range
    * aggregated per user bucket, read through the zone-map skip + the
    * exact predicate.
    */
  private def skipReadAggregate(
      s: SparkSession, store: String, maxId: Long): DataFrame = {
    val lo = maxId - maxId * 2L / 5L
    graft.sources.ManifestStore.read(
      s, store, EventsStoreSchema, "ub",
      range = Some(("event_id", lo, maxId)))
      .filter(col("event_id").between(lo, maxId))
      .groupBy("ub")
      .agg(count(lit(1)).as("n_events"), sum("event_id").as("sum_id"))
      .orderBy("ub")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C4-style line-level dedup: substantial lines survive only at
    // their corpus-wide first occurrence, documents reassembled
    "line_dedup" -> ((s, dir) =>
      Corpus.lineDedup(docs(s, dir), col("doc_id"), col("text"))
        .orderBy("doc_id")),
    // the END-TO-END pretraining-prep pipeline as ONE declarative
    // plan: quality gate -> exact dedup (keep-first) -> deterministic
    // stratified sample -> position-level sequence packing. Catalyst
    // sees all four stages at once (filters push to the scan, the
    // dedup and prefix shuffles are the only wide stages), and the
    // oracle replays the whole chain CTE by CTE.
    "pipeline_pretrain" -> ((s, dir) => {
      val d = docs(s, dir)
      val quality = d.filter(TextAnalysis.qualityMilli(col("text")) >= 30)
      val keep = Dedup.exact(quality, col("text"), col("doc_id"))
        .select(col("keep_id").as("doc_id"))
      val deduped = quality.join(keep, Seq("doc_id"), "left_semi")
      val sampled = Corpus.stratifiedSample(deduped, col("doc_id"), col("lang"),
        ratesPerMille = Map("en" -> 600), defaultPerMille = 800)
      Corpus.packSequences(sampled, col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("bigint"), seqLen = 256L)
        .orderBy("doc_id", "seq_id")
    }),
    // corpus snapshot diff (the incremental-refresh primitive): "new"
    // is the corpus with every 7th doc dropped, every 10th doc's text
    // perturbed, and every 13th re-added under a shifted id — the
    // full-outer fingerprint join classifies every id
    "corpus_diff" -> ((s, dir) => {
      val old = docs(s, dir)
      val newDocs = old.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 10 === 0, concat(col("text"), lit(" edited")))
            .otherwise(col("text")))
        .unionByName(old.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("text"),
            col("lang"), col("source"), col("n_chars")))
      Corpus.corpusDiff(old, col("doc_id"), col("text"),
        newDocs, col("doc_id"), col("text"))
        .orderBy("doc_id")
    }),
    // INCREMENTAL pipeline recompute: the diff-driven composition —
    // prior outputs built from the old snapshot, then only the
    // touched fingerprint groups + shards reprocess against the new
    // (perturbed) snapshot and merge. The perturbation includes a
    // METADATA-ONLY flip (doc_id % 11 -> lang 'xx', text unchanged):
    // lang keys the stratified sample, so the diff must classify it
    // as changed or the shard silently keeps the stale sample. The
    // oracle IS the from-scratch recompute on the new corpus, so the
    // gate proves incremental == full on every run.
    "pipeline_incremental" -> ((s, dir) => {
      val old = docs(s, dir)
      val newDocs = incrPerturbed(old)
      // sealed once: the prior kept state (a corpus-sized fingerprint
      // aggregate) is otherwise recomputed for the bootstrap pack, the
      // kept-merge anti-join and the flip-id semi-join (§6 read-once)
      val priorKept = graft.operators.Incremental.keptState(
        old, col("doc_id"), col("text"), minQualityMilli = 30L)
        .localCheckpoint(true)
      val priorPacked = graft.operators.Incremental.pipelineShardedWith(
        old, priorKept, nShards = 16, seqLen = 256L)
      val (_, packed, _) = graft.operators.Incremental.pipelineIncremental(
        old, newDocs, priorKept, priorPacked, nShards = 16, seqLen = 256L)
      packed.orderBy("doc_id", "seq_id")
    }),
    // the SAME incremental step against a MATERIALIZED shard-
    // partitioned store: touched shards dynamic-overwrite exactly
    // their partitions (untouched partitions never read or rewritten
    // — the 100 TB merge shape); emptied shards drop their partition.
    // Shares pipeline_incremental's full-recompute oracle verbatim
    "pipeline_incr_store" -> ((s, dir) => {
      val old = docs(s, dir)
      val newDocs = incrPerturbed(old)
      val store = graft.LocalDir.runDir("incr-store")
      // sealed once and shared by the bootstrap pack and the
      // incremental step's two prior-state consumers (§6 read-once)
      val priorKept = graft.operators.Incremental.keptState(
        old, col("doc_id"), col("text"), minQualityMilli = 30L)
        .localCheckpoint(true)
      graft.operators.Incremental.writeShardStore(
        graft.operators.Incremental.pipelineShardedWith(
          old, priorKept, 16, 256L), store)
      graft.operators.Incremental.pipelineIncrementalToStore(
        old, newDocs, priorKept, store, nShards = 16, seqLen = 256L)
      graft.operators.Incremental.readShardStore(s, store)
        .orderBy("doc_id", "seq_id")
    }),
    // CONTINUOUS pipeline maintenance from a CDC stream: the same
    // perturbation (incl. the lang-only metadata flip) arrives as
    // upsert/delete doc EVENTS in 3 micro-batches; corpus store,
    // dedup index and packed store update per batch touching only
    // what each batch invalidates; the drained packed store shares
    // the full-recompute oracle VERBATIM. The run is memoized per
    // (session, sf dir): `cdc_tx_corpus` reads ANOTHER store of the
    // same drained run at its final tx — one pipeline, two
    // independently-oracled consumers
    "stream_pipeline_cdc" -> ((s, dir) =>
      graft.operators.IncrementalCdc.readPacked(s, cdcRun(s, dir).packed)
        .orderBy("doc_id", "seq_id")),
    // ZONE-MAP-skipped store read: the events table lands in a
    // ManifestStore in two arrival-ordered batches (low event_id half
    // at init, high half APPENDED on top — per-batch files are
    // id-clustered, the fact-table ingest shape; every partition then
    // holds one low-range and one high-range file, which partition
    // pruning alone cannot separate). The range read prunes files AT
    // THE MANIFEST (the low-half files never reach Spark's listing —
    // spec-asserted), then applies the exact predicate. Oracle = the
    // same range aggregate straight off the events table
    "store_skip_read" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val split = maxId / 2
      val store = graft.LocalDir.runDir("skip-store")
      graft.sources.ManifestStore.init(
        ev.filter(col("event_id") <= split), "ub", store,
        statsCols = Seq("event_id"))
      graft.sources.ManifestStore.append(
        ev.filter(col("event_id") > split), "ub", store,
        statsCols = Seq("event_id"))
      skipReadAggregate(s, store, maxId)
    }),
    // the SAME consumer through the SQL SURFACE: the store becomes a
    // NAMED table via spark.read.format("graft") and the aggregate is
    // plain spark.sql — the ManifestFileIndex prunes the low-half
    // files at the manifest (spec-asserted) and the scan keeps the
    // native vectorized parquet path with pushed filters. Shares
    // store_skip_read's raw-table oracle VERBATIM
    "store_sql_read" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val split = maxId / 2
      val store = graft.LocalDir.runDir("sql-store")
      graft.sources.ManifestStore.init(
        ev.filter(col("event_id") <= split), "ub", store,
        statsCols = Seq("event_id"))
      graft.sources.ManifestStore.append(
        ev.filter(col("event_id") > split), "ub", store,
        statsCols = Seq("event_id"))
      val lo = maxId - maxId * 2L / 5L
      s.read.format("graft").option("path", store).load()
        .createOrReplaceTempView("store_sql_read_events")
      s.sql(
        s"""SELECT ub, count(*) AS n_events, sum(event_id) AS sum_id
           |FROM store_sql_read_events
           |WHERE event_id BETWEEN $lo AND $maxId
           |GROUP BY ub ORDER BY ub""".stripMargin)
    }),
    // TIME TRAVEL through the SQL surface: versionAsOf pins the read
    // to the init-only snapshot (the low event_id half) however many
    // appends landed since — the oracle replays the same bound off
    // the raw table
    "store_sql_travel" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val split = maxId / 2
      val store = graft.LocalDir.runDir("sql-travel-store")
      val v0 = graft.sources.ManifestStore.init(
        ev.filter(col("event_id") <= split), "ub", store,
        statsCols = Seq("event_id"))
      graft.sources.ManifestStore.append(
        ev.filter(col("event_id") > split), "ub", store,
        statsCols = Seq("event_id"))
      s.read.format("graft").option("path", store)
        .option("versionAsOf", v0.toString).load()
        .createOrReplaceTempView("store_sql_travel_events")
      s.sql(
        """SELECT ub, count(*) AS n_events, sum(event_id) AS sum_id
          |FROM store_sql_travel_events
          |GROUP BY ub ORDER BY ub""".stripMargin)
    }),
    // the SAME store built through the WRITE surface: both halves
    // land via df.write.format("graft") — overwrite-create then a
    // mode("append") with partCol INFERRED from the manifest — and
    // the skip-read consumer answers over the published zone maps.
    // Shares store_skip_read's raw-table oracle VERBATIM
    "store_sql_write" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val split = maxId / 2
      val store = graft.LocalDir.runDir("sql-write-store")
      ev.filter(col("event_id") <= split).write.format("graft")
        .option("partCol", "ub").option("statsCols", "event_id")
        .mode("overwrite").save(store)
      ev.filter(col("event_id") > split).write.format("graft")
        .option("statsCols", "event_id")
        .mode("append").save(store)
      skipReadAggregate(s, store, maxId)
    }),
    // SQL DML: the high half arrives via INSERT INTO a USING-graft
    // view — GraftInsertRule turns the insert into a manifest append
    // (never a raw file dump). Shares store_skip_read's oracle
    // VERBATIM
    "store_sql_insert" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val split = maxId / 2
      val store = graft.LocalDir.runDir("sql-insert-store")
      ev.filter(col("event_id") <= split).write.format("graft")
        .option("partCol", "ub").option("statsCols", "event_id")
        .mode("overwrite").save(store)
      ev.filter(col("event_id") > split)
        .createOrReplaceTempView("store_sql_insert_src")
      s.sql(
        s"CREATE OR REPLACE TEMPORARY VIEW store_sql_insert_store " +
          s"USING graft OPTIONS (path '$store', partCol 'ub', " +
          "statsCols 'event_id')")
      // the view's schema orders the partition column LAST
      s.sql(
        "INSERT INTO store_sql_insert_store " +
          "SELECT event_id, user_id, ub FROM store_sql_insert_src")
      skipReadAggregate(s, store, maxId)
    }),
    // TIME TRAVEL through SQL SYNTAX: the same init-only pin as
    // store_sql_travel, spelled `VERSION AS OF` in the query text
    // (the parser-injected rewrite — Spark itself only resolves the
    // clause for DSv2 catalogs). Shares store_sql_travel's oracle
    // VERBATIM
    "store_sql_asof" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val split = maxId / 2
      val store = graft.LocalDir.runDir("sql-asof-store")
      ev.filter(col("event_id") <= split).write.format("graft")
        .option("partCol", "ub").option("statsCols", "event_id")
        .mode("overwrite").save(store)
      ev.filter(col("event_id") > split).write.format("graft")
        .option("statsCols", "event_id").mode("append").save(store)
      s.sql(
        s"CREATE OR REPLACE TEMPORARY VIEW store_sql_asof_v " +
          s"USING graft OPTIONS (path '$store', partCol 'ub', " +
          "statsCols 'event_id')")
      s.sql(
        """SELECT ub, count(*) AS n_events, sum(event_id) AS sum_id
          |FROM store_sql_asof_v VERSION AS OF 0
          |GROUP BY ub ORDER BY ub""".stripMargin)
    }),
    // DESCRIBE HISTORY as SQL: graft_history() reads the commit log
    // off metadata alone — versions and EXACT row counts (the stats
    // sidecar's footer-harvested #rows). Oracle recomputes the same
    // per-version counts off the raw table
    "store_sql_history" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val split = maxId / 2
      val store = graft.LocalDir.runDir("sql-history-store")
      ev.filter(col("event_id") <= split).write.format("graft")
        .option("partCol", "ub").option("statsCols", "event_id")
        .mode("overwrite").save(store)
      ev.filter(col("event_id") > split).write.format("graft")
        .option("statsCols", "event_id").mode("append").save(store)
      s.sql(
        s"""SELECT version, n_rows FROM graft_history('$store')
           |ORDER BY version""".stripMargin)
    }),
    // the SAME store built ONLINE — the full streaming lakehouse-
    // ingest lifecycle: 4 arrival-ordered micro-batches land as
    // EXACTLY-ONCE tagged appends (batch id = append tag, so a
    // replayed batch finds its files manifested and skips), zone-map
    // stats harvested per batch, a mid-stream compaction folds
    // crowded partitions, and the drained store answers the same
    // range read through the manifest skip. Shares store_skip_read's
    // raw-table oracle VERBATIM
    "stream_append_store" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val scratch = graft.LocalDir.runDir("append-ingest")
      val store = new java.io.File(scratch, "store").toString
      graft.streaming.StreamingIngest.appendStoreFromFiles(
        s, ev, orderCol = "event_id", partCol = "ub", nBatches = 4,
        scratch, store, statsCols = Seq("event_id"),
        compactEvery = 2, maxFilesPerPartition = 2)
      skipReadAggregate(s, store, maxId)
    }),
    // the same online drain through the NAMED SINK: writeStream
    // .format("graft") — each micro-batch one exactly-once tagged
    // append (batch id = ledger tag), compaction on a cadence, no
    // foreachBatch anywhere. Shares store_skip_read's oracle VERBATIM
    "stream_sink_store" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val scratch = graft.LocalDir.runDir("sink-ingest")
      val store = new java.io.File(scratch, "store").toString
      graft.streaming.StreamingIngest.sinkStoreFromFiles(
        s, ev, orderCol = "event_id", partCol = "ub", nBatches = 4,
        scratch, store, statsCols = Seq("event_id"),
        compactEvery = 2, maxFilesPerPartition = 2)
      skipReadAggregate(s, store, maxId)
    }),
    // the ONLINE-built store serving store_point_read's lookups:
    // bloomCols thread through the streaming ingest (init + every
    // tagged append + mid-stream compaction), so the drained store's
    // parquet blooms locate hashed keys the zone maps cannot prune —
    // same five-point IN-list oracle off the raw table
    "stream_point_read" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
        .withColumn("u", (col("event_id") * 7919L) % 100003L)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val scratch = graft.LocalDir.runDir("stream-bloom")
      val store = new java.io.File(scratch, "store").toString
      graft.streaming.StreamingIngest.appendStoreFromFiles(
        s, ev, orderCol = "event_id", partCol = "ub", nBatches = 4,
        scratch, store, statsCols = Seq("event_id", "u"),
        compactEvery = 2, maxFilesPerPartition = 2, bloomCols = Seq("u"))
      val schema = org.apache.spark.sql.types.StructType(
        EventsStoreSchema.fields :+ org.apache.spark.sql.types.StructField(
          "u", org.apache.spark.sql.types.LongType))
      val keys = (1 to 5).map(i => (maxId / 6 * i * 7919L) % 100003L)
      keys.map(u => graft.sources.ManifestStore.readPoint(
          s, store, schema, "ub", "u", u))
        .reduce(_.unionByName(_))
        .select(col("event_id"), col("ub"), col("u"))
        .distinct() // two keys may collide on the same hashed u
        .orderBy("event_id")
    }),
    // BLOOM point-location: the same two-batch store keyed by a HASHED
    // unique column u — per-file min/max span the whole domain for u,
    // so zone maps cannot prune and the parquet blooms (written at
    // commit) are what excludes non-holding files. Five point lookups
    // answer through locate + the exact predicate; oracle = the same
    // IN-list straight off the events table
    "store_point_read" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
        .withColumn("u", (col("event_id") * 7919L) % 100003L)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val split = maxId / 2
      val store = graft.LocalDir.runDir("bloom-store")
      graft.sources.ManifestStore.init(
        ev.filter(col("event_id") <= split), "ub", store,
        statsCols = Seq("event_id", "u"), bloomCols = Seq("u"))
      graft.sources.ManifestStore.append(
        ev.filter(col("event_id") > split), "ub", store,
        statsCols = Seq("event_id", "u"), bloomCols = Seq("u"))
      val schema = org.apache.spark.sql.types.StructType(
        EventsStoreSchema.fields :+ org.apache.spark.sql.types.StructField(
          "u", org.apache.spark.sql.types.LongType))
      val keys = (1 to 5).map(i => (maxId / 6 * i * 7919L) % 100003L)
      keys.map(u => graft.sources.ManifestStore.readPoint(
          s, store, schema, "ub", "u", u))
        .reduce(_.unionByName(_))
        .select(col("event_id"), col("ub"), col("u"))
        .distinct() // two keys may collide on the same hashed u
        .orderBy("event_id")
    }),
    // TIMESTAMP AS OF: the same edit recipe as store_merge, but the
    // read pins by COMMIT WALL-TIME — commitTs(v_merge) resolves the
    // merged version however much churn (two later appends) lands on
    // top, because manifest timestamps are strictly increasing and the
    // resolved manifest is immutable (byte-stable mid-churn). Oracle =
    // store_merge's replayed-edit oracle VERBATIM: the as-of read must
    // see exactly the merged content, nothing from the churn
    "store_ts_read" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
        .withColumn("val_milli", col("event_id") * 3L)
        .select("event_id", "ub", "val_milli")
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val store = graft.LocalDir.runDir("ts-store")
      graft.sources.ManifestStore.init(ev, "ub", store,
        statsCols = Seq("event_id"), bloomCols = Seq("event_id"))
      val upIds = (1 to 3).map(i => maxId / 5 * i)
      val delIds = (1 to 2).map(i => maxId / 7 * i)
        .filterNot(upIds.contains)
      val inserts = {
        import s.implicits._
        (1 to 2).map(i => (maxId + i, (maxId + i) % 8, 777000L + maxId + i))
          .toDF("event_id", "ub", "val_milli")
      }
      val upserts = ev.filter(col("event_id").isin(upIds: _*))
        .withColumn("val_milli", lit(777000L) + col("event_id"))
        .unionByName(inserts)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ub",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("val_milli",
          org.apache.spark.sql.types.LongType)))
      val vMerge = graft.sources.ManifestStore.merge(s, store, schema,
        "ub", "event_id", upserts, delIds,
        statsCols = Seq("event_id"), bloomCols = Seq("event_id"))
      val pinTs = graft.sources.ManifestStore.commitTs(store, vMerge).get
      // churn AFTER the pin: two appends the as-of read must not see
      (1 to 2).foreach { i =>
        import s.implicits._
        graft.sources.ManifestStore.append(
          Seq((maxId + 100L + i, (maxId + 100L + i) % 8, 0L))
            .toDF("event_id", "ub", "val_milli"),
          "ub", store, statsCols = Seq("event_id"))
      }
      graft.sources.ManifestStore.readAsOf(
          s, store, schema, "ub", pinTs)
        .orderBy("event_id")
    }),
    // RESTORE: the same edit recipe, two junk churn appends on top,
    // then a metadata-only ROLLBACK to the merge's version — the
    // restored head must read exactly the merged content (nothing from
    // the churn), sharing store_merge's replayed-edit oracle VERBATIM.
    // No data file is written by the restore itself
    "store_restore" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
        .withColumn("val_milli", col("event_id") * 3L)
        .select("event_id", "ub", "val_milli")
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val store = graft.LocalDir.runDir("restore-store")
      graft.sources.ManifestStore.init(ev, "ub", store,
        statsCols = Seq("event_id"), bloomCols = Seq("event_id"))
      val upIds = (1 to 3).map(i => maxId / 5 * i)
      val delIds = (1 to 2).map(i => maxId / 7 * i)
        .filterNot(upIds.contains)
      val inserts = {
        import s.implicits._
        (1 to 2).map(i => (maxId + i, (maxId + i) % 8, 777000L + maxId + i))
          .toDF("event_id", "ub", "val_milli")
      }
      val upserts = ev.filter(col("event_id").isin(upIds: _*))
        .withColumn("val_milli", lit(777000L) + col("event_id"))
        .unionByName(inserts)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ub",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("val_milli",
          org.apache.spark.sql.types.LongType)))
      val vMerge = graft.sources.ManifestStore.merge(s, store, schema,
        "ub", "event_id", upserts, delIds,
        statsCols = Seq("event_id"), bloomCols = Seq("event_id"))
      (1 to 2).foreach { i =>
        import s.implicits._
        graft.sources.ManifestStore.append(
          Seq((maxId + 500L + i, (maxId + 500L + i) % 8, -1L))
            .toDF("event_id", "ub", "val_milli"),
          "ub", store, statsCols = Seq("event_id"))
      }
      graft.sources.ManifestStore.restore(store, "ub", vMerge)
      graft.sources.ManifestStore.read(s, store, schema, "ub")
        .orderBy("event_id")
    }),
    // CHANGE-DATA-FEED: the row-level diff between two store versions,
    // derived from the MANIFEST diff — only the files the merge added
    // or removed are read (rewritten partitions' unchanged rows cancel
    // through the multiplicity-aware diff), so an edit-sized commit
    // yields an edit-sized change read. Consumers build incremental
    // downstream views from exactly this feed
    "store_changes" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
        .withColumn("val_milli", col("event_id") * 3L)
        .select("event_id", "ub", "val_milli")
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val store = graft.LocalDir.runDir("changes-store")
      val v0 = graft.sources.ManifestStore.init(ev, "ub", store,
        statsCols = Seq("event_id"), bloomCols = Seq("event_id"))
      val upIds = (1 to 3).map(i => maxId / 5 * i)
      val delIds = (1 to 2).map(i => maxId / 7 * i)
        .filterNot(upIds.contains)
      val inserts = {
        import s.implicits._
        (1 to 2).map(i =>
            (maxId + i, (maxId + i) % 8, (maxId + i) * 3L + 111L))
          .toDF("event_id", "ub", "val_milli")
      }
      val upserts = ev.filter(col("event_id").isin(upIds: _*))
        .withColumn("val_milli", col("event_id") * 3L + 111L)
        .unionByName(inserts)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ub",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("val_milli",
          org.apache.spark.sql.types.LongType)))
      val v1 = graft.sources.ManifestStore.merge(s, store, schema, "ub",
        "event_id", upserts, delIds, statsCols = Seq("event_id"),
        bloomCols = Seq("event_id"))
      graft.sources.ManifestStore.readChanges(
        s, store, schema, "ub", v0, v1)
        .orderBy("event_id", "change")
    }),
    // the change feed FOLLOWED live: a StoreViewFollower maintains the
    // keyed view across a churning writer — tick 1 seeds from the v0
    // snapshot, tick 2 applies one single-version feed, tick 3 applies
    // ONE feed spanning two missed versions (the net edit, not a
    // snapshot re-read); the final view shares store_incr_view's
    // fresh-aggregate oracle VERBATIM
    "stream_follow_view" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
        .withColumn("val_milli", col("event_id") * 3L)
        .select("event_id", "ub", "val_milli")
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val store = graft.LocalDir.runDir("follow-view-store")
      graft.sources.ManifestStore.init(ev, "ub", store,
        statsCols = Seq("event_id"), bloomCols = Seq("event_id"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ub",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("val_milli",
          org.apache.spark.sql.types.LongType)))
      val follower = new graft.streaming.StoreViewFollower(
        s, store, schema, "ub", Seq("ub"), "val_milli",
        countCol = "n_rows", sumCol = "sum_milli")
      follower.tick() // seed from the v0 snapshot
      val upIds = (1 to 3).map(i => maxId / 5 * i)
      val delIds = (1 to 2).map(i => maxId / 7 * i)
        .filterNot(upIds.contains)
      val upserts = ev.filter(col("event_id").isin(upIds: _*))
        .withColumn("val_milli", col("event_id") * 3L + 111L)
      graft.sources.ManifestStore.merge(s, store, schema, "ub",
        "event_id", upserts, Nil, statsCols = Seq("event_id"),
        bloomCols = Seq("event_id"))
      follower.tick() // one-version feed
      graft.sources.ManifestStore.merge(s, store, schema, "ub",
        "event_id", ev.limit(0), delIds, statsCols = Seq("event_id"),
        bloomCols = Seq("event_id"))
      val inserts = {
        import s.implicits._
        (1 to 2).map(i =>
            (maxId + i, (maxId + i) % 8, (maxId + i) * 3L + 111L))
          .toDF("event_id", "ub", "val_milli")
      }
      graft.sources.ManifestStore.merge(s, store, schema, "ub",
        "event_id", inserts, Nil, statsCols = Seq("event_id"),
        bloomCols = Seq("event_id"))
      follower.tick() // ONE feed spanning the two missed versions
      follower.current.orderBy("ub")
    }),
    // BLOOM point-location through the SQL SURFACE: the hashed key u
    // spans the whole domain in every file (zone maps cannot prune),
    // so the IN-list probe rides the parquet bloom filters at PLAN
    // time (option bloomProbe) and the scan opens only the located
    // files — store_point_read's five-key lookup re-spelled as one
    // spark.sql statement, sharing its oracle VERBATIM
    "store_sql_point" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
        .withColumn("u", (col("event_id") * 7919L) % 100003L)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val split = maxId / 2
      val store = graft.LocalDir.runDir("sql-bloom-store")
      graft.sources.ManifestStore.init(
        ev.filter(col("event_id") <= split), "ub", store,
        statsCols = Seq("event_id", "u"), bloomCols = Seq("u"))
      graft.sources.ManifestStore.append(
        ev.filter(col("event_id") > split), "ub", store,
        statsCols = Seq("event_id", "u"), bloomCols = Seq("u"))
      val keys = (1 to 5).map(i => (maxId / 6 * i * 7919L) % 100003L)
      s.read.format("graft").option("path", store)
        .option("bloomProbe", "true").load()
        .createOrReplaceTempView("store_sql_point_events")
      s.sql(
        s"""SELECT DISTINCT event_id, ub, u
           |FROM store_sql_point_events
           |WHERE u IN (${keys.mkString(", ")})
           |ORDER BY event_id""".stripMargin)
    }),
    // the change feed as an ORDINARY STREAMING SOURCE (the row-131
    // follower re-expressed as one checkpointed query): the readStream
    // seeds the keyed view from the v0 snapshot-as-inserts batch, a
    // merge lands while the query runs, and the next micro-batch
    // applies its edit-sized net diff through the same signed-delta
    // fold. The drained view shares store_incr_view's fresh-aggregate
    // oracle VERBATIM
    "stream_cdf_view" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
        .withColumn("val_milli", col("event_id") * 3L)
        .select("event_id", "ub", "val_milli")
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val store = graft.LocalDir.runDir("cdf-view-store")
      graft.sources.ManifestStore.init(ev, "ub", store,
        statsCols = Seq("event_id"), bloomCols = Seq("event_id"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ub",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("val_milli",
          org.apache.spark.sql.types.LongType)))
      val ss = graft.streaming.StreamSessions.scoped(s, 4)
      val ckpt = graft.LocalDir.runDir("cdf-view-ckpt")
      val viewSchema = org.apache.spark.sql.types.StructType(Seq(
        schema("ub"),
        org.apache.spark.sql.types.StructField("n_rows",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sum_milli",
          org.apache.spark.sql.types.LongType)))
      @volatile var view = ss.createDataFrame(
        ss.sparkContext.emptyRDD[org.apache.spark.sql.Row], viewSchema)
      val q = ss.readStream.format("graft-cdf").schema(schema)
        .option("path", store).option("partCol", "ub").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
          view = graft.operators.Incremental.viewApplyChanges(
              view, b.drop("_commit_version"),
              Seq("ub"), "val_milli", "n_rows", "sum_milli")
            .localCheckpoint(true)
        })
        .start()
      q.processAllAvailable() // seed: the v0 snapshot as inserts
      val upIds = (1 to 3).map(i => maxId / 5 * i)
      val delIds = (1 to 2).map(i => maxId / 7 * i)
        .filterNot(upIds.contains)
      val inserts = {
        import s.implicits._
        (1 to 2).map(i =>
            (maxId + i, (maxId + i) % 8, (maxId + i) * 3L + 111L))
          .toDF("event_id", "ub", "val_milli")
      }
      val upserts = ev.filter(col("event_id").isin(upIds: _*))
        .withColumn("val_milli", col("event_id") * 3L + 111L)
        .unionByName(inserts)
      graft.sources.ManifestStore.merge(s, store, schema, "ub",
        "event_id", upserts, delIds, statsCols = Seq("event_id"),
        bloomCols = Seq("event_id"))
      q.processAllAvailable() // the edit-sized (v0, v1] net diff
      q.stop()
      view.orderBy("ub")
    }),
    // DELETE WHERE a range predicate (retention sweeps, date-range
    // erasure): zone maps name the intersecting partitions, only
    // those rewrite from filtered content, the rest carry verbatim —
    // then the surviving store aggregates against the raw-table minus
    // the range
    // the SAME range sweep through SQL: DELETE FROM a USING-graft
    // view — GraftDmlRule plans it as the copy-on-write partition
    // rewrite (zone maps name the touched partitions at the manifest).
    // Shares store_delete_range's oracle VERBATIM
    "store_sql_delete" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val split = maxId / 2
      val store = graft.LocalDir.runDir("sql-delete-store")
      ev.filter(col("event_id") <= split).write.format("graft")
        .option("partCol", "ub").option("statsCols", "event_id")
        .mode("overwrite").save(store)
      ev.filter(col("event_id") > split).write.format("graft")
        .option("statsCols", "event_id").mode("append").save(store)
      s.sql(
        s"CREATE OR REPLACE TEMPORARY VIEW store_sql_delete_v " +
          s"USING graft OPTIONS (path '$store', partCol 'ub', " +
          "statsCols 'event_id')")
      s.sql(
        s"DELETE FROM store_sql_delete_v WHERE event_id " +
          s"BETWEEN ${maxId / 3} AND ${maxId / 2}")
      s.read.format("graft").option("path", store).load()
        .groupBy("ub")
        .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("sum_id"))
        .orderBy("ub")
    }),
    // UPDATE through SQL: the same 777000-milli rewrite shape as the
    // merge gates, spelled as one UPDATE statement — predicate-true
    // rows of the touched partitions take the assignment, everything
    // else carries; oracle replays the CASE over the raw table
    "store_sql_update" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
        .withColumn("val_milli", col("event_id") * 3L)
        .select("event_id", "ub", "val_milli")
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val store = graft.LocalDir.runDir("sql-update-store")
      ev.write.format("graft").option("partCol", "ub")
        .option("statsCols", "event_id").mode("overwrite").save(store)
      s.sql(
        s"CREATE OR REPLACE TEMPORARY VIEW store_sql_update_v " +
          s"USING graft OPTIONS (path '$store', partCol 'ub', " +
          "statsCols 'event_id')")
      s.sql(
        s"UPDATE store_sql_update_v SET val_milli = 777000 + event_id " +
          s"WHERE event_id BETWEEN ${maxId / 3} AND ${maxId / 2}")
      s.read.format("graft").option("path", store).load()
        .select("event_id", "ub", "val_milli").orderBy("event_id")
    }),
    // MERGE INTO through SQL: store_merge's exact edit recipe —
    // upserts, inserts and point deletes — as ONE MERGE statement
    // (ordered WHEN MATCHED delete-guard then update, NOT MATCHED
    // insert). Shares store_merge's replayed-edit oracle VERBATIM
    "store_sql_merge" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
        .withColumn("val_milli", col("event_id") * 3L)
        .select("event_id", "ub", "val_milli")
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val store = graft.LocalDir.runDir("sql-merge-store")
      ev.write.format("graft").option("partCol", "ub")
        .option("statsCols", "event_id").option("bloomCols", "event_id")
        .mode("overwrite").save(store)
      val upIds = (1 to 3).map(i => maxId / 5 * i)
      val delIds = (1 to 2).map(i => maxId / 7 * i)
        .filterNot(upIds.contains)
      val inserts = {
        import s.implicits._
        (1 to 2).map(i => (maxId + i, (maxId + i) % 8, 777000L + maxId + i))
          .toDF("event_id", "ub", "val_milli")
      }
      val upserts = ev.filter(col("event_id").isin(upIds: _*))
        .withColumn("val_milli", lit(777000L) + col("event_id"))
        .unionByName(inserts)
        .withColumn("del", lit(false))
      val dels = {
        import s.implicits._
        delIds.map(id => (id, 0L, 0L, true))
          .toDF("event_id", "ub", "val_milli", "del")
      }
      upserts.unionByName(dels)
        .createOrReplaceTempView("store_sql_merge_src")
      s.sql(
        s"CREATE OR REPLACE TEMPORARY VIEW store_sql_merge_v " +
          s"USING graft OPTIONS (path '$store', partCol 'ub', " +
          "statsCols 'event_id', bloomCols 'event_id')")
      s.sql(
        """MERGE INTO store_sql_merge_v t USING store_sql_merge_src s
          |ON t.event_id = s.event_id
          |WHEN MATCHED AND s.del THEN DELETE
          |WHEN MATCHED THEN UPDATE SET val_milli = s.val_milli
          |WHEN NOT MATCHED AND NOT s.del THEN
          |  INSERT (event_id, ub, val_milli)
          |  VALUES (s.event_id, s.ub, s.val_milli)""".stripMargin)
      s.read.format("graft").option("path", store).load()
        .select("event_id", "ub", "val_milli").orderBy("event_id")
    }),
    "store_delete_range" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val split = maxId / 2
      val store = graft.LocalDir.runDir("delrange-store")
      graft.sources.ManifestStore.init(
        ev.filter(col("event_id") <= split), "ub", store,
        statsCols = Seq("event_id"))
      graft.sources.ManifestStore.append(
        ev.filter(col("event_id") > split), "ub", store,
        statsCols = Seq("event_id"))
      graft.sources.ManifestStore.deleteWhere(
        s, store, EventsStoreSchema, "ub", "event_id",
        maxId / 3, maxId / 2, statsCols = Seq("event_id"))
      graft.sources.ManifestStore.read(s, store, EventsStoreSchema, "ub")
        .groupBy("ub")
        .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("sum_id"))
        .orderBy("ub")
    }),
    // INCREMENTAL downstream view — the change feed CONSUMED: a keyed
    // (count, sum) view updates by the feed's signed deltas (insert
    // adds, delete subtracts — edit-sized work), and the maintained
    // view must equal a fresh aggregate over the new snapshot, which
    // is what the oracle computes from the edit replay
    "store_incr_view" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
        .withColumn("val_milli", col("event_id") * 3L)
        .select("event_id", "ub", "val_milli")
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val store = graft.LocalDir.runDir("incr-view-store")
      val v0 = graft.sources.ManifestStore.init(ev, "ub", store,
        statsCols = Seq("event_id"), bloomCols = Seq("event_id"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ub",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("val_milli",
          org.apache.spark.sql.types.LongType)))
      val view0 = graft.sources.ManifestStore.read(
        s, store, schema, "ub", version = Some(v0))
        .groupBy("ub")
        .agg(count(lit(1)).as("n_rows"), sum(col("val_milli")).as("sum_milli"))
      val upIds = (1 to 3).map(i => maxId / 5 * i)
      val delIds = (1 to 2).map(i => maxId / 7 * i)
        .filterNot(upIds.contains)
      val inserts = {
        import s.implicits._
        (1 to 2).map(i =>
            (maxId + i, (maxId + i) % 8, (maxId + i) * 3L + 111L))
          .toDF("event_id", "ub", "val_milli")
      }
      val upserts = ev.filter(col("event_id").isin(upIds: _*))
        .withColumn("val_milli", col("event_id") * 3L + 111L)
        .unionByName(inserts)
      val v1 = graft.sources.ManifestStore.merge(s, store, schema, "ub",
        "event_id", upserts, delIds, statsCols = Seq("event_id"),
        bloomCols = Seq("event_id"))
      val feed = graft.sources.ManifestStore.readChanges(
        s, store, schema, "ub", v0, v1)
      graft.operators.Incremental.viewApplyChanges(
        view0, feed, Seq("ub"), "val_milli", "n_rows", "sum_milli")
        .orderBy("ub")
    }),
    // SCHEMA EVOLUTION: the second half of the ingest arrives with a
    // NEW column; old files read as null for it (parquet
    // read-schema evolution), zone maps bound it only on the files
    // that carry it (older files stay unprunable on the new column —
    // kept, never wrong). The unified read aggregates both eras
    "store_evolve" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
        .select("event_id", "user_id", "ub")
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val split = maxId / 2
      val store = graft.LocalDir.runDir("evolve-store")
      graft.sources.ManifestStore.init(
        ev.filter(col("event_id") <= split), "ub", store,
        statsCols = Seq("event_id"))
      // the evolved era: a new column lands with the append
      graft.sources.ManifestStore.append(
        ev.filter(col("event_id") > split)
          .withColumn("tag", col("event_id") % 100L),
        "ub", store, statsCols = Seq("event_id", "tag"))
      val evolved = org.apache.spark.sql.types.StructType(
        EventsStoreSchema.fields :+ org.apache.spark.sql.types.StructField(
          "tag", org.apache.spark.sql.types.LongType))
      graft.sources.ManifestStore.read(s, store, evolved, "ub")
        .groupBy("ub")
        .agg(count(lit(1)).as("n_rows"),
          sum(coalesce(col("tag"), lit(-1L))).as("sum_tag"),
          count(col("tag")).as("n_tagged"))
        .orderBy("ub")
    }),
    // OPTIMIZE ZORDER: the arrival-ordered store (event_id clusters
    // per file, user_id spans everything) is re-clustered by the
    // z-value of (event_id, user_id) — each rewritten file covers a
    // compact box of the 2-D key space, so a USER_ID range read (a
    // dim arrival order could never prune) skips files at the
    // manifest; content identity vs the raw table is the oracle
    "store_zorder_read" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
      val agg0 = ev.agg(max("event_id"), max("user_id")).head
      val (maxId, maxUid) = (agg0.getLong(0), agg0.getLong(1))
      val split = maxId / 2
      val store = graft.LocalDir.runDir("zorder-store")
      graft.sources.ManifestStore.init(
        ev.filter(col("event_id") <= split), "ub", store,
        statsCols = Seq("event_id", "user_id"))
      graft.sources.ManifestStore.append(
        ev.filter(col("event_id") > split), "ub", store,
        statsCols = Seq("event_id", "user_id"))
      graft.sources.ManifestStore.compactClustered(
        s, store, EventsStoreSchema, "ub",
        dims = Seq("event_id", "user_id"), bits = 12,
        filesPerPartition = 4, statsCols = Seq("event_id", "user_id"))
      // the consumer is a CONJUNCTIVE 2-D slice — the read shape the
      // z-clustering exists for: both predicates prune files at the
      // manifest, their intersection opens only the matching boxes
      val (uLo, uHi) = (maxUid / 4, maxUid / 2)
      graft.sources.ManifestStore.read(
        s, store, EventsStoreSchema, "ub",
        ranges = Seq(("user_id", uLo, uHi), ("event_id", 0L, split)))
        .filter(col("user_id").between(uLo, uHi)
          && col("event_id") <= split)
        .groupBy("ub")
        .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("sum_id"))
        .orderBy("ub")
    }),
    // the SAME clustered-store consumer with the WHOLE lifecycle in
    // SQL: df.write builds the two-batch store, `OPTIMIZE ... ZORDER
    // BY` (the maintenance DDL the injected parser adds) re-clusters
    // it, and the 2-D slice is plain spark.sql over the view — the
    // zone maps prune both dims at the manifest exactly like the
    // Scala path. Shares store_zorder_read's oracle VERBATIM
    "store_sql_optimize" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
      val agg0 = ev.agg(max("event_id"), max("user_id")).head
      val (maxId, maxUid) = (agg0.getLong(0), agg0.getLong(1))
      val split = maxId / 2
      val store = graft.LocalDir.runDir("sql-optimize-store")
      ev.filter(col("event_id") <= split).write.format("graft")
        .option("partCol", "ub")
        .option("statsCols", "event_id,user_id")
        .mode("overwrite").save(store)
      ev.filter(col("event_id") > split).write.format("graft")
        .option("statsCols", "event_id,user_id")
        .mode("append").save(store)
      s.sql(
        s"CREATE OR REPLACE TEMPORARY VIEW store_sql_optimize_v " +
          s"USING graft OPTIONS (path '$store', partCol 'ub', " +
          "statsCols 'event_id,user_id')")
      s.sql("OPTIMIZE store_sql_optimize_v ZORDER BY (event_id, user_id)")
      val (uLo, uHi) = (maxUid / 4, maxUid / 2)
      // the view predates the optimize — name the CURRENT snapshot
      s.read.format("graft").option("path", store).load()
        .createOrReplaceTempView("store_sql_optimize_now")
      s.sql(
        s"""SELECT ub, count(*) AS n_events, sum(event_id) AS sum_id
           |FROM store_sql_optimize_now
           |WHERE user_id BETWEEN $uLo AND $uHi AND event_id <= $split
           |GROUP BY ub ORDER BY ub""".stripMargin)
    }),
    // METADATA-ONLY aggregates: COUNT(*)/MIN/MAX answered from the
    // manifest + stats sidecar alone — zero data-file opens, zero
    // Spark jobs for the answer (per-file row counts and bounds were
    // harvested from footers at commit); the Iceberg/Delta
    // aggregate-pushdown shape, served straight off the metadata tier
    "store_meta_agg" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val split = maxId / 2
      val store = graft.LocalDir.runDir("meta-agg-store")
      graft.sources.ManifestStore.init(
        ev.filter(col("event_id") <= split), "ub", store,
        statsCols = Seq("event_id", "user_id"))
      graft.sources.ManifestStore.append(
        ev.filter(col("event_id") > split), "ub", store,
        statsCols = Seq("event_id", "user_id"))
      val n = graft.sources.ManifestStore.metaCount(store, "ub").get
      val (mnE, mxE) =
        graft.sources.ManifestStore.metaMinMax(store, "event_id", "ub").get
      val (mnU, mxU) =
        graft.sources.ManifestStore.metaMinMax(store, "user_id", "ub").get
      import s.implicits._
      Seq((n, mnE, mxE, mnU, mxU))
        .toDF("n_rows", "min_id", "max_id", "min_uid", "max_uid")
    }),
    // MERGE by key (the Delta MERGE INTO analog): point upserts +
    // bloom-LOCATED deletes against the events store — delete
    // partitions are discovered through the file blooms (footer-sized
    // reads, no store scan), upserts rewrite exactly their partitions.
    // Oracle = the same edit set replayed over the raw table
    "store_merge" -> ((s, dir) => {
      val ev = eventsForStore(s, dir)
        .withColumn("val_milli", col("event_id") * 3L)
        .select("event_id", "ub", "val_milli")
      val maxId = ev.agg(max("event_id")).head.getLong(0)
      val store = graft.LocalDir.runDir("merge-store")
      graft.sources.ManifestStore.init(ev, "ub", store,
        statsCols = Seq("event_id"), bloomCols = Seq("event_id"))
      val upIds = (1 to 3).map(i => maxId / 5 * i)
      val delIds = (1 to 2).map(i => maxId / 7 * i)
        .filterNot(upIds.contains)
      val inserts = {
        import s.implicits._
        (1 to 2).map(i => (maxId + i, (maxId + i) % 8, 777000L + maxId + i))
          .toDF("event_id", "ub", "val_milli")
      }
      val upserts = ev.filter(col("event_id").isin(upIds: _*))
        .withColumn("val_milli", lit(777000L) + col("event_id"))
        .unionByName(inserts)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ub",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("val_milli",
          org.apache.spark.sql.types.LongType)))
      graft.sources.ManifestStore.merge(s, store, schema, "ub",
        "event_id", upserts, delIds,
        statsCols = Seq("event_id"), bloomCols = Seq("event_id"))
      graft.sources.ManifestStore.read(s, store, schema, "ub")
        .orderBy("event_id")
    }),
    // CROSS-STORE tx read (TxLog): resolve the drained run's FINAL tx
    // and read the CORPUS store at the version that tx pinned — the
    // consistent-combination read path (the packed store of the SAME
    // tx is what stream_pipeline_cdc checks; the spec suite drills
    // mid-churn pins, retention errors and the publish CAS). Oracle =
    // the event fold replayed in SQL over the documents table
    "cdc_tx_corpus" -> ((s, dir) => {
      val d = cdcRun(s, dir)
      graft.operators.IncrementalCdc.readAtTx(s, d)._2
        .drop("shard")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars").cast("long").as("n_chars"))
        .orderBy("doc_id")
    }),
    // deterministic corpus shuffle into training shards: same seed =
    // same order on any engine
    "train_shards" -> ((s, dir) =>
      Corpus.trainingShards(docs(s, dir), col("doc_id"), "s1", 8)
        .orderBy("doc_id")),
    // connected components over the (oracle-checked) semantic near-dup
    // pair graph: cluster = min reachable id, canonical = cluster rep
    "dup_clusters" -> ((s, dir) => {
      val pairs = Dedup.embeddingNearDups(
        embs(s, dir), col("vec_id"), col("embedding"),
        minCosineMilli = 350, bits = 6, tables = 8)
      Clusters.duplicateClusters(pairs, col("id_a"), col("id_b"))
        .select(col("id"), col("cluster"),
          col("is_canonical").cast("bigint").as("is_canonical"))
        .orderBy("id")
    }),
    // n-gram-overlap decontamination: every 20th doc plays the eval
    // set; corpus docs sharing any 3-shingle with it are flagged
    "decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Corpus.contamination(
        d.filter(col("doc_id") % 20 =!= 0), col("doc_id"), col("text"),
        d.filter(col("doc_id") % 20 === 0), col("text"), k = 3)
        .select(col("doc_id"), col("n_shared_shingles"),
          col("contaminated").cast("bigint").as("contaminated"))
        .orderBy("doc_id")
    }),
    // SEMANTIC decontamination: the embedding-space sibling of the
    // n-gram flag — every 20th embedding plays the eval set; corpus
    // vectors within 0.35 cosine of ANY eval vector are flagged
    // (paraphrased leakage n-gram overlap misses). Bipartite sign-LSH,
    // eval side broadcast — no all-pairs join at any corpus size.
    "decontaminate_semantic" -> ((s, dir) => {
      val e = embs(s, dir)
      Dedup.semanticContamination(
        e.filter(col("vec_id") % 20 =!= 0), col("vec_id"), col("embedding"),
        e.filter(col("vec_id") % 20 === 0), col("vec_id"), col("embedding"),
        minCosineMilli = 350, bits = 6, tables = 8)
        .orderBy("vec_id")
    }),
    // the SAME semantic flag maintained ONLINE: corpus embeddings
    // stream as micro-batch files against the frozen eval set
    // (stateless per row -> any split lands batch-identical flags,
    // exactly-once per-batch output dirs); shares the batch oracle
    // VERBATIM
    "stream_decontaminate" -> ((s, dir) => {
      val e = embs(s, dir)
      val scratch = graft.LocalDir.runDir("sem-decon-online")
      graft.streaming.StreamingDedup.semanticContaminationFromFiles(
        s, e.filter(col("vec_id") % 20 =!= 0),
        e.filter(col("vec_id") % 20 === 0),
        minCosineMilli = 350, bits = 6, tables = 8,
        nBatches = 4, scratch)
        .orderBy("vec_id")
    }),
    // span-level decontamination (the remediation, not just the flag):
    // eval docs = every 20th; corpus windows whose 3-shingle appears
    // in the eval set are cut, docs reassembled from surviving tokens
    "decontaminate_scrub" -> ((s, dir) => {
      val d = docs(s, dir)
      Corpus.decontaminateScrub(
        d.filter(col("doc_id") % 20 =!= 0), col("doc_id"), col("text"),
        d.filter(col("doc_id") % 20 === 0), col("text"), k = 3)
        .orderBy("doc_id")
    }),
    // deterministic per-language downsampling (pure narrow filter)
    "sample_stratified" -> ((s, dir) =>
      Corpus.stratifiedSample(
        docs(s, dir), col("doc_id"), col("lang"),
        ratesPerMille = Map("en" -> 150, "fr" -> 400, "zh" -> 800),
        defaultPerMille = 300)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")),
    // α=1/2 temperature mixture sampling over sources (the
    // multilingual-pretraining upweight-the-tail recipe): exact
    // integer sqrt weights, binding stratum keeps all, deterministic
    // hash sampler — rates derived from the data, not configured
    "sample_temperature" -> ((s, dir) =>
      Corpus.temperatureSample(
        docs(s, dir), col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("bigint"))
        .select(col("doc_id"), col("source"), col("rate_permille"))
        .orderBy("doc_id")),
    // the √T rates derived from STREAMED totals (bounded per-stratum
    // state) and applied to the corpus — row-identical to the batch
    // two-pass sampler (associative totals), oracle shared VERBATIM
    "stream_temperature" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("temp-online")
      val totals = graft.streaming.StreamingStats.stratumTotalsFromFiles(
        s, docs(s, dir), "source", "text", "doc_id", nBatches = 4, scratch)
      val rates = Corpus.temperatureRatesFromTotals(
        totals.select(col("stratum"), col("total_tokens").as("t")))
      Corpus.temperatureSampleWithRates(
        docs(s, dir), col("doc_id"), col("source"), rates)
        .select(col("doc_id"), col("source"), col("rate_permille"))
        .orderBy("doc_id")
    }),
    // curation v3 — the model-based pipeline composed end to end IN
    // ENGINE: train the classifier (exact fixed-point GD), gate the
    // corpus on the trained score, then temperature-sample the
    // survivors per source. Train → filter → mix with zero
    // hand-configured rates; the oracle replays all three stages
    "curate_v3" -> ((s, dir) => {
      val d = docs(s, dir)
      // ONE tokenize pass builds the sealed feature tables; training
      // and scoring both consume them (guide §6 read-once — scoring
      // formerly re-tokenized the corpus, an md5 per occurrence)
      val (tok, lab) = CorpusStats.classifierFeatures(
        d, col("doc_id"), col("text"), buckets = ClassifierTrainBuckets)
      val w = CorpusStats.trainClassifierOnFeatures(
        tok, lab, buckets = ClassifierTrainBuckets, iters = ClassifierTrainIters)
      val scored = CorpusStats.classifierScoreFromFeatures(
        tok, w.select(col("bucket"), col("w_micro").as("w_milli")))
      // slim sealed survivors: the sampler's rate pass + sample pass
      // otherwise recompute the gate joins twice, and lab already
      // holds the exact tokenCount — no re-tokenization (§6 read-once)
      val kept = d.select(col("doc_id"), col("source"))
        .join(scored.filter(col("keep") === 1L)
          .select(col("doc_id"), col("score_sum")), Seq("doc_id"))
        .join(lab.select(col("doc_id"), col("n_toks")), Seq("doc_id"))
        .localCheckpoint(true)
      Corpus.temperatureSample(kept, col("doc_id"), col("source"),
        col("n_toks"))
        .select(col("doc_id"), col("source"), col("score_sum"), col("rate_permille"))
        .orderBy("doc_id")
    }),
    // curation v4 — v3 with DSIR target-domain tilting composed in:
    // train the classifier (exact fixed-point GD) and gate on its
    // score, RESAMPLE the survivors proportional to frozen importance
    // weights (every 20th doc plays the target sample; the row-137
    // scoring verbatim, selection by the DSIR proportional rule —
    // hash permille < min(1000, weight)), then temperature-mix what
    // survives both stages. One declarative plan: the classifier
    // score, the importance score, and the mixture rates are all
    // exact int64, so the oracle chains the validated stage oracles
    "curate_v4" -> ((s, dir) => {
      val d = docs(s, dir)
      // stage 1: trained-classifier gate (the curate_v3 stage) — one
      // tokenize pass feeds training AND scoring (guide §6 read-once)
      val (tok, lab) = CorpusStats.classifierFeatures(
        d, col("doc_id"), col("text"), buckets = ClassifierTrainBuckets)
      val w = CorpusStats.trainClassifierOnFeatures(
        tok, lab, buckets = ClassifierTrainBuckets, iters = ClassifierTrainIters)
      val scored = CorpusStats.classifierScoreFromFeatures(
        tok, w.select(col("bucket"), col("w_micro").as("w_milli")))
      // stage 2: DSIR tilt — weights trained once against the held-out
      // target sample, frozen, selection proportional to weight; ONE
      // bigram pass feeds both the weight fit and the scoring
      val candidates = d.filter(col("doc_id") % 20 =!= 0)
      val bgCnts = CorpusStats.bigramBucketCounts(
        candidates, col("doc_id"), col("text"))
      val imp = CorpusStats.scoreWithImportanceWeightsFromCounts(
        bgCnts, CorpusStats.importanceWeightsFromCounts(
          bgCnts, d.filter(col("doc_id") % 20 === 0), col("text")))
      // slim sealed survivors (§6 read-once): the sampler's rate pass
      // + sample pass otherwise recompute the two gate joins twice,
      // and lab already holds the exact tokenCount — no re-tokenization
      val kept = candidates.select(col("doc_id"), col("source"))
        .join(scored.filter(col("keep") === 1L)
          .select(col("doc_id"), col("score_sum")), Seq("doc_id"))
        .join(CorpusStats.importanceResample(imp, col("doc_id"))
          .select(col("doc_id"), col("score_milli")), Seq("doc_id"))
        .join(lab.select(col("doc_id"), col("n_toks")), Seq("doc_id"))
        .localCheckpoint(true)
      // stage 3: temperature mixing over the twice-gated survivors
      Corpus.temperatureSample(kept, col("doc_id"), col("source"),
        col("n_toks"))
        .select(col("doc_id"), col("source"), col("score_sum"),
          col("score_milli"), col("rate_permille"))
        .orderBy("doc_id")
    }),
    // the mixture rates STREAMED: per-stratum token totals maintained
    // as bounded keyed state (one long per stratum), drained totals ==
    // batch aggregate exactly (associative addition), the same rate
    // derivation + sampler audit on top — shares mixture_rebalance's
    // oracle VERBATIM under any micro-batch split
    "stream_mixture" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("mixture-online")
      val totals = graft.streaming.StreamingStats.stratumTotalsFromFiles(
        s, docs(s, dir), "lang", "text", "doc_id", nBatches = 4, scratch)
      val targets = Map("en" -> 500, "fr" -> 300, "zh" -> 200)
      val rates = Corpus.mixtureRatesFromTotals(totals, targets)
      val d = docs(s, dir).select(
        col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens"))
      val kept = Corpus.rebalance(d, col("doc_id"), col("lang"), rates)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept_docs"), sum(col("n_tokens")).as("kept_tokens"))
      rates.withColumnRenamed("stratum", "lang")
        .join(kept, Seq("lang"), "left")
        .select(col("lang"), col("total_tokens"), col("rate_permille"),
          coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
          coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
        .orderBy("lang")
    }),
    // domain-mixture rebalancing: per-language keep rates hitting a
    // target token mixture, then the deterministic sampler; the query
    // emits the per-stratum audit (rates + what survived)
    "mixture_rebalance" -> ((s, dir) => {
      val d = docs(s, dir).select(
        col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tokens"))
      val targets = Map("en" -> 500, "fr" -> 300, "zh" -> 200)
      val rates = Corpus.mixtureRates(d, col("lang"), col("n_tokens"), targets)
      val kept = Corpus.rebalance(d, col("doc_id"), col("lang"), rates)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept_docs"), sum(col("n_tokens")).as("kept_tokens"))
      rates.withColumnRenamed("stratum", "lang")
        .join(kept, Seq("lang"), "left")
        .select(col("lang"), col("total_tokens"), col("rate_permille"),
          coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
          coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
        .orderBy("lang")
    }),
    // markup strip + PII scrub over deterministically planted PII
    // (footer with an email + ip + long id per doc), oracle-checked on
    // the full redacted text hash and the per-kind match counts
    "text_scrub" -> ((s, dir) => {
      val withPii = concat(
        lit("<p>"), col("text"),
        lit("</p> contact u"), col("doc_id").cast("string"),
        lit("@mail.example.com from 10.0."),
        pmod(col("doc_id"), lit(256)).cast("string"),
        lit(".1 ref 9000000"), col("doc_id").cast("string"))
      val clean = TextAnalysis.stripMarkup(withPii)
      docs(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(clean, lit(TextAnalysis.EmailRe), lit(0)))
          .cast("bigint").as("n_emails"),
        size(regexp_extract_all(clean, lit(TextAnalysis.Ipv4Re), lit(0)))
          .cast("bigint").as("n_ips"),
        md5(TextAnalysis.redactPii(clean)).as("clean_md5"))
        .orderBy("doc_id")
    }),
    // within-doc repetition (boilerplate/spam signal) over 2-shingles
    "text_repetition" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.repetitionMilli(col("text"), 2).as("repetition_milli"))
        .orderBy("doc_id")),
    // integer-exact tf-idf keyword extraction, top-3 per doc through
    // the bounded-heap TopKPerGroup operator
    "text_keywords" -> ((s, dir) =>
      Corpus.topKeywords(docs(s, dir), col("doc_id"), col("text"), k = 3)
        .orderBy("doc_id", "token")),
    // token-budget sequence packing: chunk by cumulative token count
    // within each language group
    "pack_chunks" -> ((s, dir) =>
      Corpus.packChunks(
        docs(s, dir), col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("bigint"),
        budgetTokens = 512L)
        .select(col("doc_id"), col("grp"), col("n_tokens"),
          col("start_offset"), col("chunk_id"), col("chunk_pos"))
        .orderBy("doc_id")),
    // position-level training-sequence packing: concatenate each
    // language's token stream in doc order, cut 512-token sequences,
    // docs split across boundaries — one row per (doc x sequence)
    // piece with the attention-reset (starts_doc) offsets
    "pack_sequences" -> ((s, dir) =>
      Corpus.packSequences(
        docs(s, dir), col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("bigint"),
        seqLen = 512L)
        .orderBy("doc_id", "seq_id")),
    // duplicated-span removal (exact-substring dedup approximation):
    // 8-token windows occurring >= 2x corpus-wide survive only at
    // their first occurrence; later repeats are cut mid-document
    "span_dedup" -> ((s, dir) =>
      Spans.spanDedup(docs(s, dir), col("doc_id"), col("text"),
        k = 8, minCount = 2)
        .orderBy("doc_id")),
    // long-document chunking with overlap (context-window prep)
    "chunk_docs" -> ((s, dir) =>
      Spans.chunkDocs(docs(s, dir), col("doc_id"), col("text"),
        maxTokens = 40, overlap = 8)
        .orderBy("doc_id", "chunk_idx")),
    // the tokenizer-pluggable contract under the gate: the SAME chunk
    // operator over a planted NON-whitespace tokenization (lowercased
    // alphanumeric runs — an RE2-safe stand-in for precomputed BPE
    // pieces); chunk boundaries land on the plugged tokenizer's
    // boundaries, proving nothing in the operator assumes whitespace
    "chunk_docs_bpe" -> ((s, dir) =>
      Spans.chunkDocsTokens(docs(s, dir), col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0),
        maxTokens = 48, overlap = 16)
        .orderBy("doc_id", "chunk_idx")),
    // BPE tokenizer TRAINING on the corpus (Sennrich alg. 1): 16
    // greedy merges over the top-2048-word frequency table, exact
    // integer counts with lexicographic tiebreaks — the oracle replays
    // every round as a materialized CTE chain (argmax pair, then the
    // same greedy left-to-right fold via list_reduce)
    "bpe_train" -> ((s, dir) =>
      Bpe.trainDf(docs(s, dir), col("text"),
        numMerges = BpeGateMerges, maxWords = BpeGateMaxWords)
        .orderBy("rank")),
    // encode the corpus with the trained merges: the fold runs once
    // per DISTINCT word through the native BpeApply kernel, docs join
    // the encoded vocab back — per-doc pre-token / char-symbol / BPE-
    // piece counts (the token budget a packing stage consumes)
    "bpe_encode" -> ((s, dir) => {
      val d = docs(s, dir)
      val merges = Bpe.train(d, col("text"),
        numMerges = BpeGateMerges, maxWords = BpeGateMaxWords)
      Bpe.encodeDocs(d, col("doc_id"), col("text"), merges)
        .orderBy("doc_id")
    }),
    // ONLINE encode: train once on the corpus at rest, stream the
    // documents as micro-batch files through the stateless kernel
    // projection (model = plan literal; no state, no shuffle) — rows
    // identical to the batch encode, same oracle
    "stream_bpe_encode" -> ((s, dir) => {
      val d = docs(s, dir)
      val merges = Bpe.train(d, col("text"),
        numMerges = BpeGateMerges, maxWords = BpeGateMaxWords)
      val scratch = graft.LocalDir.runDir("bpe-online")
      graft.streaming.StreamingDocs.encodeBpeFromFiles(
        s, d, col("doc_id"), merges, nBatches = 4, scratch)
        .orderBy("doc_id")
    }),
    // corpus-wide heavy-hitter 3-grams (boilerplate discovery):
    // global top-50 via per-partition heaps, deterministic tiebreak
    // KMV cardinality sketch: distinct-token estimate from the 64
    // smallest portable hashes — the estimate itself is exact integer
    // math, so the oracle reproduces it bit-exactly (which HLL-based
    // approx_count_distinct cannot offer)
    "distinct_kmv" -> ((s, dir) =>
      CorpusStats.distinctKmv(
        docs(s, dir).select(
          explode(TextAnalysis.tokens(col("text"))).as("tok")),
        col("tok"), k = 64)),
    // grouped KMV: distinct-token estimate PER LANGUAGE in one pass —
    // the rollup whose exact form shuffles every distinct (lang, tok)
    "kmv_by_group" -> ((s, dir) =>
      CorpusStats.distinctKmvByGroup(
        docs(s, dir).select(col("lang"),
          explode(TextAnalysis.tokens(col("text"))).as("tok")),
        col("lang"), col("tok"), k = 64)
        .orderBy("g")),
    // count-min sketch (3x4096, Kirsch-Mitzenmacher over one md5):
    // estimated counts for the exact top-50 heavy hitters — CM's
    // one-sided bound (est >= exact) is visible row by row
    "cm_heavy_est" -> ((s, dir) => {
      val d = docs(s, dir)
      val grams = d.select(
        explode(CorpusStats.ngramStrings(
          TextAnalysis.tokens(col("text")), 3)).as("ngram"))
      val sketch = CorpusStats.countMinSketch(grams, col("ngram"), depth = 3, width = 4096)
      val top = CorpusStats.heavyNgrams(d, col("text"), n = 3, k = 50)
      val est = CorpusStats.cmEstimate(
        sketch, top.select(col("ngram")), col("ngram"), depth = 3, width = 4096)
      top.join(est, col("ngram") === col("v"))
        .select(col("rank"), col("ngram"), col("cnt"), col("est_cnt"))
        .orderBy("rank")
    }),
    "heavy_ngrams" -> ((s, dir) =>
      CorpusStats.heavyNgrams(docs(s, dir), col("text"), n = 3, k = 50)
        .orderBy("rank")),
    // DSIR-style importance scoring: every 20th doc plays the TARGET
    // domain sample; every other doc scores by its hashed-bigram
    // distribution's target-vs-corpus likelihood ratio (Laplace-
    // smoothed, milli fixed point), keep = more domain-like than
    // corpus-average. Both count tables are bucket-bounded broadcasts
    "domain_importance" -> ((s, dir) => {
      val d = docs(s, dir)
      CorpusStats.importanceScore(
        d.filter(col("doc_id") % 20 =!= 0), col("doc_id"), col("text"),
        d.filter(col("doc_id") % 20 === 0), col("text"))
        .orderBy("doc_id")
    }),
    // the SAME importance scoring maintained ONLINE: weights trained
    // once and frozen, corpus docs stream as micro-batch files and
    // score statelessly (any split lands identical scores, exactly-
    // once per-batch outputs); shares the batch oracle VERBATIM
    "stream_domain_importance" -> ((s, dir) => {
      val d = docs(s, dir)
      val corpus = d.filter(col("doc_id") % 20 =!= 0)
      val weights = CorpusStats.importanceWeights(
        corpus, col("text"), d.filter(col("doc_id") % 20 === 0),
        col("text"))
      val scratch = graft.LocalDir.runDir("dsir-online")
      graft.streaming.StreamingImportance.scoreFromFiles(
        s, corpus.select(col("doc_id"), col("text")), weights,
        buckets = 4096, nBatches = 4, scratch)
        .orderBy("doc_id")
    }),
    // bigram-LM familiarity scoring: the integer-exact analog of the
    // KenLM-perplexity quality filter, trained on the corpus itself
    "lm_familiarity" -> ((s, dir) =>
      CorpusStats.familiarity(docs(s, dir), col("doc_id"), col("text"))
        .orderBy("doc_id")),
    // domain balancing: keep the 10 largest docs per source through
    // the bounded-heap TopKPerGroup (no per-host window sort)
    "host_cap" -> ((s, dir) =>
      CorpusStats.capPerSource(
        docs(s, dir).select(col("doc_id"), col("source"),
          col("n_chars").cast("bigint").as("n_chars")),
        col("source"), struct(col("n_chars"), col("doc_id")), n = 10)
        .orderBy("doc_id")),
    // fasttext-style hashed linear classifier scoring: broadcast
    // integer weight table, one narrow corpus pass, per-doc sum
    "quality_classifier" -> ((s, dir) =>
      CorpusStats.classifierScore(
        docs(s, dir), col("doc_id"), col("text"),
        CorpusStats.syntheticWeights(s, 4096), buckets = 4096)
        .orderBy("doc_id")),
    // in-engine classifier TRAINING: 3 rounds of batch gradient
    // descent in exact int64 fixed point (hard-sigmoid logistic unit,
    // micro scale) distilling the heuristic quality gate into the
    // hashed-feature space of quality_classifier — integer gradient
    // sums are partition-order-free, so the oracle replays every
    // iteration bit-exactly as a CTE chain
    "quality_classifier_train" -> ((s, dir) =>
      CorpusStats.trainClassifier(
        docs(s, dir), col("doc_id"), col("text"),
        buckets = ClassifierTrainBuckets, iters = ClassifierTrainIters)),
    // round-7 curation composition: classifier gate -> corpus-wide
    // line dedup -> exact dedup of the CLEANED text, audited per doc.
    // Planted all-short-line duplicates (which line dedup passes
    // through untouched) prove the third stage fires: 25 copies in,
    // exactly one kept
    "curate_v2" -> ((s, dir) => {
      val d = docs(s, dir)
      val planted = d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          lit("cat\ndog\nfox").as("text"))
      val input = d.select(col("doc_id"), col("text")).unionByName(planted)
      graft.operators.Curation.curateV2(
        input, col("doc_id"), col("text"),
        CorpusStats.syntheticWeights(s, 4096), buckets = 4096)
        .orderBy("doc_id")
    }),
    // STREAMING heavy hitters: the n-gram counts maintained as a
    // native stateful streaming aggregation over 4 micro-batches;
    // the drained snapshot's top-50 shares heavy_ngrams' oracle
    // VERBATIM — the streamed == batch equivalence claim
    "stream_heavy_ngrams" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("heavy-online")
      graft.streaming.StreamingStats.heavyNgramsFromFiles(
        s, docs(s, dir), "text", "doc_id", n = 3, k = 50,
        nBatches = 4, scratch)
        .orderBy("rank")
    }),
    // STREAMING KMV cardinality (bounded salts*k state): the drained
    // k-minimum sets merge to the EXACT batch k smallest, so the
    // estimate shares distinct_kmv's oracle VERBATIM
    "stream_kmv" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("kmv-online")
      graft.streaming.StreamingStats.kmvFromFiles(
        s, docs(s, dir), "text", "doc_id", k = 64, salts = 16,
        nBatches = 4, scratch)
    }),
    // the STREAMING count-min sketch (bounded depth x width state —
    // the stateful agg that runs forever over an unbounded vocab):
    // drained sketch probed with the batch top-50; shares
    // cm_heavy_est's oracle VERBATIM (streamed == batch)
    "stream_cm_est" -> ((s, dir) => {
      val scratch = graft.LocalDir.runDir("cm-online")
      val sketch = graft.streaming.StreamingStats.cmSketchFromFiles(
        s, docs(s, dir), "text", "doc_id", n = 3, depth = 3, width = 4096,
        nBatches = 4, scratch)
      val top = CorpusStats.heavyNgrams(docs(s, dir), col("text"), n = 3, k = 50)
      val est = CorpusStats.cmEstimate(
        sketch, top.select(col("ngram")), col("ngram"), depth = 3, width = 4096)
      top.join(est, col("ngram") === col("v"))
        .select(col("rank"), col("ngram"), col("cnt"), col("est_cnt"))
        .orderBy("rank")
    })
  )

  /** Near-dup pair pipeline, shared verbatim with LlmQueries'
    * dedup_embedding oracle ([[LlmQueries.NearDupCte]] /
    * [[LlmQueries.NearDupThreshold]]) plus the threshold-applied
    * `pairs` step.
    */
  private val nearDupPairsCte: String =
    LlmQueries.NearDupCte + s""",
      |pairs AS (
      |  SELECT id_a, id_b FROM d
      |  WHERE ${LlmQueries.NearDupThreshold})""".stripMargin

  /** Shared verbatim by `heavy_ngrams` (batch) and
    * `stream_heavy_ngrams` (incremental stateful aggregation) — the
    * streamed == batch claim is that ONE oracle checks both.
    */
  /** CM sketch built from the trigram stream; probe = the exact
    * top-50; bucket_j = (h1 + j·h2) over the 2^56 hash space, mod
    * 4096. Shared VERBATIM by the batch (`cm_heavy_est`) and streaming
    * (`stream_cm_est`) spellings — the streamed-sketch == batch-sketch
    * equivalence claim.
    */
  private val CmHeavyEstOracle: String =
    """WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents),
      |g AS (SELECT UNNEST(list_transform(generate_series(1, len(toks) - 2),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngram
      |      FROM t WHERE len(toks) >= 3),
      |hh AS (
      |  SELECT ngram,
      |    list_reduce(list_transform(string_split(substr(md5(ngram), 1, 14), ''),
      |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
      |      (a, b) -> a * 16 + b) AS h1,
      |    list_reduce(list_transform(string_split(substr(md5(ngram), 15, 14), ''),
      |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
      |      (a, b) -> a * 16 + b) AS h2
      |  FROM g),
      |sk AS (
      |  SELECT d.d, (h1 + d.d * h2) % 4096 AS bucket, CAST(count(*) AS BIGINT) AS cnt
      |  FROM hh, (SELECT UNNEST(generate_series(0, 2)) AS d) d
      |  GROUP BY d.d, (h1 + d.d * h2) % 4096),
      |c AS (SELECT ngram, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY ngram),
      |top AS (
      |  SELECT CAST(row_number() OVER (ORDER BY cnt DESC, ngram DESC) AS BIGINT) AS rank,
      |    ngram, cnt
      |  FROM c ORDER BY cnt DESC, ngram DESC LIMIT 50),
      |probe AS (
      |  SELECT top.rank, top.ngram, top.cnt,
      |    list_reduce(list_transform(string_split(substr(md5(top.ngram), 1, 14), ''),
      |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
      |      (a, b) -> a * 16 + b) AS h1,
      |    list_reduce(list_transform(string_split(substr(md5(top.ngram), 15, 14), ''),
      |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
      |      (a, b) -> a * 16 + b) AS h2
      |  FROM top)
      |SELECT p.rank, p.ngram, p.cnt, CAST(min(sk.cnt) AS BIGINT) AS est_cnt
      |FROM probe p, (SELECT UNNEST(generate_series(0, 2)) AS d) d
      |JOIN sk ON sk.d = d.d AND sk.bucket = (p.h1 + d.d * p.h2) % 4096
      |GROUP BY p.rank, p.ngram, p.cnt
      |ORDER BY p.rank""".stripMargin

  /** KMV estimate: (k−1)·2^56 // k-th smallest distinct 56-bit hash.
    * Shared VERBATIM by the batch (`distinct_kmv`) and bounded-state
    * streaming (`stream_kmv`) spellings.
    */
  private val DistinctKmvOracle: String =
    """WITH tok AS (
      |  SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
      |h AS (
      |  SELECT DISTINCT list_reduce(list_transform(
      |    string_split(substr(md5(tok), 1, 14), ''),
      |    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
      |    (a, b) -> a * 16 + b) AS h
      |  FROM tok),
      |k AS (SELECT h FROM h ORDER BY h LIMIT 64)
      |SELECT CAST(count(*) AS BIGINT) AS k_seen,
      |  CAST(max(h) AS BIGINT) AS kth_hash,
      |  CAST(CASE WHEN count(*) < 64 THEN count(*)
      |    ELSE 4539628424389459968 // max(h) END AS BIGINT) AS est_distinct
      |FROM k""".stripMargin

  private val BpeGateMerges = 16
  private val BpeGateMaxWords = 2048
  private val ClassifierTrainBuckets = 512
  private val ClassifierTrainIters = 3

  /** DuckDB spelling of [[CorpusStats.fdiv]]: divisible numerator
    * makes truncating `//` equal floor. */
  private def sqlFdiv(a: String, b: String) =
    s"(($a - ((($a) % ($b)) + ($b)) % ($b)) // ($b))"

  /** DuckDB replay of [[CorpusStats.trainClassifier]] as a reusable
    * WITH-body: the `iters` gradient-descent rounds as a materialized
    * CTE chain ending in `w$iters` (bucket, w_micro). Every quantity
    * is int64; floor division is [[sqlFdiv]], exactly mirroring the
    * Spark fdiv. */
  private def classifierTrainCtes(buckets: Int, iters: Int): String = {
    val fdiv = sqlFdiv _
    val rounds = (1 to iters).map { i =>
      s"""z$i AS MATERIALIZED (
         |  SELECT t.doc_id, CAST(sum(t.cnt * w.w_micro) AS BIGINT) AS z
         |  FROM tok t JOIN w${i - 1} w USING (bucket) GROUP BY t.doc_id),
         |p$i AS MATERIALIZED (
         |  SELECT doc_id, n_toks, ${fdiv("raw", "1000000")} AS err
         |  FROM (SELECT doc_id, n_toks,
         |          (y_micro - LEAST(GREATEST(${fdiv("t", "4")} + 500000, 0), 1000000))
         |            * (CASE WHEN y_micro > 0 THEN (SELECT c_pos FROM cw)
         |               ELSE (SELECT c_neg FROM cw) END) AS raw
         |        FROM (SELECT doc_id, n_toks, y_micro, ${fdiv("z", "n_toks")} AS t
         |              FROM (SELECT l.doc_id, l.n_toks, l.y_micro,
         |                      CAST(COALESCE(z.z, 0) AS BIGINT) AS z
         |                    FROM lab l LEFT JOIN z$i z USING (doc_id))))),
         |g$i AS MATERIALIZED (
         |  SELECT bucket, CAST(sum(${fdiv("e", "n")}) AS BIGINT) AS g
         |  FROM (SELECT t.bucket, p.n_toks AS n, p.err * t.cnt AS e
         |        FROM tok t JOIN p$i p USING (doc_id))
         |  GROUP BY bucket),
         |w$i AS MATERIALIZED (
         |  SELECT bucket, CAST(w_micro + ${fdiv("gg", "dn")} AS BIGINT) AS w_micro
         |  FROM (SELECT w.bucket, w.w_micro,
         |          CAST(COALESCE(g.g, 0) AS BIGINT) AS gg,
         |          2 * (SELECT n FROM nd) AS dn
         |        FROM w${i - 1} w LEFT JOIN g$i g USING (bucket)))""".stripMargin
    }.mkString(",\n")
    s"""tok AS MATERIALIZED (
       |  SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT doc_id,
       |      list_reduce(list_transform(string_split(substr(md5(token), 1, 8), ''),
       |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
       |        (a, b) -> a * 16 + b) % $buckets AS bucket
       |    FROM (SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS token
       |          FROM documents))
       |  GROUP BY doc_id, bucket),
       |lab AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_toks,
       |    CASE WHEN CAST(round(1000.0 * len(list_filter(
       |          string_split_regex(trim(text), '\\s+'),
       |          t -> t = 'the' OR t = 'a')) /
       |        len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) >= 30
       |      THEN 1000000 ELSE 0 END AS y_micro
       |  FROM documents),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lab),
       |cw AS (SELECT
       |    LEAST((500000 * n) // GREATEST(n_pos, 1), 100000000) AS c_pos,
       |    LEAST((500000 * n) // GREATEST(n - n_pos, 1), 100000000) AS c_neg
       |  FROM (SELECT CAST(sum(CASE WHEN y_micro > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |          CAST(count(*) AS BIGINT) AS n FROM lab)),
       |w0 AS (SELECT CAST(i AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS w_micro
       |       FROM generate_series(0, ${buckets - 1}) AS t(i)),
       |$rounds""".stripMargin
  }

  private def classifierTrainOracle(buckets: Int, iters: Int): String =
    s"""WITH ${classifierTrainCtes(buckets, iters)}
       |SELECT bucket, w_micro FROM w$iters ORDER BY bucket""".stripMargin

  /** The greedy left-to-right merge fold as a DuckDB `list_reduce`
    * over `src.syms`, with the merge pair taken from the one-row CTE
    * `m` — symbol-for-symbol the [[graft.operators.Bpe.mergeFold]]
    * semantics (merged tail immediately participates in the next
    * comparison).
    */
  private def bpeFoldSql(src: String, m: String): String =
    s"""list_reduce(string_split($src.syms, ' '),
       |    (acc, x) -> CASE
       |      WHEN regexp_extract(acc, '([^ ]+)$$', 1) = $m.l AND x = $m.r
       |      THEN regexp_replace(acc, '([^ ]+)$$', $m.l || $m.r)
       |      ELSE acc || ' ' || x END)""".stripMargin

  /** Training replayed round by round: w0 = the capped word-frequency
    * table with char start symbols; round i = pair counts over w(i-1)
    * (p_i), the total-order argmax (m_i), the fold applied (w_i). Every
    * chained CTE is MATERIALIZED — w_i is referenced twice (p_{i+1} and
    * w_{i+1}), so inlining would expand the chain exponentially.
    */
  private def bpeTrainCtes(n: Int, maxWords: Int): String = {
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT word, cnt, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS syms
         |  FROM (SELECT token AS word, CAST(count(*) AS BIGINT) AS cnt
         |    FROM (SELECT UNNEST(list_filter(
         |        string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS token
         |      FROM documents)
         |    GROUP BY token ORDER BY cnt DESC, word LIMIT $maxWords))""".stripMargin
    val rounds = (1 to n).map { i =>
      s"""p$i AS (SELECT l, r, CAST(sum(cnt) AS BIGINT) AS freq FROM (
         |    SELECT cnt, t[i] AS l, t[i+1] AS r FROM (
         |      SELECT cnt, string_split(syms, ' ') AS t,
         |             UNNEST(generate_series(1, len(string_split(syms, ' ')) - 1)) AS i
         |      FROM w${i - 1} WHERE len(string_split(syms, ' ')) >= 2))
         |  GROUP BY l, r),
         |m$i AS MATERIALIZED (SELECT l, r, freq FROM p$i ORDER BY freq DESC, l, r LIMIT 1),
         |w$i AS MATERIALIZED (SELECT word, cnt, ${bpeFoldSql(s"w${i - 1}", s"m$i")} AS syms
         |  FROM w${i - 1}, m$i)""".stripMargin
    }
    (w0 +: rounds).mkString(",\n")
  }

  private def bpeTrainOracle(n: Int, maxWords: Int): String = {
    val union = (1 to n)
      .map(i => s"SELECT CAST($i AS BIGINT) AS rank, l, r, freq FROM m$i")
      .mkString("\nUNION ALL ")
    s"WITH ${bpeTrainCtes(n, maxWords)}\nSELECT * FROM ($union) ORDER BY rank"
  }

  /** Encode: the DISTINCT corpus words (uncapped — the cap only bounds
    * training statistics) through the same n folds, then per-doc sums
    * via the token→vocab join. Docs with no [a-z0-9] runs keep zeros
    * through the left join.
    */
  private def bpeEncodeOracle(n: Int, maxWords: Int): String = {
    val vocabChain = (1 to n).map { i =>
      s"""v$i AS MATERIALIZED (SELECT word, ${bpeFoldSql(s"v${i - 1}", s"m$i")} AS syms
         |  FROM v${i - 1}, m$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${bpeTrainCtes(n, maxWords)},
       |tok AS MATERIALIZED (SELECT doc_id, UNNEST(list_filter(
       |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS word
       |  FROM documents),
       |v0 AS MATERIALIZED (SELECT DISTINCT word,
       |    trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS syms FROM tok),
       |$vocabChain,
       |enc AS MATERIALIZED (SELECT word, len(word) AS w_chars,
       |    len(string_split(syms, ' ')) AS w_pieces FROM v$n)
       |SELECT d.doc_id,
       |  CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(a.n_chars, 0) AS BIGINT) AS n_chars,
       |  CAST(COALESCE(a.n_pieces, 0) AS BIGINT) AS n_pieces
       |FROM documents d LEFT JOIN (
       |  SELECT tok.doc_id, count(*) AS n_tokens, sum(enc.w_chars) AS n_chars,
       |         sum(enc.w_pieces) AS n_pieces
       |  FROM tok JOIN enc USING (word) GROUP BY tok.doc_id) a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  private val HeavyNgramsOracle: String =
    """WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents),
      |g AS (SELECT UNNEST(list_transform(generate_series(1, len(toks) - 2),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngram
      |      FROM t WHERE len(toks) >= 3),
      |c AS (SELECT ngram, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY ngram)
      |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, ngram DESC) AS BIGINT) AS rank,
      |  ngram, cnt
      |FROM c ORDER BY cnt DESC, ngram DESC LIMIT 50""".stripMargin

  private val TemperatureSampleOracle: String = {
      val hashPm =
        """list_reduce(list_transform(
          |    string_split(substr(md5(d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8), ''),
          |    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
          |    (a, b) -> a * 16 + b) % 1000""".stripMargin
      s"""WITH tot AS (
         |  SELECT source AS stratum,
         |    CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS t
         |  FROM documents GROUP BY source),
         |w AS (
         |  SELECT stratum, t,
         |    CASE WHEN (s0 + 1) * (s0 + 1) <= t THEN s0 + 1
         |         WHEN s0 * s0 > t THEN s0 - 1 ELSE s0 END AS w
         |  FROM (SELECT stratum, t,
         |          CAST(floor(sqrt(CAST(t AS DOUBLE))) AS BIGINT) AS s0
         |        FROM tot WHERE t > 0)),
         |m AS (SELECT t AS m_t, w AS m_w FROM w
         |      ORDER BY ${sqlFdiv("t * 256", "w")}, stratum LIMIT 1),
         |r AS (SELECT stratum,
         |    LEAST(1000, ${sqlFdiv(s"w * ${sqlFdiv("1000000 * m_t", "t")}", "1000 * m_w")})
         |      AS rate_permille
         |  FROM w, m)
         |SELECT d.doc_id, d.source, r.rate_permille
         |FROM documents d JOIN r ON d.source = r.stratum
         |WHERE $hashPm < r.rate_permille
         |ORDER BY d.doc_id""".stripMargin
    }

  private val SemanticDecontaminationOracle: String =
    """WITH e AS (
        |  SELECT vec_id AS id,
        |    list_transform(generate_series(0,7), t ->
        |      CAST(list_sum(list_transform(generate_series(1,6), i ->
        |        CASE WHEN CAST(embedding[t*6 + i] AS DOUBLE) >= 0
        |          THEN (CAST(1 AS BIGINT) << (i-1)) ELSE 0 END)) AS BIGINT)) AS bs,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
        |  FROM embeddings),
        |n AS (
        |  SELECT id, q, bs, CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nq FROM e),
        |cx AS (
        |  SELECT n.*, t.tbl, bs[t.tbl + 1] AS bucket
        |  FROM n, (SELECT UNNEST(generate_series(0,7)) AS tbl) t WHERE id % 20 <> 0),
        |ex AS (
        |  SELECT n.*, t.tbl, bs[t.tbl + 1] AS bucket
        |  FROM n, (SELECT UNNEST(generate_series(0,7)) AS tbl) t WHERE id % 20 = 0),
        |p AS (
        |  SELECT a.id AS id, a.q AS qa, b.q AS qb, a.nq AS nq_a, b.nq AS nq_b
        |  FROM cx a JOIN ex b ON a.tbl = b.tbl AND a.bucket = b.bucket
        |  WHERE a.tbl = list_position(list_transform(generate_series(1,8),
        |    i -> a.bs[i] = b.bs[i]), true) - 1),
        |d AS (
        |  SELECT id, nq_a, nq_b,
        |    CAST(list_sum(list_transform(generate_series(1,64), i -> qa[i]*qb[i])) AS BIGINT) AS dot_q
        |  FROM p),
        |hits AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS n_near_eval FROM d
        |  WHERE dot_q > 0
        |    AND CAST(dot_q AS HUGEINT) * dot_q * 1000000 >= 122500 * CAST(nq_a AS HUGEINT) * nq_b
        |  GROUP BY id)
        |SELECT c.vec_id,
        |  CAST(coalesce(h.n_near_eval, 0) AS BIGINT) AS n_near_eval,
        |  CASE WHEN coalesce(h.n_near_eval, 0) > 0 THEN 1 ELSE 0 END AS contaminated
        |FROM (SELECT vec_id FROM embeddings WHERE vec_id % 20 <> 0) c
        |LEFT JOIN hits h ON h.id = c.vec_id
        |ORDER BY c.vec_id""".stripMargin

  /** The DSIR importance fold replayed in SQL — shared VERBATIM by
    * the batch and streaming gates (stateless scoring: same rows).
    */
  /** The per-ub (count, sum) view over the standard edit replay
    * (3 upserts at val = 3·id + 111, 2 bloom-located deletes, 2
    * inserts) — shared VERBATIM by the batch-maintained view
    * (`store_incr_view`) and the live follower (`stream_follow_view`):
    * both must land on the fresh aggregate over the edited table.
    */
  private val EditedViewOracle: String =
    """WITH m AS (SELECT max(event_id) AS mx FROM events),
      |up AS (SELECT (mx // 5) * i AS id FROM m, (VALUES (1),(2),(3)) t(i)),
      |del AS (SELECT (mx // 7) * i AS id FROM m, (VALUES (1),(2)) t(i)
      |        WHERE (mx // 7) * i NOT IN (SELECT id FROM up)),
      |base AS (SELECT event_id, user_id % 8 AS ub,
      |           event_id * 3 AS val_milli FROM events),
      |final AS (
      |  SELECT b.event_id, b.ub,
      |    CASE WHEN b.event_id IN (SELECT id FROM up)
      |      THEN b.event_id * 3 + 111 ELSE b.val_milli END AS val_milli
      |  FROM base b WHERE b.event_id NOT IN (SELECT id FROM del)
      |  UNION ALL
      |  SELECT mx + i, (mx + i) % 8, (mx + i) * 3 + 111
      |  FROM m, (VALUES (1),(2)) t(i))
      |SELECT CAST(ub AS BIGINT) AS ub,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(val_milli) AS BIGINT) AS sum_milli
      |FROM final GROUP BY ub ORDER BY ub""".stripMargin

  private val DomainImportanceOracle: String =
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |occ AS (
        |  SELECT doc_id,
        |    list_reduce(list_transform(string_split(substr(md5(bg), 1, 8), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) % 4096 AS bucket
        |  FROM (SELECT doc_id, UNNEST(list_transform(generate_series(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1])) AS bg
        |        FROM t WHERE len(toks) >= 2)),
        |tgt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS t_cnt
        |        FROM occ WHERE doc_id % 20 = 0 GROUP BY bucket),
        |cor AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c_cnt
        |        FROM occ WHERE doc_id % 20 <> 0 GROUP BY bucket),
        |tot AS (SELECT (SELECT COALESCE(sum(t_cnt), 0) FROM tgt) AS tt,
        |               (SELECT COALESCE(sum(c_cnt), 0) FROM cor) AS tc),
        |sc AS (
        |  SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
        |    CAST(sum((1000 * (COALESCE(g.t_cnt, 0) + 1) * (tot.tc + 4096))
        |        // ((COALESCE(c.c_cnt, 0) + 1) * (tot.tt + 4096))) AS BIGINT) AS w_sum
        |  FROM occ o LEFT JOIN tgt g USING (bucket)
        |    LEFT JOIN cor c USING (bucket), tot
        |  WHERE o.doc_id % 20 <> 0
        |  GROUP BY o.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(sc.n_feats, 0) AS BIGINT) AS n_feats,
        |  CAST(CASE WHEN sc.n_feats IS NULL THEN 0
        |    ELSE sc.w_sum // sc.n_feats END AS BIGINT) AS score_milli,
        |  CAST(CASE WHEN sc.n_feats IS NULL THEN 0
        |    WHEN sc.w_sum // sc.n_feats >= 1000 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
        |LEFT JOIN sc USING (doc_id) ORDER BY doc_id""".stripMargin

  private val PipelineIncrementalOracle: String =
    """WITH nd0 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN 'xx' ELSE lang END AS lang, text
        |  FROM documents),
        |nd AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 10 = 0 THEN text || ' edited' ELSE text END AS text
        |  FROM nd0 WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, lang, text FROM nd0 WHERE doc_id % 13 = 0),
        |f AS (
        |  SELECT doc_id, lang, text,
        |    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
        |    CAST(round(1000.0 * len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> t = 'the' OR t = 'a')) / len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS q
        |  FROM nd),
        |qf AS (SELECT * FROM f WHERE q >= 30),
        |keep AS (SELECT min(doc_id) AS doc_id FROM qf GROUP BY fp),
        |kept AS (SELECT qf.* FROM qf JOIN keep USING (doc_id)),
        |samp AS (
        |  SELECT * FROM kept
        |  WHERE list_reduce(list_transform(
        |      string_split(substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) % 1000
        |    < CASE WHEN lang = 'en' THEN 600 ELSE 800 END),
        |t AS (SELECT doc_id, doc_id % 16 AS grp,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens FROM samp),
        |o AS (SELECT doc_id, grp, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY grp ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        |  FROM t),
        |e AS (SELECT doc_id, grp, n_tokens, start_offset,
        |  UNNEST(generate_series(start_offset // 256, (start_offset + n_tokens - 1) // 256)) AS seq_id
        |  FROM o WHERE n_tokens > 0)
        |SELECT doc_id, CAST(grp AS BIGINT) AS grp, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(greatest(start_offset, seq_id * 256) - seq_id * 256 AS BIGINT) AS begin_in_seq,
        |  CAST(least(start_offset + n_tokens, seq_id * 256 + 256) - seq_id * 256 AS BIGINT) AS end_in_seq,
        |  CAST(greatest(0, seq_id * 256 - start_offset) AS BIGINT) AS doc_begin,
        |  CAST(least(start_offset + n_tokens, seq_id * 256 + 256)
        |    - greatest(start_offset, seq_id * 256) AS BIGINT) AS n_piece,
        |  (greatest(0, seq_id * 256 - start_offset) = 0) AS starts_doc
        |FROM e ORDER BY doc_id, seq_id""".stripMargin

  private val MixtureRebalanceOracle: String =
    """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |agg AS (
        |  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |  FROM t GROUP BY lang),
        |tgt AS (SELECT * FROM (VALUES ('en', CAST(500 AS BIGINT)),
        |  ('fr', CAST(300 AS BIGINT)), ('zh', CAST(200 AS BIGINT))) AS v(lang, target_permille)),
        |j AS (SELECT agg.lang, total_tokens, target_permille FROM agg JOIN tgt USING (lang)),
        |m AS (SELECT total_tokens AS m_tokens, target_permille AS m_target FROM j
        |      ORDER BY CAST(total_tokens AS DOUBLE) / target_permille, lang LIMIT 1),
        |r AS (SELECT lang, total_tokens,
        |        least(1000, (1000 * target_permille * m_tokens) // (m_target * total_tokens))
        |          AS rate_permille
        |      FROM j, m),
        |k AS (SELECT t.lang, CAST(count(*) AS BIGINT) AS kept_docs,
        |        CAST(sum(t.n_tokens) AS BIGINT) AS kept_tokens
        |      FROM t JOIN r USING (lang)
        |      WHERE list_reduce(list_transform(
        |          string_split(substr(md5(t.lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |          (a, b) -> a * 16 + b) % 1000 < r.rate_permille
        |      GROUP BY t.lang)
        |SELECT r.lang, r.total_tokens, r.rate_permille,
        |  coalesce(k.kept_docs, 0) AS kept_docs,
        |  coalesce(k.kept_tokens, 0) AS kept_tokens
        |FROM r LEFT JOIN k USING (lang)
        |ORDER BY lang""".stripMargin

  val oracles: Map[String, String] = Map(
    // 16 greedy merges on the top-2048 word table, replayed round by
    // round (materialized CTE chain; argmax = ORDER BY freq DESC, l, r)
    "bpe_train" -> bpeTrainOracle(BpeGateMerges, BpeGateMaxWords),
    // the trained merges applied to every distinct word (same fold),
    // summed back per document through the token join
    "bpe_encode" -> bpeEncodeOracle(BpeGateMerges, BpeGateMaxWords),
    // the streaming encode emits row-identical output to the batch
    // encode — one oracle serves both
    "stream_bpe_encode" -> bpeEncodeOracle(BpeGateMerges, BpeGateMaxWords),
    // the full prep chain replayed stage by stage: quality gate,
    // keep-first exact dedup, md5 stratified sample, sequence packing
    "pipeline_pretrain" ->
      """WITH f AS (
        |  SELECT doc_id, lang, text,
        |    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
        |    CAST(round(1000.0 * len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> t = 'the' OR t = 'a')) / len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS q
        |  FROM documents),
        |qf AS (SELECT * FROM f WHERE q >= 30),
        |keep AS (SELECT min(doc_id) AS doc_id FROM qf GROUP BY fp),
        |kept AS (SELECT qf.* FROM qf JOIN keep USING (doc_id)),
        |samp AS (
        |  SELECT * FROM kept
        |  WHERE list_reduce(list_transform(
        |      string_split(substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) % 1000
        |    < CASE WHEN lang = 'en' THEN 600 ELSE 800 END),
        |t AS (SELECT doc_id, lang AS grp,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens FROM samp),
        |o AS (SELECT doc_id, grp, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY grp ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        |  FROM t),
        |e AS (SELECT doc_id, grp, n_tokens, start_offset,
        |  UNNEST(generate_series(start_offset // 256, (start_offset + n_tokens - 1) // 256)) AS seq_id
        |  FROM o WHERE n_tokens > 0)
        |SELECT doc_id, grp, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(greatest(start_offset, seq_id * 256) - seq_id * 256 AS BIGINT) AS begin_in_seq,
        |  CAST(least(start_offset + n_tokens, seq_id * 256 + 256) - seq_id * 256 AS BIGINT) AS end_in_seq,
        |  CAST(greatest(0, seq_id * 256 - start_offset) AS BIGINT) AS doc_begin,
        |  CAST(least(start_offset + n_tokens, seq_id * 256 + 256)
        |    - greatest(start_offset, seq_id * 256) AS BIGINT) AS n_piece,
        |  (greatest(0, seq_id * 256 - start_offset) = 0) AS starts_doc
        |FROM e ORDER BY doc_id, seq_id""".stripMargin,
    // the from-scratch recompute on the perturbed corpus — proving the
    // incremental merge equals a full run (shard-grouped packing);
    // shared VERBATIM by the frame-merge and store-overwrite gates
    "pipeline_incremental" -> PipelineIncrementalOracle,
    "pipeline_incr_store" -> PipelineIncrementalOracle,
    // the CDC drain lands on the same final corpus -> same oracle
    "stream_pipeline_cdc" -> PipelineIncrementalOracle,
    // the store read with zone-map skipping == the same range aggregate
    // off the raw table (skipping may drop FILES, never rows)
    "store_skip_read" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |f AS (
        |  SELECT user_id % 8 AS ub, event_id
        |  FROM events, m
        |  WHERE event_id BETWEEN mx - (mx * 2) // 5 AND mx)
        |SELECT ub, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM f GROUP BY ub ORDER BY ub""".stripMargin,
    // the SQL-surface read of the same store content -> shares
    // store_skip_read's oracle verbatim
    "store_sql_read" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |f AS (
        |  SELECT user_id % 8 AS ub, event_id
        |  FROM events, m
        |  WHERE event_id BETWEEN mx - (mx * 2) // 5 AND mx)
        |SELECT ub, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM f GROUP BY ub ORDER BY ub""".stripMargin,
    // versionAsOf pins the init-only snapshot: the low event_id half
    "store_sql_travel" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |f AS (
        |  SELECT user_id % 8 AS ub, event_id
        |  FROM events, m
        |  WHERE event_id <= mx // 2)
        |SELECT ub, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM f GROUP BY ub ORDER BY ub""".stripMargin,
    // VERSION AS OF syntax pins the init-only snapshot -> shares
    // store_sql_travel's oracle verbatim
    "store_sql_asof" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |f AS (
        |  SELECT user_id % 8 AS ub, event_id
        |  FROM events, m
        |  WHERE event_id <= mx // 2)
        |SELECT ub, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM f GROUP BY ub ORDER BY ub""".stripMargin,
    // graft_history's per-version exact row counts == the raw-table
    // counts of what each commit's snapshot holds
    "store_sql_history" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events)
        |SELECT CAST(v AS BIGINT) AS version, CAST(n AS BIGINT) AS n_rows
        |FROM (
        |  SELECT 0 AS v, count(*) AS n FROM events, m
        |  WHERE event_id <= mx // 2
        |  UNION ALL
        |  SELECT 1 AS v, count(*) AS n FROM events)
        |ORDER BY version""".stripMargin,
    // the write surface (df.write.format) publishes the same store
    // content -> shares store_skip_read's oracle verbatim
    "store_sql_write" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |f AS (
        |  SELECT user_id % 8 AS ub, event_id
        |  FROM events, m
        |  WHERE event_id BETWEEN mx - (mx * 2) // 5 AND mx)
        |SELECT ub, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM f GROUP BY ub ORDER BY ub""".stripMargin,
    // INSERT INTO a USING-graft view appends the same content ->
    // same oracle
    "store_sql_insert" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |f AS (
        |  SELECT user_id % 8 AS ub, event_id
        |  FROM events, m
        |  WHERE event_id BETWEEN mx - (mx * 2) // 5 AND mx)
        |SELECT ub, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM f GROUP BY ub ORDER BY ub""".stripMargin,
    // the named streaming sink drains to the same store content ->
    // same oracle
    "stream_sink_store" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |f AS (
        |  SELECT user_id % 8 AS ub, event_id
        |  FROM events, m
        |  WHERE event_id BETWEEN mx - (mx * 2) // 5 AND mx)
        |SELECT ub, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM f GROUP BY ub ORDER BY ub""".stripMargin,
    // the streamed append-ingest drains to the same store content ->
    // same oracle
    "stream_append_store" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |f AS (
        |  SELECT user_id % 8 AS ub, event_id
        |  FROM events, m
        |  WHERE event_id BETWEEN mx - (mx * 2) // 5 AND mx)
        |SELECT ub, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM f GROUP BY ub ORDER BY ub""".stripMargin,
    // the merged store == the edit set replayed over the raw table
    "store_merge" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |up AS (SELECT (mx // 5) * i AS id FROM m, (VALUES (1),(2),(3)) t(i)),
        |del AS (SELECT (mx // 7) * i AS id FROM m, (VALUES (1),(2)) t(i)
        |        WHERE (mx // 7) * i NOT IN (SELECT id FROM up)),
        |base AS (SELECT event_id, user_id % 8 AS ub,
        |           event_id * 3 AS val_milli FROM events),
        |ins AS (SELECT mx + i AS event_id, (mx + i) % 8 AS ub,
        |          777000 + mx + i AS val_milli
        |        FROM m, (VALUES (1),(2)) t(i))
        |SELECT event_id, CAST(ub AS BIGINT) AS ub,
        |  CAST(val_milli AS BIGINT) AS val_milli FROM (
        |  SELECT b.event_id, b.ub,
        |    CASE WHEN b.event_id IN (SELECT id FROM up)
        |      THEN 777000 + b.event_id ELSE b.val_milli END AS val_milli
        |  FROM base b WHERE b.event_id NOT IN (SELECT id FROM del)
        |  UNION ALL SELECT * FROM ins)
        |ORDER BY event_id""".stripMargin,
    // the metadata-only ROLLBACK republishes the merged content —
    // same replayed-edit oracle as store_merge VERBATIM
    "store_restore" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |up AS (SELECT (mx // 5) * i AS id FROM m, (VALUES (1),(2),(3)) t(i)),
        |del AS (SELECT (mx // 7) * i AS id FROM m, (VALUES (1),(2)) t(i)
        |        WHERE (mx // 7) * i NOT IN (SELECT id FROM up)),
        |base AS (SELECT event_id, user_id % 8 AS ub,
        |           event_id * 3 AS val_milli FROM events),
        |ins AS (SELECT mx + i AS event_id, (mx + i) % 8 AS ub,
        |          777000 + mx + i AS val_milli
        |        FROM m, (VALUES (1),(2)) t(i))
        |SELECT event_id, CAST(ub AS BIGINT) AS ub,
        |  CAST(val_milli AS BIGINT) AS val_milli FROM (
        |  SELECT b.event_id, b.ub,
        |    CASE WHEN b.event_id IN (SELECT id FROM up)
        |      THEN 777000 + b.event_id ELSE b.val_milli END AS val_milli
        |  FROM base b WHERE b.event_id NOT IN (SELECT id FROM del)
        |  UNION ALL SELECT * FROM ins)
        |ORDER BY event_id""".stripMargin,
    // the TIMESTAMP AS OF read pins the merged version mid-churn —
    // same replayed-edit oracle as store_merge VERBATIM
    "store_ts_read" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |up AS (SELECT (mx // 5) * i AS id FROM m, (VALUES (1),(2),(3)) t(i)),
        |del AS (SELECT (mx // 7) * i AS id FROM m, (VALUES (1),(2)) t(i)
        |        WHERE (mx // 7) * i NOT IN (SELECT id FROM up)),
        |base AS (SELECT event_id, user_id % 8 AS ub,
        |           event_id * 3 AS val_milli FROM events),
        |ins AS (SELECT mx + i AS event_id, (mx + i) % 8 AS ub,
        |          777000 + mx + i AS val_milli
        |        FROM m, (VALUES (1),(2)) t(i))
        |SELECT event_id, CAST(ub AS BIGINT) AS ub,
        |  CAST(val_milli AS BIGINT) AS val_milli FROM (
        |  SELECT b.event_id, b.ub,
        |    CASE WHEN b.event_id IN (SELECT id FROM up)
        |      THEN 777000 + b.event_id ELSE b.val_milli END AS val_milli
        |  FROM base b WHERE b.event_id NOT IN (SELECT id FROM del)
        |  UNION ALL SELECT * FROM ins)
        |ORDER BY event_id""".stripMargin,
    // the ONLINE-built store's bloom point reads answer the same
    // IN-list — the oracle is identical to store_point_read's
    "stream_point_read" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |t(i) AS (VALUES (1),(2),(3),(4),(5)),
        |keys AS (
        |  SELECT (mx // 6 * i * 7919) % 100003 AS u FROM m, t)
        |SELECT DISTINCT e.event_id, e.user_id % 8 AS ub,
        |  (e.event_id * 7919) % 100003 AS u
        |FROM events e
        |WHERE (e.event_id * 7919) % 100003 IN (SELECT u FROM keys)
        |ORDER BY e.event_id""".stripMargin,
    // the swept store == the raw table minus the deleted range
    "store_delete_range" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |f AS (
        |  SELECT user_id % 8 AS ub, event_id
        |  FROM events, m
        |  WHERE event_id NOT BETWEEN mx // 3 AND mx // 2)
        |SELECT ub, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM f GROUP BY ub ORDER BY ub""".stripMargin,
    // SQL DELETE sweeps the same band -> shares store_delete_range's
    // oracle verbatim
    "store_sql_delete" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |f AS (
        |  SELECT user_id % 8 AS ub, event_id
        |  FROM events, m
        |  WHERE event_id NOT BETWEEN mx // 3 AND mx // 2)
        |SELECT ub, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM f GROUP BY ub ORDER BY ub""".stripMargin,
    // SQL UPDATE == the CASE replayed over the raw table
    "store_sql_update" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events)
        |SELECT event_id, CAST(user_id % 8 AS BIGINT) AS ub,
        |  CAST(CASE WHEN event_id BETWEEN mx // 3 AND mx // 2
        |    THEN 777000 + event_id ELSE event_id * 3 END AS BIGINT)
        |    AS val_milli
        |FROM events, m ORDER BY event_id""".stripMargin,
    // SQL MERGE lands store_merge's exact edit -> shares its
    // replayed-edit oracle verbatim
    "store_sql_merge" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |up AS (SELECT (mx // 5) * i AS id FROM m, (VALUES (1),(2),(3)) t(i)),
        |del AS (SELECT (mx // 7) * i AS id FROM m, (VALUES (1),(2)) t(i)
        |        WHERE (mx // 7) * i NOT IN (SELECT id FROM up)),
        |base AS (SELECT event_id, user_id % 8 AS ub,
        |           event_id * 3 AS val_milli FROM events),
        |ins AS (SELECT mx + i AS event_id, (mx + i) % 8 AS ub,
        |          777000 + mx + i AS val_milli
        |        FROM m, (VALUES (1),(2)) t(i))
        |SELECT event_id, CAST(ub AS BIGINT) AS ub,
        |  CAST(val_milli AS BIGINT) AS val_milli FROM (
        |  SELECT b.event_id, b.ub,
        |    CASE WHEN b.event_id IN (SELECT id FROM up)
        |      THEN 777000 + b.event_id ELSE b.val_milli END AS val_milli
        |  FROM base b WHERE b.event_id NOT IN (SELECT id FROM del)
        |  UNION ALL SELECT * FROM ins)
        |ORDER BY event_id""".stripMargin,
    // the incrementally-maintained view == the aggregate over the
    // edited table (the edit replay feeding a fresh GROUP BY)
    "store_incr_view" -> EditedViewOracle,
    // the feed-subscribed streaming view lands on the same content
    "stream_cdf_view" -> EditedViewOracle,
    // the LIVE follower lands on the same view — shares the oracle
    // VERBATIM (the follower invariant: view == fresh aggregate at
    // the version it last applied)
    "stream_follow_view" -> EditedViewOracle,
    // both eras aggregated: old rows read the new column as null
    // (counted out of n_tagged, -1 into the sum), new rows carry it
    "store_evolve" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |f AS (
        |  SELECT user_id % 8 AS ub,
        |    CASE WHEN event_id > mx // 2 THEN event_id % 100 END AS tag
        |  FROM events, m)
        |SELECT ub, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(COALESCE(tag, -1)) AS BIGINT) AS sum_tag,
        |  CAST(count(tag) AS BIGINT) AS n_tagged
        |FROM f GROUP BY ub ORDER BY ub""".stripMargin,
    // the derived change feed == the edit set spelled as explicit
    // delete/insert rows (updates are their delete+insert pair)
    "store_changes" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |up AS (SELECT (mx // 5) * i AS id FROM m, (VALUES (1),(2),(3)) t(i)),
        |del AS (SELECT (mx // 7) * i AS id FROM m, (VALUES (1),(2)) t(i)
        |        WHERE (mx // 7) * i NOT IN (SELECT id FROM up)),
        |base AS (SELECT event_id, user_id % 8 AS ub,
        |           event_id * 3 AS val_milli FROM events),
        |changes AS (
        |  SELECT b.event_id, b.ub, b.val_milli, 'delete' AS change
        |  FROM base b WHERE b.event_id IN (SELECT id FROM up)
        |  UNION ALL
        |  SELECT b.event_id, b.ub, b.event_id * 3 + 111, 'insert'
        |  FROM base b WHERE b.event_id IN (SELECT id FROM up)
        |  UNION ALL
        |  SELECT b.event_id, b.ub, b.val_milli, 'delete'
        |  FROM base b WHERE b.event_id IN (SELECT id FROM del)
        |  UNION ALL
        |  SELECT mx + i, (mx + i) % 8, (mx + i) * 3 + 111, 'insert'
        |  FROM m, (VALUES (1),(2)) t(i))
        |SELECT event_id, CAST(ub AS BIGINT) AS ub,
        |  CAST(val_milli AS BIGINT) AS val_milli, change
        |FROM changes ORDER BY event_id, change""".stripMargin,
    // the z-clustered store's user_id slice == the same aggregate off
    // the raw table (clustering is a content-identical rewrite)
    "store_zorder_read" ->
      """WITH m AS (SELECT max(user_id) AS mu, max(event_id) AS mx
        |           FROM events),
        |f AS (
        |  SELECT user_id % 8 AS ub, event_id
        |  FROM events, m
        |  WHERE user_id BETWEEN mu // 4 AND mu // 2
        |    AND event_id <= mx // 2)
        |SELECT ub, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM f GROUP BY ub ORDER BY ub""".stripMargin,
    // the all-SQL lifecycle lands the same clustered content ->
    // shares store_zorder_read's oracle verbatim
    "store_sql_optimize" ->
      """WITH m AS (SELECT max(user_id) AS mu, max(event_id) AS mx
        |           FROM events),
        |f AS (
        |  SELECT user_id % 8 AS ub, event_id
        |  FROM events, m
        |  WHERE user_id BETWEEN mu // 4 AND mu // 2
        |    AND event_id <= mx // 2)
        |SELECT ub, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM f GROUP BY ub ORDER BY ub""".stripMargin,
    // the metadata-served aggregates == the same aggregates computed
    // the hard way over the raw table
    "store_meta_agg" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  min(event_id) AS min_id, max(event_id) AS max_id,
        |  min(user_id) AS min_uid, max(user_id) AS max_uid
        |FROM events""".stripMargin,
    // the bloom-located point reads == the same hashed-key IN-list off
    // the raw table (location may open extra files, never skip a hit)
    "store_point_read" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |t(i) AS (VALUES (1),(2),(3),(4),(5)),
        |keys AS (
        |  SELECT (mx // 6 * i * 7919) % 100003 AS u FROM m, t)
        |SELECT DISTINCT e.event_id, e.user_id % 8 AS ub,
        |  (e.event_id * 7919) % 100003 AS u
        |FROM events e
        |WHERE (e.event_id * 7919) % 100003 IN (SELECT u FROM keys)
        |ORDER BY e.event_id""".stripMargin,
    // the SQL-surface bloom probe answers the same IN-list
    "store_sql_point" ->
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |t(i) AS (VALUES (1),(2),(3),(4),(5)),
        |keys AS (
        |  SELECT (mx // 6 * i * 7919) % 100003 AS u FROM m, t)
        |SELECT DISTINCT e.event_id, e.user_id % 8 AS ub,
        |  (e.event_id * 7919) % 100003 AS u
        |FROM events e
        |WHERE (e.event_id * 7919) % 100003 IN (SELECT u FROM keys)
        |ORDER BY e.event_id""".stripMargin,
    // the CORPUS store at the drained run's final tx == the event fold
    // replayed over the documents table: %7 deletes, %10 text edits,
    // %11 lang flips (upserts reach only %10/%11 docs — every other
    // surviving row is the UNTOUCHED original), %13 re-adds at +10^7
    "cdc_tx_corpus" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0 THEN text || ' edited' ELSE text END
        |    AS text,
        |  CASE WHEN doc_id % 11 = 0 THEN 'xx' ELSE lang END AS lang,
        |  source, CAST(n_chars AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id % 7 <> 0
        |UNION ALL
        |SELECT doc_id + 10000000, text,
        |  CASE WHEN doc_id % 11 = 0 THEN 'xx' ELSE lang END,
        |  source, CAST(n_chars AS BIGINT)
        |FROM documents WHERE doc_id % 13 = 0
        |ORDER BY doc_id""".stripMargin,
    // full-outer fingerprint join over the same planted perturbation
    "corpus_diff" ->
      """WITH old AS (
        |  SELECT doc_id,
        |    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |newd AS (
        |  SELECT doc_id,
        |    md5(lower(regexp_replace(trim(
        |      CASE WHEN doc_id % 10 = 0 THEN text || ' edited' ELSE text END),
        |      '\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000,
        |    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |  FROM documents WHERE doc_id % 13 = 0)
        |SELECT doc_id,
        |  CASE WHEN o.fp IS NULL THEN 'added'
        |       WHEN n.fp IS NULL THEN 'removed'
        |       WHEN o.fp = n.fp THEN 'unchanged' ELSE 'changed' END AS status,
        |  o.fp AS old_fp, n.fp AS new_fp
        |FROM old o FULL OUTER JOIN newd n USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "train_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_reduce(list_transform(
        |      string_split(substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 8), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) % 8 AS shard,
        |    md5('s1:' || CAST(doc_id AS VARCHAR)) AS sort_key
        |  FROM documents)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard, sort_key,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY sort_key, doc_id) AS BIGINT) AS pos
        |FROM t ORDER BY doc_id""".stripMargin,
    // eligibility is judged on the normalized form the fingerprint
    // hashes (constant per lfp partition BY CONSTRUCTION — raw-line
    // length could differ within a group under Unicode case-folding,
    // e.g. 'İ' → 'i̇'), so the window's keeper choice matches the
    // eligible-only groupBy-min
    "line_dedup" ->
      """WITH l AS (
        |  SELECT doc_id,
        |    UNNEST(generate_series(1, len(string_split(text, chr(10))))) AS line_idx,
        |    UNNEST(string_split(text, chr(10))) AS line
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, line_idx, line,
        |    length(regexp_replace(lower(trim(line)), '\s', '', 'g')) >= 10 AS eligible,
        |    md5(lower(trim(line))) AS lfp
        |  FROM l),
        |k AS (
        |  SELECT doc_id, line_idx, line, eligible,
        |    row_number() OVER (PARTITION BY lfp ORDER BY doc_id, line_idx) AS rn
        |  FROM e),
        |kept AS (SELECT doc_id, line_idx, line FROM k WHERE NOT eligible OR rn = 1),
        |agg AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_idx) AS clean_text,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(agg.clean_text, '') AS clean_text,
        |  CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(len(string_split(d.text, chr(10))) - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_dropped
        |FROM documents d LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // min-label propagation over the near-dup pair graph (aggregate
    // recursive term: each round keeps one improved label per node, so
    // accumulated rows are O(V·diameter), never the O(Σ component²)
    // transitive closure — the closure spelling ran ~1 h at sf1, this
    // runs in under a second); cluster = min reachable id (same
    // contract as the pointer-jumping Spark implementation)
    "dup_clusters" ->
      (s"""WITH RECURSIVE $nearDupPairsCte,
        |edges AS (
        |  SELECT id_a AS u, id_b AS v FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |lbl(id, c) AS (
        |  SELECT u, least(u, min(v)) FROM edges GROUP BY u
        |  UNION
        |  SELECT e.u, min(l.c) FROM edges e JOIN lbl l ON l.id = e.v GROUP BY e.u),
        |comp AS (SELECT id, min(c) AS cluster FROM lbl GROUP BY id)
        |SELECT id, cluster,
        |  CASE WHEN cluster = id THEN 1 ELSE 0 END AS is_canonical
        |FROM comp ORDER BY id""").stripMargin,
    "decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
        |         ELSE list_transform(generate_series(1, len(toks) - 2),
        |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS shingles
        |  FROM t),
        |bh AS (
        |  SELECT DISTINCT substr(md5(s), 1, 14) AS h
        |  FROM (SELECT UNNEST(shingles) AS s FROM sh WHERE doc_id % 20 = 0)),
        |ch AS (
        |  SELECT doc_id, substr(md5(s), 1, 14) AS h
        |  FROM (SELECT doc_id, UNNEST(list_distinct(shingles)) AS s
        |        FROM sh WHERE doc_id % 20 <> 0)),
        |cnt AS (
        |  SELECT ch.doc_id, CAST(count(bh.h) AS BIGINT) AS n
        |  FROM ch LEFT JOIN bh USING (h) GROUP BY ch.doc_id)
        |SELECT c.doc_id,
        |  CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_shared_shingles,
        |  CASE WHEN coalesce(cnt.n, 0) > 0 THEN 1 ELSE 0 END AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) c
        |LEFT JOIN cnt USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // the bipartite sign-LSH (6 bits x 8 tables) replayed: corpus x
    // eval buckets, first-agreeing-table exactly-once pair emission,
    // exact integer cosine threshold (m = 350 -> m^2 = 122500)
    "decontaminate_semantic" -> SemanticDecontaminationOracle,
    // streamed == batch is the equivalence claim itself
    "stream_decontaminate" -> SemanticDecontaminationOracle,
    // portable 32-bit hash of "lang:doc_id" mod 1000 under the
    // per-language per-mille rate
    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE list_reduce(list_transform(
        |    string_split(substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8), ''),
        |    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |    (a, b) -> a * 16 + b) % 1000
        |  < CASE lang WHEN 'en' THEN 150 WHEN 'fr' THEN 400 WHEN 'zh' THEN 800
        |    ELSE 300 END
        |ORDER BY doc_id""".stripMargin,
    // train (CTE chain) -> score & gate (score_sum >= 0) ->
    // temperature-sample the survivors — all three stages replayed
    "curate_v3" -> {
      val k = ClassifierTrainIters
      val hashPm =
        """list_reduce(list_transform(
          |    string_split(substr(md5(k.source || ':' || CAST(k.doc_id AS VARCHAR)), 1, 8), ''),
          |    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
          |    (a, b) -> a * 16 + b) % 1000""".stripMargin
      s"""WITH ${classifierTrainCtes(ClassifierTrainBuckets, k)},
         |score AS MATERIALIZED (
         |  SELECT t.doc_id, CAST(sum(t.cnt * w.w_micro) AS BIGINT) AS score_sum
         |  FROM tok t JOIN w$k w USING (bucket) GROUP BY t.doc_id),
         |keepd AS MATERIALIZED (
         |  SELECT d.doc_id, d.source, d.text, s.score_sum
         |  FROM documents d JOIN score s USING (doc_id)
         |  WHERE s.score_sum >= 0),
         |tw AS (SELECT source AS stratum,
         |    CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS t
         |  FROM keepd GROUP BY source),
         |sw AS (SELECT stratum, t,
         |    CASE WHEN (s0 + 1) * (s0 + 1) <= t THEN s0 + 1
         |         WHEN s0 * s0 > t THEN s0 - 1 ELSE s0 END AS w
         |  FROM (SELECT stratum, t,
         |          CAST(floor(sqrt(CAST(t AS DOUBLE))) AS BIGINT) AS s0
         |        FROM tw WHERE t > 0)),
         |sm AS (SELECT t AS m_t, w AS m_w FROM sw
         |       ORDER BY ${sqlFdiv("t * 256", "w")}, stratum LIMIT 1),
         |sr AS (SELECT stratum,
         |    LEAST(1000, ${sqlFdiv(s"w * ${sqlFdiv("1000000 * m_t", "t")}", "1000 * m_w")})
         |      AS rate_permille
         |  FROM sw, sm)
         |SELECT k.doc_id, k.source, k.score_sum, sr.rate_permille
         |FROM keepd k JOIN sr ON k.source = sr.stratum
         |WHERE $hashPm < sr.rate_permille
         |ORDER BY k.doc_id""".stripMargin
    },
    // curate_v4 = the three validated stage oracles chained as CTEs:
    // classifier train+gate (curate_v3's CTEs verbatim), DSIR
    // importance tilt (domain_importance's CTEs, d-prefixed), then
    // temperature rates over the docs surviving BOTH gates
    "curate_v4" -> {
      val k = ClassifierTrainIters
      val hashPm =
        """list_reduce(list_transform(
          |    string_split(substr(md5(k.source || ':' || CAST(k.doc_id AS VARCHAR)), 1, 8), ''),
          |    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
          |    (a, b) -> a * 16 + b) % 1000""".stripMargin
      s"""WITH ${classifierTrainCtes(ClassifierTrainBuckets, k)},
         |score AS MATERIALIZED (
         |  SELECT t.doc_id, CAST(sum(t.cnt * w.w_micro) AS BIGINT) AS score_sum
         |  FROM tok t JOIN w$k w USING (bucket) GROUP BY t.doc_id),
         |ckeep AS MATERIALIZED (
         |  SELECT d.doc_id, d.source, d.text, s.score_sum
         |  FROM documents d JOIN score s USING (doc_id)
         |  WHERE s.score_sum >= 0),
         |dt AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
         |docc AS (
         |  SELECT doc_id,
         |    list_reduce(list_transform(string_split(substr(md5(bg), 1, 8), ''),
         |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
         |      (a, b) -> a * 16 + b) % 4096 AS bucket
         |  FROM (SELECT doc_id, UNNEST(list_transform(generate_series(1, len(toks) - 1),
         |          i -> toks[i] || ' ' || toks[i+1])) AS bg
         |        FROM dt WHERE len(toks) >= 2)),
         |dtgt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS t_cnt
         |        FROM docc WHERE doc_id % 20 = 0 GROUP BY bucket),
         |dcor AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c_cnt
         |        FROM docc WHERE doc_id % 20 <> 0 GROUP BY bucket),
         |dtot AS (SELECT (SELECT COALESCE(sum(t_cnt), 0) FROM dtgt) AS tt,
         |               (SELECT COALESCE(sum(c_cnt), 0) FROM dcor) AS tc),
         |dsc AS (
         |  SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |    CAST(sum((1000 * (COALESCE(g.t_cnt, 0) + 1) * (dtot.tc + 4096))
         |        // ((COALESCE(c.c_cnt, 0) + 1) * (dtot.tt + 4096))) AS BIGINT) AS w_sum
         |  FROM docc o LEFT JOIN dtgt g USING (bucket)
         |    LEFT JOIN dcor c USING (bucket), dtot
         |  WHERE o.doc_id % 20 <> 0
         |  GROUP BY o.doc_id),
         |ikeep AS (
         |  SELECT doc_id, CAST(w_sum // n_feats AS BIGINT) AS score_milli
         |  FROM dsc
         |  WHERE list_reduce(list_transform(
         |      string_split(substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 8), ''),
         |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
         |      (a, b) -> a * 16 + b) % 1000
         |    < LEAST(1000, w_sum // n_feats)),
         |kept AS MATERIALIZED (
         |  SELECT c.doc_id, c.source, c.text, c.score_sum, i.score_milli
         |  FROM ckeep c JOIN ikeep i USING (doc_id)
         |  WHERE c.doc_id % 20 <> 0),
         |tw AS (SELECT source AS stratum,
         |    CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS t
         |  FROM kept GROUP BY source),
         |sw AS (SELECT stratum, t,
         |    CASE WHEN (s0 + 1) * (s0 + 1) <= t THEN s0 + 1
         |         WHEN s0 * s0 > t THEN s0 - 1 ELSE s0 END AS w
         |  FROM (SELECT stratum, t,
         |          CAST(floor(sqrt(CAST(t AS DOUBLE))) AS BIGINT) AS s0
         |        FROM tw WHERE t > 0)),
         |sm AS (SELECT t AS m_t, w AS m_w FROM sw
         |       ORDER BY ${sqlFdiv("t * 256", "w")}, stratum LIMIT 1),
         |sr AS (SELECT stratum,
         |    LEAST(1000, ${sqlFdiv(s"w * ${sqlFdiv("1000000 * m_t", "t")}", "1000 * m_w")})
         |      AS rate_permille
         |  FROM sw, sm)
         |SELECT k.doc_id, k.source, k.score_sum, k.score_milli, sr.rate_permille
         |FROM kept k JOIN sr ON k.source = sr.stratum
         |WHERE $hashPm < sr.rate_permille
         |ORDER BY k.doc_id""".stripMargin
    },
    // isqrt weights (double sqrt floored, then integer-verified ±1),
    // binding stratum by the staged fixed-point key, two-stage floor
    // division for the rate, portable-hash per-mille sampler
    "sample_temperature" -> TemperatureSampleOracle,
    // streamed-totals variant: identical rates, identical rows
    "stream_temperature" -> TemperatureSampleOracle,
    // binding stratum = min tokens/target (tie → name); rates by exact
    // bigint cross-multiplication; sampler = portable hash per-mille;
    // shared VERBATIM by the streamed-totals gate (stream_mixture) —
    // associative addition makes the drained totals row-identical
    "stream_mixture" -> MixtureRebalanceOracle,
    "mixture_rebalance" -> MixtureRebalanceOracle,

    // same planted-PII footer, markup strip, and three-stage redaction
    // (email -> ip -> long-number) with global replacement
    "text_scrub" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    '<p>' || text || '</p> contact u' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com from 10.0.'
        |      || CAST(doc_id % 256 AS VARCHAR)
        |      || '.1 ref 9000000' || CAST(doc_id AS VARCHAR) AS t
        |  FROM documents),
        |c AS (SELECT doc_id, regexp_replace(t, '<[^>]+>', ' ', 'g') AS t FROM w)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
        |    '\d{9,}', '[NUM]', 'g')) AS clean_md5
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
        |         ELSE list_transform(generate_series(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i+1]) END AS shingles
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN len(shingles) = 0 THEN 0
        |    ELSE CAST(round(1000.0 * (len(shingles) - len(list_distinct(shingles)))
        |         / len(shingles)) AS BIGINT) END AS repetition_milli
        |FROM sh ORDER BY doc_id""".stripMargin,
    // tf, df, and N are exact integers; idf = N*1e6 integer-floor-div
    // df; ranking is (score DESC, token DESC) to match the operator's
    // descending struct order
    "text_keywords" ->
      """WITH tok AS (
        |  SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok GROUP BY doc_id, token),
        |dfreq AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
        |    tf.tf * ((n.n_docs * 1000000) // dfreq.df) AS score
        |  FROM tf JOIN dfreq USING (token), n),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, token DESC) AS rnk
        |  FROM scored)
        |SELECT doc_id, token, tf, df, score FROM ranked
        |WHERE rnk <= 3 ORDER BY doc_id, token""".stripMargin,
    // duplicated 8-token spans: first occurrence (min doc_id, start)
    // survives, later repeats' positions are cut; same window-rank
    // trick as line_dedup (rank over the span hash)
    "span_dedup" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |w AS (
        |  SELECT doc_id,
        |    UNNEST(generate_series(0, len(toks) - 8)) AS s,
        |    UNNEST(list_transform(generate_series(1, len(toks) - 7),
        |      i -> substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 14))) AS h
        |  FROM t WHERE len(toks) >= 8),
        |k AS (SELECT doc_id, s, h,
        |        row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn,
        |        count(*) OVER (PARTITION BY h) AS cnt
        |      FROM w),
        |cov AS (SELECT DISTINCT doc_id, pos FROM (
        |  SELECT doc_id, UNNEST(generate_series(s + 1, s + 8)) AS pos
        |  FROM k WHERE cnt >= 2 AND rn > 1)),
        |tok AS (SELECT doc_id, UNNEST(generate_series(1, len(toks))) AS pos,
        |          UNNEST(toks) AS token FROM t),
        |kept AS (
        |  SELECT tok.doc_id, tok.pos, tok.token
        |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
        |  WHERE cov.pos IS NULL),
        |agg AS (SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS clean_text,
        |          count(*) AS n_kept
        |        FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
        |  CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(len(t.toks) - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_dropped
        |FROM t LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // covered positions = windows whose shingle hash is in the eval
    // set; reassembly identical to span_dedup's
    "decontaminate_scrub" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents WHERE doc_id % 20 <> 0),
        |bench AS (
        |  SELECT DISTINCT substr(md5(sh), 1, 14) AS h FROM (
        |    SELECT UNNEST(list_transform(generate_series(1, len(toks) - 2),
        |      i -> array_to_string(toks[i:i+2], ' '))) AS sh
        |    FROM (SELECT string_split_regex(trim(text), '\s+') AS toks
        |          FROM documents WHERE doc_id % 20 = 0)
        |    WHERE len(toks) >= 3)),
        |w AS (
        |  SELECT doc_id,
        |    UNNEST(generate_series(0, len(toks) - 3)) AS s,
        |    UNNEST(list_transform(generate_series(1, len(toks) - 2),
        |      i -> substr(md5(array_to_string(toks[i:i+2], ' ')), 1, 14))) AS h
        |  FROM t WHERE len(toks) >= 3),
        |cov AS (SELECT DISTINCT doc_id, pos FROM (
        |  SELECT w.doc_id, UNNEST(generate_series(w.s + 1, w.s + 3)) AS pos
        |  FROM w JOIN bench USING (h))),
        |tok AS (SELECT doc_id, UNNEST(generate_series(1, len(toks))) AS pos,
        |          UNNEST(toks) AS token FROM t),
        |kept AS (
        |  SELECT tok.doc_id, tok.pos, tok.token
        |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
        |  WHERE cov.pos IS NULL),
        |agg AS (SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS clean_text,
        |          count(*) AS n_kept
        |        FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
        |  CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(len(t.toks) - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_dropped
        |FROM t LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // maxTokens=40, overlap=8 -> stride 32; final chunk = remainder
    "chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
        |             len(string_split_regex(trim(text), '\s+')) AS n FROM documents),
        |c AS (SELECT doc_id, toks, n,
        |  CASE WHEN n <= 40 THEN 1 ELSE 1 + (n - 40 + 31) // 32 END AS n_chunks FROM t),
        |e AS (SELECT doc_id, toks, n,
        |        UNNEST(generate_series(0, n_chunks - 1)) AS chunk_idx FROM c)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  array_to_string(toks[chunk_idx*32 + 1 : chunk_idx*32 + 40], ' ') AS chunk_text,
        |  CAST(least(40, n - chunk_idx*32) AS BIGINT) AS n_tokens
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,
    // same chunker over the planted BPE-ish tokenization:
    // maxTokens=48, overlap=16 -> stride 32
    "chunk_docs_bpe" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> len(x) > 0) AS toks FROM documents),
        |n0 AS (SELECT doc_id, toks, len(toks) AS n FROM t),
        |c AS (SELECT doc_id, toks, n,
        |  CASE WHEN n <= 48 THEN 1 ELSE 1 + (n - 48 + 31) // 32 END AS n_chunks FROM n0),
        |e AS (SELECT doc_id, toks, n,
        |        UNNEST(generate_series(0, n_chunks - 1)) AS chunk_idx FROM c)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  array_to_string(toks[chunk_idx*32 + 1 : chunk_idx*32 + 48], ' ') AS chunk_text,
        |  CAST(least(48, n - chunk_idx*32) AS BIGINT) AS n_tokens
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,
    // global top-50 3-grams; ties broken by ngram text descending so
    // the cut at rank 50 is total-order deterministic
    "heavy_ngrams" -> HeavyNgramsOracle,
    // KMV estimate: (k-1)*2^56 // kth smallest distinct 56-bit hash
    "distinct_kmv" -> DistinctKmvOracle,
    // grouped KMV: the same hash + k-min + (k-1)*2^56/kth math, per lang
    "kmv_by_group" ->
      """WITH tok AS (
        |  SELECT lang AS g, UNNEST(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |h AS (
        |  SELECT DISTINCT g, list_reduce(list_transform(
        |    string_split(substr(md5(tok), 1, 14), ''),
        |    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |    (a, b) -> a * 16 + b) AS h
        |  FROM tok),
        |r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
        |  FROM h),
        |k AS (SELECT g, h FROM r WHERE rn <= 64)
        |SELECT g, CAST(count(*) AS BIGINT) AS k_seen,
        |  CAST(max(h) AS BIGINT) AS kth_hash,
        |  CAST(CASE WHEN count(*) < 64 THEN count(*)
        |    ELSE 4539628424389459968 // max(h) END AS BIGINT) AS est_distinct
        |FROM k GROUP BY g ORDER BY g""".stripMargin,
    // bounded-state streaming KMV drains to the IDENTICAL estimate
    "stream_kmv" -> DistinctKmvOracle,
    // CM sketch built from the same trigram stream; probe = the exact
    // top-50; bucket_j = (h1 + j*h2) % 2^56-space % 4096
    "cm_heavy_est" -> CmHeavyEstOracle,
    // the streaming sketch must drain to the IDENTICAL table
    "stream_cm_est" -> CmHeavyEstOracle,
    // the streaming operator's equivalence claim: the drained
    // stateful-aggregation snapshot must rank to the IDENTICAL result
    "stream_heavy_ngrams" -> HeavyNgramsOracle,
    // bigram occurrence counts trained on the corpus itself; per-doc
    // mean corpus frequency + unique-bigram share, exact integer math
    // the importance fold replayed: hashed-bigram buckets, smoothed
    // ratio per occurrence, per-doc mean, keep at >= 1000 milli
    "domain_importance" -> DomainImportanceOracle,
    "stream_domain_importance" -> DomainImportanceOracle,
    "lm_familiarity" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |occ AS (SELECT doc_id, substr(md5(bg), 1, 14) AS h FROM (
        |   SELECT doc_id, UNNEST(list_transform(generate_series(1, len(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i+1])) AS bg
        |   FROM t WHERE len(toks) >= 2)),
        |c AS (SELECT h, CAST(count(*) AS BIGINT) AS cnt FROM occ GROUP BY h),
        |d AS (SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |        CAST(sum(c.cnt) AS BIGINT) AS freq_sum,
        |        CAST(sum(CASE WHEN c.cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        |      FROM occ JOIN c USING (h) GROUP BY occ.doc_id)
        |SELECT t.doc_id,
        |  CAST(COALESCE(d.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  CAST(CASE WHEN d.n_bigrams IS NULL THEN 0
        |    ELSE d.freq_sum // d.n_bigrams END AS BIGINT) AS avg_bigram_freq,
        |  CAST(CASE WHEN d.n_bigrams IS NULL THEN 0
        |    ELSE (1000 * d.n_rare) // d.n_bigrams END AS BIGINT) AS rare_permille
        |FROM t LEFT JOIN d USING (doc_id) ORDER BY doc_id""".stripMargin,
    // the three validated stage oracles chained as CTEs: classifier
    // gate, line dedup over passing docs, first-occurrence of the
    // cleaned fingerprint
    "curate_v2" ->
      """WITH t AS (SELECT doc_id, text FROM documents
        |           UNION ALL
        |           SELECT doc_id + 1000000, 'cat' || chr(10) || 'dog' || chr(10) || 'fox'
        |           FROM documents WHERE doc_id % 20 = 0),
        |tok AS (SELECT doc_id, UNNEST(string_split_regex(trim(text), '\s+')) AS token FROM t),
        |bk AS (SELECT doc_id,
        |        list_reduce(list_transform(string_split(substr(md5(token), 1, 8), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |          (a, b) -> a * 16 + b) % 4096 AS bucket
        |      FROM tok),
        |w AS (SELECT i AS bucket, ((i * 2654435761) % 1997) - 998 AS w_milli
        |      FROM generate_series(0, 4095) AS g(i)),
        |s AS (SELECT doc_id, CAST(COALESCE(sum(w.w_milli), 0) AS BIGINT) AS score_sum
        |      FROM bk LEFT JOIN w USING (bucket) GROUP BY doc_id),
        |p AS (SELECT t.doc_id, t.text, (s.score_sum >= 0) AS passed FROM t JOIN s USING (doc_id)),
        |l AS (SELECT doc_id,
        |        UNNEST(generate_series(1, len(string_split(text, chr(10))))) AS line_idx,
        |        UNNEST(string_split(text, chr(10))) AS line
        |      FROM p WHERE passed),
        |e AS (SELECT doc_id, line_idx, line,
        |        length(regexp_replace(lower(trim(line)), '\s', '', 'g')) >= 10 AS eligible,
        |        md5(lower(trim(line))) AS lfp
        |      FROM l),
        |k AS (SELECT doc_id, line_idx, line, eligible,
        |        row_number() OVER (PARTITION BY lfp ORDER BY doc_id, line_idx) AS rn
        |      FROM e),
        |kept AS (SELECT doc_id, line_idx, line FROM k WHERE NOT eligible OR rn = 1),
        |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY line_idx) AS clean_text,
        |          count(*) AS n_kept
        |        FROM kept GROUP BY doc_id),
        |c AS (SELECT pp.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
        |        CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept
        |      FROM (SELECT doc_id FROM p WHERE passed) pp LEFT JOIN agg USING (doc_id)),
        |cm AS (SELECT doc_id, md5(clean_text) AS clean_md5, n_kept, clean_text FROM c),
        |f AS (SELECT clean_md5, min(doc_id) AS first_id FROM cm WHERE clean_text <> '' GROUP BY clean_md5)
        |SELECT p.doc_id,
        |  CASE WHEN p.passed THEN 1 ELSE 0 END AS passed_quality,
        |  CAST(COALESCE(cm.n_kept, 0) AS BIGINT) AS n_kept_lines,
        |  COALESCE(cm.clean_md5, '') AS clean_md5,
        |  CASE WHEN p.passed AND f.first_id = p.doc_id THEN 1 ELSE 0 END AS kept
        |FROM p
        |LEFT JOIN cm USING (doc_id)
        |LEFT JOIN f ON cm.clean_md5 = f.clean_md5
        |ORDER BY p.doc_id""".stripMargin,
    // keep-10-per-source by (n_chars, doc_id) descending — a total
    // order, so the heap operator and the window rank agree exactly
    "host_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id DESC) AS rn
        |  FROM documents)
        |SELECT doc_id, source, n_chars FROM r WHERE rn <= 10
        |ORDER BY doc_id""".stripMargin,
    // the 3 GD rounds replayed iteration by iteration — int64 fixed
    // point end to end, so Spark-on-32-threads and single-threaded
    // DuckDB agree bit for bit
    "quality_classifier_train" ->
      classifierTrainOracle(ClassifierTrainBuckets, ClassifierTrainIters),
    // same synthetic weight table (b*2654435761 mod 1997 - 998) and
    // portable 32-bit token hash mod 4096
    "quality_classifier" ->
      """WITH w AS (SELECT i AS bucket, ((i * 2654435761) % 1997) - 998 AS w_milli
        |           FROM generate_series(0, 4095) AS t(i)),
        |tok AS (SELECT doc_id, UNNEST(string_split_regex(trim(text), '\s+')) AS token
        |        FROM documents),
        |b AS (SELECT doc_id,
        |        list_reduce(list_transform(string_split(substr(md5(token), 1, 8), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |          (a, b) -> a * 16 + b) % 4096 AS bucket
        |      FROM tok),
        |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |        CAST(COALESCE(sum(w.w_milli), 0) AS BIGINT) AS score_sum
        |      FROM b LEFT JOIN w USING (bucket) GROUP BY doc_id)
        |SELECT doc_id, n_tokens, score_sum,
        |  CASE WHEN score_sum >= 0 THEN 1 ELSE 0 END AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    // doc x sequence intersections over the same per-lang prefix sum
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, lang AS grp,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, grp, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY grp ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start_offset
        |  FROM t WHERE n_tokens IS NOT NULL),
        |e AS (
        |  SELECT doc_id, grp, n_tokens, start_offset,
        |    UNNEST(generate_series(start_offset // 512,
        |      (start_offset + n_tokens - 1) // 512)) AS seq_id
        |  FROM o WHERE n_tokens > 0)
        |SELECT doc_id, grp, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(greatest(start_offset, seq_id * 512) - seq_id * 512 AS BIGINT) AS begin_in_seq,
        |  CAST(least(start_offset + n_tokens, seq_id * 512 + 512) - seq_id * 512 AS BIGINT) AS end_in_seq,
        |  CAST(greatest(0, seq_id * 512 - start_offset) AS BIGINT) AS doc_begin,
        |  CAST(least(start_offset + n_tokens, seq_id * 512 + 512)
        |    - greatest(start_offset, seq_id * 512) AS BIGINT) AS n_piece,
        |  (greatest(0, seq_id * 512 - start_offset) = 0) AS starts_doc
        |FROM e ORDER BY doc_id, seq_id""".stripMargin,
    "pack_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, lang AS grp,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, grp, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY grp ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start_offset
        |  FROM t)
        |SELECT doc_id, grp, n_tokens, start_offset,
        |  start_offset // 512 AS chunk_id,
        |  CAST(row_number() OVER (PARTITION BY grp, start_offset // 512
        |    ORDER BY doc_id) AS BIGINT) AS chunk_pos
        |FROM o ORDER BY doc_id""".stripMargin
  )
}
