package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** The WRITE half of the graft SQL surface — the option parsing and
  * SaveMode dispatch shared by `df.write.format("graft")`
  * ([[GraftDataSource]]'s `CreatableRelationProvider`), the streaming
  * sink (`df.writeStream.format("graft")` →
  * [[graft.streaming.GraftSink]]) and SQL DML
  * (`INSERT INTO ... USING-graft view` →
  * [[graft.plans.GraftInsertRule]]).
  *
  * Every mode is a MANIFEST COMMIT, never a file dump: content becomes
  * visible atomically at the manifest CAS, pinned readers keep their
  * snapshot, history stays readable via `versionAsOf`/`timestampAsOf`,
  * and zone-map stats + parquet blooms harvest per batch exactly as the
  * Scala API's `init`/`append`/`commit` do — the SQL surface and the
  * Scala surface publish indistinguishable stores.
  *
  * Options (beyond the read-side ones documented on
  * [[GraftDataSource]]):
  *  - `partCol`: the partition column (required for a fresh store;
  *    an existing store's manifest names it);
  *  - `statsCols` / `bloomCols`: comma-separated column lists to
  *    harvest zone-map bounds / write parquet bloom filters for;
  *  - `retainVersions` (int, default 8) / `retainAgeMillis` (long):
  *    the retention knobs threaded to every commit;
  *  - `tag`: exactly-once append tag ([[ManifestStore.append]]);
  *  - `compactEvery` / `maxFilesPerPartition` (streaming sink only):
  *    fold crowded partitions every N micro-batches.
  *
  * Reference: the reference system's state is written exclusively
  * through its transactional operators (`StateOperator.java`); this
  * gives the lakehouse store tier the same property on the SQL
  * surface — there is no unmanaged write path.
  */
object GraftWriter {

  final case class Opts(
      storeDir: String,
      partCol: Option[String],
      statsCols: Seq[String],
      bloomCols: Seq[String],
      retainVersions: Int,
      retainAgeMillis: Option[Long],
      tag: Option[String],
      compactEvery: Int,
      maxFilesPerPartition: Int)

  def parse(parameters: Map[String, String]): Opts = {
    val o = parameters.map { case (k, v) => k.toLowerCase -> v }
    def cols(k: String): Seq[String] =
      o.get(k).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    Opts(
      storeDir = o.getOrElse("path", throw new IllegalArgumentException(
        "the graft writer needs a store directory: option(\"path\", ...) " +
          "or save(path)")),
      partCol = o.get("partcol"),
      statsCols = cols("statscols"),
      bloomCols = cols("bloomcols"),
      retainVersions = o.get("retainversions").map(_.toInt).getOrElse(8),
      retainAgeMillis = o.get("retainagemillis").map(_.toLong),
      tag = o.get("tag"),
      compactEvery = o.get("compactevery").map(_.toInt).getOrElse(0),
      maxFilesPerPartition =
        o.get("maxfilesperpartition").map(_.toInt).getOrElse(4))
  }

  /** The partition column: the explicit option wins; otherwise an
    * existing non-empty store's manifest names it (partition values
    * ride in the entry dir names).
    */
  def resolvePartCol(opts: Opts): String =
    opts.partCol
      .orElse(ManifestStore.latestVersion(opts.storeDir).flatMap(v =>
        ManifestStore.files(opts.storeDir, v).headOption
          .map(_.takeWhile(_ != '='))))
      .getOrElse(throw new IllegalArgumentException(
        s"${opts.storeDir}: pass option(\"partCol\", ...) — no existing " +
          "manifest names the partition column"))

  /** One batch write under `mode` semantics:
    *
    *  - a FRESH path initializes the store (manifest v0) whatever the
    *    mode;
    *  - `Append` on an existing store is a [[ManifestStore.append]]
    *    (the fact-table ingest shape — per-batch files carry tight
    *    zone-map bounds on whatever the batch was clustered by);
    *  - `Overwrite` on an existing store is a NEW VERSION replacing
    *    the whole content — a [[ManifestStore.commit]] touching the
    *    union of previous and incoming partition values (partitions
    *    absent from the batch drop, exactly like SQL `INSERT
    *    OVERWRITE`), NEVER a directory wipe: previous versions stay
    *    readable through time travel until retention, and a pinned
    *    reader mid-overwrite keeps its snapshot;
    *  - `ErrorIfExists` refuses an existing store typed; `Ignore`
    *    leaves it untouched.
    */
  /** Invalidate catalog-relation and DataFrame caches over the store
    * path after a commit: a `CREATE TABLE ... USING graft` name
    * resolves through Spark's relation cache, which would otherwise
    * keep serving the pre-commit snapshot (pinned DataFrames the user
    * already holds keep theirs — that is snapshot isolation, not
    * staleness). Same post-write contract as Spark's own
    * InsertIntoHadoopFsRelationCommand.
    */
  def refreshPath(data: DataFrame, storeDir: String): Unit =
    try data.sparkSession.catalog.refreshByPath(storeDir)
    catch { case _: Exception => () }

  def write(mode: SaveMode, opts: Opts, data: DataFrame): Unit = {
    val partCol = resolvePartCol(opts)
    require(data.columns.contains(partCol),
      s"the batch has no '$partCol' column " +
        s"(columns: ${data.columns.mkString(", ")})")
    ManifestStore.latestVersion(opts.storeDir) match {
      case None =>
        ManifestStore.init(
          data, partCol, opts.storeDir, opts.statsCols, opts.bloomCols)
        refreshPath(data, opts.storeDir)
      case Some(v) => mode match {
        case SaveMode.ErrorIfExists =>
          throw new IllegalStateException(
            s"${opts.storeDir} already holds a graft store (v$v) and the " +
              "save mode is ErrorIfExists")
        case SaveMode.Ignore => ()
        case SaveMode.Append =>
          ManifestStore.append(
            data, partCol, opts.storeDir, opts.retainVersions,
            opts.statsCols, opts.tag, bloomCols = opts.bloomCols,
            retainAgeMillis = opts.retainAgeMillis)
          refreshPath(data, opts.storeDir)
        case SaveMode.Overwrite =>
          // partition values are bounded by design (it's a partition
          // column), so the driver-side distinct-collect is metadata-
          // sized; the union makes partitions the batch doesn't touch
          // DROP — a true content replacement in one atomic commit
          val oldVals = ManifestStore.files(opts.storeDir, v)
            .map(_.takeWhile(_ != '/').stripPrefix(s"$partCol=").toLong)
            .distinct
          val newVals = data.select(col(partCol).cast("long"))
            .where(col(partCol).isNotNull)
            .distinct().collect().map(_.getLong(0)).toSeq
          ManifestStore.commit(
            data, partCol, (oldVals ++ newVals).distinct, opts.storeDir,
            opts.retainVersions, opts.statsCols, bloomCols = opts.bloomCols,
            retainAgeMillis = opts.retainAgeMillis)
          refreshPath(data, opts.storeDir)
      }
    }
  }
}
