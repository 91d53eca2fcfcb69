package graft.plans

import graft.sources.{GraftWriter, ManifestStore}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** MAINTENANCE DDL for the graft store — the operator console's verbs
  * as plain SQL, parsed by [[GraftSqlParser]] before the Spark grammar
  * (none of these statements exist in Spark's own parser — the Delta
  * pattern):
  *
  *  - `OPTIMIZE <target> [ZORDER BY (c1, c2, ...)]` /
  *    `[HILBERT BY (...)]` — small-file folding
  *    ([[ManifestStore.compact]]), or clustered rewrite
  *    ([[ManifestStore.compactClustered]], Z or d-dim Hilbert curve)
  *    so the zone maps bound every listed dimension;
  *  - `VACUUM <target>` — reclaim crash litter (unmanifested orphans)
  *    under the store's fenced lease/marker protocol;
  *  - `RESTORE <target> [TO] VERSION AS OF n` /
  *    `[TO] TIMESTAMP AS OF '<ts>'` — the metadata-only rollback
  *    ([[ManifestStore.restore]]).
  *
  * `<target>` is a quoted store path (`OPTIMIZE '/data/events'`) or a
  * graft view/table name (resolved through the session catalog —
  * [[GraftDml.optionsForName]]; statsCols/bloomCols ride along from
  * the relation's options). A path target re-derives statsCols from
  * the existing sidecar, so an OPTIMIZE never silently DROPS zone
  * maps. Each statement returns its result row (published version /
  * reclaimed count) like a query.
  */
object GraftMaintenanceParser {

  private val T = """(?:'([^']+)'|([\w.$]+))"""
  private val OptimizeRe =
    ("""(?is)^\s*OPTIMIZE\s+""" + T +
      """(?:\s+(ZORDER|HILBERT)\s+BY\s*\(([^)]*)\))?\s*;?\s*$""").r
  private val VacuumRe = ("""(?is)^\s*VACUUM\s+""" + T + """\s*;?\s*$""").r
  private val RestoreVRe =
    ("""(?is)^\s*RESTORE\s+""" + T +
      """\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  private val RestoreTRe =
    ("""(?is)^\s*RESTORE\s+""" + T +
      """\s+(?:TO\s+)?TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""").r

  private def resolve(
      session: SparkSession, path: String, name: String):
      (Map[String, String],
        Option[org.apache.spark.sql.catalyst.TableIdentifier]) =
    if (path != null) (Map("path" -> path), None)
    else GraftDml.optionsForName(session, name.split('.').toSeq)
      .getOrElse(throw new IllegalArgumentException(
        s"$name does not name a graft store view or table"))

  def parse(session: SparkSession, sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case OptimizeRe(p, n, curve, cols) =>
        val (opts, tbl) = resolve(session, p, n)
        val dims = Option(cols).toSeq.flatMap(_.split(','))
          .map(_.trim).filter(_.nonEmpty)
        require(curve == null || dims.nonEmpty,
          "OPTIMIZE ... BY wants at least one column")
        Some(GraftOptimizeCommand(
          opts, dims, Option(curve).exists(_.equalsIgnoreCase("HILBERT")),
          tbl))
      case VacuumRe(p, n) =>
        val (opts, _) = resolve(session, p, n)
        Some(GraftVacuumCommand(opts))
      case RestoreVRe(p, n, v) =>
        val (opts, tbl) = resolve(session, p, n)
        Some(GraftRestoreCommand(opts, Left(v.toLong), tbl))
      case RestoreTRe(p, n, ts) =>
        val (opts, tbl) = resolve(session, p, n)
        Some(GraftRestoreCommand(opts, Right(ts), tbl))
      case _ => None
    }
}

private[plans] object GraftMaintenance {

  /** (write opts, partCol, current version, full schema incl. the
    * partition column, effective statsCols — option-declared, else
    * re-derived from the existing sidecar so maintenance never drops
    * the zone maps).
    */
  def context(spark: SparkSession, options: Map[String, String]):
      (GraftWriter.Opts, String, Long,
        org.apache.spark.sql.types.StructType, Seq[String]) = {
    val w = GraftWriter.parse(options)
    val partCol = GraftWriter.resolvePartCol(w)
    val v = ManifestStore.latestVersion(w.storeDir).getOrElse(
      throw new IllegalArgumentException(
        s"${w.storeDir} holds no manifest — not a graft store"))
    val schema = spark.read.format("graft")
      .options(options).option("versionAsOf", v.toString).load().schema
    val statsCols =
      if (w.statsCols.nonEmpty) w.statsCols
      else ManifestStore.stats(w.storeDir, v).valuesIterator
        .flatMap(_.keys).filterNot(_.startsWith("#")).toSeq.distinct.sorted
    (w, partCol, v, schema, statsCols)
  }

  val versionOutput: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(StructField("version", LongType, nullable = false))))
}

case class GraftOptimizeCommand(
    options: Map[String, String],
    dims: Seq[String],
    hilbert: Boolean,
    table: Option[org.apache.spark.sql.catalyst.TableIdentifier])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = GraftMaintenance.versionOutput

  override def run(spark: SparkSession): Seq[Row] = {
    val (w, partCol, v, schema, statsCols) =
      GraftMaintenance.context(spark, options)
    val newV =
      if (dims.isEmpty)
        ManifestStore.compact(
          spark, w.storeDir, schema, partCol, w.maxFilesPerPartition,
          w.retainVersions, statsCols, w.bloomCols,
          w.retainAgeMillis).getOrElse(v)
      else
        ManifestStore.compactClustered(
          spark, w.storeDir, schema, partCol, dims,
          filesPerPartition = w.maxFilesPerPartition,
          retainVersions = w.retainVersions, statsCols = statsCols,
          bloomCols = w.bloomCols,
          curve = if (hilbert) graft.operators.Layout.Hilbert
            else graft.operators.Layout.Z,
          retainAgeMillis = w.retainAgeMillis)
    try spark.catalog.refreshByPath(w.storeDir)
    catch { case _: Exception => () }
    GraftDml.refreshName(spark, table)
    Seq(Row(newV))
  }
}

case class GraftVacuumCommand(options: Map[String, String])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    StructType(Seq(
      StructField("reclaimed_files", LongType, nullable = false))))

  override def run(spark: SparkSession): Seq[Row] = {
    val w = GraftWriter.parse(options)
    val partCol = GraftWriter.resolvePartCol(w)
    Seq(Row(ManifestStore.vacuum(w.storeDir, partCol).toLong))
  }
}

case class GraftRestoreCommand(
    options: Map[String, String],
    to: Either[Long, String],
    table: Option[org.apache.spark.sql.catalyst.TableIdentifier])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = GraftMaintenance.versionOutput

  override def run(spark: SparkSession): Seq[Row] = {
    val w = GraftWriter.parse(options)
    val partCol = GraftWriter.resolvePartCol(w)
    val version = to match {
      case Left(v) => v
      case Right(ts) =>
        val millis = Option(spark.range(1)
          .select(lit(ts).cast("timestamp").as("ts")).head()
          .getAs[java.sql.Timestamp](0)).map(_.getTime)
          .getOrElse(throw new IllegalArgumentException(
            s"cannot read '$ts' as a timestamp"))
        ManifestStore.versionAt(w.storeDir, millis)
    }
    val newV = ManifestStore.restore(
      w.storeDir, partCol, version, w.retainVersions, w.retainAgeMillis)
    try spark.catalog.refreshByPath(w.storeDir)
    catch { case _: Exception => () }
    GraftDml.refreshName(spark, table)
    Seq(Row(newV))
  }
}
