package graft.plans

import graft.sources.{GraftWriter, ManifestFileIndex, ManifestStore}
import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
import org.apache.spark.sql.graft.GraftSqlShims

/** SQL DML on the graft store: `INSERT INTO v SELECT ...` and
  * `INSERT OVERWRITE v SELECT ...` against a `USING graft` view become
  * MANIFEST COMMITS instead of raw file writes.
  *
  * Why a rule is needed at all: the read surface is a
  * `HadoopFsRelation` (deliberately — the native vectorized scan; see
  * [[graft.sources.GraftDataSource]]), and Spark's own
  * `DataSourceAnalysis` plans EVERY insert into a `HadoopFsRelation`
  * as `InsertIntoHadoopFsRelationCommand` — a raw parquet write into
  * the store directory that would bypass the manifest entirely
  * (invisible rows at best; for static INSERT OVERWRITE a recursive
  * DELETE of store content — catastrophic). This rule runs in the same
  * post-hoc-resolution batch, AFTER `DataSourceAnalysis` (injected
  * rules append to the built-ins, and rules in a batch see their
  * predecessors' output), recognizes the command's [[ManifestFileIndex]]
  * — or a target path that holds a manifest, catching inserts aimed at
  * the store dir through a plain parquet relation — and replaces it
  * with [[GraftInsertCommand]]: INSERT INTO = [[ManifestStore.append]],
  * INSERT OVERWRITE = a whole-content [[ManifestStore.commit]]
  * publishing a new VERSION (history stays readable through time
  * travel; pinned readers keep their snapshot).
  *
  * Self-referential `INSERT INTO v SELECT ... FROM v` is safe by
  * architecture: the source query reads the CURRENT pinned manifest's
  * files while the write stages NEW files — nothing read is
  * overwritten, and the commit publishes atomically on top.
  * Self-referential INSERT OVERWRITE is refused upstream by Spark's
  * own `verifyNotReadPath` guard (it runs before this rule and cannot
  * know the store is MVCC-safe) — route that shape through
  * `df.write.format("graft").mode("overwrite")`, which has no such
  * guard and the same snapshot isolation.
  *
  * Wired by [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`) — the same
  * switch that enables the SQL kernels.
  */
case class GraftInsertRule(session: SparkSession)
  extends Rule[LogicalPlan] {

  private def storeDirOf(i: InsertIntoHadoopFsRelationCommand): Option[String] =
    i.fileIndex match {
      case Some(_: ManifestFileIndex) =>
        // the USING-graft path: the relation's options carry the
        // store dir exactly as the user spelled it
        Some(i.options.collectFirst {
          case (k, v) if k.equalsIgnoreCase("path") => v
        }.getOrElse(i.outputPath.toString))
      case _ =>
        // a plain file relation aimed at a directory that holds a
        // manifest: intercept — the raw write would corrupt the store
        val dir = i.outputPath.toString
        if (ManifestStore.latestVersion(dir).isDefined) Some(dir) else None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case i: InsertIntoHadoopFsRelationCommand if storeDirOf(i).isDefined =>
      require(i.staticPartitions.isEmpty,
        "INSERT ... PARTITION(col=...) static partitions are not " +
          "supported on a graft store — the partition column rides in " +
          "the rows")
      GraftInsertCommand(
        i.options + ("path" -> storeDirOf(i).get),
        i.query, i.mode, i.outputColumnNames)
  }
}

/** The rewritten insert: run the (already resolved and type-coerced)
  * source query through [[GraftWriter.write]] under the INSERT's
  * SaveMode (INTO = Append, OVERWRITE = Overwrite). `outputColumnNames`
  * restore the table-schema names `PreprocessTableInsertion` matched
  * positionally — the store writes by name.
  */
case class GraftInsertCommand(
    options: Map[String, String],
    query: LogicalPlan,
    mode: SaveMode,
    outputColumnNames: Seq[String]) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val data =
      GraftSqlShims.ofRows(spark, query).toDF(outputColumnNames: _*)
    GraftWriter.write(mode, GraftWriter.parse(options), data)
    Seq.empty
  }
}
