package graft.functions

import graft.sources.ManifestStore
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

/** SQL TABLE-VALUED FUNCTIONS over the manifest store's metadata tier
  * — the `DESCRIBE HISTORY` / file-inventory surface for plain
  * `spark.sql`, registered by [[GraftExtensions]]
  * (`injectTableFunction`):
  *
  *  - `SELECT * FROM graft_history('/path/to/store')` — the retained
  *    commit log ([[ManifestStore.history]]): version, commit time,
  *    operation, file count, exact row count (when the stats sidecar
  *    is complete), tags. What an operator reads before a RESTORE or
  *    an AS OF pin.
  *  - `SELECT * FROM graft_files('/path/to/store'[, version])` — the
  *    snapshot's manifest entries with per-file zone-map bounds
  *    rendered as text: the file-skipping story made inspectable.
  *
  * Both answer from METADATA alone — zero data-file opens, zero Spark
  * jobs; the result is a driver-side [[LocalRelation]] (a retained
  * manifest log is bounded by retention, never large). The path must
  * be a literal — these run at resolution time.
  */
object GraftTableFunctions {

  private def literalString(e: Expression, what: String): String = e match {
    case l: Literal if l.dataType == StringType && l.value != null =>
      l.value.toString
    case other => throw new IllegalArgumentException(
      s"$what wants a literal string path, got $other")
  }

  private val historySchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("commit_ts", TimestampType),
    StructField("operation", StringType),
    StructField("n_files", IntegerType, nullable = false),
    StructField("n_rows", LongType),
    StructField("tags", StringType)))

  private[functions] val historyDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_history"),
    new ExpressionInfo(GraftTableFunctions.getClass.getName, "graft_history"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_history(path) wants one argument")
      val dir = literalString(args.head, "graft_history")
      val rows = ManifestStore.history(dir).map { c =>
        InternalRow(
          c.version,
          c.ts.map(_ * 1000L).map(Long.box).orNull, // millis -> micros
          c.op.map(UTF8String.fromString).orNull,
          c.nFiles,
          c.rows.map(Long.box).orNull,
          if (c.tags.isEmpty) null
          else UTF8String.fromString(c.tags.mkString(",")))
      }
      LocalRelation(
        org.apache.spark.sql.catalyst.types.DataTypeUtils
          .toAttributes(historySchema), rows)
    })

  private val filesSchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("bounds", StringType)))

  private[functions] val filesDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_files"),
    new ExpressionInfo(GraftTableFunctions.getClass.getName, "graft_files"),
    (args: Seq[Expression]) => {
      require(args.length == 1 || args.length == 2,
        "graft_files(path[, version]) wants one or two arguments")
      val dir = literalString(args.head, "graft_files")
      val v = args.lift(1).map {
        case l: Literal if l.value != null => l.value.toString.toLong
        case other => throw new IllegalArgumentException(
          s"graft_files wants a literal version, got $other")
      }.getOrElse(ManifestStore.latestVersion(dir).getOrElse(
        throw new IllegalArgumentException(
          s"$dir holds no manifest — not a graft store")))
      val stats = ManifestStore.stats(dir, v)
      val rows = ManifestStore.files(dir, v).map { rel =>
        val b = stats.getOrElse(rel, Map.empty).toSeq.sortBy(_._1)
          .map { case (c, (lo, hi)) => s"$c=[$lo..$hi]" }.mkString(" ")
        InternalRow(
          v, UTF8String.fromString(rel),
          if (b.isEmpty) null else UTF8String.fromString(b))
      }
      LocalRelation(
        org.apache.spark.sql.catalyst.types.DataTypeUtils
          .toAttributes(filesSchema), rows)
    })
}
