package graft.plans

import graft.sources.{GraftWriter, ManifestFileIndex, ManifestStore}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable, View}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{coalesce, col, collect_set, count, first, lit, max, monotonically_increasing_id, not, when}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL row-level DML on the graft store — `DELETE FROM`, `UPDATE` and
  * `MERGE INTO` over a `USING graft` view, each executed as a
  * COPY-ON-WRITE partition rewrite published in ONE atomic manifest
  * commit (the Delta/Iceberg copy-on-write shape): the predicate (or
  * merge join) names the partitions whose content changes — evaluated
  * through the store's own pruned scan, so a range predicate prunes
  * files at the manifest before a single task runs — ONLY those
  * partitions rewrite, every other file carries verbatim, history
  * stays readable through time travel, and a racing commit is
  * conflict-checked against the version the edit was derived from
  * (`baseVersion` → typed ConcurrentCommitException, never a lost
  * edit).
  *
  * Why a rule: these statements parse and RESOLVE over a V1 relation
  * (the probe-verified Spark 4 behavior), but Spark only PLANS them
  * for DSv2 tables — left alone they fail at planning. This rule runs
  * post-hoc-resolution (wired by [[graft.functions.GraftExtensions]],
  * same switch as [[GraftInsertRule]]), recognizes a target whose
  * location is the [[ManifestFileIndex]], and replaces the statement
  * with a runnable command. Expressions arrive RESOLVED against the
  * statement's view attributes; the commands re-read the store at the
  * CURRENT latest version (a long-lived view must not edit through a
  * stale pin) and rebind the expressions onto the fresh attributes by
  * exprId→name.
  *
  * MERGE semantics implemented in full: ordered `WHEN MATCHED
  * [AND cond] THEN UPDATE/DELETE` (first true clause wins), `WHEN NOT
  * MATCHED [AND cond] THEN INSERT`, `WHEN NOT MATCHED BY SOURCE THEN
  * UPDATE/DELETE`, `UPDATE/INSERT SET *`; a target row matched by
  * MORE THAN ONE source row is the standard runtime error (the result
  * would be nondeterministic — same contract as Delta). An update that
  * reassigns the PARTITION column moves its rows: destination
  * partitions join the touched set and rewrite too.
  *
  * Reference: the reference system's keyed state updates flow through
  * its transactional operators (`StateOperator.java` update path);
  * this is the same discipline on the lakehouse tier's SQL surface.
  */
case class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case d: DeleteFromTable => GraftDml.target(d.table) match {
      case Some((opts, out, tbl)) =>
        GraftDeleteCommand(opts, out, d.condition, tbl)
      case None => d
    }
    case u: UpdateTable => GraftDml.target(u.table) match {
      case Some((opts, out, tbl)) =>
        GraftUpdateCommand(opts, out, u.assignments, u.condition, tbl)
      case None => u
    }
    case m: MergeIntoTable => GraftDml.target(m.targetTable) match {
      case Some((opts, out, tbl)) =>
        require(!m.withSchemaEvolution,
          "MERGE WITH SCHEMA EVOLUTION is not supported on a graft " +
            "store — evolve the schema by appending evolved-era files")
        GraftMergeCommand(opts, out, m.sourceTable, m.mergeCondition,
          m.matchedActions, m.notMatchedActions,
          m.notMatchedBySourceActions, tbl)
      case None => m
    }
  }
}

private[plans] object GraftDml {

  /** Unwrap a DML statement's target down to the graft relation:
    * `Some((relation options, statement-visible output, catalog
    * identity))` when the location is a [[ManifestFileIndex]]. The
    * identity (present for `CREATE TABLE ... USING graft` names, absent
    * for temp views) lets a command invalidate Spark's relation cache
    * after its commit, so the NAME re-pins to the new version — a temp
    * view stays pinned to its creation-time snapshot by design (it is
    * a named pin, like a held DataFrame).
    */
  def target(plan: LogicalPlan): Option[(Map[String, String],
      Seq[Attribute], Option[org.apache.spark.sql.catalyst.TableIdentifier])] = {
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => strip(c)
      case v: View => strip(v.child)
      case other => other
    }
    strip(plan) match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation if fs.location.isInstanceOf[ManifestFileIndex] =>
          Some((fs.options, plan.output, lr.catalogTable.map(_.identifier)))
        case _ => None
      }
      case _ => None
    }
  }

  /** Post-commit: drop the catalog's cached relation so the TABLE name
    * resolves to the new version on its next use.
    */
  def refreshName(
      spark: SparkSession,
      table: Option[org.apache.spark.sql.catalyst.TableIdentifier]): Unit =
    table.foreach { t =>
      try spark.sessionState.catalog.refreshTable(t)
      catch { case _: Exception => () }
    }

  /** Resolve a (possibly still-unanalyzed) relation NAME through the
    * session catalog WITHOUT a nested analyzer pass: temp / global
    * temp view plans are stored analyzed (read via [[target]]), a
    * catalog table's options live in its metadata (`USING graft`
    * provider; the `path` option becomes the storage location).
    * Returns the graft options plus the catalog identity (for
    * relation-cache invalidation), or None for non-graft names.
    */
  def optionsForName(session: SparkSession, name: Seq[String]):
      Option[(Map[String, String],
        Option[org.apache.spark.sql.catalyst.TableIdentifier])] = {
    val cat = session.sessionState.catalog
    def fromView(v: LogicalPlan) = target(v).map(t => (t._1, None))
    def fromTable(db: Option[String], n: String) =
      try {
        val t = cat.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(n, db))
        if (!t.provider.exists(_.equalsIgnoreCase("graft"))) None
        else Some((t.storage.locationUri
          .map(u => t.storage.properties + ("path" -> u.toString))
          .getOrElse(t.storage.properties), Some(t.identifier)))
      } catch { case _: Exception => None }
    name match {
      case Seq(n) =>
        cat.getTempView(n).flatMap(fromView).orElse(fromTable(None, n))
      case Seq(db, n) =>
        (if (db.equalsIgnoreCase(cat.globalTempDatabase))
          cat.getGlobalTempView(n).flatMap(fromView)
        else None).orElse(fromTable(Some(db), n))
      case Seq(_, db, n) => fromTable(Some(db), n)
      case _ => None
    }
  }

  /** The store re-read at the CURRENT latest version: (frame, pinned
    * version, write opts, partition column, fresh output attrs).
    */
  def freshTarget(
      spark: SparkSession, options: Map[String, String]):
      (DataFrame, Long, GraftWriter.Opts, String, Seq[Attribute]) = {
    val w = GraftWriter.parse(options)
    val v = ManifestStore.latestVersion(w.storeDir).getOrElse(
      throw new IllegalArgumentException(
        s"${w.storeDir} holds no manifest — nothing to edit"))
    val partCol = GraftWriter.resolvePartCol(w)
    val df = spark.read.format("graft")
      .options(options - "versionAsOf" - "versionasof"
        - "timestampAsOf" - "timestampasof")
      .option("versionAsOf", v.toString).load()
    (df, v, w, partCol, Bridge.logicalPlan(df).output)
  }

  /** Rebind every reference to the STATEMENT's target attributes onto
    * the fresh read's attributes (exprId → name); other references
    * (e.g. a MERGE source's) pass through untouched.
    */
  def rebind(
      e: Expression, stmtOut: Seq[Attribute],
      fresh: Seq[Attribute]): Expression = {
    val stmtIds: Set[ExprId] = stmtOut.map(_.exprId).toSet
    val freshByName = fresh.map(a => a.name -> a).toMap
    e.transform {
      case a: AttributeReference if stmtIds.contains(a.exprId) =>
        freshByName.getOrElse(a.name, throw new IllegalArgumentException(
          s"column ${a.name} is not in the store's schema"))
    }
  }

  def rebound(
      e: Expression, stmtOut: Seq[Attribute],
      fresh: Seq[Attribute]): Column =
    Bridge.column(rebind(e, stmtOut, fresh))

  /** assignment key must be a plain column (nested-field updates are
    * not supported), value cast to the column's type when needed.
    */
  def assignmentsByName(
      assignments: Seq[Assignment], stmtOut: Seq[Attribute],
      fresh: Seq[Attribute]): Map[String, Column] =
    assignments.map { a =>
      val name = a.key match {
        case k: AttributeReference => k.name
        case other => throw new IllegalArgumentException(
          s"only whole-column assignments are supported, got $other")
      }
      val tpe = fresh.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name is not in the store's schema")).dataType
      val v = rebound(a.value, stmtOut, fresh)
      name -> (if (a.value.dataType == tpe) v else v.cast(tpe))
    }.toMap

  /** Distinct partition values a frame's `partCol` column takes —
    * bounded by design (it's a partition column).
    */
  def partVals(df: DataFrame, pc: Column): Seq[Long] =
    df.select(pc.cast("long").as("__graft_pv")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted

  def commitRewrite(
      content: DataFrame, partCol: String, touched: Seq[Long],
      w: GraftWriter.Opts, base: Long): Unit = {
    ManifestStore.commit(
      content, partCol, touched, w.storeDir, w.retainVersions,
      w.statsCols, bloomCols = w.bloomCols,
      retainAgeMillis = w.retainAgeMillis, baseVersion = Some(base))
    GraftWriter.refreshPath(content, w.storeDir)
  }
}

/** `DELETE FROM v WHERE cond` — SQL null semantics (a NULL predicate
  * keeps its row); partitions with no matching row carry verbatim; a
  * predicate matching nothing is a version-stable no-op.
  */
case class GraftDeleteCommand(
    options: Map[String, String],
    stmtOut: Seq[Attribute],
    condition: Expression,
    table: Option[org.apache.spark.sql.catalyst.TableIdentifier] = None)
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (tgt, v, w, partCol, fresh) = GraftDml.freshTarget(spark, options)
    val cond = GraftDml.rebound(condition, stmtOut, fresh)
    val touched = GraftDml.partVals(tgt.filter(cond), col(partCol))
    if (touched.isEmpty) return Seq.empty
    val kept = tgt.filter(col(partCol).isin(touched: _*))
      .filter(not(coalesce(cond, lit(false))))
    GraftDml.commitRewrite(kept, partCol, touched, w, v)
    GraftDml.refreshName(spark, table)
    Seq.empty
  }
}

/** `UPDATE v SET c = expr, ... [WHERE cond]` — touched partitions
  * rewrite with the assignments applied to predicate-true rows; an
  * assignment to the PARTITION column moves rows, so destination
  * partitions join the touched set.
  */
case class GraftUpdateCommand(
    options: Map[String, String],
    stmtOut: Seq[Attribute],
    assignments: Seq[Assignment],
    condition: Option[Expression],
    table: Option[org.apache.spark.sql.catalyst.TableIdentifier] = None)
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (tgt, v, w, partCol, fresh) = GraftDml.freshTarget(spark, options)
    val cond = condition
      .map(c => coalesce(GraftDml.rebound(c, stmtOut, fresh), lit(false)))
      .getOrElse(lit(true))
    val assign = GraftDml.assignmentsByName(assignments, stmtOut, fresh)
    val srcParts = GraftDml.partVals(tgt.filter(cond), col(partCol))
    if (srcParts.isEmpty) return Seq.empty
    // rows may MOVE partitions when the partition column is assigned
    val destParts = assign.get(partCol) match {
      case Some(pv) => GraftDml.partVals(tgt.filter(cond), pv)
      case None => Nil
    }
    val touched = (srcParts ++ destParts).distinct.sorted
    val base = tgt.filter(col(partCol).isin(touched: _*))
    val updated = base.select(tgt.columns.map { c =>
      assign.get(c) match {
        case Some(value) => when(cond, value).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*)
    GraftDml.commitRewrite(updated, partCol, touched, w, v)
    GraftDml.refreshName(spark, table)
    Seq.empty
  }
}

/** `MERGE INTO t USING s ON cond WHEN ...` — the general copy-on-write
  * merge over the partitions the join names. See [[GraftDmlRule]] for
  * the supported clause set and the multiple-match contract.
  */
case class GraftMergeCommand(
    options: Map[String, String],
    stmtOut: Seq[Attribute],
    source: LogicalPlan,
    mergeCondition: Expression,
    matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction],
    table: Option[org.apache.spark.sql.catalyst.TableIdentifier] = None)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  private val Marker = "__graft_src_marker"
  private val Tid = "__graft_tid"
  private val AIdx = "__graft_aidx"

  override def run(spark: SparkSession): Seq[Row] = {
    val (tgt, v, w, partCol, fresh) = GraftDml.freshTarget(spark, options)
    val src = Bridge.ofRows(spark, source).withColumn(Marker, lit(1L))
    val cond = GraftDml.rebound(mergeCondition, stmtOut, fresh)
    val freshByName = fresh.map(a => a.name -> a).toMap
    val pc = Bridge.column(freshByName(partCol))
    def actionCond(a: MergeAction): Option[Expression] = a match {
      case u: UpdateAction => u.condition
      case d: DeleteAction => d.condition
      case i: InsertAction => i.condition
      case other => throw new IllegalArgumentException(
        // star actions resolve to full assignment lists during
        // analysis — reaching here means the statement never resolved
        s"unresolved merge action: $other")
    }
    def actionAssign(a: MergeAction): Seq[Assignment] = a match {
      case u: UpdateAction => u.assignments
      case i: InsertAction => i.assignments
      case _ => Nil
    }
    def condColOf(a: MergeAction): Column = actionCond(a)
      .map(c => coalesce(GraftDml.rebound(c, stmtOut, fresh), lit(false)))
      .getOrElse(lit(true))

    // ---- one pass over the matched join: per-target-row cardinality
    // (two source matches for one target row = nondeterministic result
    // = typed error, the standard MERGE contract) + touched partitions
    val matches = tgt.withColumn(Tid, monotonically_increasing_id())
      .join(src, cond, "inner")
    val stats = matches.groupBy(col(Tid))
      .agg(count(lit(1)).as("__n"), first(pc).as("__pv"))
      .agg(max(col("__n")).as("mx"),
        collect_set(col("__pv")).as("pvs")).head
    if (!stats.isNullAt(0) && stats.getLong(0) > 1)
      throw new IllegalStateException(
        "MERGE failed: more than one source row matched a single " +
          "target row — the result would be nondeterministic; " +
          "de-duplicate the source on the join key")
    val matchedParts: Seq[Long] =
      if (stats.isNullAt(0)) Nil else stats.getSeq[Long](1)

    // ---- inserts: source rows with no target match, first-true
    // NOT MATCHED clause wins, unassigned columns become NULL
    val inserts: Option[DataFrame] = if (notMatchedActions.isEmpty) None
    else {
      val srcOnly = src.drop(Marker).join(tgt, cond, "left_anti")
      val idx = notMatchedActions.zipWithIndex.foldRight(lit(0)) {
        case ((a, i), els) => when(condColOf(a), lit(i + 1)).otherwise(els)
      }
      val picked = srcOnly.withColumn(AIdx, idx).filter(col(AIdx) > 0)
      val cols = fresh.map { attr =>
        notMatchedActions.zipWithIndex.foldLeft(
            lit(null).cast(attr.dataType)) { case (els, (a, i)) =>
          val assign = GraftDml.assignmentsByName(
            actionAssign(a), stmtOut, fresh)
          assign.get(attr.name) match {
            case Some(value) =>
              when(col(AIdx) === (i + 1), value).otherwise(els)
            case None => els
          }
        }.as(attr.name)
      }
      Some(picked.select(cols: _*))
    }
    val insertParts = inserts.map(df => GraftDml.partVals(df, col(partCol)))
      .getOrElse(Nil)

    // ---- partitions the NOT MATCHED BY SOURCE clauses touch: they
    // act on UNMATCHED target rows, which can sit in any partition —
    // the matched join alone must not bound the touched set
    val nmsParts: Seq[Long] = if (notMatchedBySourceActions.isEmpty) Nil
    else {
      val unmatched = tgt.join(src, cond, "left_anti")
      val any = notMatchedBySourceActions.map(condColOf).reduce(_ || _)
      GraftDml.partVals(unmatched.filter(any), pc)
    }

    // ---- partitions an UPDATE (matched or by-source) moves rows INTO
    val movedParts = (matchedActions.map(a => (a, "inner"))
      ++ notMatchedBySourceActions.map(a => (a, "left_anti"))).collect {
      case (u: UpdateAction, joinType)
          if GraftDml.assignmentsByName(u.assignments, stmtOut, fresh)
            .contains(partCol) =>
        val assign = GraftDml.assignmentsByName(u.assignments, stmtOut, fresh)
        GraftDml.partVals(
          tgt.join(src, cond, joinType).filter(condColOf(u)), assign(partCol))
    }.flatten

    val touched = (matchedParts ++ insertParts ++ nmsParts ++ movedParts)
      .distinct.sorted
    if (touched.isEmpty) return Seq.empty

    // ---- rewrite the touched partitions: left join against the
    // source; ordered first-true action decides update / delete / keep
    // (matched actions on matched rows, NOT-MATCHED-BY-SOURCE actions
    // on the rest); attribute-based selection — source column NAMES
    // may collide with the target's, exprIds never do
    val base = tgt.filter(pc.isin(touched: _*))
    val joined = base.join(src, cond, "left_outer")
    val isMatched = col(Marker).isNotNull
    val ordered: Seq[(MergeAction, Int, Column)] =
      (matchedActions.map(a => a -> isMatched)
        ++ notMatchedBySourceActions.map(a => a -> !isMatched))
        .zipWithIndex.map { case ((a, side), i) =>
          (a, i + 1, side && condColOf(a))
        }
    val idx = ordered.foldRight(lit(0)) { case ((_, i, c), els) =>
      when(c, lit(i)).otherwise(els)
    }
    val deleteIdxs = ordered.collect { case (_: DeleteAction, i, _) => i }
    val withIdx = joined.withColumn(AIdx, idx)
    val survivors =
      if (deleteIdxs.isEmpty) withIdx
      else withIdx.filter(not(col(AIdx).isin(deleteIdxs.map(_.toLong): _*)))
    val cols = fresh.map { attr =>
      ordered.foldLeft(Bridge.column(attr)) { case (els, (a, i, _)) =>
        a match {
          case u: UpdateAction =>
            val assign = GraftDml.assignmentsByName(
              u.assignments, stmtOut, fresh)
            assign.get(attr.name) match {
              case Some(value) =>
                when(col(AIdx) === i, value).otherwise(els)
              case None => els
            }
          case _ => els
        }
      }.as(attr.name)
    }
    val rewritten = survivors.select(cols: _*)
    val content = inserts match {
      case Some(ins) => rewritten.unionByName(ins)
      case None => rewritten
    }
    GraftDml.commitRewrite(content, partCol, touched, w, v)
    GraftDml.refreshName(spark, table)
    Seq.empty
  }
}
