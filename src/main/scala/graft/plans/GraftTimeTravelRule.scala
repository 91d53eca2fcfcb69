package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.TimestampType

/** SQL time travel on graft views and tables — `SELECT ... FROM t
  * VERSION AS OF 3` and `FOR SYSTEM_TIME AS OF '...'` — the syntax
  * Spark parses for every relation but resolves only for DSv2
  * catalogs. This rule runs in the HINTS batch (before resolution —
  * `ResolveRelations` throws `UNSUPPORTED_FEATURE.TIME_TRAVEL` for a
  * temp view, so a post-resolution hook would never see the node),
  * resolves the still-unresolved name through the session catalog,
  * and — when it names a graft relation — splices in the pinned
  * snapshot via the format's own `versionAsOf`/`timestampAsOf`
  * options ([[graft.sources.GraftDataSource]]); an aged-out pin
  * answers the typed RetentionException exactly like the option
  * spelling. A time-travel clause OVERRIDES a pin already present in
  * the view's options (the clause is the more specific ask).
  *
  * `FOR SYSTEM_TIME AS OF` accepts any foldable timestamp expression
  * (cast through the session time zone — the SQL-standard reading);
  * non-foldable or non-graft targets pass through untouched so
  * Spark's own error paths keep their wording.
  */
case class GraftTimeTravelRule(session: SparkSession)
  extends Rule[LogicalPlan] {

  private def graftOptions(name: Seq[String]): Option[Map[String, String]] =
    GraftDml.optionsForName(session, name).map(_._1)

  /** Evaluate the AS OF expression: it arrives UNRESOLVED (this
    * rewrite runs at parse time), so resolve + fold it through a
    * one-row select — constant-folded on the driver, no job. A
    * non-constant expression (column references) answers None and the
    * node passes through to Spark's own error wording.
    */
  private def tsMillis(e: Expression): Option[Long] =
    try {
      val cast = Cast(e, TimestampType,
        Some(session.sessionState.conf.sessionLocalTimeZone))
      val row = session.range(1).select(Bridge.column(cast).as("ts")).head()
      Option(row.getAs[java.sql.Timestamp](0)).map(_.getTime)
    } catch { case _: Exception => None }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case tt: RelationTimeTravel => tt.relation match {
      case u: UnresolvedRelation => graftOptions(u.multipartIdentifier) match {
        case Some(opts) =>
          val base = session.read.format("graft").options(
            opts - "versionAsOf" - "versionasof"
              - "timestampAsOf" - "timestampasof")
          val pinned = (tt.version, tt.timestamp.flatMap(tsMillis)) match {
            case (Some(v), _) => Some(base.option("versionAsOf", v))
            case (_, Some(ms)) =>
              Some(base.option("timestampAsOf", ms.toString))
            case _ => None // non-foldable timestamp: Spark's own error
          }
          pinned.map(r => Bridge.logicalPlan(r.load())).getOrElse(tt)
        case None => tt
      }
      case _ => tt
    }
  }
}

/** The injection vehicle for [[GraftTimeTravelRule]]: a delegating
  * parser (`injectParser` — the Delta pattern). A rule can NOT do
  * this: the analyzer resolves (and rejects) `RelationTimeTravel`
  * over a temp view BEFORE any injectable batch sees the node, so the
  * rewrite must happen on the parsed tree. Every non-plan method
  * delegates verbatim.
  */
class GraftSqlParser(
    session: SparkSession,
    delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
  extends org.apache.spark.sql.catalyst.parser.ParserInterface {

  private lazy val rule = GraftTimeTravelRule(session)

  override def parsePlan(sqlText: String): LogicalPlan =
    // maintenance DDL first: OPTIMIZE / VACUUM / RESTORE exist in no
    // Spark grammar — anything unmatched falls straight through
    GraftMaintenanceParser.parse(session, sqlText)
      .getOrElse(rule(delegate.parsePlan(sqlText)))

  override def parseQuery(sqlText: String): LogicalPlan =
    rule(delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
}
