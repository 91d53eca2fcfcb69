package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY audit — the constraint pass every
  * training-data pipeline runs before (and after) every transform:
  * nullability, ranges, accepted vocabularies, uniqueness, asserted
  * in ONE job and reported as a table of (check, n_violations,
  * passed) rows a gate can diff or a scheduler can alert on.
  *
  * Scale shape: every row-level check compiles to a conditional-sum
  * aggregate over the same single scan — adding a check adds a column
  * to one map-side-combinable aggregate, not a pass. Uniqueness needs
  * distinct counting and joins the SAME aggregate as
  * `count_distinct` (Catalyst plans multi-distinct via Expand, still
  * one scan). Nothing is collected; the report is |checks| rows.
  *
  * The reference's evaluation harness asserts invariants imperatively
  * per record (tspoon `evaluation/` consistency checks); here the
  * invariants are data, so the same audit runs over any table.
  */
object DataQuality {

  /** A named constraint compiled into violation-count expressions. */
  sealed trait Check {
    def name: String
    /** violation counter aggregate (rows failing the constraint);
      * None for checks that need their own aggregate form. */
    def violations: Column
    /** per-ROW violation predicate, when the check is row-decidable
      * (everything except [[Unique]], a table-level property) — the
      * basis of [[route]]'s quarantine decision. */
    def rowViolation: Option[Column] = None
  }

  /** Column must never be null. */
  final case class NotNull(c: String) extends Check {
    val name = s"not_null($c)"
    def violations: Column = sum(when(col(c).isNull, 1L).otherwise(0L))
    override def rowViolation: Option[Column] = Some(col(c).isNull)
  }

  /** Column must lie in [lo, hi] (nulls are not range violations —
    * pair with [[NotNull]] to forbid them). */
  final case class InRange(c: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range($c,$lo,$hi)"
    def violations: Column =
      sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L).otherwise(0L))
    override def rowViolation: Option[Column] =
      Some(col(c).isNotNull && (col(c) < lo || col(c) > hi))
  }

  /** Column values must come from the accepted vocabulary. */
  final case class AcceptedValues(c: String, values: Seq[String]) extends Check {
    val name = s"accepted_values($c)"
    def violations: Column =
      sum(when(col(c).isNotNull && !col(c).isin(values: _*), 1L).otherwise(0L))
    override def rowViolation: Option[Column] =
      Some(col(c).isNotNull && !col(c).isin(values: _*))
  }

  /** Column (tuple) must be unique across the table: violations =
    * n_rows − n_distinct (each duplicate beyond the first counts). */
  final case class Unique(cs: Seq[String]) extends Check {
    val name = s"unique(${cs.mkString(",")})"
    def violations: Column =
      count(lit(1)) - count_distinct(col(cs.head), cs.tail.map(col): _*)
  }

  /** Rows must satisfy an arbitrary boolean predicate. */
  final case class Satisfies(label: String, predicate: Column) extends Check {
    val name = s"satisfies($label)"
    def violations: Column =
      sum(when(!coalesce(predicate, lit(false)), 1L).otherwise(0L))
    override def rowViolation: Option[Column] =
      Some(!coalesce(predicate, lit(false)))
  }

  /** ROW-LEVEL routing — the dead-letter discipline around every
    * ingest: each row gains (dq_passed, dq_reason) where `dq_reason`
    * is the FIRST failing row-decidable check in the caller's check
    * order (deterministic; null when clean). One narrow projection —
    * no aggregate, no shuffle; quarantine = `filter(!dq_passed)`,
    * the clean continuation = `filter(dq_passed)`, both from the same
    * scan. [[Unique]] checks are table-level and don't route (pair
    * with keep-first dedup for per-row duplicate handling).
    */
  def route(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val reasons = checks.flatMap(c =>
      c.rowViolation.map(v => when(v, lit(c.name))))
    require(reasons.nonEmpty, "no row-decidable checks given")
    df.withColumn("dq_reason", coalesce(reasons: _*))
      .withColumn("dq_passed", col("dq_reason").isNull)
  }

  /** Run every check in one aggregate over one scan; returns
    * (check, n_rows, n_violations, passed) ordered by check name.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val aggs = count(lit(1)).as("__n") +:
      checks.zipWithIndex.map { case (c, i) =>
        coalesce(c.violations, lit(0L)).cast("long").as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val report = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), col(s"__v$i").as("n_violations"))
    }
    one
      .select(col("__n").as("n_rows"), explode(array(report: _*)).as("r"))
      .select(col("r.check"), col("n_rows"), col("r.n_violations"),
        (col("r.n_violations") === 0L).as("passed"))
      .orderBy("check")
  }
}
