package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryComparison, Expression, Literal}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}

/** Plan auditor: prints the physical plan of every registered query and
  * flags scale hazards:
  *
  *  - `CartesianProduct` — never allowed;
  *  - `globalWindow` — a Window over SinglePartition (the WAL's dense
  *    lsn is range-partition + zipWithIndex, never a global window);
  *  - `unpushedFilter` — a FilterExec sitting DIRECTLY on a parquet
  *    scan whose PushedFilters is empty although the condition has a
  *    pushable column-vs-literal comparison: at 100 TB that scan
  *    decodes every page it could have skipped;
  *  - `shuffleBudget` — the query's shuffle-exchange count exceeds its
  *    recorded budget (`tools/plan_budgets.txt`, committed): a NEW
  *    Exchange creeping into a previously-audited plan is exactly the
  *    regression a string eyeball misses. Run with `--write-budgets`
  *    after an intentional plan change to re-baseline; queries without
  *    a recorded budget report their count as `NEW` (not a hazard) so
  *    adding a gate never reds the audit retroactively.
  *
  * The shuffle count parses the EXECUTED plan's string: exchanges are
  * inserted by EnsureRequirements (absent from `sparkPlan`) and the
  * AQE wrapper hides children from `collect` — the printed initial
  * plan is the one stable pre-execution view of them. AQE only ever
  * removes exchanges at run time, so the static count is the upper
  * bound. The unpushed-filter tree check runs on `sparkPlan` (scans
  * get their pushdown at strategy time). Run:
  *   sbt "runMain graft.tools.PlanAudit /root/testdata/sf0.001 [--write-budgets] [name...]"
  */
object PlanAudit {

  private val BudgetFile = "tools/plan_budgets.txt"

  /** A shuffle Exchange node in a printed plan: the bare word at a node
    * position (not BroadcastExchange/ReusedExchange, which keep their
    * prefixes in toString).
    */
  private val ShuffleNode =
    """(?<![A-Za-z])Exchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)""".r

  private def pushableComparison(e: Expression): Boolean = e match {
    case cmp: BinaryComparison => (cmp.left, cmp.right) match {
      case (_: Attribute, _: Literal) => true
      case (_: Literal, _: Attribute) => true
      case _ => false
    }
    case _ => e.children.exists(pushableComparison)
  }

  private def hazardsOf(phys: SparkPlan, planStr: String): Seq[String] = {
    val unpushed = phys.collect {
      case f: FilterExec => f.child match {
        case s: FileSourceScanExec
          if s.metadata.get("PushedFilters").contains("[]") &&
            pushableComparison(f.condition) => 1
        case _ => 0
      }
    }.sum
    Seq(
      "CartesianProduct" -> planStr.contains("CartesianProduct"),
      "globalWindow" -> (planStr.contains("Window") &&
        planStr.contains("SinglePartition")),
      s"unpushedFilter($unpushed)" -> (unpushed > 0)
    ).collect { case (f, true) => f }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val writeBudgets = args.contains("--write-budgets")
    val only = args.drop(1).filterNot(_ == "--write-budgets").toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val budgets: Map[String, Int] =
      if (!new java.io.File(BudgetFile).exists()) Map.empty
      else scala.io.Source.fromFile(BudgetFile).getLines()
        .filter(_.nonEmpty).map { l =>
          val Array(n, c) = l.split(' '); n -> c.toInt
        }.toMap

    var hazards = 0
    val counts = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        val qe = fn(spark, sfDir).queryExecution
        val phys = qe.sparkPlan
        val planStr = qe.executedPlan.toString
        // shuffle Exchange node lines; "BroadcastExchange" (good) and
        // "ReusedExchange"/"AQEShuffleRead" don't match the bare word
        val shuffles = ShuffleNode.findAllIn(planStr).size
        counts += name -> shuffles
        val budget = budgets.get(name)
        val over = budget.exists(shuffles > _)
        val flags = hazardsOf(phys, planStr) ++
          (if (over) Seq(s"shuffleBudget($shuffles>${budget.get})") else Nil)
        hazards += flags.size
        val budgetNote = budget
          .map(b => s"shuffles=$shuffles/$b")
          .getOrElse(s"shuffles=$shuffles/NEW")
        println(s"== $name ${
          if (flags.isEmpty) s"OK $budgetNote"
          else s"HAZARD ${flags.mkString(",")} $budgetNote"}")
        if (only.nonEmpty || flags.nonEmpty) println(planStr)
      }
    }
    if (writeBudgets && only.isEmpty) {
      val body = counts.sortBy(_._1)
        .map { case (n, c) => s"$n $c" }.mkString("", "\n", "\n")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(BudgetFile), body)
      println(s"budgets written: ${counts.size} -> $BudgetFile")
    }
    println(s"hazards: $hazards")
    spark.stop()
  }
}
