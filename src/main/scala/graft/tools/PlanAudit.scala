package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the physical plan of every registered query and
  * flags scale hazards — cartesian products, missing pushed filters,
  * single-partition windows (none allowed anywhere; the WAL's dense lsn
  * is computed via range-partition + zipWithIndex, not a global
  * window). Run:
  *   sbt "runMain graft.tools.PlanAudit /root/testdata/sf0.001 [name...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var hazards = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "globalWindow" -> (plan.contains("Window") &&
            plan.contains("SinglePartition"))
        ).collect { case (f, true) => f }
        hazards += flags.size
        println(s"== $name ${if (flags.isEmpty) "OK" else "HAZARD " + flags.mkString(",")}")
        if (only.nonEmpty || flags.nonEmpty) println(plan)
      }
    }
    println(s"hazards: $hazards")
    spark.stop()
  }
}
