package graft.plans

import graft.SparkSpec
import graft.sources.FileIO
import org.apache.spark.sql.functions._

class TtProbe2Spec extends SparkSpec {

  test("probe: hint rule firing + catalog-table DML plan shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ttp2").toString
    spark.range(0, 100).select(
      col("id").as("event_id"), pmod(col("id"), lit(4L)).as("p"))
      .write.format("graft").option("partCol", "p").mode("append").save(dir)
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW ttp2_v USING graft " +
        s"OPTIONS (path '$dir', partCol 'p')")
    // 1. does the rule's lookup path work outside the analyzer?
    val viaTable = GraftDml.target(
      org.apache.spark.sql.graftbridge.Bridge.logicalPlan(
        spark.table("ttp2_v")))
    info(s"target(table(ttp2_v)) = ${viaTable.map(_._1).toString.take(200)}")
    // 2. catalog table DELETE plan
    spark.sql("DROP TABLE IF EXISTS ttp2_cat")
    spark.sql(
      s"CREATE TABLE ttp2_cat USING graft OPTIONS (path '$dir', partCol 'p')")
    val parsed = spark.sessionState.sqlParser.parsePlan(
      "DELETE FROM ttp2_cat WHERE event_id < 10")
    val analyzed = try spark.sessionState.analyzer.executeAndCheck(
      parsed.asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan],
      new org.apache.spark.sql.catalyst.QueryPlanningTracker()).treeString
    catch { case e: Throwable => s"FAIL ${e.getMessage.take(300)}" }
    info(s"catalog DELETE analyzed:\n${analyzed.take(800)}")
    val selPlan = spark.table("ttp2_cat").queryExecution.analyzed.treeString
    info(s"catalog SELECT analyzed:\n${selPlan.take(600)}")
    spark.sql("DROP TABLE IF EXISTS ttp2_cat")
    FileIO.deleteScratch(new java.io.File(dir))
  }
}
