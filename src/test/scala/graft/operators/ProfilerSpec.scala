package graft.operators

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.Row

class ProfilerSpec extends SparkSpec {

  test("one-pass profile reports exact nulls/rows and sane estimates") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val prof = Profiler.profile(docs).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(prof.keySet ==
      Set("doc_id", "text", "lang", "source", "n_chars"))
    val docId = prof("doc_id")
    assert(docId.getAs[Long]("n_rows") == 500L)
    assert(docId.getAs[Long]("n_nulls") == 0L)
    // HLL++ estimate within 10% of the true 500 distinct ids
    val est = docId.getAs[Long]("approx_distinct")
    assert(est > 450 && est < 550, s"est=$est")
    assert(prof("lang").getAs[Long]("approx_distinct") == 5L)
    assert(prof("doc_id").getAs[String]("min_value") == "0")
    // single aggregation: one scan regardless of column count
    val plan = Profiler.profile(docs).queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).size == 1)
  }
}
