package graft.tgraph

import graft.SparkSpec
import graft.streaming.StreamingPurchases
import graft.streaming.StreamingPurchases.PurchaseRow
import graft.tgraph.query.{MultiQueryServer, QueryClient, QueryServer}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** One live endpoint over BOTH namespaces of the purchases graph
  * (reference `tgraph/query/MultiStateQuery.java` at the serving
  * tier): namespace-tagged POINT/PRED answers, each pinned to one
  * committed epoch of its own namespace, consistent while both
  * streams keep advancing.
  */
class MultiQueryServerSpec extends SparkSpec {
  import spark.implicits._

  private val RowsRe = """\[(-?\d+),(-?\d+)\]""".r
  private val BatchRe = """"batch":(-?\d+)""".r

  private def parse(resp: String): (Long, Map[Long, Long]) = {
    val b = BatchRe.findFirstMatchIn(resp).map(_.group(1).toLong)
      .getOrElse(fail(s"no batch id in $resp"))
    (b, RowsRe.findAllMatchIn(resp)
      .map(m => m.group(1).toLong -> m.group(2).toLong).toMap)
  }

  private def eventually[T](maxMs: Long = 20000)(f: => Option[T]): T = {
    val deadline = System.nanoTime() + maxMs * 1000000L
    var out: Option[T] = f
    while (out.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(50); out = f
    }
    out.getOrElse(fail(s"condition not met within $maxMs ms"))
  }

  test("namespace-tagged answers from BOTH running stores: one pinned " +
    "epoch per answer, both namespaces batch-consistent across " +
    "advancing epochs") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-mqsrv").toString
    // a purchase workload exercising both vetoes
    val purchases = (1 to 400).map { i =>
      PurchaseRow(i.toLong, i % 23L, i % 50L,
        if (i % 17 == 0) 13000L else (i % 90L) * 100L)
    }
    val (firstHalf, secondHalf) = purchases.splitAt(200)

    val input = MemoryStream[PurchaseRow]
    def start(name: String, out: org.apache.spark.sql.DataFrame) =
      out.writeStream
        .format("parquet")
        .option("path", s"$dir/out-$name")
        .option("checkpointLocation", s"$dir/ckpt-$name")
        .outputMode(OutputMode.Append())
        .start()
    val qBal = start("balances",
      StreamingPurchases.balances(spark, input.toDS().toDF()).toDF())
    val qInv = start("inventory",
      StreamingPurchases.inventory(spark, input.toDS().toDF()).toDF())
    try {
      input.addData(firstHalf)
      qBal.processAllAvailable(); qInv.processAllAvailable()

      val srv = new MultiQueryServer(Map(
        "balances" -> new QueryServer(spark, s"$dir/ckpt-balances", refreshMillis = 50),
        "inventory" -> new QueryServer(spark, s"$dir/ckpt-inventory", refreshMillis = 50)))
      try {
        eventually() {
          if (srv.servedBatchId("balances") >= 0
            && srv.servedBatchId("inventory") >= 0) Some(()) else None
        }
        def sinkState(name: String): Map[Long, Long] =
          spark.read.parquet(s"$dir/out-$name")
            .groupBy(col("key"))
            .agg(max_by(col("value"), col("tid")).as("v"))
            .as[(Long, Long)].collect().toMap
        val bal1 = sinkState("balances")
        val inv1 = sinkState("inventory")
        val bBal1 = srv.servedBatchId("balances")
        val bInv1 = srv.servedBatchId("inventory")

        val c = new QueryClient("localhost", srv.boundPort)
        try {
          // each answer pins ONE epoch of ITS namespace and tags itself
          val balResp = c.request(s"NS balances POINT ${bal1.keys.mkString(",")}")
          assert(balResp.contains(""""ns":"balances""""))
          val (bb, balRows) = parse(balResp)
          assert(bb == bBal1 && balRows == bal1)
          val invResp = c.request(s"NS inventory POINT ${inv1.keys.mkString(",")}")
          assert(invResp.contains(""""ns":"inventory""""))
          val (bi, invRows) = parse(invResp)
          assert(bi == bInv1 && invRows == inv1)

          // namespaces are INDEPENDENT stores: the same key answers
          // per-namespace, never a mixed row set
          val shared = bal1.keySet.intersect(inv1.keySet)
          shared.take(3).foreach { k =>
            val (_, b) = parse(c.request(s"NS balances POINT $k"))
            val (_, i) = parse(c.request(s"NS inventory POINT $k"))
            assert(b.get(k).contains(bal1(k)) && i.get(k).contains(inv1(k)))
          }

          // both streams advance; each namespace's served epoch moves
          // forward and its answers track its OWN new committed state
          input.addData(secondHalf)
          qBal.processAllAvailable(); qInv.processAllAvailable()
          val (bBal2, bInv2) = eventually() {
            val b = srv.servedBatchId("balances")
            val i = srv.servedBatchId("inventory")
            if (b > bBal1 && i > bInv1) Some((b, i)) else None
          }
          val bal2 = sinkState("balances")
          val inv2 = sinkState("inventory")
          val (bb2, balRows2) = parse(
            c.request(s"NS balances POINT ${bal2.keys.mkString(",")}"))
          assert(bb2 == bBal2 && balRows2 == bal2,
            "balances answer not batch-consistent after the epoch advance")
          val (bi2, invRows2) = parse(
            c.request(s"NS inventory POINT ${inv2.keys.mkString(",")}"))
          assert(bi2 == bInv2 && invRows2 == inv2,
            "inventory answer not batch-consistent after the epoch advance")

          // PRED is namespace-tagged too, pinned the same way
          val (pb, pRows) = parse(c.request("NS inventory PRED LE -5"))
          assert(pb == bInv2 && pRows == inv2.filter(_._2 <= -5L))

          // protocol errors: untagged and unknown-namespace requests
          assert(c.request("COUNT").contains("error"))
          assert(c.request("NS nope COUNT").contains("error"))
        } finally c.close()
      } finally srv.close()
    } finally { qBal.stop(); qInv.stop() }
    graft.sources.FileIO.deleteScratch(new java.io.File(dir))
  }
}
