package graft.streaming

import graft.SparkSpec
import graft.evaluation.Purchases
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingPurchasesSpec extends SparkSpec {
  import spark.implicits._
  import StreamingPurchases.PurchaseRow

  test("streaming two-namespace purchases converge to the batch 2PC close") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Purchases
      .fromEvents(graft.tables.Tables.load(spark, Sf0001, "events"))
      .select("tid", "customer", "product", "price_cents")
      .as[PurchaseRow].collect()

    val input = MemoryStream[PurchaseRow]
    val qBal = StreamingPurchases.balances(spark, input.toDF()).writeStream
      .format("memory").queryName("p_bal").outputMode(OutputMode.Append()).start()
    val qInv = StreamingPurchases.inventory(spark, input.toDF()).writeStream
      .format("memory").queryName("p_inv").outputMode(OutputMode.Append()).start()
    try {
      rows.grouped(400).foreach { chunk =>
        input.addData(chunk.toSeq)
        qBal.processAllAvailable()
        qInv.processAllAvailable()
      }
      def streamedFinal(table: String) = spark.table(table)
        .groupBy(col("key"))
        .agg(max_by(col("value"), col("version")).as("value"),
          max(col("version")).cast("bigint").as("n_updates"))
        .as[(Long, Long, Long)].collect().map { case (k, v, n) => (k, (v, n)) }.toMap

      val batch = Purchases.committedState(Purchases.graph(spark, Sf0001))
      val batchBal = batch.filter(col("namespace") === Purchases.BalancesNs)
        .select("key", "value", "n_updates").as[(Long, Long, Long)]
        .collect().map { case (k, v, n) => (k, (v, n)) }.toMap
      val batchInv = batch.filter(col("namespace") === Purchases.InventoryNs)
        .select("key", "value", "n_updates").as[(Long, Long, Long)]
        .collect().map { case (k, v, n) => (k, (v, n)) }.toMap

      assert(streamedFinal("p_bal") == batchBal)
      assert(streamedFinal("p_inv") == batchInv)

      // the coupling, online: a purchase whose balance branch is fine
      // but whose product is discontinued must appear in NEITHER sink
      val vetoedTids = rows.filter(r =>
        r.product == Purchases.DiscontinuedProduct &&
          r.price_cents <= Purchases.CreditLimitCents).map(_.tid).toSet
      assert(vetoedTids.nonEmpty)
      val balTids = spark.table("p_bal").select("tid").as[Long].collect().toSet
      assert(balTids.intersect(vetoedTids).isEmpty)
    } finally { qBal.stop(); qInv.stop() }
  }
}
