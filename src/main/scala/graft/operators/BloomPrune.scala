package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Runtime Bloom-filter join pruning — the shuffle reducer for
  * selective joins at 100 TB: when the dimension side is too large to
  * broadcast-hash-join but its KEY SET fits a Bloom filter (1M keys ≈
  * 1.2 MB at 1% fpp), build the filter distributed (one aggregate),
  * ship it as a literal into a narrow predicate on the fact scan, and
  * only the ~matching fraction of the fact table ever reaches the
  * join's shuffle. False positives cost nothing semantically — the
  * exact join behind the filter removes them — so results are
  * bit-identical to the unpruned join (the oracle IS the plain join).
  *
  * This is Spark's own InjectRuntimeFilter pattern made explicit and
  * composable: the probe side uses the codegen'd
  * `BloomFilterMightContain` expression, so the predicate runs inside
  * whole-stage codegen at scan time.
  */
object BloomPrune {

  /** Build a Bloom filter of the dimension keys (distributed
    * aggregation; only the filter's bytes reach the driver —
    * n·log2(1/fpp)·1.44 bits, model-sized, never the keys).
    */
  def bloomOf(
      dim: DataFrame, dimKey: Column,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = dim.select(dimKey.cast("long").as("__k"))
      .stat.bloomFilter("__k", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** The membership predicate as a codegen'd Catalyst expression over
    * the serialized filter (a binary literal — Spark's own
    * `BloomFilterMightContain`, the same expression its runtime-filter
    * rewrite injects).
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      Bridge.expression(key.cast("long"))))

  /** Equi-join with a Bloom pre-filter on the fact side: build the
    * filter from the (already filtered) dimension, prune the fact
    * scan, then join exactly. `expectedItems` sizes the filter — a
    * low estimate only raises the false-positive rate (more fact rows
    * shuffle), never changes the result.
    */
  def prunedJoin(
      fact: DataFrame, factKey: Column,
      dim: DataFrame, dimKey: Column,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bytes = bloomOf(dim, dimKey, expectedItems, fpp)
    fact.filter(mightContain(bytes, factKey))
      .join(dim, factKey === dimKey)
  }
}
