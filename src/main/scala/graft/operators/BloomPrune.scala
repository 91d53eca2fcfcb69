package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, IntegerType, LongType, ShortType}

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

  /** The filter domain is the 64-bit `xxhash64` of the key, NOT a
    * numeric cast: `cast('long')` on a string key yields null, and
    * `mightContain(null)` is null — the filter would silently drop
    * EVERY fact row while the scaladoc promises bit-identical join
    * results. Hashing keeps the predicate codegen'd for any key type;
    * a 64-bit hash collision behaves exactly like a Bloom false
    * positive (the exact join behind the filter removes it), so the
    * bit-identical guarantee is unconditional. xxhash64 is
    * width-sensitive, so [[prunedJoin]] widens integral keys to long
    * on BOTH sides before building/probing; standalone
    * [[bloomOf]]/[[mightContain]] callers must feed the same key type
    * to both (or pre-widen the same way).
    */
  private def hashedKey(key: Column): Column = xxhash64(key)

  private def widen(key: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType => key.cast("long")
    case _ => key
  }

  private def keyType(df: DataFrame, key: Column): DataType =
    df.select(key).schema.head.dataType

  /** Build a Bloom filter of the dimension keys (distributed
    * aggregation; only the filter's bytes reach the driver —
    * n·log2(1/fpp)·1.44 bits, model-sized, never the keys). Works for
    * any key type: the filter holds xxhash64 of the key — probe with
    * [[mightContain]] over the SAME key type (or pre-widened integral).
    */
  def bloomOf(
      dim: DataFrame, dimKey: Column,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = dim
      .select(hashedKey(dimKey).as("__k"))
      .stat.bloomFilter("__k", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** The membership predicate as a codegen'd Catalyst expression over
    * the serialized filter (a binary literal — Spark's own
    * `BloomFilterMightContain`, the same expression its runtime-filter
    * rewrite injects), probing with the key's xxhash64.
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      Bridge.expression(hashedKey(key))))

  /** Equi-join with a Bloom pre-filter on the fact side: build the
    * filter from the (already filtered) dimension, prune the fact
    * scan, then join exactly. `expectedItems` sizes the filter — a
    * low estimate only raises the false-positive rate (more fact rows
    * shuffle), never changes the result. Key types must agree across
    * sides up to integral width (both widened to long); any other
    * mismatch would hash disjointly and is rejected fast instead of
    * returning an empty join.
    */
  def prunedJoin(
      fact: DataFrame, factKey: Column,
      dim: DataFrame, dimKey: Column,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val (ft, dt) = (keyType(fact, factKey), keyType(dim, dimKey))
    val (fk, dk) = (widen(factKey, ft), widen(dimKey, dt))
    require(
      keyType(fact, fk) == keyType(dim, dk),
      s"join key types must match up to integral width, got $ft vs $dt")
    val bytes = bloomOf(dim, dk, expectedItems, fpp)
    fact.filter(mightContain(bytes, fk))
      .join(dim, factKey === dimKey)
  }
}
