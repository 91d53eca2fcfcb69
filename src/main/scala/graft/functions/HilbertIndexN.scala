package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** d-DIMENSIONAL Hilbert index: `(bigint ×d) → bigint` over coords
  * already quantized to [0, 2^bits) each — [[HilbertIndex2D]]'s
  * arbitrary-dimension sibling, closing the asymmetry where OPTIMIZE
  * clustering offered Z-order for any dimension count but the
  * stronger-locality Hilbert walk only on a plane.
  *
  * Algorithm: Skilling's transpose construction (John Skilling,
  * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — the
  * standard public d-dim formulation): undo the excess-work pass,
  * Gray-encode across axes, then bit-interleave the transposed form
  * MSB-first. Pure integer bit math (XOR/shift/mask), sequential
  * per-bit state — the textbook case for a native codegen'd
  * expression (a column-DSL spelling would expand to bits×d chained
  * conditionals). Unit steps along the curve are 2d-adjacent, so
  * equal-count file cuts cover strictly contiguous boxes in EVERY
  * clustered dimension — the property the slice-grid spec pins.
  *
  * NOTE: for d = 2 this curve is a reflection of [[HilbertIndex2D]]'s
  * classic xy→d walk — both are Hilbert curves (bijective, unit-step
  * adjacent) but not bit-identical; the 2-D kernel stays the d=2
  * spelling so existing layouts/oracles are unchanged.
  */
case class HilbertIndexN(children: Seq[Expression], bits: Int)
    extends Expression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2)
      TypeCheckResult.TypeCheckFailure(
        s"hilbertn wants >= 2 dimensions, got ${children.size}")
    else if (children.exists(_.dataType != LongType))
      TypeCheckResult.TypeCheckFailure(
        s"hilbertn expects bigint coords, got " +
          children.map(_.dataType.simpleString).mkString(", "))
    else if (bits < 1 || bits * children.size > 62)
      // the index packs bits*d bits into one signed long; bits<1 maps
      // everything to 0 — both silently corrupt the layout, so fail
      // at analysis time (same guard as Layout.zValue)
      TypeCheckResult.TypeCheckFailure(
        s"hilbertn bits=$bits x ${children.size} dims must fit a long " +
          "(bits >= 1, bits * dims <= 62)")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbertn"

  override def eval(input: InternalRow): Any = {
    val n = children.size
    val coords = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      coords(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertIndexN.hilbertNdEval(coords, bits)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val helper = HilbertIndexN.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val evals = children.map(_.genCode(ctx))
    val anyNull = evals.map(_.isNull).mkString(" || ")
    val arr = ctx.freshName("hcoords")
    val fill = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString("\n")
    ev.copy(code =
      code"""
         |${evals.map(_.code.toString).mkString("\n")}
         |boolean ${ev.isNull} = $anyNull;
         |long ${ev.value} = -1L;
         |if (!${ev.isNull}) {
         |  long[] $arr = new long[${children.size}];
         |  $fill
         |  ${ev.value} = $helper.hilbertNdEval($arr, $bits);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object HilbertIndexN {

  def apply(cols: Seq[Column], bits: Int): Column =
    Bridge.column(HilbertIndexN(cols.map(Bridge.expression), bits))

  /** Skilling AxesToTranspose + MSB-first interleave. Coords are
    * masked to `bits` (out-of-range wraps instead of corrupting the
    * walk — same contract as the 2-D kernel and zValue).
    */
  def hilbertNdEval(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val mask = (1L << bits) - 1
    val x = new Array[Long](n)
    var i = 0
    while (i < n) { x(i) = coords(i) & mask; i += 1 }
    // inverse undo
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose -> index: bit b of axis i lands at b*n + (n-1-i)
    var h = 0L
    var b = 0
    while (b < bits) {
      i = 0
      while (i < n) {
        h |= ((x(i) >> b) & 1L) << (b * n + (n - 1 - i))
        i += 1
      }
      b += 1
    }
    h
  }
}
