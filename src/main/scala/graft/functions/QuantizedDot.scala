package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression for the ANN hot path: exact int64
  * milli-quantized dot product of two float vectors.
  *
  * Equivalent to the declarative
  * `aggregate(zip_with(quantize(a), quantize(b), _*_), 0L, _+_)` but
  * with `doGenCode` emitting a tight primitive loop — no per-element
  * lambda dispatch, no intermediate quantized arrays, no boxing. At
  * 100 TB of embeddings this is the kernel every candidate pair runs
  * through, which is the one place a custom expression beats composed
  * built-ins (preference order (b) in the design notes: native
  * Expression > UDF).
  *
  * Quantization matches `Similarity.quantize` / `functions.round`
  * (BigDecimal HALF_UP = half away from zero): q(v) = sign-adjusted
  * floor(|v·1000| + 0.5).
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_q expects two array<float> arguments, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += QuantizedDot.q(x.getFloat(i)) * QuantizedDot.q(y.getFloat(i))
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val qd = QuantizedDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $qd.q($x.getFloat($i)) * $qd.q($y.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  /** round-half-away-from-zero of v·1000, matching functions.round. */
  def q(v: Float): Long = {
    val d = v.toDouble * 1000.0
    if (d < 0) -math.floor(-d + 0.5).toLong else math.floor(d + 0.5).toLong
  }

  /** Helper for [[PqCells]]: the m sign-pattern cell ids in one pass
    * over the float array (bit p of cell j set iff q(v[j·subDim+p])
    * ≥ 0) — value-identical to the declarative transform/aggregate
    * fold, no per-element lambda dispatch.
    */
  def pqCellsEval(arr: ArrayData, m: Int, subDim: Int): ArrayData = {
    // pq_cells is SQL-registered with caller-supplied m/subDim: a short
    // array would otherwise read out of bounds (unchecked Platform.get
    // on the UnsafeArrayData codegen path — garbage cells, not an AIOOBE)
    if (arr.numElements() < m * subDim)
      throw new IllegalArgumentException(
        s"pq_cells: input has ${arr.numElements()} elements, " +
          s"need m*subDim = ${m * subDim}")
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var cell = 0L
      var p = 0
      while (p < subDim) {
        if (q(arr.getFloat(j * subDim + p)) >= 0) cell |= (1L << p)
        p += 1
      }
      out(j) = cell
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Helper for [[Sq8Dot]]: ADC dot of a full-precision query against
    * SQ8 codes, decoding `(c·2·maxabs) div 255 − maxabs` inline —
    * the product is non-negative so Java integer division IS the
    * floor the declarative spelling computes.
    */
  def sq8DotEval(qv: ArrayData, codes: ArrayData, maxabs: Long): Long = {
    val n = math.min(qv.numElements(), codes.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += q(qv.getFloat(i)) * (codes.getLong(i) * 2 * maxabs / 255 - maxabs)
      i += 1
    }
    acc
  }

  /** Helper for [[HilbertIndex2D]]: the classic xy→d walk — from the
    * top bit down, derive the quadrant, add its cell count, rotate
    * the frame. Inputs are masked to `bits` (out-of-range wraps
    * instead of corrupting the walk).
    */
  def hilbert2dEval(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Helper for [[CenteredSsd]]: the offset-invariant squared
    * distance between two equal-length long windows — two sum passes
    * + one diff pass, no per-element lambda dispatch. Callers guard
    * lengths == w (the expression returns null otherwise — silently
    * truncating but centering with factor w would produce a
    * plausible-looking, wrongly scaled distance).
    */
  def centeredSsdEval(a: ArrayData, b: ArrayData, w: Int): Long = {
    val n = math.min(math.min(a.numElements(), b.numElements()), w)
    var sa = 0L; var sb = 0L
    var i = 0
    while (i < n) { sa += a.getLong(i); sb += b.getLong(i); i += 1 }
    var acc = 0L
    i = 0
    while (i < n) {
      val d = a.getLong(i) * w - sa - (b.getLong(i) * w - sb)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Column form usable on any session (no registration needed). */
  def apply(a: Column, b: Column): Column =
    Bridge.column(QuantizedDot(Bridge.expression(a), Bridge.expression(b)))
}

/** Native exact int64 dot product: `(array<bigint>, array<bigint>) →
  * bigint` — the already-quantized sibling of [[QuantizedDot]], for
  * scans where both sides carry milli-quantized integer vectors (the
  * PQ Lloyd assignment join scores n·m·2^subDim candidate rows per
  * iteration; an interpreted zip_with/aggregate there IS the cost).
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_long expects two array<bigint> arguments, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotLong {
  /** Column form usable on any session (no registration needed). */
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotLong(Bridge.expression(a), Bridge.expression(b)))
}

/** Native offset-invariant window distance: `(array<bigint>,
  * array<bigint>) → bigint`, the Σ((w·x−Sₓ)−(w·y−S_y))² kernel the
  * time-series candidate-pair scan runs per pair.
  */
case class CenteredSsd(left: Expression, right: Expression, w: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"centered_ssd expects (array<bigint>, array<bigint>), got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "centered_ssd"
  // null (not a truncated distance) on windows whose length != w —
  // matching the declarative zip_with reference, which nulls on
  // length mismatch; a silently truncated sum still centered by w
  // would be a plausible-looking wrong distance
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != w || y.numElements() != w) null
    else QuantizedDot.centeredSsdEval(x, y, w)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qd = QuantizedDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""
         |if ($x.numElements() != $w || $y.numElements() != $w) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $qd.centeredSsdEval($x, $y, $w);
         |}
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CenteredSsd {
  def apply(a: Column, b: Column, w: Int): Column =
    Bridge.column(CenteredSsd(Bridge.expression(a), Bridge.expression(b), w))
}

/** Native 2-D Hilbert-curve index: `(bigint x, bigint y) → bigint`
  * distance along the order-`bits` Hilbert curve. Unlike the Z-order
  * interleave, EVERY unit step along the curve moves to a 4-adjacent
  * cell (no diagonal jumps across the key space), so range-partition
  * boundaries cut the space into strictly contiguous regions — the
  * strongest locality a 1-D sort key can give multi-column min/max
  * skipping. The per-bit rotation is inherently sequential, which is
  * exactly the case for a custom codegen'd expression over composing
  * built-ins (the declarative spelling would be a 16-step struct
  * fold through interpreted lambdas).
  */
case class HilbertIndex2D(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // bits outside [1, 31] silently corrupts the walk (bits<=0 skips
      // it and maps everything to 0; bits>31 overflows s*s) — fail at
      // analysis time, same guard as Layout.hilbertValue
      case (LongType, LongType) if bits < 1 || bits > 31 =>
        TypeCheckResult.TypeCheckFailure(
          s"hilbert2d bits must be in [1, 31], got $bits")
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hilbert2d expects (bigint, bigint), got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2d"
  override def nullSafeEval(a: Any, b: Any): Any =
    QuantizedDot.hilbert2dEval(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qd = QuantizedDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = $qd.hilbert2dEval($x, $y, $bits);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex2D {
  def apply(x: Column, y: Column, bits: Int): Column =
    Bridge.column(HilbertIndex2D(Bridge.expression(x), Bridge.expression(y), bits))
}

/** Native SQ8 asymmetric-distance dot: `(array<float> query,
  * array<long> codes, bigint maxabs) → bigint` — the compressed-scan
  * hot path as one codegen'd primitive loop (the interpreted
  * zip_with/aggregate spelling pays per-element lambda dispatch on
  * every candidate pair).
  */
case class Sq8Dot(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sq8_dot expects (array<float>, array<bigint>, bigint), got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sq8_dot"
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    QuantizedDot.sq8DotEval(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], c.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qd = QuantizedDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (x, y, z) =>
      s"${ev.value} = $qd.sq8DotEval($x, $y, $z);")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object Sq8Dot {
  def apply(qvec: Column, codes: Column, maxabs: Column): Column =
    Bridge.column(Sq8Dot(
      Bridge.expression(qvec), Bridge.expression(codes), Bridge.expression(maxabs)))
}

/** Native PQ cell assignment: `array<float> → array<long>` — the m
  * per-subspace sign-pattern codes ([[graft.operators.Similarity]]'s
  * product-quantization encode step) as one codegen'd primitive loop.
  */
case class PqCells(child: Expression, m: Int, subDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if m < 1 || subDim < 1 || subDim > 63 =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_cells needs m >= 1 and subDim in [1, 63], got m=$m subDim=$subDim")
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_cells expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_cells"
  override def nullSafeEval(arr: Any): Any =
    QuantizedDot.pqCellsEval(arr.asInstanceOf[ArrayData], m, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qd = QuantizedDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $qd.pqCellsEval($in, $m, $subDim);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqCells {
  def apply(vec: Column, m: Int, subDim: Int): Column =
    Bridge.column(PqCells(Bridge.expression(vec), m, subDim))
}

/** Native predicate for the semantic-dedup hot path: quantized cosine
  * threshold `dot_q(a,b)/√(nqA·nqB) ≥ milli/1000`, evaluated as the
  * exact integer comparison `dot > 0 ∧ dot²·10⁶ ≥ milli²·nqA·nqB`
  * (BigInteger — no precision loss at any vector scale).
  *
  * Exists because a composed `filter(dot > 0 && dec(dot)·dot·10⁶ ≥ …)`
  * gets inlined into the JOIN condition with the dot-product kernel
  * duplicated per reference (no common-subexpression elimination in
  * join predicates) plus per-row Decimal allocations — measured 3× the
  * cost of the whole candidate join at sf0.1. This expression computes
  * the dot ONCE per candidate pair and decides in place.
  */
case class QuantizedCosineGe(
    vecA: Expression, vecB: Expression,
    nqA: Expression, nqB: Expression,
    milli: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(vecA, vecB, nqA, nqB, milli)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "cos_q_ge"

  override def checkInputDataTypes(): TypeCheckResult =
    (vecA.dataType, vecB.dataType, nqA.dataType, nqB.dataType, milli.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _), LongType, LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "cos_q_ge expects (array<float>, array<float>, bigint, bigint, bigint)")
    }

  override def eval(input: InternalRow): Any = {
    val a = vecA.eval(input); val b = vecB.eval(input)
    val na = nqA.eval(input); val nb = nqB.eval(input)
    val m = milli.eval(input)
    if (a == null || b == null || na == null || nb == null || m == null) null
    else QuantizedCosineGe.ge(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      na.asInstanceOf[Long], nb.asInstanceOf[Long], m.asInstanceOf[Long])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val helper = QuantizedCosineGe.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val evals = children.map(_.genCode(ctx))
    val anyNull = evals.map(_.isNull).mkString(" || ")
    val call = s"$helper.ge(${evals.map(_.value).mkString(", ")})"
    ev.copy(code =
      code"""
         |${evals(0).code}
         |${evals(1).code}
         |${evals(2).code}
         |${evals(3).code}
         |${evals(4).code}
         |boolean ${ev.isNull} = $anyNull;
         |boolean ${ev.value} = false;
         |if (!${ev.isNull}) {
         |  ${ev.value} = $call;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vecA = newChildren(0), vecB = newChildren(1),
      nqA = newChildren(2), nqB = newChildren(3), milli = newChildren(4))
}

object QuantizedCosineGe {
  private val Million = java.math.BigInteger.valueOf(1000000L)

  /** dot > 0 ∧ dot²·10⁶ ≥ m²·nqa·nqb, exact at any magnitude. */
  def ge(a: ArrayData, b: ArrayData, nqa: Long, nqb: Long, m: Long): Boolean = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += QuantizedDot.q(a.getFloat(i)) * QuantizedDot.q(b.getFloat(i))
      i += 1
    }
    if (dot <= 0L) return false
    val d = java.math.BigInteger.valueOf(dot)
    val lhs = d.multiply(d).multiply(Million)
    val rhs = java.math.BigInteger.valueOf(m * m)
      .multiply(java.math.BigInteger.valueOf(nqa))
      .multiply(java.math.BigInteger.valueOf(nqb))
    lhs.compareTo(rhs) >= 0
  }

  def apply(a: Column, b: Column, nqa: Column, nqb: Column, milli: Long): Column =
    Bridge.column(QuantizedCosineGe(
      Bridge.expression(a), Bridge.expression(b),
      Bridge.expression(nqa), Bridge.expression(nqb),
      org.apache.spark.sql.catalyst.expressions.Literal(milli)))
}

/** Session-extension wiring: `spark.sql("SELECT dot_q(a, b) ...")`
  * after `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. For
  * driver-owned sessions, [[GraftFunctions.register]] injects the same
  * function at runtime.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotQDescriptor)
    ext.injectFunction(GraftFunctions.cosQGeDescriptor)
    ext.injectFunction(GraftFunctions.sq8DotDescriptor)
    ext.injectFunction(GraftFunctions.pqCellsDescriptor)
    ext.injectFunction(GraftFunctions.hilbert2dDescriptor)
    ext.injectOptimizerRule(_ => graft.plans.QuantizedDotRewrite)
    // SQL DML on the manifest store: INSERT INTO / INSERT OVERWRITE a
    // `USING graft` view become manifest commits instead of the raw
    // parquet write DataSourceAnalysis would plan (which would bypass
    // the manifest — see GraftInsertRule)
    ext.injectPostHocResolutionRule(s => graft.plans.GraftInsertRule(s))
    // row-level SQL DML: DELETE FROM / UPDATE / MERGE INTO a USING-
    // graft view become copy-on-write partition rewrites in one
    // atomic manifest commit (left alone they fail at planning —
    // Spark only plans these statements for DSv2 tables)
    ext.injectPostHocResolutionRule(s => graft.plans.GraftDmlRule(s))
    // SQL time travel (VERSION AS OF / FOR SYSTEM_TIME AS OF) on
    // graft relations: rewritten on the PARSED tree — the analyzer
    // resolves (and rejects) RelationTimeTravel over a temp view
    // before any injectable rule batch sees the node, so a delegating
    // parser (the Delta pattern) is the only injection point early
    // enough
    ext.injectParser((s, delegate) => new graft.plans.GraftSqlParser(s, delegate))
    // metadata-tier table functions: DESCRIBE HISTORY / file
    // inventory as plain SQL (zero data-file opens, zero jobs)
    ext.injectTableFunction(GraftTableFunctions.historyDescriptor)
    ext.injectTableFunction(GraftTableFunctions.filesDescriptor)
  }
}

object GraftFunctions {
  private[functions] val dotQDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_q"),
    new ExpressionInfo(classOf[QuantizedDot].getName, "dot_q"),
    (children: Seq[Expression]) => QuantizedDot(children(0), children(1))
  )

  private[functions] val cosQGeDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cos_q_ge"),
    new ExpressionInfo(classOf[QuantizedCosineGe].getName, "cos_q_ge"),
    (children: Seq[Expression]) => QuantizedCosineGe(
      children(0), children(1), children(2), children(3), children(4))
  )

  private def intArg(e: Expression, name: String): Int = {
    require(e.foldable, s"$name must be a literal integer")
    e.eval().asInstanceOf[Number].intValue()
  }

  private[functions] val sq8DotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sq8_dot"),
    new ExpressionInfo(classOf[Sq8Dot].getName, "sq8_dot"),
    (children: Seq[Expression]) => Sq8Dot(children(0), children(1), children(2))
  )

  private[functions] val pqCellsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_cells"),
    new ExpressionInfo(classOf[PqCells].getName, "pq_cells"),
    (children: Seq[Expression]) => PqCells(children(0),
      intArg(children(1), "m"), intArg(children(2), "subDim"))
  )

  private[functions] val hilbert2dDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hilbert2d"),
    new ExpressionInfo(classOf[HilbertIndex2D].getName, "hilbert2d"),
    (children: Seq[Expression]) => HilbertIndex2D(
      children(0), children(1), intArg(children(2), "bits"))
  )

  /** Idempotent runtime registration on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(dotQDescriptor, cosQGeDescriptor, sq8DotDescriptor,
      pqCellsDescriptor, hilbert2dDescriptor).foreach {
      case (id, info, builder) => Bridge.registerFunction(spark, id, info, builder)
    }
  }
}
