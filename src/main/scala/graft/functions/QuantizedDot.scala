package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
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

  /** Column form usable on any session (no registration needed). */
  def apply(a: Column, b: Column): Column =
    Bridge.column(QuantizedDot(Bridge.expression(a), Bridge.expression(b)))
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
    ext.injectOptimizerRule(_ => graft.plans.QuantizedDotRewrite)
  }
}

object GraftFunctions {
  private[functions] val dotQDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_q"),
    new ExpressionInfo(classOf[QuantizedDot].getName, "dot_q"),
    (children: Seq[Expression]) => QuantizedDot(children(0), children(1))
  )

  /** Idempotent runtime registration on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = dotQDescriptor
    Bridge.registerFunction(spark, id, info, builder)
  }
}
