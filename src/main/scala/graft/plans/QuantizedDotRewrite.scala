package graft.plans

import graft.functions.QuantizedDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}

/** Optimizer rule: recognize the engine-portable higher-order-function
  * spelling of the quantized dot product
  * (`aggregate(zip_with(transform(a, q), transform(b, q), *), 0L, +)`,
  * see `Similarity.dotQHof`) and rewrite it to the fused native kernel
  * [[QuantizedDot]] — users write the declarative form, Catalyst swaps
  * in the tight loop. Registered via
  * `GraftExtensions` (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations`.
  *
  * Matching is structural and conservative: anything that doesn't
  * match exactly is left untouched (the HOF form is still correct,
  * just slower).
  */
object QuantizedDotRewrite extends Rule[LogicalPlan] {

  /** transform(x, v -> cast(round(cast(v as double) * 1000, 0) as long))
    * over an array<float> — the `Similarity.quantize` tree, modulo the
    * casts type-coercion inserts.
    */
  private object Quantize {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayTransform(arr, LambdaFunction(body, Seq(v: NamedLambdaVariable), _))
          if arr.dataType.isInstanceOf[ArrayType] &&
            arr.dataType.asInstanceOf[ArrayType].elementType == FloatType &&
            isQuantizeBody(body, v) =>
        Some(arr)
      case _ => None
    }

    private def isQuantizeBody(body: Expression, v: NamedLambdaVariable): Boolean =
      body match {
        case Cast(Round(Multiply(castToDouble, thousand, _), Literal(0, _), _), LongType, _, _)
            if isVar(castToDouble, v) && isThousand(thousand) => true
        case _ => false
      }

    private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
      case Cast(c, DoubleType, _, _) => isVar(c, v)
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

    private def isThousand(e: Expression): Boolean = e match {
      case Cast(c, _, _, _) => isThousand(c)
      case Literal(1000, _) => true
      case Literal(v: Double, DoubleType) => v == 1000.0
      case Literal(v: Long, LongType) => v == 1000L
      case _ => false
    }
  }

  private def isMulLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      Set(a.exprId, b.exprId) == Set(x.exprId, y.exprId)
    case _ => false
  }

  private def isAddLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Add(a, b, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      val ids = Set(x.exprId, y.exprId)
      Seq(a, b).forall {
        case nv: NamedLambdaVariable => ids.contains(nv.exprId)
        case Cast(nv: NamedLambdaVariable, _, _, _) => ids.contains(nv.exprId)
        case _ => false
      }
    case _ => false
  }

  private def isZeroLong(e: Expression): Boolean = e match {
    case Literal(0L, LongType) => true
    case Cast(Literal(0L, LongType), _, _, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(Quantize(a), Quantize(b), mul),
            zero, merge, LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if isMulLambda(mul) && isZeroLong(zero) && isAddLambda(merge) &&
            fin.exprId == fv.exprId =>
        QuantizedDot(a, b)
    }
}
