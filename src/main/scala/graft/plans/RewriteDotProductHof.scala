package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrites the engine-portable higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  *
  * into the whole-stage-codegen [[graft.functions.DotProduct]] primitive
  * loop (~100x less per-pair overhead — the HOF form is interpreted and
  * allocates per element). Users keep writing the portable SQL/Column form;
  * plans silently get the fused expression. Registered by
  * [[graft.GraftExtensions]] via `injectOptimizerRule`.
  *
  * The rewrite is semantics-preserving, which needs two guards:
  *  - both arrays must be `containsNull = false` (a null element makes the
  *    HOF sum null; DotProduct reads primitives),
  *  - unequal lengths make the HOF sum null (zip_with null-pads the shorter
  *    side), so the rewrite targets DotProduct's `strict` mode, which
  *    reproduces exactly that.
  * Both factor orders match (IEEE-754 multiplication and addition of
  * non-NaN-payload doubles are commutative bit-for-bit), and no-op
  * `cast(double)` wrappers are seen through whether or not SimplifyCasts
  * has already removed them.
  */
object RewriteDotProductHof extends Rule[LogicalPlan] {

  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case other => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripDoubleCast(e) match {
      case nlv: NamedLambdaVariable => nlv.exprId == v.exprId
      case _ => false
    }

  /** Array of non-null float/double — DotProduct's input contract. */
  private def eligible(e: Expression): Boolean = e.dataType match {
    case ArrayType(t, false) => t == FloatType || t == DoubleType
    case _ => false
  }

  private def isProductOf(e: Expression, x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean =
    e match {
      // the product itself must be computed in DOUBLE: a raw `x*y` over
      // float arrays types the Multiply as float, so the HOF rounds each
      // product to float before summing while DotProduct multiplies in
      // double — different bits. Only the explicitly-widened form (the
      // Vectors.dotHof shape, cast(x as double) * cast(y as double)) is
      // semantics-identical to DotProduct for float inputs.
      case m: Multiply if m.dataType == DoubleType =>
        (isVar(m.left, x) && isVar(m.right, y)) || (isVar(m.left, y) && isVar(m.right, x))
      case _ => false
    }

  private def isSumOf(e: Expression, acc: NamedLambdaVariable, v: NamedLambdaVariable): Boolean =
    e match {
      case a: Add =>
        (isVar(a.left, acc) && isVar(a.right, v)) || (isVar(a.left, v) && isVar(a.right, acc))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(mult, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero: Double, DoubleType),
          LambdaFunction(add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(finish, Seq(facc: NamedLambdaVariable), _))
        if zero == 0.0 && eligible(a) && eligible(b) &&
          isProductOf(mult, x, y) && isSumOf(add, acc, v) && isVar(finish, facc) =>
      DotProduct(a, b, strict = true)
  }
}
