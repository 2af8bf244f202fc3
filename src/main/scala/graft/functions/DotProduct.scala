package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product of two float/double array columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted per element — at millions of candidate pairs (ANN scoring,
  * embedding near-dup) that allocation-per-element cost dominates the whole
  * query. This expression compiles to a tight primitive loop inside
  * whole-stage codegen: same index-ordered double accumulation (bit-
  * identical results), ~100x less per-pair overhead.
  *
  * Array elements must be non-null (embedding vectors). If lengths differ,
  * the common prefix is used — unless `strict` is set, which yields null on
  * a length mismatch instead. Strict mode exists for the optimizer rewrite
  * of the HOF form ([[graft.plans.RewriteDotProductHof]]): zip_with
  * null-pads the shorter array, so the HOF's sum is null when lengths
  * differ, and a semantics-preserving rewrite must reproduce that.
  */
case class DotProduct(left: Expression, right: Expression, strict: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = strict || super.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (strict && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (isFloat(left), isFloat(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getL = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      val strictGuard =
        if (strict) s"if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; } else"
        else ""
      s"""
         |$strictGuard {
         |  int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $getL * $getR;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}
