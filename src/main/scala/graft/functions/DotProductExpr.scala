package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product of two `array<double>` columns — the hot scalar of
  * the whole ANN family (brute-force top-k scores |corpus|×|queries| of
  * them; LSH verify one per candidate pair; IVF one per (vector,
  * centroid)). The `aggregate(zip_with(...))` formulation allocates an
  * intermediate array per evaluation and walks it with boxed lambda
  * calls; this expression is ONE fused primitive loop in both
  * interpreted and generated code, summing in index order —
  * bit-identical to the higher-order form and to DuckDB's
  * `list_aggregate(list_transform(...), 'sum')`, so every oracle stays
  * exact.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.DotProductExpr.dot($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  /** Index-ordered multiply-add over the common prefix (shared by
    * interpreted eval and generated code).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}
