package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of the most frequent element in an `array<string>` — the
  * top-word repetition signal's kernel ([[graft.ml.Curation.topWordFrac]]).
  *
  * The `array_sort` + `aggregate`-over-runs formulation is correct but
  * both are CodegenFallback higher-order functions: every element pays a
  * boxed lambda call and a fresh run-state struct, interpreted (measured
  * ~40% of the whole repetition query). This expression is one native
  * sort + one primitive run-scan, identical result, and keeps the
  * projection inside whole-stage codegen.
  */
case class TopRunExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    TopRunExpr.topRun(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TopRunExpr.topRun($a)")

  override protected def withNewChildInternal(newChild: Expression): TopRunExpr =
    copy(child = newChild)
}

object TopRunExpr {
  /** Longest equal-run after sorting — i.e. the max multiplicity.
    * Shared by interpreted eval and generated code.
    */
  def topRun(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val a = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      // whitespace-split tokens are never null; guard anyway
      a(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(a, (x: UTF8String, y: UTF8String) => x.compareTo(y))
    var best = 1L
    var run = 1L
    i = 1
    while (i < n) {
      if (a(i) == a(i - 1) || a(i).equals(a(i - 1))) run += 1 else run = 1
      if (run > best) best = run
      i += 1
    }
    best
  }
}
