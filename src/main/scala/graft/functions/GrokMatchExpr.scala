package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Grok

/** Native grok match: string → map<string,string> of the first matching
  * pattern's captures (null when no pattern matches) — the
  * [[graft.operators.Grok.matchFirst]] kernel as a Catalyst expression.
  *
  * The grokker sat on the events hot path as the last per-row Scala UDF
  * in the structural/pattern processor families: every row paid the
  * UDF's catalyst→Scala conversion (UTF8String→String→Map→catalyst) and
  * broke whole-stage codegen for the surrounding projection. This
  * expression keeps the projection fused; the regex sweep itself is
  * unchanged, including the bounded-backtracking guard that stands in
  * for the reference's per-match 1 s timeout
  * (`util/grok/grok.py:87` `@timeout(seconds=1)`).
  *
  * The compiled pattern list rides on the plan as ONE reference object
  * (`ctx.addReferenceObj`), not per-row state: patterns compile once at
  * plan build (`Grok.compile`), exactly like the replaced closure.
  */
case class GrokMatchExpr(child: Expression, compiled: Seq[Grok.Compiled])
    extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = true)

  // null for non-null input when NO pattern matches
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any): Any =
    GrokMatchExpr.matchToMap(compiled, s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("grokCompiled", compiled,
      "scala.collection.immutable.Seq")
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.GrokMatchExpr.matchToMap($ref, $a);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): GrokMatchExpr =
    copy(child = newChild)
}

object GrokMatchExpr {
  /** Shared by interpreted eval and generated code. */
  def matchToMap(compiled: Seq[Grok.Compiled], s: UTF8String): MapData = {
    if (s == null) return null
    val m = Grok.matchFirst(compiled, s.toString)
    if (m == null) return null
    val keys = new Array[Any](m.size)
    val values = new Array[Any](m.size)
    var i = 0
    m.foreach { case (k, v) =>
      keys(i) = UTF8String.fromString(k)
      values(i) = UTF8String.fromString(v)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }
}
