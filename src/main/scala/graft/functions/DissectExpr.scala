package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass dissect: split the input on the pattern's literal
  * separators (left-to-right `indexOf`, last field greedy) and return the
  * captured fields as `array<string>` (null when the line doesn't match).
  *
  * This is the custom-`Expression` tier of the operator preference order
  * (SURVEY §2.5 flags Dissect as the codegen candidate): one linear scan
  * of the string per row versus k anchored-regex executions for the
  * regexp_extract compilation of the same pattern. `doGenCode` emits a
  * direct static call — no interpreted fallback on the hot path.
  *
  * Reference semantics: logprep/processor/dissector (tokenization by
  * literal separators); conversions (`|int` …) and field routing stay in
  * the [[graft.operators.PatternOps.dissector]] wrapper.
  */
case class DissectExpr(child: Expression, separators: Seq[String],
                       prefix: String, suffix: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val seps: Array[UTF8String] =
    separators.map(UTF8String.fromString).toArray
  @transient private lazy val pre = UTF8String.fromString(prefix)
  @transient private lazy val suf = UTF8String.fromString(suffix)

  override def nullSafeEval(input: Any): Any = {
    val out = DissectExpr.dissect(input.asInstanceOf[UTF8String], pre, seps, suf)
    if (out == null) null else new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepsRef = ctx.addReferenceObj("seps", seps, "org.apache.spark.unsafe.types.UTF8String[]")
    val preRef = ctx.addReferenceObj("pre", pre, "org.apache.spark.unsafe.types.UTF8String")
    val sufRef = ctx.addReferenceObj("suf", suf, "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("fields")
      s"""
         |org.apache.spark.unsafe.types.UTF8String[] $arr =
         |  graft.functions.DissectExpr.dissect($c, $preRef, $sepsRef, $sufRef);
         |if ($arr == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DissectExpr =
    copy(child = newChild)
}

object DissectExpr {

  /** Linear-scan dissect shared by interpreted eval and generated code.
    * Returns null when a separator (or the prefix/suffix) is absent.
    */
  def dissect(s: UTF8String, prefix: UTF8String, seps: Array[UTF8String],
              suffix: UTF8String): Array[UTF8String] = {
    var str = s
    if (prefix.numBytes() > 0) {
      if (!str.startsWith(prefix)) return null
      str = str.substring(prefix.numChars(), str.numChars())
    }
    if (suffix.numBytes() > 0) {
      if (!str.endsWith(suffix)) return null
      str = str.substring(0, str.numChars() - suffix.numChars())
    }
    val out = new Array[UTF8String](seps.length + 1)
    var i = 0
    var rest = str
    while (i < seps.length) {
      val idx = rest.indexOf(seps(i), 0)
      if (idx < 0) return null
      out(i) = rest.substring(0, idx)
      rest = rest.substring(idx + seps(i).numChars(), rest.numChars())
      i += 1
    }
    out(seps.length) = rest
    out
  }

  /** Column builder over a pre-analyzed pattern (prefix, separators,
    * suffix). Pattern analysis lives in PatternOps, which falls back to
    * the regex path for patterns this expression can't express
    * (skip/indirect/append fields, adjacent captures).
    */
  def build(c: Column, prefix: String, seps: Seq[String], suffix: String): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      DissectExpr(org.apache.spark.sql.GraftSqlBridge.expression(c),
        seps, prefix, suffix))
}
