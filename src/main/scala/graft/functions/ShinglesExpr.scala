package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-word shingles of a text column, one native pass.
  *
  * Replaces the `array_distinct(zip_with(slice…, slice…))` composition in
  * [[graft.ml.Dedup.shingles]]: those are all CodegenFallback
  * higher-order functions, and the shingle construction measured ~60% of
  * the whole MinHash signature job at sf0.1. Semantics are replicated
  * bit-for-bit so every oracle keeps matching:
  *
  *  - tokens = `split(trim(text), "\s+")`, where `trim` is SPARK's trim
  *    (strips 0x20 space only, not general whitespace) and split is
  *    `Pattern.split(s, -1)`;
  *  - n ≥ k → the distinct k-shingles joined by one space, first
  *    occurrence order;
  *  - n < k → one shingle: all tokens joined by one space
  *    (`concat_ws(" ", tokens)`).
  */
case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    ShinglesExpr.shingles(a.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.ShinglesExpr.shingles($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def shingles(text: UTF8String, k: Int): ArrayData = {
    // Spark's trim(): space (0x20) only — NOT Java String.trim
    val trimmed = trimSpaces(text.toString)
    val toks = ws.split(trimmed, -1)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (toks.length >= k) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString)); ()
        i += 1
      }
    } else {
      out.add(UTF8String.fromString(toks.mkString(" "))); ()
    }
    new GenericArrayData(out.toArray)
  }

  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }
}
