package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Consecutive word n-grams of a text column, NON-distinct, in order —
  * one native pass. The counting complement of [[ShinglesExpr]] (which
  * deduplicates for set-similarity): corpus n-gram statistics need every
  * occurrence, so multiplicity is preserved.
  *
  * Semantics are pinned to [[graft.ml.Curation.words]] so the DuckDB
  * oracle can mirror them exactly:
  *
  *  - words = split on the single space character, empties removed
  *    (NOT `\s+`: the corpus-stats family shares the words() tokenizer);
  *  - n-grams = words joined by one space, every consecutive window,
  *    duplicates kept;
  *  - fewer than n words → empty array (a stats op must not invent
  *    grams, unlike the dedup fallback shingle).
  */
case class NgramsExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    NgramsExpr.ngrams(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.NgramsExpr.ngrams($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramsExpr =
    copy(child = newChild)
}

object NgramsExpr {

  def ngrams(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val toks = new java.util.ArrayList[String]()
    var start = 0
    val len = s.length
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) { toks.add(s.substring(start, i)); () }
        start = i + 1
      }
      i += 1
    }
    val m = toks.size
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val sb = new java.lang.StringBuilder()
    var w = 0
    while (w <= m - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(w + j))
        j += 1
      }
      out(w) = UTF8String.fromString(sb.toString)
      w += 1
    }
    new GenericArrayData(out)
  }
}
