package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DissectExpr, DotProductExpr, Md5HalfExpr, NgramsExpr, ShinglesExpr, TopRunExpr}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`:
  *
  * {{{ SELECT dissect(message, '%{a} %{b}')[1] FROM logs }}}
  *
  * `dissect(str, pattern)` returns array<string> of the captured fields
  * (null on non-match) via the single-pass codegen'd [[DissectExpr]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dissect"),
      new ExpressionInfo(classOf[DissectExpr].getName, "dissect"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "dissect(str, pattern)")
        val pattern = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString
          case other => throw new IllegalArgumentException(
            s"dissect pattern must be a literal, got $other")
        }
        val tok = """%\{([^}]*)\}""".r
        val ms = tok.findAllMatchIn(pattern).toList
        require(ms.nonEmpty, "pattern has no %{field} captures")
        val seps = ms.sliding(2).collect {
          case List(a, b) => pattern.substring(a.end, b.start)
        }.toList
        DissectExpr(args.head, seps,
          pattern.substring(0, ms.head.start), pattern.substring(ms.last.end))
      }))
    // graft_dot(array<double>, array<double>) → double: the ANN hot scalar
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_dot(a, b)")
        DotProductExpr(args.head, args(1))
      }))
    def intLit(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
        v.toString.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be a literal int, got $other")
    }
    // graft_shingles(text, k) → array<string>: distinct k-word shingles
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "graft_shingles"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_shingles(text, k)")
        ShinglesExpr(args.head, intLit(args(1), "k"))
      }))
    // graft_md5half(s, half) → bigint: 32-bit digest half, no hex round-trip
    ext.injectFunction((
      FunctionIdentifier("graft_md5half"),
      new ExpressionInfo(classOf[Md5HalfExpr].getName, "graft_md5half"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_md5half(s, half)")
        Md5HalfExpr(args.head, intLit(args(1), "half"))
      }))
    // graft_ngrams(text, n) → array<string>: consecutive word n-grams,
    // multiplicity kept (the counting complement of graft_shingles)
    ext.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[NgramsExpr].getName, "graft_ngrams"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_ngrams(text, n)")
        val n = intLit(args(1), "n")
        require(n >= 1, s"n must be >= 1, got $n")
        NgramsExpr(args.head, n)
      }))
    // graft_toprun(array<string>) → bigint: max element multiplicity
    ext.injectFunction((
      FunctionIdentifier("graft_toprun"),
      new ExpressionInfo(classOf[TopRunExpr].getName, "graft_toprun"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_toprun(arr)")
        TopRunExpr(args.head)
      }))
  }
}
