package graft.filter

/** AST for the Lucene-style filter DSL.
  *
  * Semantics mirror the reference's `FilterExpression` node set
  * (reference: logprep/filter/expression/filter_expression.py) but the
  * representation is ours: a small immutable ADT that the
  * [[FilterCompiler]] lowers to a single Catalyst `Column` predicate at
  * plan time — there is no per-event interpretation anywhere.
  */
sealed trait FilterAst

object FilterAst {
  /** `filter: "*"` — constant truth (filter_expression.py:107-120). */
  case class Always(value: Boolean) extends FilterAst
  case class Not(child: FilterAst) extends FilterAst
  case class And(children: Seq[FilterAst]) extends FilterAst
  case class Or(children: Seq[FilterAst]) extends FilterAst

  /** `field: value` — string equality after string-coercion of the event
    * value; list-valued fields test membership (filter_expression.py:204-215).
    */
  case class StringEq(field: String, value: String) extends FilterAst

  /** `field: va?ue*` — anchored wildcard, case-sensitive
    * (filter_expression.py:218-267).
    */
  case class Wildcard(field: String, pattern: String) extends FilterAst

  /** Case-insensitive wildcard (sigma semantics, filter_expression.py:270-273). */
  case class SigmaWildcard(field: String, pattern: String) extends FilterAst

  case class IntEq(field: String, value: Long) extends FilterAst
  case class FloatEq(field: String, value: Double) extends FilterAst

  /** `field: [lo TO hi]` inclusive bounds; `{` `}` exclusive. */
  case class IntRange(field: String, lo: Option[Long], hi: Option[Long],
                      loIncl: Boolean = true, hiIncl: Boolean = true) extends FilterAst
  case class FloatRange(field: String, lo: Option[Double], hi: Option[Double],
                        loIncl: Boolean = true, hiIncl: Boolean = true) extends FilterAst
  /** Lexicographic string range — used for ISO-8601 timestamp ranges. */
  case class StringRange(field: String, lo: Option[String], hi: Option[String],
                         loIncl: Boolean = true, hiIncl: Boolean = true) extends FilterAst

  /** `field|re: pattern` — regex, normalized to full anchoring
    * (filter_expression.py:378-411).
    */
  case class Regex(field: String, pattern: String) extends FilterAst

  /** Bare `field` term — the dotted path exists (not merely non-null). */
  case class Exists(field: String) extends FilterAst

  /** `field: null` — value is exactly JSON null (≠ missing). */
  case class IsNull(field: String) extends FilterAst
}
