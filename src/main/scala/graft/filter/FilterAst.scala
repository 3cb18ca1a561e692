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

  /** Normalized filter rendering, matching the reference's
    * `FilterExpression.__repr__` forms (filter_expression.py:114-445) —
    * the string the pre_detector publishes as `rule_filter`
    * (base/rule.py:286 `filter_str`).
    */
  def render(ast: FilterAst): String = ast match {
    case Always(v) => if (v) "*" else ""
    case Not(c) => s"NOT (${render(c)})"
    case And(cs) => cs.map(render).mkString("(", " AND ", ")")
    case Or(cs) => cs.map(render).mkString("(", " OR ", ")")
    case StringEq(f, v) => s"""$f:"$v""""
    case Wildcard(f, p) => s"""$f:"$p""""
    case SigmaWildcard(f, p) => s"""$f:"$p""""
    case IntEq(f, v) => s"$f:$v"
    case FloatEq(f, v) => s"$f:$v"
    case IntRange(f, lo, hi, li, hi2) =>
      range(f, lo.map(_.toString), hi.map(_.toString), li, hi2)
    case FloatRange(f, lo, hi, li, hi2) =>
      range(f, lo.map(_.toString), hi.map(_.toString), li, hi2)
    case StringRange(f, lo, hi, li, hi2) => range(f, lo, hi, li, hi2)
    case Regex(f, p) => s"$f:$p"
    case Exists(f) => s"$f: *"
    case IsNull(f) => s"$f:None"
  }

  private def range(f: String, lo: Option[String], hi: Option[String],
      loIncl: Boolean, hiIncl: Boolean): String = {
    val ob = if (loIncl) "[" else "{"
    val cb = if (hiIncl) "]" else "}"
    s"$f:$ob${lo.getOrElse("*")} TO ${hi.getOrElse("*")}$cb"
  }

  /** Apply the reference's `sigma_fields` special-field rule
    * (lucene_filter.py:643-653): equality/wildcard terms on the listed
    * fields (`None` = every field, i.e. `sigma_fields: true`) become
    * case-insensitive sigma wildcards over the stringified value.
    */
  def sigmaize(ast: FilterAst, fields: Option[Set[String]]): FilterAst = {
    def hit(f: String) = fields.forall(_.contains(f))
    ast match {
      case Not(c) => Not(sigmaize(c, fields))
      case And(cs) => And(cs.map(sigmaize(_, fields)))
      case Or(cs) => Or(cs.map(sigmaize(_, fields)))
      case StringEq(f, v) if hit(f) => SigmaWildcard(f, v)
      case Wildcard(f, p) if hit(f) => SigmaWildcard(f, p)
      case IntEq(f, v) if hit(f) => SigmaWildcard(f, v.toString)
      case FloatEq(f, v) if hit(f) => SigmaWildcard(f, v.toString)
      case other => other
    }
  }

  /** Render to a string the engine's own parser round-trips — unlike
    * [[render]] (the reference's display form) this keeps `|re`/`|sigma`
    * modifiers and bare-field Exists terms.
    */
  def renderParseable(ast: FilterAst): String = ast match {
    case SigmaWildcard(f, p) => s"""$f|sigma:"${quoteValue(p)}""""
    case Regex(f, p) => s"""$f|re:"${quoteValue(p)}""""
    case Wildcard(f, p) => s"$f:$p" // quoting would demote to string-eq
    case Exists(f) => f
    case IsNull(f) => s"$f:null"
    case StringEq(f, v) => s"""$f:"${quoteValue(v)}""""
    case Not(c) => s"NOT (${renderParseable(c)})"
    case And(cs) => cs.map(renderParseable).mkString("(", " AND ", ")")
    case Or(cs) => cs.map(renderParseable).mkString("(", " OR ", ")")
    case other => render(other)
  }

  /** Quote-escape for quoted values: ONLY the quote — the parser's quoted
    * strings keep every other backslash literal (see
    * LuceneParser.unescapeQuotes), so escaping backslashes here would
    * double them on re-parse.
    */
  private def quoteValue(v: String): String = v.replace("\"", "\\\"")
}
