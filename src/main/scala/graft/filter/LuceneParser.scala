package graft.filter

import scala.util.parsing.combinator.RegexParsers

/** Parser for the Lucene-subset filter grammar the reference accepts
  * (reference grammar behavior: logprep/filter/lucene_filter.py:246-403 —
  * boolean ops, parens, quoted phrases, wildcards, ranges incl. exclusive
  * bounds, field groups `f:(a OR b)`, the `|re` key modifier, and
  * backslash escaping). Built with scala-parser-combinators; produces a
  * [[FilterAst]]. No luqum, no runtime interpretation.
  */
object LuceneParser extends RegexParsers {
  import FilterAst._

  override def skipWhitespace = true

  // ---- lexical helpers -------------------------------------------------
  // A field name: dotted path, may contain escaped chars. `|re` suffix is
  // split off by the caller rule.
  private val fieldRe = """(?:[^\s:()\[\]{}"|\\]|\\.)+""".r
  // Bare value term: anything until whitespace/paren/quote. Keeps escapes.
  private val bareRe = """(?:[^\s:()\[\]{}"\\]|\\.)+""".r
  // second alternative: a quoted chunk whose inner backslash is LITERAL
  // (e.g. `"\"` = one backslash) — tried when escape-aware parsing
  // cannot close the quote
  private val quotedRe = """"(?:[^"\\]|\\.)*"|"[^"]*"""".r

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Wildcard chars that are present unescaped ⇒ wildcard expression. */
  private def hasUnescapedWildcard(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == '*' || c == '?') return true
      else i += 1
    }
    false
  }

  private val intRe = """[+-]?\d+""".r
  // decimal or scientific notation (the reference accepts `1e-3` range
  // bounds via Python float())
  private val floatRe = """[+-]?(?:\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)""".r

  // ---- grammar ---------------------------------------------------------
  def query: Parser[FilterAst] = orExpr

  def orExpr: Parser[FilterAst] =
    rep1sep(andExpr, "OR") ^^ { cs => if (cs.size == 1) cs.head else Or(cs) }

  def andExpr: Parser[FilterAst] =
    rep1sep(notExpr, "AND") ^^ { cs => if (cs.size == 1) cs.head else And(cs) }

  def notExpr: Parser[FilterAst] =
    ("NOT" ~> notExpr ^^ (Not(_))) | primary

  def primary: Parser[FilterAst] =
    ("(" ~> orExpr <~ ")") | star | fieldTerm

  def star: Parser[FilterAst] = "*" ^^ { _ => Always(true) }

  /** Unescape backslash-before-WHITESPACE in a field token — the one
    * escape that belongs to the Lucene TOKENIZER, not to dotted-path
    * resolution: an unquoted field name cannot contain whitespace at
    * all except through `\ `/`\<tab>` (fieldRe only admits it inside an
    * escape pair), so `a\ key` denotes the literal key `a key`
    * (reference: test_lucene_filter.py special-characters cases). Every
    * OTHER escape pair is kept intact for splitPath (see fieldTerm's
    * comment); a backslash that is itself escaped (`\\`) is consumed as
    * a pair here, so a key containing a real backslash-before-space
    * round-trips as `\\\ `.
    */
  private def unescapeFieldWs(s: String): String = {
    if (!s.contains('\\')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        val n = s.charAt(i + 1)
        if (n == ' ' || n == '\t') sb.append(n)
        else sb.append(c).append(n)
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.result()
  }

  /** field term: `path(|modifier)? : value` or bare `path` (exists). */
  def fieldTerm: Parser[FilterAst] =
    fieldRe ~ opt("|" ~> """re|sigma""".r) >> { case rawField ~ mod =>
      // Field names stay in ESCAPED form except for escaped whitespace
      // (a tokenizer-level escape, resolved here — see unescapeFieldWs):
      // dotted-path resolution (FilterCompiler.splitPath) is the single
      // unescaping point for `\.`/`\\`, so `comp\\lex\.field` reaches it
      // intact — unescaping those here too would strip the backslashes
      // twice (the reference likewise defers to get_dotted_field_list,
      // util/helper.py:482-517).
      val field = unescapeFieldWs(rawField)
      (":" ~> valueFor(field, mod)) | success(Exists(field))
    }

  private def valueFor(field: String, mod: Option[String]): Parser[FilterAst] =
    rangeValue(field) | groupValue(field, mod) | quotedValue(field, mod) |
      bareValue(field, mod)

  /** `field:(a OR b AND c)` — the group distributes the field over terms
    * (lucene_filter.py:392-397).
    */
  private def groupValue(field: String, mod: Option[String]): Parser[FilterAst] =
    "(" ~> groupOr(field, mod) <~ ")"

  private def groupOr(field: String, mod: Option[String]): Parser[FilterAst] =
    rep1sep(groupAnd(field, mod), "OR") ^^ { cs => if (cs.size == 1) cs.head else Or(cs) }

  private def groupAnd(field: String, mod: Option[String]): Parser[FilterAst] =
    rep1sep(groupNot(field, mod), "AND") ^^ { cs => if (cs.size == 1) cs.head else And(cs) }

  private def groupNot(field: String, mod: Option[String]): Parser[FilterAst] =
    ("NOT" ~> groupNot(field, mod) ^^ (Not(_))) |
      rangeValue(field) | quotedValue(field, mod) | bareValue(field, mod) |
      ("(" ~> groupOr(field, mod) <~ ")")

  /** Inside quotes only the QUOTE escape is removed (`\"` → `"`); every
    * other backslash is literal — the reference's
    * `_remove_one_escaping_from_quotes` (lucene_filter.py:682-745), pinned
    * by its own unit tests: `"\a"` matches `\a`, `"\\n"` matches `\\n`.
    */
  private def unescapeQuotes(s: String): String = s.replace("\\\"", "\"")

  private def quotedValue(field: String, mod: Option[String]): Parser[FilterAst] =
    quotedRe ^^ { q => leaf(field, unescapeQuotes(q.substring(1, q.length - 1)), quoted = true, mod) }

  private def bareValue(field: String, mod: Option[String]): Parser[FilterAst] =
    bareRe ^^ { raw => leafRaw(field, raw, mod) }

  /** Range: `[lo TO hi]`, `{lo TO hi}`, mixed bounds, `*` = unbounded.
    * Bounds may contain `:` (unquoted ISO-8601 timestamps are the
    * documented use of string ranges) — anything up to whitespace or a
    * closing bracket.
    */
  private val rangeBoundRe = """(?:[^\s\]}"\\]|\\.)+""".r
  private def rangeValue(field: String): Parser[FilterAst] = {
    val bound = quotedRe ^^ (q => unescapeQuotes(q.substring(1, q.length - 1))) |
      rangeBoundRe
    ("[" | "{") ~ bound ~ "TO" ~ bound ~ ("]" | "}") ^^ {
      case lb ~ lo ~ _ ~ hi ~ rb => mkRange(field, lo, hi, lb == "[", rb == "]")
    }
  }

  private def mkRange(field: String, lo: String, hi: String,
                      loIncl: Boolean, hiIncl: Boolean): FilterAst = {
    def optB(s: String): Option[String] = if (s == "*") None else Some(s)
    val (l, h) = (optB(lo), optB(hi))
    val allInt = (l ++ h).forall(intRe.matches(_))
    val allNum = (l ++ h).forall(s => intRe.matches(s) || floatRe.matches(s))
    if (allInt && (l.nonEmpty || h.nonEmpty))
      IntRange(field, l.map(_.toLong), h.map(_.toLong), loIncl, hiIncl)
    else if (allNum && (l.nonEmpty || h.nonEmpty))
      FloatRange(field, l.map(_.toDouble), h.map(_.toDouble), loIncl, hiIncl)
    else
      StringRange(field, l, h, loIncl, hiIncl)
  }

  /** Classify a raw (still-escaped) bare value into the leaf type, matching
    * the reference's type dispatch (int → IntEq, float → FloatEq, unescaped
    * wildcard → Wildcard, `null` → IsNull, else string equality).
    */
  private def leafRaw(field: String, raw: String, mod: Option[String]): FilterAst =
    mod match {
      case Some("re") => Regex(field, unescape(raw))
      case Some("sigma") => SigmaWildcard(field, raw)
      case _ =>
        if (raw == "null") IsNull(field)
        else if (intRe.matches(raw)) IntEq(field, raw.toLong)
        else if (floatRe.matches(raw)) FloatEq(field, raw.toDouble)
        else if (hasUnescapedWildcard(raw)) Wildcard(field, raw)
        else StringEq(field, unescape(raw))
    }

  private def leaf(field: String, value: String, quoted: Boolean,
                   mod: Option[String]): FilterAst =
    mod match {
      case Some("re") => Regex(field, value)
      case Some("sigma") => SigmaWildcard(field, value)
      case _ => StringEq(field, value) // quoted phrases are literal strings
    }

  /** Parse a filter string; Left(error) on failure. */
  def parse(s: String): Either[String, FilterAst] =
    parseAll(query, s) match {
      case Success(ast, _) => Right(ast)
      case NoSuccess(msg, next) =>
        Left(s"filter parse error at ${next.pos}: $msg")
      case other => Left(s"filter parse error: $other")
    }

  def parseOrThrow(s: String): FilterAst =
    parse(s).fold(e => throw new IllegalArgumentException(e), identity)
}
