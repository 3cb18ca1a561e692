package graft.operators

/** Grok pattern engine (reference: util/grok/grok.py:40-220): resolves
  * `%{NAME:target:type}` references and oniguruma `(?<target>...)` named
  * captures against the public logstash ecs-v1 pattern set (data file in
  * resources) plus rule-supplied custom patterns, producing ONE compiled
  * Java regex per pattern with positional group names and a plan-time map
  * group → (dotted target, optional int/float conversion).
  *
  * Resolution happens once at plan build; matching is a first-match-wins
  * sweep over the rule's pattern list per row. Logstash `[a][b]` bracket
  * targets become dotted paths with inner dots escaped
  * (field_list_to_dotted_field, util/helper.py:520-538).
  */
object Grok {

  final case class Capture(group: String, target: String, conv: Option[String])
  final case class Compiled(regex: java.util.regex.Pattern, captures: Seq[Capture])

  lazy val defaultPatterns: Map[String, String] = {
    val in = getClass.getResourceAsStream("/grok/ecs-v1-patterns.txt")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    in.close()
    lines.filterNot(l => l.startsWith("#") || l.trim.isEmpty).flatMap { l =>
      val i = l.indexOf(' ')
      if (i < 0) None else Some(l.take(i) -> l.substring(i + 1).trim)
    }.toMap
  }

  private val grokRef =
    """%\{([A-Z0-9_]*)(?::((?:\[[^\]]*\])+|[^:}]*))?(?::(int|float))?\}""".r

  /** `[a][b]` → `a.b` with literal dots in names escaped; plain input is
    * already dotted notation.
    */
  def logstashToDotted(fields: String): String =
    if (fields.startsWith("["))
      // field_list_to_dotted_field (util/helper.py:520-538): only dots
      // are escaped when joining; backslashes in names pass through
      fields.substring(1, fields.length - 1).split("\\]\\[")
        .map(_.replace(".", "\\."))
        .mkString(".")
    else fields

  /** Resolve one grok pattern to a Compiled regex. Oniguruma captures
    * resolve first, then `%{...}` references iteratively (grok.py
    * `_compile_pattern`, :178-200).
    */
  def compile(pattern0: String,
              customPatterns: Map[String, String] = Map.empty): Compiled = {
    val dict = defaultPatterns ++ customPatterns
    val captures = scala.collection.mutable.ArrayBuffer.empty[Capture]
    var counter = 0
    def freshGroup(): String = { counter += 1; s"g$counter" }

    // oniguruma `(?<name>body)` captures: single left-to-right pass with
    // paren-depth scanning (a regex-based scanner would re-match its own
    // emitted `(?<gN>…)` replacements and rewrap forever), recursing into
    // bodies for nested named groups
    def resolveOnig(s: String): String = {
      val out = new StringBuilder
      var rest = s
      var going = true
      while (going) {
        // find "(?<" that is a NAMED group (not lookbehind (?<= / (?<!)
        var i = rest.indexOf("(?<")
        while (i >= 0 && i + 3 < rest.length &&
            (rest.charAt(i + 3) == '=' || rest.charAt(i + 3) == '!'))
          i = rest.indexOf("(?<", i + 1)
        val gt = if (i < 0) -1 else rest.indexOf('>', i + 3)
        if (i < 0 || gt < 0) { out.append(rest); going = false }
        else {
          out.append(rest.take(i))
          val name = rest.substring(i + 3, gt)
          var j = gt + 1; var depth = 1
          while (depth > 0 && j < rest.length) {
            rest.charAt(j) match {
              case '\\' => j += 1
              case '(' => depth += 1
              case ')' => depth -= 1
              case _ =>
            }
            j += 1
          }
          val (body, after) =
            if (depth == 0) (rest.substring(gt + 1, j - 1), rest.substring(j))
            else {
              // unclosed named group (the reference's pattern regex absorbs
              // one balanced inner group via its optional paren wrappers):
              // body = the first balanced chunk after '>', rest continues
              var b = gt + 1; var d = 0
              if (b < rest.length && rest.charAt(b) == '(') {
                d = 1; b += 1
                while (d > 0 && b < rest.length) {
                  rest.charAt(b) match {
                    case '\\' => b += 1
                    case '(' => d += 1
                    case ')' => d -= 1
                    case _ =>
                  }
                  b += 1
                }
              } else {
                while (b < rest.length && rest.charAt(b) != '(' &&
                  rest.charAt(b) != ')') b += 1
              }
              (rest.substring(gt + 1, b), rest.substring(b))
            }
          val g = freshGroup()
          captures += Capture(g, logstashToDotted(name), None)
          out.append(s"(?<$g>").append(resolveOnig(body)).append(")")
          rest = after
        }
      }
      out.toString
    }

    var p = resolveOnig(pattern0)
    // %{NAME:target:type} loop
    var changed = true
    while (changed) {
      grokRef.findFirstMatchIn(p) match {
        case Some(m) =>
          val name = m.group(1)
          val body = dict.getOrElse(name,
            throw new IllegalArgumentException(s"grok pattern '$name' not found"))
          val replacement = Option(m.group(2)) match {
            case Some(fields) =>
              val g = freshGroup()
              captures += Capture(g, logstashToDotted(fields), Option(m.group(3)))
              s"(?<$g>$body)"
            case None => body
          }
          p = p.substring(0, m.start) + replacement + p.substring(m.end)
        case None => changed = false
      }
    }
    Compiled(java.util.regex.Pattern.compile(p), captures.toSeq)
  }

  /** First-match-wins over the compiled pattern list: the matched
    * pattern's non-null captures as target→value (later captures of the
    * same target win, like the reference's dict comprehension). Null when
    * NO pattern matches (→ "no grok pattern matched" warning upstream).
    */
  /** A CharSequence that aborts pathological regex backtracking after a
    * bounded number of reads — the Spark-side equivalent of the
    * reference's `@timeout(seconds=1)` match guard (grok.py:87): one
    * hostile log line must not hang (or OOM) an executor core.
    */
  private final class Bounded(s: String, var budget: Long = 20_000_000L)
      extends CharSequence {
    def length: Int = s.length
    def charAt(i: Int): Char = {
      budget -= 1
      if (budget <= 0) throw new IllegalStateException("grok match budget exceeded")
      s.charAt(i)
    }
    def subSequence(a: Int, b: Int): CharSequence = new Bounded(s.substring(a, b), budget)
    override def toString: String = s
  }

  def matchFirst(compiled: Seq[Compiled], text: String): Map[String, String] = {
    if (text == null) return null
    compiled.iterator.flatMap { c =>
      val m =
        try c.regex.matcher(new Bounded(text))
        catch { case _: IllegalStateException => return null }
      val matches =
        try m.matches()
        catch { case _: IllegalStateException => false }
      if (matches) {
        val entries = c.captures.flatMap { cap =>
          Option(m.group(cap.group)).map(v => cap.target -> v)
        }
        if (entries.nonEmpty) Some(entries.toMap) else Some(Map.empty[String, String])
      } else None
    }.nextOption().orNull
  }
}
