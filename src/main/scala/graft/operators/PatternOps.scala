package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.fields.FieldOps

/** Pattern processors — dissect/grok tokenization, template replacement,
  * string decoding, log clustering. Patterns are compiled ONCE at plan time
  * to Java-regex-based Catalyst expressions (`regexp_extract`,
  * `regexp_replace`, `from_json`, `str_to_map`); the reference interprets
  * each pattern per event in Python with 1 s timeout guards
  * (logprep/util/grok/grok.py:87) — compiling to native expressions removes
  * both the interpreter and the need for timeouts.
  *
  *  - dissector (reference: logprep/processor/dissector/processor.py:43-110,
  *    grammar rule.py:103-123)
  *  - grokker   (logprep/processor/grokker/processor.py:50-146,
  *    engine logprep/util/grok/grok.py:49-146)
  *  - replacer  (logprep/processor/replacer/processor.py:35-131)
  *  - decoder   (logprep/processor/decoder/processor.py:53-82,
  *    registry decoders.py:235-247)
  *  - clusterer (logprep/processor/clusterer/processor.py:66-197)
  */
object PatternOps {

  // ------------------------------------------------------------------ dissect
  /** One parsed dissect token: literal separator or a field capture. */
  case class DissectField(name: String, convert: Option[String], append: Boolean)

  /** Compile a dissect pattern (`pre%{f1} %{f2|int} post`) to
    * (anchored regex, fields-in-order). `%{}` and `%{?ref}` captures are
    * skipped (matched but not extracted). Greedy last field, non-greedy
    * inner fields — the dissect contract (split on the literal separators).
    */
  def compileDissect(pattern: String): (String, Seq[DissectField]) = {
    val tok = """%\{([^}]*)\}""".r
    val sb = new StringBuilder("^")
    val fields = scala.collection.mutable.ArrayBuffer[DissectField]()
    var last = 0
    val ms = tok.findAllMatchIn(pattern).toList
    ms.zipWithIndex.foreach { case (m, i) =>
      sb.append(java.util.regex.Pattern.quote(pattern.substring(last, m.start)))
      val body = m.group(1)
      val isLast = i == ms.size - 1
      if (body.isEmpty || body.startsWith("?")) {
        sb.append(if (isLast) "(?:.*)" else "(?:.*?)")
      } else {
        val append = body.startsWith("+")
        val core = body.stripPrefix("+")
        val (name, conv) = core.split("\\|") match {
          case Array(n, c) => (n, Some(c))
          case Array(n) => (n, None)
          case _ => (core, None)
        }
        fields += DissectField(name, conv, append)
        sb.append(if (isLast) "(.*)" else "(.*?)")
      }
      last = m.end
    }
    sb.append(java.util.regex.Pattern.quote(pattern.substring(last)))
    sb.append("$")
    (sb.toString, fields.toSeq)
  }

  /** Simple-pattern analysis for the native single-pass expression: every
    * capture a plain (possibly `|conv`) field, non-empty separators.
    */
  private def analyzeSimple(pattern: String): Option[(String, Seq[String], String)] = {
    val tok = """%\{([^}]*)\}""".r
    val ms = tok.findAllMatchIn(pattern).toList
    val simple = ms.nonEmpty && ms.forall(
      _.group(1).matches("""[A-Za-z0-9_.@]+(\|(int|float|bool))?"""))
    if (!simple) return None
    val seps = ms.sliding(2).collect {
      case List(a, b) => pattern.substring(a.end, b.start)
    }.toList
    if (seps.exists(_.isEmpty)) None
    else Some((pattern.substring(0, ms.head.start), seps,
      pattern.substring(ms.last.end)))
  }

  /** dissector: tokenize `source` by the dissect pattern, writing each
    * captured field (with optional `|int`/`|float`/`|bool` conversion).
    *
    * Simple patterns use the native [[graft.functions.DissectExpr]]
    * (one linear scan per row, codegen'd); patterns with skip/indirect
    * fields fall back to the compiled-regex path. Non-matching lines
    * write nothing (null) — the reference's dissect-failure behavior.
    */
  def dissector(df: DataFrame, source: String, pattern: String): DataFrame = {
    val (regex, fields) = compileDissect(pattern)
    val src = FieldOps.getOrNull(df.schema, source).cast("string")
    def convert(f: DissectField, raw: Column): Column = f.convert match {
      case Some("int") => raw.cast("long")
      case Some("float") => raw.cast("double")
      case Some("bool") => lower(raw) === "true"
      case _ => raw
    }
    analyzeSimple(pattern) match {
      case Some((prefix, seps, suffix)) =>
        // identical DissectExpr trees per field are merged by Catalyst's
        // subexpression elimination → one scan per row
        val arr = graft.functions.DissectExpr.build(src, prefix, seps, suffix)
        fields.zipWithIndex.foldLeft(df) { case (d, (f, i)) =>
          FieldOps.set(d, f.name, convert(f, element_at(arr, i + 1)))
        }
      case None =>
        fields.zipWithIndex.foldLeft(df) { case (d, (f, i)) =>
          val raw = when(src.rlike(regex), regexp_extract(src, regex, i + 1))
          FieldOps.set(d, f.name, convert(f, raw))
        }
    }
  }

  // -------------------------------------------------------------------- grok
  /** Built-in grok pattern dictionary — the commonly-used core of the
    * logstash/ECS set the reference resolves (logprep/util/grok resolves
    * from its shipped pattern dirs; we inline the definitions, same
    * public pattern language).
    */
  val grokPatterns: Map[String, String] = {
    val base = Map(
      "USERNAME" -> "[a-zA-Z0-9._-]+",
      "USER" -> "%{USERNAME}",
      "INT" -> "(?:[+-]?(?:[0-9]+))",
      "BASE10NUM" -> """(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?)|\.[0-9]+)""",
      "NUMBER" -> "(?:%{BASE10NUM})",
      "WORD" -> """\b\w+\b""",
      "NOTSPACE" -> """\S+""",
      "SPACE" -> """\s*""",
      "DATA" -> ".*?",
      "GREEDYDATA" -> ".*",
      "QUOTEDSTRING" -> """(?:"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')""",
      "UUID" -> "[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
      "IPV4" -> """(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)""",
      "IPV6" -> """(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}(?:%\w+)?""",
      "IP" -> "(?:%{IPV6}|%{IPV4})",
      "HOSTNAME" -> """\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b""",
      "IPORHOST" -> "(?:%{IP}|%{HOSTNAME})",
      "POSINT" -> """\b(?:[1-9][0-9]*)\b""",
      "NONNEGINT" -> """\b(?:[0-9]+)\b""",
      "LOGLEVEL" -> "(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
      "YEAR" -> "(?:\\d\\d){1,2}",
      "MONTHNUM" -> "(?:0?[1-9]|1[0-2])",
      "MONTHDAY" -> "(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
      "HOUR" -> "(?:2[0123]|[01]?[0-9])",
      "MINUTE" -> "(?:[0-5][0-9])",
      "SECOND" -> "(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
      "TIME" -> "(?!<[0-9])%{HOUR}:%{MINUTE}(?::%{SECOND})(?![0-9])",
      "ISO8601_TIMEZONE" -> "(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
      "TIMESTAMP_ISO8601" -> "%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
      "HTTPDATE" -> """%{MONTHDAY}/\w{3}/%{YEAR}:%{TIME} %{INT}""",
      "URIPROTO" -> "[A-Za-z](?:[A-Za-z0-9+\\-.]+)+",
      "URIHOST" -> "%{IPORHOST}(?::%{POSINT})?",
      "URIPATH" -> """(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+""",
      "URIQUERY" -> """[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*""",
      "URIPARAM" -> """\?%{URIQUERY}""",
      "URIPATHPARAM" -> "%{URIPATH}(?:\\?%{URIQUERY})?",
      "URI" -> "%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATH}(?:\\?%{URIQUERY})?)?",
      "BASE16NUM" -> "(?:0[xX])?[0-9A-Fa-f]+",
      "MONTH" -> "\\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|[Mm](?:a|ä)?r(?:ch|z)?|[Aa]pr(?:il)?|[Mm]a(?:y|i)?|[Jj]un(?:e|i)?|[Jj]ul(?:y|i)?|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo](?:c|k)?t(?:ober)?|[Nn]ov(?:ember)?|[Dd]e(?:c|z)(?:ember)?)\\b",
      "DAY" -> "(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
      "DATE_US" -> "%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
      "DATE_EU" -> "%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
      "DATE" -> "(?:%{DATE_US}|%{DATE_EU})",
      "DATESTAMP" -> "%{DATE}[- ]%{TIME}",
      "COMMONMAC" -> "(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
      "CISCOMAC" -> "(?:[A-Fa-f0-9]{4}\\.){2}[A-Fa-f0-9]{4}",
      "WINDOWSMAC" -> "(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
      "MAC" -> "(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
      "EMAILLOCALPART" -> "[a-zA-Z0-9!#$%&'*+\\-/=?^_`{|}~]{1,64}(?:\\.[a-zA-Z0-9!#$%&'*+\\-/=?^_`{|}~]{1,62}){0,63}",
      "EMAILADDRESS" -> "%{EMAILLOCALPART}@%{HOSTNAME}",
      "UNIXPATH" -> "(?:/[\\w_%!$@:.,+~-]*)+",
      "WINPATH" -> "(?:[A-Za-z]:|\\\\)(?:\\\\[^\\\\?*]*)+",
      "PATH" -> "(?:%{UNIXPATH}|%{WINPATH})",
      "HOSTPORT" -> "%{IPORHOST}:%{POSINT}",
      "QS" -> "%{QUOTEDSTRING}",
      // composite log-line patterns (logstash core set shapes)
      "SYSLOGTIMESTAMP" -> """(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) +%{MONTHDAY} %{TIME}""",
      "SYSLOGPROG" -> """%{NOTSPACE}(?:\[%{POSINT}\])?""",
      "SYSLOGBASE" -> """%{SYSLOGTIMESTAMP} (?:%{NOTSPACE} )?%{IPORHOST} %{SYSLOGPROG}:""",
      "COMMONAPACHELOG" -> """%{IPORHOST} %{NOTSPACE} %{NOTSPACE} \[%{HTTPDATE}\] "(?:%{WORD} %{NOTSPACE}(?: HTTP/%{NUMBER})?|%{DATA})" %{NONNEGINT} (?:%{NONNEGINT}|-)""",
      "COMBINEDAPACHELOG" -> """%{COMMONAPACHELOG} %{QUOTEDSTRING} %{QUOTEDSTRING}""",
    )
    base
  }

  /** Resolve `%{NAME}` / `%{NAME:field}` references to a flat Java regex;
    * named captures become `(?<gN>...)` groups returned as (group, field).
    */
  def compileGrok(pattern: String,
                  extra: Map[String, String] = Map.empty): (String, Seq[(String, String)]) = {
    val dict = grokPatterns ++ extra
    val ref = """%\{(\w+)(?::([\w.\[\]@]+))?\}""".r
    val captures = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var gi = 0
    def resolve(p: String, depth: Int): String = {
      if (depth > 20) throw new IllegalArgumentException("grok recursion too deep")
      ref.replaceAllIn(p, m => {
        val name = m.group(1)
        val field = Option(m.group(2))
        val body = dict.getOrElse(name,
          throw new IllegalArgumentException(s"unknown grok pattern %{$name}"))
        val resolved = resolve(body, depth + 1)
        val out = field match {
          case Some(f) =>
            gi += 1
            val g = s"g$gi"
            captures += ((g, f.replace("[", ".").replace("]", "")))
            s"(?<$g>$resolved)"
          case None => s"(?:$resolved)"
        }
        java.util.regex.Matcher.quoteReplacement(out)
      })
    }
    (resolve(pattern, 0), captures.toSeq)
  }

  /** grokker: apply grok patterns (first-match-wins across the list) to
    * `source`, writing each named capture to its dotted field. The match is
    * a full match, as in the reference (grok.py fullmatch).
    */
  def grokker(df: DataFrame, source: String, patterns: Seq[String],
              extra: Map[String, String] = Map.empty): DataFrame = {
    val src = FieldOps.getOrNull(df.schema, source).cast("string")
    val compiled = patterns.map(p => compileGrok(p, extra))
    // field → value from the first pattern that (a) matches and (b) binds it
    val allFields = compiled.flatMap(_._2.map(_._2)).distinct
    allFields.foldLeft(df) { case (d, field) =>
      val candidates = compiled.collect {
        case (regex, caps) if caps.exists(_._2 == field) =>
          val anchored = "^" + regex + "$"
          val gname = caps.find(_._2 == field).get._1
          when(src.rlike(anchored),
            regexp_extract(src, anchored, groupIndexOf(regex, gname)))
      }
      FieldOps.set(d, field, coalesce(candidates: _*))
    }
  }

  /** Index of named group `g` among all capturing groups of `regex`.
    *
    * A character-by-character scan tracking backslash escapes and character
    * classes: a literal '(' inside `[...]` (URIPATH/URIQUERY bodies have
    * them) is NOT a capture group — a regex-based count of '(' would shift
    * every group index after such a pattern and extract the wrong field.
    */
  def groupIndexOf(regex: String, g: String): Int = {
    val target = s"(?<$g>"
    var i = 0; var count = 0; var inClass = false
    while (i < regex.length) {
      val c = regex.charAt(i)
      if (c == '\\') i += 2                       // escaped char: skip both
      else if (inClass) { if (c == ']') inClass = false; i += 1 }
      else c match {
        case '[' => inClass = true; i += 1
        case '(' =>
          if (regex.startsWith(target, i)) return count + 1
          if (i + 1 < regex.length && regex.charAt(i + 1) == '?') {
            // (?<name>...) is capturing; (?<= (?<! (?: (?= (?! etc. are not
            if (i + 2 < regex.length && regex.charAt(i + 2) == '<' &&
                i + 3 < regex.length &&
                regex.charAt(i + 3) != '=' && regex.charAt(i + 3) != '!')
              count += 1
          } else count += 1
          i += 1
        case _ => i += 1
      }
    }
    throw new IllegalArgumentException(s"group $g not in regex")
  }

  // ----------------------------------------------------------------- replacer
  /** replacer: rewrite `source` by a template where `%{new}` segments give
    * replacement text and `*` wildcards keep the original. Compiled to one
    * `regexp_replace` where the literal context anchors the match.
    * Template example: `"User *: %{MASKED}"` — keeps the `*` part, replaces
    * the text matched after `: ` with `MASKED`.
    */
  def replacer(df: DataFrame, source: String, matchRegex: String,
               replacement: String, target: Option[String] = None): DataFrame = {
    val src = FieldOps.getOrNull(df.schema, source).cast("string")
    FieldOps.set(df, target.getOrElse(source),
      regexp_replace(src, matchRegex, replacement))
  }

  // ------------------------------------------------------------------ decoder
  /** decoder: decode a string field per `format` into `target`.
    * Formats: json (→ parsed struct via schema inference at plan time is
    * not possible — caller passes a spark DDL schema), base64, logfmt,
    * decolorize (ANSI strip), kv (str_to_map).
    */
  def decodeJson(df: DataFrame, source: String, target: String, ddl: String): DataFrame =
    FieldOps.set(df, target,
      from_json(FieldOps.getOrNull(df.schema, source).cast("string"), ddl, Map.empty[String, String]))

  def decodeBase64(df: DataFrame, source: String, target: String): DataFrame =
    FieldOps.set(df, target,
      unbase64(FieldOps.getOrNull(df.schema, source).cast("string")).cast("string"))

  def decodeLogfmt(df: DataFrame, source: String, target: String): DataFrame =
    FieldOps.set(df, target,
      str_to_map(FieldOps.getOrNull(df.schema, source).cast("string"), lit(" "), lit("=")))

  def decolorize(df: DataFrame, source: String, target: String): DataFrame =
    FieldOps.set(df, target,
      regexp_replace(FieldOps.getOrNull(df.schema, source).cast("string"),
        """\[[;\d]*m""", ""))

  // ---------------------------------------------------------------- clusterer
  /** clusterer: SLCT/Drain-lite signature extraction — an ordered chain of
    * (pattern → replacement) substitutions on the source text, then
    * collapse repeated whitespace; the result is the cluster signature.
    * The reference's `apply_multiple_times` fixpoint is bounded-unrolled by
    * `iterations` (rule sets are finite; K passes reach the fixpoint).
    */
  def clusterer(df: DataFrame, source: String, target: String,
                substitutions: Seq[(String, String)],
                iterations: Int = 1): DataFrame = {
    val src = FieldOps.getOrNull(df.schema, source).cast("string")
    val once: Column => Column = c =>
      substitutions.foldLeft(c) { case (acc, (p, r)) => regexp_replace(acc, p, r) }
    val sig0 = (1 to math.max(1, iterations)).foldLeft(src)((c, _) => once(c))
    FieldOps.set(df, target, trim(regexp_replace(sig0, """\s+""", " ")))
  }
}
