package graft.operators

/** Replacer template grammar + rewriting (reference:
  * processor/replacer/rule.py:101-290 for the template parse,
  * processor.py:61-131 for the rewrite): `%{new}` segments with literal
  * delimiters, `%{match:new}` assertions, `*` keep-original wildcard
  * (escapable `\*`), and the `|g` greedy modifier.
  *
  * The template is parsed ONCE at plan time; the rewrite itself is the
  * reference's partition-based iterative algorithm, executed per row in a
  * deterministic UDF — the general greedy/keep-original semantics are
  * inherently sequential string work (SURVEY §2.2 #12 planned exactly
  * this fallback). Still narrow/distributed; the reference interprets the
  * same algorithm per event in Python.
  */
object Replacer {

  final case class Replacement(
      value: String,
      next: String,
      matchStr: Option[String],
      keepOriginal: Boolean,
      greedy: Boolean)

  final case class Template(prefix: String, replacements: List[Replacement])

  // ---- parsing (rule.py) ---------------------------------------------

  private def partition(s: String, sep: String): (String, String, String) = {
    val i = s.indexOf(sep)
    if (i < 0) (s, "", "") else (s.take(i), sep, s.substring(i + sep.length))
  }

  private def rpartition(s: String, sep: String): (String, String, String) = {
    val i = s.lastIndexOf(sep)
    if (i < 0) ("", "", s) else (s.take(i), sep, s.substring(i + sep.length))
  }

  /** `_find_not_escaped_character` (rule.py:236-243). */
  private def findNotEscaped(text: String, target: Char): Option[Int] = {
    var backslashes = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == target && backslashes % 2 == 0) return Some(i)
      backslashes = if (c == '\\') backslashes + 1 else 0
      i += 1
    }
    None
  }

  /** `_unescape_character` (rule.py:227-234): halve each backslash run
    * preceding the target character.
    */
  private def unescapeChar(text0: String, target: Char): String = {
    var text = text0
    val re = ("\\\\+" + java.util.regex.Pattern.quote(target.toString)).r
    re.findAllIn(text0).toList.foreach { m =>
      val (pre, sep, post) = partition(text, m)
      if (sep.nonEmpty)
        text = pre + ("\\" * ((sep.length - 2) / 2)) + target + post
    }
    text
  }

  /** `_unescape_backslashes_at_end_of_string` (rule.py:291-297). */
  private def unescapeTrailingBackslashes(text: String): String = {
    val m = "\\\\+$".r.findFirstIn(text)
    m match {
      case Some(run) =>
        val (pre, sep, post) = partition(text, run)
        pre + ("\\" * (sep.length / 2)) + post
      case None => text
    }
  }

  private final class Raw(
      var value: String,
      var next: String = "",
      var matchStr: Option[String] = None,
      var greedy: Boolean = false)

  /** Parse a replacer template into prefix + replacements (the rule.py
    * pipeline `_get_replacement_strings`).
    */
  def parseTemplate(template0: String): Template = {
    // _get_replacements
    var template = template0
    var prefix = ""
    var end = ""
    val raws = scala.collection.mutable.ArrayBuffer.empty[Raw]
    var idx = 0
    while (template.nonEmpty) {
      val (preStart, _, postStart) = partition(template, "%{")
      if (idx == 0) prefix = preStart
      val (preEnd, endPart, postEnd) = partition(postStart, "}")
      if (endPart.nonEmpty) {
        if (idx > 0 && raws.nonEmpty) raws(idx - 1).next = preStart
        raws += new Raw(preEnd)
      } else end = template
      template = postEnd
      idx += 1
    }
    if (raws.nonEmpty) raws.last.next = end

    // _parse_colon_notation
    raws.zipWithIndex.foreach { case (r, i) =>
      findNotEscaped(r.value, ':') match {
        case None =>
          r.matchStr = None
          r.value = unescapeChar(r.value, ':')
        case Some(colPos) =>
          var m = r.value.take(colPos)
          m = unescapeTrailingBackslashes(m)
          m = unescapeChar(m, ':')
          var matchOpt = if (m == "*") None else Some(m)
          matchOpt = matchOpt.map { mm =>
            if (mm.nonEmpty && mm.endsWith("*") &&
                mm.dropRight(1).forall(_ == '\\')) mm.substring(1)
            else mm
          }
          r.matchStr = matchOpt
          r.value = unescapeChar(r.value.substring(colPos + 1), ':')
          if (i > 0) raws(i - 1).next += matchOpt.getOrElse("")
      }
    }

    // _get_greedy_state
    raws.foreach { r =>
      findNotEscaped(r.value, '|') match {
        case None =>
          r.greedy = false
          r.value = unescapeChar(r.value, '|')
        case Some(pipePos) =>
          val modifier = r.value.substring(pipePos + 1)
          r.greedy = modifier == "g"
          r.value = unescapeTrailingBackslashes(r.value.take(pipePos))
      }
    }

    // wildcard state + single-star unescape
    val replacements = raws.toList.map { r =>
      val keepOriginal = r.value == "*"
      val value =
        if (!keepOriginal && r.value.endsWith("*") &&
            r.value.dropRight(1).forall(_ == '\\'))
          r.value.substring(1)
        else r.value
      Replacement(value, r.next, r.matchStr, keepOriginal, r.greedy)
    }
    Template(prefix, replacements)
  }

  // ---- rewriting (processor.py) ---------------------------------------

  /** `replace_by_templates` — None means "no rewrite" (prefix/match
    * failure), in which case nothing is written.
    */
  def replaceByTemplates(template: Template, toReplace0: String): Option[String] = {
    if (template.replacements.isEmpty) return None
    var toReplace = toReplace0
    val first = template.replacements.head
    var result = if (first.keepOriginal) "" else template.prefix
    first.matchStr match {
      case Some(m) if m.nonEmpty =>
        if (!toReplace.startsWith(template.prefix + m)) return None
        result += m
      case _ =>
    }

    val n = template.replacements.size
    var i = 0
    var broke = false
    while (i < n && !broke) {
      handleWildcard(template.replacements(i), toReplace) match {
        case None => return None
        case Some(replacement) =>
          replacement.matchStr match {
            case Some(m) if m.nonEmpty =>
              val (pre, matched, _) = rpartition(result, m)
              if (matched.isEmpty) return None
              result = pre + replacement.value + replacement.next
            case _ =>
              if (replacement.next.isEmpty) {
                result += replacement.value
                broke = true
              } else {
                val (_, separator, rest0) = partition(toReplace, replacement.next)
                if (separator.isEmpty) return None
                toReplace = rest0
                if (replacement.greedy)
                  toReplace = partitionGreedily(replacement, toReplace)
                if (i == n - 1 && !replacement.next.endsWith(toReplace))
                  return None
                result += replacement.value + replacement.next
              }
          }
      }
      i += 1
    }
    Some(result)
  }

  private def partitionGreedily(r: Replacement, toReplace: String): String = {
    val lastIndex = toReplace.lastIndexOf(r.next)
    if (lastIndex != -1) toReplace.substring(lastIndex + r.next.length)
    else toReplace
  }

  /** `_handle_wildcard`: keep-original replaces value with the original
    * span before `next`.
    */
  private def handleWildcard(r: Replacement, toReplace: String): Option[Replacement] = {
    if (!r.keepOriginal) return Some(r)
    val matchIdx =
      if (r.greedy) toReplace.lastIndexOf(r.next)
      else toReplace.indexOf(r.next)
    if (matchIdx < 0) return None
    val original = if (matchIdx != 0) toReplace.take(matchIdx) else toReplace
    Some(r.copy(value = original))
  }
}
