package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The decoder format registry (reference:
  * processor/decoder/decoders.py:235-247): each decoder turns a string
  * column into (value, ok-given-present) where `ok` mirrors the
  * reference's DecoderError conditions.
  *
  * Regex formats (clf, nginx, syslog RFC5424/3164/3164-local) re-express
  * the reference's public patterns; they run in a small deterministic UDF
  * returning a Map so non-participating optional groups stay null (a pure
  * Catalyst regexp_extract can only yield "" there). json uses variant
  * (`try_parse_json`) — schema-free like the reference's msgspec decode.
  */
object Decoders {

  private val clf = Seq(
    """^(?<host>[^\s]+)\s+(?<ident>[^\s]+)\s+(?<authuser>[^\s]+)\s+\[(?<timestamp>[^\s]+\s+[^\s]+)\]\s+"(?<requestline>.*)"\s+(?<status>\d{3})\s+(?<bytes>\d+)\s*$""")

  private val nginx = Seq(
    """^(?<host>[^ ]*) - (?<user>[^ ]*) \[(?<time>[^\]]*)\]\s+(?<code>[^ ]*) "(?<method>\S+)(?: +(?<path>[^"]*?)(?: +\S*)?)?"\s+(?<size>[^ ]*)\s+"(?<referer>[^"]*)"\s+"(?<agent>[^"]*)"\s+"(?<gzipratio>[^"]*)"$""",
    """^(?<host>[^ ]*) - (?<user>[^ ]*) \[(?<time>[^\]]*)\]\s+"(?<method>\S+)(?: +(?<path>[^"]*?)(?: +\S*)?)?"\s+(?<code>[^ ]*) (?<size>[^ ]*)\s+"(?<referer>[^"]*)"\s+"(?<agent>[^"]*)"$""",
    """^(?<remote>[^ ]*) (?<host>[^ ]*) (?<user>[^ ]*) \[(?<time>[^\]]*)\] "(?<method>\S+)(?: +(?<path>[^"]*?)(?: +\S*)?)?" (?<code>[^ ]*) (?<size>[^ ]*)(?: "(?<referer>[^"]*)" "(?<agent>[^"]*)")$""")

  private val syslog3164Local = Seq(
    """^<(?<pri>[0-9]+)>(?<time>[^ ]* {1,2}[^ ]* [^ ]*) (?<ident>[a-zA-Z0-9_/.\-]*)(?:\[(?<pid>[0-9]+)\])?(?:[^:]*:)? *(?<message>.*)$""")

  private val syslog3164 = Seq(
    """^<(?<pri>[0-9]+)>(?<time>[^ ]* {1,2}[^ ]* [^ ]*) (?<host>[^ ]*) (?<ident>[a-zA-Z0-9_/.\-]*)(?:\[(?<pid>[0-9]+)\])?(?:[^:]*:)? *(?<message>.*)$""")

  private val iso8601 =
    """\d{4}-[01]\d-[0-3]\dT[0-2]\d:[0-5]\d:[0-5]\d\.\d+(?:[+-][0-2]\d:[0-5]\d|Z)"""

  private val syslog5424 = Seq(
    s"""^<(?<pri>[0-9]{1,5})>1 (?<time>$iso8601) (?<host>[^ ]+) (?<ident>[^ ]+) (?<pid>[-0-9]+) (?<msgid>[^ ]+) (?<extradata>(?:\\[(?:.*?)\\]|-)) (?<message>.+)$$""")

  // Java named groups forbid '_' in names; the reference's snake_case
  // names are restored on output
  private val renames = Map("requestline" -> "request_line", "gzipratio" -> "gzip_ratio")

  private def groupNames(p: String): Seq[String] =
    """\(\?<([A-Za-z][A-Za-z0-9]*)>""".r.findAllMatchIn(p).map(_.group(1)).toSeq

  /** First-matching-regex groupdict as a map; null for no match (the
    * reference raises DecoderError there). Null-valued groups kept null.
    */
  private def regexUdf(patterns: Seq[String]) = {
    val metas = patterns.map(p => (p, groupNames(p)))
    udf { (s: String) =>
      if (s == null) null
      else {
        metas.iterator.flatMap { case (p, names) =>
          val m = java.util.regex.Pattern.compile(p).matcher(s)
          if (m.matches())
            Some(names.map(n => renames.getOrElse(n, n) -> m.group(n)).toMap)
          else None
        }.nextOption().orNull
      }
    }
  }

  /** (decoded value, ok-when-source-present) per source_format. */
  def decode(format: String, s: Column): (Column, Column) = format match {
    case "json" =>
      val v = try_parse_json(s)
      (v, v.isNotNull)
    case "base64" =>
      // Python b64decode(validate=False): discard non-alphabet chars, then
      // padding must check out (binascii.Error otherwise)
      val cleaned = regexp_replace(s, "[^A-Za-z0-9+/=]", "")
      val ok = (length(cleaned) % 4 === 0) &&
        cleaned.rlike("^[A-Za-z0-9+/]*={0,2}$")
      (when(ok, unbase64(cleaned).cast("string")), ok)
    case "clf" => viaUdf(clf, s)
    case "nginx" => viaUdf(nginx, s)
    case "syslog_rfc5424" => viaUdf(syslog5424, s)
    case "syslog_rfc3164" => viaUdf(syslog3164, s)
    case "syslog_rfc3164_local" => viaUdf(syslog3164Local, s)
    case "logfmt" =>
      // token regex ([\w*?.|#@/-]+)=("[^"]*"|\S*), dict last-wins
      val tokens = regexp_extract_all(s,
        lit("""([\w*?.|#@/-]+=(?:"[^"]*"|\S*))"""), lit(1))
      val entries = transform(tokens, t => struct(
        substring_index(t, "=", 1).as("key"),
        regexp_replace(
          t.substr(locate("=", t) + 1, lit(Int.MaxValue)),
          "^\"|\"$", "").as("value")))
      (map_from_entries(entries), lit(true))
    case "cri" =>
      val parts = split(s, " ", 4)
      val ok = size(parts) === 4
      (when(ok, struct(
        element_at(parts, 1).as("timestamp"),
        element_at(parts, 2).as("stream"),
        element_at(parts, 3).as("flags"),
        element_at(parts, 4).as("message"))), ok)
    case "docker" =>
      // msgspec Struct(log, stream, time): extras ignored, missing = error
      val parsed = from_json(s, StructType(Seq(
        StructField("log", StringType), StructField("stream", StringType),
        StructField("time", StringType))))
      val ok = parsed.isNotNull && parsed.getField("log").isNotNull &&
        parsed.getField("stream").isNotNull && parsed.getField("time").isNotNull
      (when(ok, struct(
        parsed.getField("log").as("output"),
        parsed.getField("stream").as("stream"),
        parsed.getField("time").as("timestamp"))), ok)
    case "decolorize" =>
      (regexp_replace(s, """\x1B(?:[@-Z\\-_]|\[[0-?]*[ -/]*[@-~])""", ""),
        lit(true))
    case other =>
      throw new IllegalArgumentException(s"unknown decoder format: $other")
  }

  private def viaUdf(patterns: Seq[String], s: Column): (Column, Column) = {
    val v = regexUdf(patterns)(s)
    (v, v.isNotNull)
  }
}
