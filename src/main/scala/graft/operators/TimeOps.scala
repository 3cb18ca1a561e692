package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.fields.FieldOps

/** Time processors:
  *  - timestamper         (reference: logprep/processor/timestamper/processor.py:37-67)
  *  - datetime_extractor  (logprep/processor/datetime_extractor/processor.py:35-85)
  *  - timestamp_differ    (logprep/processor/timestamp_differ/processor.py:36-86)
  *
  * All compile to built-in temporal expressions — `to_timestamp`,
  * `date_format`, `unix_micros` — with multi-format fallback via `coalesce`
  * (the reference tries formats in order; `coalesce` of `try_to_timestamp`
  * calls is the declarative equivalent and stays in codegen).
  */
object TimeOps {

  /** Parse `source` trying each format in order; emit ISO-8601 UTC `Z`
    * string at `target` (default `@timestamp` in the reference). Formats:
    * "ISO8601", "UNIX" (epoch s or ms), or a Java time pattern.
    */
  def timestamper(df: DataFrame, source: String, formats: Seq[String],
                  target: String, sourceTz: String = "UTC"): DataFrame = {
    val c = FieldOps.getOrNull(df.schema, source)
    val candidates = formats.map {
      case "ISO8601" => try_to_timestamp(c.cast("string"))
      case "UNIX" =>
        // epoch millis if ≥ 10^12 in magnitude, else seconds (the reference
        // auto-detects via string length)
        val n = c.cast("double")
        when(abs(n) >= 1e12, timestamp_millis(n.cast("long")))
          .otherwise(timestamp_seconds(n))
      case fmt => try_to_timestamp(c.cast("string"), lit(fmt))
    }
    val ts0 = coalesce(candidates: _*)
    val ts = if (sourceTz == "UTC") ts0 else to_utc_timestamp(ts0, sourceTz)
    FieldOps.set(df, target,
      date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
  }

  /** Split a timestamp into its parts struct. */
  def datetimeExtractor(df: DataFrame, source: String, target: String): DataFrame =
    FieldOps.set(df, target, datetimeParts(df, source))

  /** The split_@timestamp struct for `source` (see [[datetimeExtractor]]). */
  def datetimeParts(df: DataFrame, source: String): Column = {
    import org.apache.spark.sql.types.StringType
    val isString = FieldOps.get(df.schema, source).exists(_._2 == StringType)
    val (ts, tzName) =
      if (isString) {
        // the reference keeps the SOURCE's own offset (TimeParser
        // .from_string, datetime_extractor/processor.py): field values are
        // the wall-clock digits as written, timezone is the offset's name
        // ("UTC", "UTC+01:00"). Parse the naive part; name the offset.
        val raw = FieldOps.getOrNull(df.schema, source).cast("string")
        val offRe = """([+-]\d{2}:\d{2}|[+-]\d{4}|Z)$"""
        val off = regexp_extract(raw, offRe, 1)
        val name = when(off === "" || off === "Z" ||
            off === "+00:00" || off === "+0000", lit("UTC"))
          .otherwise(concat(lit("UTC"), off))
        (to_timestamp(regexp_replace(raw, offRe, "")), name)
      } else (toTs(FieldOps.getOrNull(df.schema, source)), lit("UTC"))
    struct(
      year(ts).as("year"), month(ts).as("month"), dayofmonth(ts).as("day"),
      hour(ts).as("hour"), minute(ts).as("minute"), second(ts).as("second"),
      (unix_micros(ts) % 1000000).as("microsecond"),
      date_format(ts, "EEEE").as("weekday"),
      tzName.as("timezone"))
  }

  /** Difference `a - b` in the requested unit written to `target`, with an
    * optional unit suffix (show_unit in the reference).
    */
  def timestampDiffer(df: DataFrame, fieldA: String, fieldB: String,
                      target: String, unit: String = "ms",
                      showUnit: Boolean = false): DataFrame = {
    val a = toTs(FieldOps.getOrNull(df.schema, fieldA))
    val b = toTs(FieldOps.getOrNull(df.schema, fieldB))
    val micros = unix_micros(a) - unix_micros(b)
    val scaled: Column = unit match {
      case "s" => (micros / 1000000L).cast("long")
      case "ms" => (micros / 1000L).cast("long")
      case "ns" => micros * 1000L
      case _ => micros
    }
    val out = if (showUnit) concat(scaled.cast("string"), lit(" " + unit))
              else scaled.cast("string")
    FieldOps.set(df, target, out)
  }

  private def toTs(c: Column): Column = c // caller passes timestamp-typed or
  // pre-parsed columns; string inputs should go through timestamper first

  // ------------------------------------------------- full reference fidelity

  /** Python strptime directive → Java DateTimeFormatter pattern. Unmapped
    * letters are single-quoted (Java treats bare letters as pattern
    * symbols). Single-letter day/hour/month forms accept both padded and
    * unpadded values, like strptime does.
    */
  def strptimeToJava(fmt: String, padded: Boolean = false): String = {
    val map =
      if (padded) Map(
        'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd", 'H' -> "HH",
        'I' -> "hh", 'M' -> "mm", 'S' -> "ss", 'f' -> "SSSSSS", 'z' -> "XXX",
        'Z' -> "zzz", 'A' -> "EEEE", 'a' -> "EEE", 'B' -> "MMMM", 'b' -> "MMM",
        'p' -> "a", 'j' -> "DDD", '%' -> "%")
      else Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "M", 'd' -> "d", 'H' -> "H",
      'I' -> "h", 'M' -> "m", 'S' -> "s", 'f' -> "SSSSSS", 'z' -> "XXX",
      'Z' -> "zzz", 'A' -> "EEEE", 'a' -> "EEE", 'B' -> "MMMM", 'b' -> "MMM",
      'p' -> "a", 'j' -> "DDD", '%' -> "%")
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        sb.append(map.getOrElse(fmt.charAt(i + 1), fmt.charAt(i + 1).toString))
        i += 2
      } else {
        if (c.isLetter) sb.append("'").append(c).append("'")
        else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Does a strptime format carry its own timezone? */
  def strptimeHasTz(fmt: String): Boolean =
    fmt.contains("%z") || fmt.contains("%Z")

  /** Lenient ISO-8601 patterns in try order — tz-aware first, fractional
    * before whole seconds (reference TimeParser.from_string is
    * ciso8601-lenient, util/time.py:16-45).
    */
  private val isoTzPatterns = Seq(
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX", "yyyy-MM-dd'T'HH:mmXXX",
    "yyyy-MM-dd HH:mm:ss.SSSSSSXXX", "yyyy-MM-dd HH:mm:ss.SSSXXX",
    "yyyy-MM-dd HH:mm:ssXXX", "yyyy-MM-dd HH:mmXXX")
  private val isoNaivePatterns = Seq(
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS", "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd'T'HH:mm",
    "yyyy-MM-dd HH:mm:ss.SSSSSS", "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm", "yyyy-MM-dd")

  /** Parse a string column as a lenient ISO-8601 instant; naive values are
    * interpreted in `sourceTz`. Digit-only strings are rejected (they are
    * UNIX timestamps, not ISO).
    */
  def parseIso(s: Column, sourceTz: String): Column = {
    val guard = s.rlike("^\\d{4}-\\d{2}-\\d{2}") && !s.rlike("^\\d+$")
    val withTz = coalesce(isoTzPatterns.map(p => try_to_timestamp(s, lit(p))): _*)
    val naive = coalesce(isoNaivePatterns.map(p => try_to_timestamp(s, lit(p))): _*)
    when(guard, coalesce(withTz, to_utc_timestamp(naive, sourceTz)))
  }

  /** UNIX-epoch string → instant (reference `_normalize_unix_timestamp`,
    * util/time.py:130-156: ≤10 digits = seconds, each extra digit shifts
    * the decimal point).
    */
  def parseUnix(s: Column): Column = {
    val digits = s.rlike("^\\d+$")
    val n = s.cast("long")
    val len = length(s)
    val micros =
      when(len <= 10, n * 1000000L)
        .when(len === 11, n * 100000L)
        .when(len === 12, n * 10000L)
        .when(len === 13, n * 1000L)
        .when(len === 14, n * 100L)
        .when(len === 15, n * 10L)
        .when(len === 16, n)
    when(digits, timestamp_micros(micros))
  }

  private val dayNames =
    "(?:Monday|Tuesday|Wednesday|Thursday|Friday|Saturday|Sunday|Mon|Tue|Wed|Thu|Fri|Sat|Sun)"

  /** Parse per one source_format entry (ISO8601 | UNIX | strptime).
    * Spark's post-3.0 parser rejects day-of-week directives for PARSING
    * (E/EEEE are format-only), and %A/%a are validation-only in strptime
    * anyway — the date comes from the other directives — so the day name
    * is stripped from both pattern and input.
    */
  def parseWithFormat(s0: Column, fmt: String, sourceTz: String): Column =
    fmt match {
      case "ISO8601" => parseIso(s0, sourceTz)
      case "UNIX" => parseUnix(s0)
      case strp0 =>
        val hasDayName = strp0.contains("%A") || strp0.contains("%a")
        val (strp, s) =
          if (hasDayName)
            (strp0.replace("%A", "").replace("%a", ""),
              regexp_replace(s0, dayNames, ""))
          else (strp0, s0)
        // adjacent numeric directives (e.g. %Y%m%d%H%M%S) are ambiguous
        // for variable-width letters; a strict zero-padded variant is the
        // fallback — strptime itself accepts both forms
        val parsed = coalesce(
          try_to_timestamp(s, lit(strptimeToJava(strp))),
          try_to_timestamp(s, lit(strptimeToJava(strp, padded = true))))
        if (strptimeHasTz(strp)) parsed else to_utc_timestamp(parsed, sourceTz)
    }

  /** Render an instant as the Python `datetime.isoformat()` string in
    * `targetTz`, with `+00:00` → `Z` (timestamper output contract,
    * processor.py:61-63): microseconds only when non-zero, 6 digits.
    */
  def isoformatIn(ts: Column, targetTz: String): Column = {
    val wall = from_utc_timestamp(ts, targetTz)
    val base = date_format(wall, "yyyy-MM-dd'T'HH:mm:ss")
    val micros = date_format(wall, "SSSSSS")
    val withMicros =
      when(micros =!= "000000", concat(base, lit("."), micros)).otherwise(base)
    val offSec = (unix_seconds(wall) - unix_seconds(ts)).cast("long")
    val sign = when(offSec < 0, "-").otherwise("+")
    val absSec = abs(offSec)
    val offStr = when(offSec === 0, lit("Z")).otherwise(concat(
      sign,
      lpad((absSec / 3600).cast("long").cast("string"), 2, "0"), lit(":"),
      lpad(((absSec % 3600) / 60).cast("long").cast("string"), 2, "0")))
    concat(withMicros, offStr)
  }

  /** Python float repr of `micros / scaleMicros` without scientific
    * notation (Python str(float) stays positional far beyond where
    * Java/Spark switch to E-notation). `fracDigits` = decimal digits of
    * one micro in the unit (6 for s, 3 for ms, 0 for ns).
    */
  def pyFloatOfMicros(micros: Column, fracDigits: Int): Column = {
    if (fracDigits == 0) // ns: integer-valued, always ".0"
      return concat((micros * 1000L).cast("string"), lit(".0"))
    val unit = math.pow(10, fracDigits).toLong
    val sign = when(micros < 0, "-").otherwise("")
    val a = abs(micros)
    val intPart = (a / unit).cast("long").cast("string")
    val rem = (a % unit).cast("long")
    val frac = when(rem === 0, lit("0")).otherwise(
      regexp_replace(lpad(rem.cast("string"), fracDigits, "0"), "0+$", ""))
    concat(sign, intPart, lit("."), frac)
  }
}
