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
  def datetimeExtractor(df: DataFrame, source: String, target: String): DataFrame = {
    val ts = toTs(FieldOps.getOrNull(df.schema, source))
    FieldOps.set(df, target, struct(
      year(ts).as("year"), month(ts).as("month"), dayofmonth(ts).as("day"),
      hour(ts).as("hour"), minute(ts).as("minute"), second(ts).as("second"),
      (unix_micros(ts) % 1000000).as("microsecond"),
      date_format(ts, "EEEE").as("weekday")))
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
}
