package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders. `events.parquet` carries TIMESTAMP(NANOS) which
  * Spark's µs-native reader rejects; we read nanos-as-long
  * (spark.sql.legacy.parquet.nanosAsLong) and floor-convert to a µs
  * timestamp — the same truncation DuckDB applies casting TIMESTAMP_NS →
  * TIMESTAMP, keeping engine and oracle bit-identical.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` as a proper µs TimestampType column. Nanos → micros
    * uses INTEGER division (`div`): `/` is double division in Spark and
    * its rounding at the 16th significant digit disagrees with the
    * truncation every other reader (DuckDB included) applies.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Reference semantics are try-style: a malformed value yields a
      // per-event warning tag, never an aborted job (abc/processor.py:
      // 228-252 catches everything). At 100 TB a single bad row must not
      // kill the pipeline, so casts/division follow NULL-on-error.
      .config("spark.sql.ansi.enabled", "false")
      // dissect indirect-capture rewrites of the same map key must take
      // the newest value (reference dicts overwrite in place)
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
}
