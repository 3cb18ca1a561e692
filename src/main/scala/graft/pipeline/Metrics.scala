package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipeline metrics via Spark's native `Dataset.observe` — the
  * Spark-idiomatic stand-in for the reference's per-processor Prometheus
  * counters (`Processor.Metrics` / `Pipeline.metrics`,
  * logprep/metrics/metrics.py): aggregates ride the existing job
  * (zero extra passes, streaming-compatible — observed metrics surface
  * per micro-batch via `StreamingQueryListener`/`QueryExecutionListener`).
  *
  * Observed per batch:
  *  - `events_processed`  — rows through the pipeline
  *  - `events_failed`     — rows carrying failure tags
  *  - `tags_total`        — total tag count (≈ number of warnings)
  */
object Metrics {

  val ObservationName = "graft_pipeline"

  def observed(df: DataFrame): DataFrame = {
    val tags: Column =
      if (df.columns.contains("tags"))
        coalesce(col("tags").cast("array<string>"), array().cast("array<string>"))
      else array().cast("array<string>")
    df.observe(ObservationName,
      count(lit(1)).as("events_processed"),
      count(when(size(tags) > 0, 1)).as("events_failed"),
      coalesce(sum(size(tags)), lit(0L)).as("tags_total"))
  }

  /** Batch-mode convenience: run `action` on the observed frame and
    * return the metrics row as a map.
    */
  def collectWith(df: DataFrame)(action: DataFrame => Unit): Map[String, Long] = {
    val observation = new org.apache.spark.sql.Observation(ObservationName)
    val tags: Column =
      if (df.columns.contains("tags"))
        coalesce(col("tags").cast("array<string>"), array().cast("array<string>"))
      else array().cast("array<string>")
    val observedDf = df.observe(observation,
      count(lit(1)).as("events_processed"),
      count(when(size(tags) > 0, 1)).as("events_failed"),
      coalesce(sum(size(tags)), lit(0L)).as("tags_total"))
    action(observedDf)
    observation.get.map { case (k, v) => k -> v.toString.toLong }
  }
}
