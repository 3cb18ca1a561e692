package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stateful streaming operators — the event-time surface the reference
  * lacks entirely (SURVEY §2.4: no watermarks, no windows, no cross-event
  * state). Exposed as engine stage types for streaming pipelines; state
  * is bounded by watermarks so they run indefinitely at cluster scale.
  */
object StreamingOps {

  /** Tumbling-window counts/sums per key with a watermark bounding state. */
  def windowedAgg(df: DataFrame, tsCol: String, watermark: String,
                  windowLen: String, keyCols: Seq[String],
                  aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), windowLen) +: keyCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Cross-event exact dedup with bounded state: drops duplicates on
    * `keys` arriving within the watermark horizon
    * (`dropDuplicatesWithinWatermark` — state expires, unlike a global
    * distinct which grows forever).
    */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, watermark: String,
                           keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Late-data-tolerant sessionization: session window per key (gap-based
    * `session_window`), watermark-bounded.
    */
  def sessionWindows(df: DataFrame, tsCol: String, watermark: String,
                     gap: String, keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy((session_window(col(tsCol), gap) +: keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n_events"))
}
