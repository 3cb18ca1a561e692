package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders. `events.parquet` has shipped with two physical
  * `ts` encodings across testdata generations: TIMESTAMP(NANOS) (which
  * Spark's µs-native reader rejects — we read nanos-as-long via
  * spark.sql.legacy.parquet.nanosAsLong and floor-convert) and plain
  * TIMESTAMP(MICROS) (readable directly). `events` normalizes both to a
  * µs TimestampType column so every consumer sees one schema.
  */
object Tables {
  // r17 optimization note: a guarded round-robin spread after the read
  // (guide §2.5's unsplittable-input fix — the testdata tables are one
  // row group, so every scan plans to ONE task) was implemented and
  // A/B-measured at sf0.1: net LOSS (ml_hybrid_topk 1.36→1.79 s, q2
  // 0.44→0.59, bigram_xent 0.91→1.11; only minhash/pretrain moved ≤5%
  // the other way). At 5k docs the per-stage fixed overhead of the
  // extra exchange — and the broadcast builds it drags behind an
  // exchange — outweighs the single-core kernel time it parallelizes;
  // at production scale the guard made it the identity anyway. Removed;
  // the measurement lives in OPTIMIZATION_r17.md.
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` as a proper µs TimestampType column. When the file
    * carries nanos (surfaced as LongType under nanosAsLong), nanos →
    * micros uses INTEGER division (`div`): `/` is double division in
    * Spark and its rounding at the 16th significant digit disagrees with
    * the truncation every other reader (DuckDB included) applies. A
    * native µs TIMESTAMP column passes through untouched.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // session tz is pinned UTC, so NTZ→instant is the identity the
        // oracle (DuckDB TIMESTAMP, also naive-as-UTC) applies
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // µs parquet timestamps without isAdjustedToUTC would otherwise
      // infer TIMESTAMP_NTZ (Spark ≥3.4), which unix_micros/convert_tz
      // reject; classic TimestampType under the UTC session timezone is
      // bit-identical to DuckDB's naive-as-UTC TIMESTAMP reads.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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
      // guide §3.1/§9: allow shuffled-hash join where its size
      // conditions hold instead of always sorting both sides — the
      // planner still falls back to sort-merge when a build side could
      // not fit a per-partition hash map, so this only removes sorts
      // the join never needed. Not a local-mode tweak: the same
      // preference holds on a cluster (measured here on the containment
      // x100 tier: the two per-doc-count joins stop sorting the
      // pre-threshold pair table).
      .config("spark.sql.join.preferSortMergeJoin", "false")
}
