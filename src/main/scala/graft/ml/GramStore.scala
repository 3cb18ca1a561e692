package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental gram-count store — corpus statistics that UPDATE as data
  * lands instead of re-scanning the corpus per run. At 100 TB the
  * reference LM behind perplexity gating (CCNet's architecture) is
  * retrained every time its exemplar corpus grows; with this store each
  * new batch pays ONE batch-sized fused count pass
  * ([[CorpusStats.fusedGramCountsN]]) appended as `(kind, gram, count,
  * batch_id)` rows, and training reads the store's merged view — a
  * vocabulary×batches-sized scan, never the corpus. Because batch
  * counts SUM exactly to the one-shot counts, store-trained scores are
  * bit-identical to corpus-trained ones (spec- and oracle-gated).
  *
  * The operational discipline is the dedup_ingest key store's:
  *  - a `_graft_grams.json` marker pins the gram ORDERS the store was
  *    built with (appending a different shape would silently leave
  *    higher-order tables partial — refused loudly instead);
  *  - appends are idempotent per `batchId` — a replayed batch is a
  *    no-op, so at-least-once delivery never double-counts;
  *  - [[compact]] folds the per-batch rows into one row per (kind,
  *    gram) with the crash-safe park-swap of the ingest compactor.
  *
  * Reference behavior context: fkie-cad/Logprep has no corpus-LM
  * machinery; this extends the engine's training-data family
  * (bigramLogProbAgainst / trigramStupidBackoff) with the incremental
  * form those operators need in production.
  */
object GramStore {

  private val Marker = "_graft_grams.json"

  private def markerPath(store: String) =
    new org.apache.hadoop.fs.Path(store, Marker)

  private def fs(spark: SparkSession, store: String) =
    markerPath(store).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The store's pinned gram orders (marker-recorded at first append).
    * Fails loudly on a directory that is not a gram store.
    */
  def orders(spark: SparkSession, store: String): Int = {
    val p = markerPath(store)
    val f = fs(spark, store)
    require(f.exists(p),
      s"$store carries no $Marker marker — not a GramStore (did you " +
        "point a scorer at a raw parquet directory?)")
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(txt)
    val o = Option(node.get("orders")).filter(_.isInt).map(_.asInt)
    require(o.isDefined, s"malformed $Marker at $store: $txt")
    o.get
  }

  /** Append one batch's gram counts (orders 1..`orders`, kind =
    * order−1). Idempotent per `batchId`: a batch already in the store
    * is a no-op, so streaming replays and batch-job retries never
    * double-count. The first append records the marker; later appends
    * must match its orders exactly.
    *
    * Single-writer discipline (the ingest key store's contract): the
    * seen-check then append is not atomic across two SIMULTANEOUS
    * writers using the same batchId — serialize appends per store
    * (Structured Streaming's one-query-per-checkpoint already does).
    */
  def append(batch: DataFrame, textCol: String, store: String,
             batchId: String, orders: Int = 2): Unit = {
    require(batchId.nonEmpty && batchId != "__compact",
      s"batchId must be non-empty and not the reserved `__compact`")
    val spark = batch.sparkSession
    val f = fs(spark, store)
    val exists = f.exists(markerPath(store))
    if (exists) {
      val pinned = GramStore.orders(spark, store)
      require(pinned == orders,
        s"gram store $store is pinned to orders=$pinned but this append " +
          s"is shaped for orders=$orders — mixed shapes leave the " +
          "higher-order tables silently partial; use a separate store")
      val seen = spark.read.parquet(store).select(col("bid"))
        .filter(col("bid") === batchId).limit(1).count() > 0
      if (seen) return // replay: counts already in — never double-count
    }
    CorpusStats.fusedGramCountsN(batch, textCol, orders)
      .select(col("kind"), col("g"), col("c"))
      .withColumn("bid", lit(batchId))
      .write.mode("append").parquet(store)
    if (!exists) {
      val out = f.create(markerPath(store), true)
      try out.write(s"""{"orders":$orders}""".getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** The merged count table, in [[CorpusStats.fusedGramCountsN]]'s
    * exact output shape `(kind, gd, c, g)` — batch counts sum per
    * (kind, gram) in ONE hash aggregate over the store (vocabulary ×
    * batches rows, never corpus-sized), digest projected AFTER the
    * merge so the aggregate keeps the fixed-width fast path.
    */
  def counts(spark: SparkSession, store: String): DataFrame =
    spark.read.parquet(store)
      .groupBy(col("kind"), col("g"))
      .agg(sum(col("c")).as("c"))
      .select(col("kind"), unhex(md5(col("g"))).as("gd"),
        col("c"), col("g"))

  /** Fold the per-batch rows into one row per (kind, gram) under a
    * single `__compact` batch id — the crash-safe park-swap of
    * [[graft.pipeline.CurationStages.compactIngestStore]]: write the
    * merged table beside the store, park the old directory, move the
    * new one in, delete the parked copy; a stale `.compact-old` from a
    * crashed run is cleaned first. Returns (rows before, rows after).
    * Appends after compaction keep working (their bids differ from
    * `__compact` by the non-empty requirement plus this reserved name).
    */
  def compact(spark: SparkSession, store: String): (Long, Long) = {
    val f = fs(spark, store)
    val ords = orders(spark, store) // also validates the marker
    val dir = new org.apache.hadoop.fs.Path(store)
    val tmp = new org.apache.hadoop.fs.Path(store + ".compact-tmp")
    val old = new org.apache.hadoop.fs.Path(store + ".compact-old")
    if (f.exists(old)) f.delete(old, true) // stale parked copy
    if (f.exists(tmp)) f.delete(tmp, true)
    val before = spark.read.parquet(store).count()
    spark.read.parquet(store)
      .groupBy(col("kind"), col("g")).agg(sum(col("c")).as("c"))
      .withColumn("bid", lit("__compact"))
      .write.parquet(store + ".compact-tmp")
    // the tmp dir has no marker yet — write it before the swap so the
    // post-swap store is complete the moment it exists
    val mout = f.create(new org.apache.hadoop.fs.Path(tmp, Marker), true)
    try mout.write(s"""{"orders":$ords}""".getBytes("UTF-8"))
    finally mout.close()
    require(f.rename(dir, old), s"compact: could not park $store")
    require(f.rename(tmp, dir), s"compact: could not swap in $tmp")
    f.delete(old, true)
    (before, spark.read.parquet(store).count())
  }
}
