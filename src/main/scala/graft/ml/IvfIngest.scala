package graft.ml

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental ingest into a written IVF index — the production pattern
  * where embeddings keep landing after the index is built. The classic
  * [[Similarity.ivfWriteIndex]] layout is one immutable write; re-running
  * it per batch would rewrite the whole corpus, and parquet `append`
  * would double rows on every replay. This store follows the
  * [[GramStore]] ingest discipline instead:
  *
  *   - layout `path/bid=<batchId>/bucket=N/part-*.parquet` — each batch
  *     is ONE `bid=` partition, committed by a rename (the rename IS
  *     the commit point); the seen-check is an O(1) directory probe, so
  *     replays no-op and crash-abandoned staging dirs (dot-prefixed,
  *     invisible to reads) are reclaimed by the retry;
  *   - the geometry marker (`_graft_ivf.json`, kind + centroids +
  *     `layout: bidpart`) is written BEFORE any data — marker-less data
  *     directories are refused, never adopted, and appends against a
  *     classic single-write index are refused loudly (its layout has
  *     root-level `bucket=` dirs; mixing the two breaks partition
  *     discovery);
  *   - readers are unchanged: partition discovery yields (bid, bucket)
  *     columns and the batch readers' bucket filter prunes at planning
  *     inside every bid — [[Similarity.ivfReadTopKBatch]] /
  *     [[Similarity.ivfSqReadTopKBatch]] work on both layouts.
  *
  * Geometry is pinned at creation: bucket assignment under one centroid
  * set is incomparable with another, so re-centering = re-ingest into a
  * fresh index (the dedup_ingest re-banding convention). Err HIGH on
  * the training corpus — centroids trained on the first batch serve
  * every later batch, and a drifting stream eventually deserves a
  * re-index (tuned nprobe from [[Recall.tuneNprobe]] restores recall in
  * the meantime at a visible probe-width cost).
  *
  * Kinds: `flat` stores (id, vec, bucket) — tunable, exact-verifiable;
  * `sq8` stores (id, scale, codes, bucket) — 4× smaller, IP ranking.
  */
object IvfIngest {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def escape(bid: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(bid)

  /** Create an ingestable index: marker only, no data — the marker
    * rides ahead of the first append (the GramStore crash rule: a
    * crash after create leaves an empty pinned store and the retry
    * appends exactly once). Idempotent when the existing marker
    * matches; refuses a kind/geometry/layout mismatch, and refuses to
    * adopt a marker-less directory that already holds data.
    */
  def create(spark: SparkSession, path: String,
             centroids: Seq[Seq[Double]], kind: String = "flat"): Unit = {
    require(kind == "flat" || kind == "sq8",
      s"IvfIngest: kind `$kind` not ingestable (flat | sq8)")
    require(centroids.nonEmpty, "IvfIngest.create: no centroids")
    val f = fs(spark, path)
    val dir = new Path(path)
    Similarity.ivfIndexGeometry(spark, path) match {
      case Some((mk, mc, _)) =>
        require(mk == kind && mc == centroids &&
            Similarity.ivfIndexLayout(spark, path).contains("bidpart"),
          s"IvfIngest: $path already carries a DIFFERENT index " +
            "(kind/geometry/layout mismatch) — appending under foreign " +
            "geometry silently collapses recall; use a fresh directory " +
            "or re-ingest")
      case None =>
        require(!f.exists(dir) || f.listStatus(dir).forall { s =>
            val n = s.getPath.getName
            n.startsWith("_") || n.startsWith(".")
          },
          s"$path holds data but no geometry marker — not an IVF " +
            "index; refusing to adopt it (point the ingest at a fresh " +
            "directory)")
        f.mkdirs(dir)
        Similarity.writeIvfMarker(spark, path, kind, centroids,
          Seq.empty, layout = Some("bidpart"))
    }
  }

  /** Append one batch under `batchId`. Idempotent per batch id (the
    * bid-directory probe); the marker's geometry assigns buckets.
    * Returns true when the batch was committed by THIS call, false
    * when a previous attempt already had.
    */
  def append(batch: DataFrame, idCol: String, vecCol: String,
             path: String, batchId: String): Boolean = {
    require(batchId.nonEmpty, "IvfIngest.append: empty batchId")
    val spark = batch.sparkSession
    val (kind, centroids, _) = Similarity.ivfIndexGeometry(spark, path)
      .getOrElse(throw new IllegalArgumentException(
        s"IvfIngest: $path carries no geometry marker — create(...) " +
          "the index first (geometry is pinned at creation)"))
    require(Similarity.ivfIndexLayout(spark, path).contains("bidpart"),
      s"IvfIngest: the index at $path is the classic single-write " +
        "layout — appending would mix root-level and bid-level bucket " +
        "partitions and break partition discovery; rebuild it as an " +
        "ingestable index (IvfIngest.create) to ingest into it")
    val f = fs(spark, path)
    val part = new Path(path, "bid=" + escape(batchId))
    if (f.exists(part)) return false // committed by a previous attempt
    val stage = new Path(path, ".stage-" + escape(batchId))
    if (f.exists(stage)) f.delete(stage, true)
    val rows = kind match {
      case "flat" =>
        // columns match ivfWriteIndex's layout exactly (original
        // vector column, untouched type) so every flat reader works
        // unchanged on the ingested index
        batch.select(col(idCol), col(vecCol),
            Similarity.assignBucket(col(vecCol), centroids).as("bucket"))
      case "sq8" =>
        Similarity.sq8Staged(batch, vecCol)
          .withColumn("bucket",
            Similarity.assignBucket(col(vecCol), centroids))
          .select(col(idCol), col("__scale").as("scale"),
            col("__codes").as("codes"), col("bucket"))
      case other => throw new IllegalArgumentException(
        s"IvfIngest: kind `$other` not ingestable (flat | sq8)")
    }
    rows.write.partitionBy("bucket").parquet(stage.toString)
    // the rename IS the commit point
    require(f.rename(stage, part),
      s"IvfIngest: could not commit $stage -> $part")
    true
  }
}
