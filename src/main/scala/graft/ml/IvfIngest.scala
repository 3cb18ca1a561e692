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
  *     [[Similarity.ivfSqReadTopKBatch]] work on both layouts;
  *   - [[compact]] folds the per-batch partitions into one
  *     `bid=__compact` partition (one file per bucket) and records the
  *     folded batch ids in the marker's ledger, so replays of folded
  *     batches still no-op — the small-files control that keeps a
  *     year of batches from turning partition discovery into the
  *     dominant query cost. Readers stay safe across the fold's
  *     park-swap instant ([[ParkSwap.readerDir]]).
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
  * `sq8` stores (id, scale, codes, bucket) — 4× smaller, IP ranking;
  * `pq` stores (id, codes, bucket) — m bytes/vector residual codes
  * against codebooks pinned at creation alongside the centroids
  * (train both on the first batch; the memory-scale rung).
  */
object IvfIngest {

  private val CompactBid = "__compact"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def escape(bid: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(bid)

  private def unescape(dirName: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(dirName)

  /** Create an ingestable index: marker only, no data — the marker
    * rides ahead of the first append (the GramStore crash rule: a
    * crash after create leaves an empty pinned store and the retry
    * appends exactly once). Idempotent when the existing marker
    * matches; refuses a kind/geometry/layout mismatch, and refuses to
    * adopt a marker-less directory that already holds data.
    */
  def create(spark: SparkSession, path: String,
             centroids: Seq[Seq[Double]], kind: String = "flat",
             books: Seq[Seq[Seq[Double]]] = Seq.empty): Unit = {
    require(kind == "flat" || kind == "sq8" || kind == "pq",
      s"IvfIngest: kind `$kind` not ingestable (flat | sq8 | pq)")
    require(centroids.nonEmpty, "IvfIngest.create: no centroids")
    require((kind == "pq") == books.nonEmpty,
      if (kind == "pq")
        "IvfIngest.create: kind pq needs trained residual codebooks " +
          "(Similarity.ivfPqTrain) — codes are meaningless without them"
      else s"IvfIngest.create: kind $kind takes no codebooks")
    val f = fs(spark, path)
    ParkSwap.recover(f, path) // writer entry: repair an interrupted fold
    val dir = new Path(path)
    Similarity.ivfIndexGeometry(spark, path) match {
      case Some((mk, mc, mb)) =>
        require(mk == kind && mc == centroids && mb == books &&
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
          books, layout = Some("bidpart"))
    }
  }

  /** Append one batch under `batchId`. Idempotent per batch id (the
    * bid-directory probe); the marker's geometry assigns buckets.
    * Returns true when the batch was committed by THIS call, false
    * when a previous attempt already had.
    */
  def append(batch: DataFrame, idCol: String, vecCol: String,
             path: String, batchId: String): Boolean = {
    require(batchId.nonEmpty && batchId != CompactBid,
      s"IvfIngest.append: batchId must be non-empty and not the " +
        s"reserved `$CompactBid`")
    val spark = batch.sparkSession
    val f = fs(spark, path)
    ParkSwap.recover(f, path) // writer entry: repair an interrupted fold
    val (kind, centroids, books) = Similarity.ivfIndexGeometry(spark, path)
      .getOrElse(throw new IllegalArgumentException(
        s"IvfIngest: $path carries no geometry marker — create(...) " +
          "the index first (geometry is pinned at creation)"))
    require(Similarity.ivfIndexLayout(spark, path).contains("bidpart"),
      s"IvfIngest: the index at $path is the classic single-write " +
        "layout — appending would mix root-level and bid-level bucket " +
        "partitions and break partition discovery; rebuild it as an " +
        "ingestable index (IvfIngest.create) to ingest into it")
    // a batch whose partition a compact folded away must still no-op:
    // the marker's ledger (not the gone directory) carries the memory
    if (Similarity.ivfIndexFolded(spark, path).contains(batchId))
      return false
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
      case "pq" =>
        // the one-shot layout's exact projection (L2 coarse
        // assignment + residual PQ codes — shared builder, so
        // ingested rows are bit-identical to ivfPqWriteIndex's)
        Similarity.pqIndexRows(batch, idCol, vecCol, centroids, books)
          .select(col(idCol), col("codes"), col("bucket"))
      case other => throw new IllegalArgumentException(
        s"IvfIngest: kind `$other` not ingestable (flat | sq8 | pq)")
    }
    rows.write.partitionBy("bucket").parquet(stage.toString)
    // the rename IS the commit point
    require(f.rename(stage, part),
      s"IvfIngest: could not commit $stage -> $part")
    true
  }

  /** Count of live (unfolded) `bid=` batch partitions — the quantity
    * the `ann_ingest` stage's `compact_every:` knob thresholds on.
    * Metadata-only (one directory listing); the consolidated
    * `bid=__compact` partition is excluded, so the count resets to 0
    * after a fold.
    */
  def pendingBatchCount(spark: SparkSession, path: String): Int = {
    val f = fs(spark, path)
    val dir = new Path(path)
    if (!f.exists(dir)) return 0
    f.listStatus(dir).iterator.map(_.getPath.getName)
      .count(n => n.startsWith("bid=") && unescape(n.drop(4)) != CompactBid)
  }

  /** Count of visible data files under the index's `bid=` partitions —
    * the quantity compaction exists to bound (staging and metadata
    * files excluded). Metadata-only; never reads data.
    */
  def dataFileCount(spark: SparkSession, path: String): Long = {
    val f = fs(spark, path)
    val dir = new Path(path)
    if (!f.exists(dir)) return 0L
    f.listStatus(dir).iterator
      .filter(_.getPath.getName.startsWith("bid="))
      .map { bidDir =>
        val it = f.listFiles(bidDir.getPath, true)
        var n = 0L
        while (it.hasNext) {
          val nm = it.next().getPath.getName
          if (!nm.startsWith("_") && !nm.startsWith(".")) n += 1
        }
        n
      }.sum
  }

  /** Fold the per-batch `bid=` partitions into one `bid=__compact`
    * partition — the small-files control for a long-lived ingest
    * index: N batches × C buckets leaves N·C data files (and N·C
    * directories for partition discovery to list), which at production
    * batch counts dominates both the planning-time listing and the
    * scan's per-file open cost. The fold is a pure re-layout — rows
    * are unioned, never aggregated — re-shuffled on `bucket` so each
    * bucket lands as ONE file, and committed by [[ParkSwap]]'s
    * park-swap (marker written LAST into the tmp build; an
    * interrupted swap rolls back on the next writer entry, and
    * readers resolve through the parked copy meanwhile). Every folded
    * batch id lands in the marker's `folded` ledger, so a batch
    * replayed after compaction still no-ops instead of
    * double-ingesting (the GramStore ledger rule — folded ids come
    * from the partition DIRECTORIES, so even an empty batch's commit
    * survives the fold). Readers are unchanged: bucket pruning works
    * identically on `bid=__compact/bucket=N`.
    *
    * Returns (data files before, data files after). Single-writer
    * discipline: serialize with appends.
    */
  def compact(spark: SparkSession, path: String): (Long, Long) = {
    val f = fs(spark, path)
    ParkSwap.recover(f, path)
    val (kind, centroids, books) = Similarity.ivfIndexGeometry(spark, path)
      .getOrElse(throw new IllegalArgumentException(
        s"IvfIngest: $path carries no geometry marker — not an IVF index"))
    require(Similarity.ivfIndexLayout(spark, path).contains("bidpart"),
      s"IvfIngest: the index at $path is the classic single-write " +
        "layout — it is already one immutable write per bucket; there " +
        "is nothing to fold")
    val dir = new Path(path)
    val live: Set[String] = f.listStatus(dir).iterator
      .map(_.getPath.getName).filter(_.startsWith("bid="))
      .map(n => unescape(n.drop(4))).toSet
    val before = dataFileCount(spark, path)
    if (live.isEmpty) return (before, before) // nothing ingested yet
    val folded = Similarity.ivfIndexFolded(spark, path)
    val tmp = ParkSwap.tmpDir(path)
    if (f.exists(new Path(tmp))) f.delete(new Path(tmp), true)
    // partition discovery yields (…data…, bid, bucket); bid is dropped
    // (its memory moves into the ledger) and ONE shuffle on the bucket
    // key lands each bucket as one file under the consolidated bid
    spark.read.parquet(path)
      .drop("bid")
      .withColumn("bid", lit(CompactBid))
      .repartition(col("bucket"))
      .write.partitionBy("bid", "bucket").parquet(tmp)
    // marker LAST while building tmp — a tmp with a marker is complete
    Similarity.writeIvfMarker(spark, tmp, kind, centroids, books,
      layout = Some("bidpart"), folded = folded ++ (live - CompactBid))
    ParkSwap.swap(f, path)
    (before, dataFileCount(spark, path))
  }
}
