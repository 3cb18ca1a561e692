package graft.ml

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental ingest into a BM25 lexical index — the term-channel twin
  * of [[IvfIngest]], and the STRUCTURAL answer to LexIndex staleness
  * (VERDICT r16 missing #2 measured it; this removes it): the frozen
  * layout pins df/n_docs/avgdl at write, so every document landing
  * after the build is invisible until a re-index — `doc_drift_pct` IS
  * that blind fraction. Here nothing is frozen. df was ALREADY computed
  * at read time from the read postings (the frozen reader's df is a
  * per-term count over `postings/`), so growing the postings grows df
  * correctly for free; n_docs and avgdl become read-time sums over
  * per-batch stats sidecars. Retrieval is exact BM25 over exactly the
  * committed batches, always — the blind fraction is zero by layout.
  *
  * Store layout (the [[GramStore]]/[[IvfIngest]] ingest discipline):
  *
  *  - `_graft_bm25.json` marker with `layout: bidpart` — written at
  *    [[create]] BEFORE any data (marker-less data dirs are refused,
  *    never adopted); `buckets` pinned at creation (the term-hash
  *    geometry — mixed bucket counts would silently miss every row);
  *    the `folded` batch-id ledger keeps replays of compacted batches
  *    as no-ops;
  *  - `path/bid=<batchId>/tb=<bucket>/part-*.parquet` — one `bid=`
  *    partition per batch, rows `(t, id, tf, dl)` partitioned by the
  *    term's hash bucket (same `pmod(xxhash64(t), buckets)` expression
  *    as the frozen writer), committed by a rename (the rename IS the
  *    commit point; the seen-check is an O(1) directory probe, so
  *    replays no-op);
  *  - `path/bid=<batchId>/_graft_lex_stats.json` — the batch's doc
  *    count and summed doc length, written into the staging dir before
  *    the commit rename (underscore-prefixed: invisible to parquet
  *    reads). [[LexIndex.bm25ReadTopK]]'s bidpart dispatch sums these
  *    sidecars — a metadata-only read, O(batches), bounded by
  *    [[compact]] — so n_docs/avgdl are always exactly the committed
  *    total. Equality with the full-scan scorer holds up to the
  *    floating-point summation ORDER of avgdl (per-batch partial sums
  *    vs one corpus aggregate — a last-ulp effect the 6-decimal score
  *    rounding erases; the oracle row `ml_bm25_ingest` shares
  *    `ml_bm25_topk`'s SQL verbatim and gates it per round).
  *
  * Reads prune exactly as the frozen layout: the query's term buckets
  * collect to literals and prune `tb=` directories at PLANNING inside
  * every `bid=`, and the term literal pushes into row-group stats — a
  * query touches O(query terms) of postings across all batches, never
  * the corpus. [[compact]] folds the per-batch partitions into one
  * `bid=__compact` (one file per bucket, merged stats sidecar, folded
  * ids into the marker ledger) via [[ParkSwap]], the small-files
  * control that keeps a year of micro-batches from turning partition
  * discovery into the dominant query cost.
  *
  * Caller discipline, stated: the store does not dedup ids — a doc id
  * appended in two batches carries two posting sets and double-counts
  * in df/n_docs (the [[IvfIngest]] two-vectors rule). Feed it admitted
  * rows (e.g. downstream of dedup_ingest), or accept the double count.
  */
object LexIngest {

  private val CompactBid = "__compact"
  private val StatsFile = "_graft_lex_stats.json"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def escape(bid: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(bid)

  private def unescape(dirName: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(dirName)

  private def markerJson(buckets: Int, folded: Set[String]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", 1) // tokenizer: Curation.words single-space split
    root.put("buckets", buckets)
    root.put("layout", "bidpart")
    val arr = root.putArray("folded")
    folded.toSeq.sorted.foreach(arr.add)
    mapper.writeValueAsString(root)
  }

  private def writeBatchStats(f: FileSystem, dir: Path, nDocs: Long,
                              dlSum: Double): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("n_docs", nDocs)
    // Double.toString round-trips the exact IEEE value (the frozen
    // marker's avgdl rule)
    root.put("dl_sum", java.lang.Double.toString(dlSum))
    val out = f.create(new Path(dir, StatsFile), true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
  }

  /** Create an ingestable lex store: marker only, no data — the marker
    * rides ahead of the first append (the GramStore crash rule).
    * Idempotent when the existing marker matches; refuses a bucket or
    * layout mismatch, and refuses to adopt a marker-less directory
    * that already holds data.
    */
  def create(spark: SparkSession, path: String, buckets: Int = 64): Unit = {
    require(buckets >= 1, s"LexIngest: buckets must be >= 1 (got $buckets)")
    val f = fs(spark, path)
    ParkSwap.recover(f, path) // writer entry: repair an interrupted fold
    val dir = new Path(path)
    LexIndex.readMeta(spark, path) match {
      case Some(m) =>
        require(m.layout == "bidpart" && m.buckets == buckets,
          s"LexIngest: $path already carries a DIFFERENT lex index " +
            s"(layout ${m.layout}, buckets ${m.buckets}) — appending " +
            "under foreign term geometry silently misses every row; " +
            "use a fresh directory or re-ingest")
      case None =>
        require(!f.exists(dir) || f.listStatus(dir).forall { s =>
            val n = s.getPath.getName
            n.startsWith("_") || n.startsWith(".")
          },
          s"$path holds data but no ${LexIndex.MarkerFile} marker — " +
            "not a lex store; refusing to adopt it (point the ingest " +
            "at a fresh directory)")
        f.mkdirs(dir)
        LexIndex.commitMarker(f, path, markerJson(buckets, Set.empty))
    }
  }

  /** The store's bucket count, when `path` is an ingestable lex store
    * (None when no marker, or a frozen index, sits there) — what the
    * `lex_ingest` stage consults to validate an explicit `buckets:`
    * knob against the pinned geometry.
    */
  def storeBuckets(spark: SparkSession, path: String): Option[Int] =
    LexIndex.readMeta(spark, path)
      .filter(_.layout == "bidpart").map(_.buckets)

  /** Append one batch under `batchId`. Idempotent per batch id (the
    * bid-directory probe; the marker ledger covers folded batches).
    * Returns true when the batch was committed by THIS call.
    */
  def append(batch: DataFrame, idCol: String, textCol: String,
             path: String, batchId: String): Boolean = {
    require(batchId.nonEmpty && batchId != CompactBid,
      s"LexIngest.append: batchId must be non-empty and not the " +
        s"reserved `$CompactBid`")
    val spark = batch.sparkSession
    val f = fs(spark, path)
    ParkSwap.recover(f, path) // writer entry: repair an interrupted fold
    val meta = LexIndex.readMeta(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"LexIngest: $path carries no ${LexIndex.MarkerFile} marker — " +
          "create(...) the store first (bucket geometry is pinned at " +
          "creation)"))
    require(meta.layout == "bidpart",
      s"LexIngest: the index at $path is the frozen single-write " +
        "layout (LexIndex.write) — appending would mix `postings/` " +
        "and `bid=` partition trees and break discovery; create an " +
        "ingestable store (LexIngest.create) to ingest into")
    // a batch whose partition a compact folded away must still no-op:
    // the marker's ledger (not the gone directory) carries the memory
    if (meta.folded.contains(batchId)) return false
    val part = new Path(path, "bid=" + escape(batchId))
    if (f.exists(part)) return false // committed by a previous attempt
    val stage = new Path(path, ".stage-" + escape(batchId))
    if (f.exists(stage)) f.delete(stage, true)
    val docs = batch.select(col(idCol).as("id"),
        Curation.words(col(textCol)).as("__w"))
      .withColumn("dl", size(col("__w")).cast("double"))
    // the same one-row aggregate the frozen write computes — per batch
    // here, summed at read (docs with no words count toward both)
    val statsRow = docs.agg(count(lit(1)),
      coalesce(sum(col("dl")), lit(0.0))).head()
    val postings = docs
      .select(col("id"), col("dl"), explode(col("__w")).as("t"))
      .groupBy(col("id"), col("t"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .withColumn("tb", pmod(xxhash64(col("t")), lit(meta.buckets)))
    commitBatch(f, stage, part, postings, statsRow.getLong(0),
      statsRow.getDouble(1))
    true
  }

  /** Stage → stats sidecar → rename: the one commit path every batch
    * takes ([[append]] and [[migrate]] share it so the crash protocol
    * cannot fork).
    */
  private def commitBatch(f: FileSystem, stage: Path, part: Path,
                          postings: DataFrame, nDocs: Long,
                          dlSum: Double): Unit = {
    // one shuffle on the bucket key so each bucket lands as one file
    // per batch (the IvfIngest layout rule: a bucket is the read unit)
    postings.repartition(col("tb"))
      .write.partitionBy("tb").parquet(stage.toString)
    // stats sidecar INSIDE the staging dir, before the commit rename —
    // a committed partition always carries its stats
    writeBatchStats(f, stage, nDocs, dlSum)
    // the rename IS the commit point
    require(f.rename(stage, part),
      s"LexIngest: could not commit $stage -> $part")
  }

  /** Adopt a FROZEN LexIndex into a fresh ingestable store WITHOUT
    * re-tokenizing: the frozen postings are already the store's row
    * shape, so migration is one re-layout commit (the frozen corpus
    * becomes the store's first batch, under `batchId`) and the corpus
    * can keep growing from there with [[append]]. Stats carry over
    * from the frozen marker — n_docs exactly; dl_sum reconstructed as
    * avgdl × n_docs, which differs from the original corpus sum by at
    * most float-product error (a last-ulp avgdl effect the 6-decimal
    * score rounding erases — the bidpart read caveat, one step
    * further). Refuses a target that already holds ANY data or marker
    * (adoption means a fresh store; appending a frozen index's rows
    * into a live store would double-count its documents).
    */
  def migrate(spark: SparkSession, frozenPath: String, storePath: String,
              batchId: String = "migrated-frozen"): Unit = {
    require(batchId.nonEmpty && batchId != CompactBid,
      s"LexIngest.migrate: batchId must be non-empty and not the " +
        s"reserved `$CompactBid`")
    val meta = LexIndex.readMeta(spark, frozenPath).getOrElse(
      throw new IllegalArgumentException(
        s"LexIngest.migrate: $frozenPath carries no " +
          s"${LexIndex.MarkerFile} marker — not a LexIndex"))
    require(meta.layout == "frozen",
      s"LexIngest.migrate: $frozenPath is already an ingestable store " +
        "— nothing to migrate")
    val f = fs(spark, storePath)
    val dir = new Path(storePath)
    require(!f.exists(dir) || f.listStatus(dir).isEmpty,
      s"LexIngest.migrate: $storePath already holds data — adoption " +
        "targets a FRESH store (appending a frozen index into a live " +
        "store would double-count its documents)")
    create(spark, storePath, meta.buckets)
    val stage = new Path(storePath, ".stage-" + escape(batchId))
    if (f.exists(stage)) f.delete(stage, true)
    // same tb values ride along (identical bucket expression + count),
    // so the re-layout never re-hashes a term
    val postings = spark.read.parquet(frozenPath + "/postings")
      .select(col("id"), col("t"), col("tf"), col("dl"), col("tb"))
    commitBatch(f, stage, new Path(storePath, "bid=" + escape(batchId)),
      postings, meta.nDocs, meta.avgdl * meta.nDocs)
  }

  /** Count of live (unfolded) `bid=` batch partitions — what the
    * `lex_ingest` stage's `compact_every:` knob thresholds on.
    * Metadata-only; `bid=__compact` is excluded, so the count resets
    * to 0 after a fold.
    */
  def pendingBatchCount(spark: SparkSession, path: String): Int = {
    val f = fs(spark, path)
    val dir = new Path(path)
    if (!f.exists(dir)) return 0
    f.listStatus(dir).iterator.map(_.getPath.getName)
      .count(n => n.startsWith("bid=") && unescape(n.drop(4)) != CompactBid)
  }

  /** Summed (n_docs, dl_sum) over every committed batch partition —
    * the read-time replacement for the frozen marker's n_docs/avgdl.
    * Metadata-only: O(batches) tiny sidecar reads, bounded by
    * [[compact]]; never touches postings.
    */
  def storeStats(spark: SparkSession, path: String): (Long, Double) = {
    val f = fs(spark, path)
    val dir = new Path(path)
    if (!f.exists(dir)) return (0L, 0.0)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var n = 0L
    var dl = 0.0
    f.listStatus(dir).iterator
      .filter(_.getPath.getName.startsWith("bid="))
      .foreach { bidDir =>
        val sp = new Path(bidDir.getPath, StatsFile)
        require(f.exists(sp),
          s"LexIngest: ${bidDir.getPath} carries no $StatsFile — the " +
            "commit rename always ships it; this partition was not " +
            "written by LexIngest.append")
        val in = f.open(sp)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                  finally in.close()
        val node = mapper.readTree(txt)
        n += node.get("n_docs").asLong
        dl += java.lang.Double.parseDouble(node.get("dl_sum").asText)
      }
    (n, dl)
  }

  /** Count of visible postings files under the store's `bid=`
    * partitions — the quantity compaction bounds. Metadata-only.
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
    * partition — pure re-layout (rows unioned, never aggregated),
    * one file per term bucket, merged stats sidecar, folded batch ids
    * into the marker ledger so replays of folded batches still no-op.
    * Committed via [[ParkSwap]] (marker LAST into the tmp build);
    * readers resolve across the swap through [[ParkSwap.readerDir]].
    * Returns (data files before, after). Single-writer discipline:
    * serialize with appends.
    */
  def compact(spark: SparkSession, path: String): (Long, Long) = {
    val f = fs(spark, path)
    ParkSwap.recover(f, path)
    val meta = LexIndex.readMeta(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"LexIngest: $path carries no ${LexIndex.MarkerFile} marker — " +
          "not a lex store"))
    require(meta.layout == "bidpart",
      s"LexIngest: the index at $path is the frozen single-write " +
        "layout — it is already one immutable write per bucket; there " +
        "is nothing to fold")
    val dir = new Path(path)
    val live: Set[String] = f.listStatus(dir).iterator
      .map(_.getPath.getName).filter(_.startsWith("bid="))
      .map(n => unescape(n.drop(4))).toSet
    val before = dataFileCount(spark, path)
    if (live.isEmpty) return (before, before) // nothing ingested yet
    val (nDocs, dlSum) = storeStats(spark, path)
    val tmp = ParkSwap.tmpDir(path)
    if (f.exists(new Path(tmp))) f.delete(new Path(tmp), true)
    if (before > 0) {
      // partition discovery yields (t, id, tf, dl, bid, tb); bid is
      // dropped (its memory moves into the ledger) and ONE shuffle on
      // the bucket key lands each bucket as one file
      spark.read.parquet(path)
        .drop("bid")
        .withColumn("bid", lit(CompactBid))
        .repartition(col("tb"))
        .write.partitionBy("bid", "tb").parquet(tmp)
    } else f.mkdirs(new Path(tmp)) // stats-only batches (no postings)
    writeBatchStats(f, new Path(tmp, "bid=" + CompactBid), nDocs, dlSum)
    // marker LAST while building tmp — a tmp with a marker is complete
    LexIndex.commitMarker(f, tmp,
      markerJson(meta.buckets, meta.folded ++ (live - CompactBid)))
    ParkSwap.swap(f, path)
    (before, dataFileCount(spark, path))
  }
}
