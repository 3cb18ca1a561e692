package graft.ml

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A written BM25 lexical index — the term-channel sibling of
  * [[Similarity.ivfWriteIndex]], completing the retrieval family's
  * index-scale story on BOTH channels: [[CorpusStats.bm25TopK]] pays
  * one full corpus scan + tokenize per query batch (idf/avgdl are
  * whole-corpus statistics), which is the right exact baseline and the
  * wrong thing to re-pay per retrieval batch at 100 TB. This index
  * pays tokenization ONCE at write:
  *
  *  - `path/postings/tb=<bucket>/` parquet rows `(t, id, tf, dl)` —
  *    one row per (document, term), partitioned by the term's hash
  *    bucket `tb = pmod(xxhash64(t), buckets)`. At query time the
  *    query's term set is side-table-small by the stage convention, so
  *    both the bucket set AND the term set collect to literals: the
  *    scan prunes to the probed `tb=` directories at PLANNING
  *    (PartitionFilters — the [[Similarity.ivfReadTopKBatch]] probe
  *    rule applied to terms) and the `t IN (...)` literal pushes into
  *    the parquet row-group stats inside each bucket. A query touches
  *    O(query terms) of the index, never the corpus.
  *  - `_graft_bm25.json` marker: `n_docs`, `avgdl` (serialized via
  *    `Double.toString`, which round-trips the exact IEEE value),
  *    `buckets`, and the id/text column names the index was built
  *    from. The marker is authoritative — readers take NO geometry
  *    arguments, so probing with the wrong bucket count (every row
  *    silently missed) is unrepresentable.
  *
  * Score identity: df(t) = count of postings rows per term — exactly
  * the query-term-restricted aggregate [[CorpusStats.bm25TopK]]
  * computes; tf/dl ride the postings rows; n_docs/avgdl come from the
  * same one-row aggregate, frozen at write. The reader then runs the
  * IDENTICAL term-score expression, so index-served BM25 is
  * bit-identical to the full-scan baseline (oracle row `ml_bm25_index`
  * shares `ml_bm25_topk`'s SQL verbatim; LexIndexSpec pins equality).
  *
  * k1/b are QUERY-time knobs (they touch no stored quantity); the
  * tokenizer ([[Curation.words]]) is an index property — the marker
  * records version 1 = single-space split.
  *
  * The frozen index is immutable (one write, the ivfWriteIndex
  * convention) — df/avgdl staleness is a CORRECTNESS drift for BM25,
  * unlike ANN's recall drift, so its honest refresh is re-index on a
  * cadence ([[staleness]] prices when). A corpus that keeps GROWING
  * deserves the ingestable layout instead ([[LexIngest]], marker
  * `layout: bidpart`): per-batch rename-committed postings partitions
  * whose df/n_docs/avgdl are computed AT READ from exactly the
  * committed batches — no frozen statistic, no blind fraction.
  * [[bm25ReadTopK]] serves both layouts through the marker dispatch.
  */
object LexIndex {

  private[ml] val MarkerFile = "_graft_bm25.json"

  private def markerPath(path: String) = new Path(path, MarkerFile)

  /** `layout: frozen` carries authoritative n_docs/avgdl; `bidpart`
    * ([[LexIngest]]) computes them at read from the committed batch
    * stats, and the marker instead carries the `folded` batch-id
    * ledger (the [[IvfIngest.compact]] replay rule).
    */
  private[ml] case class Meta(nDocs: Long, avgdl: Double, buckets: Int,
                              layout: String, folded: Set[String])

  private[ml] def readMeta(spark: SparkSession, path: String): Option[Meta] = {
    val p = markerPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    val node = try new com.fasterxml.jackson.databind.ObjectMapper()
                     .readTree(txt)
               catch { case _: java.io.IOException => return None }
    val layout = Option(node.get("layout")).map(_.asText).getOrElse("frozen")
    val folded: Set[String] = Option(node.get("folded")).map { arr =>
      (0 until arr.size).map(arr.get(_).asText).toSet
    }.getOrElse(Set.empty)
    Option(node.get("buckets")).flatMap { b =>
      if (layout == "frozen")
        for {
          n <- Option(node.get("n_docs"))
          a <- Option(node.get("avgdl"))
        } yield Meta(n.asLong, java.lang.Double.parseDouble(a.asText),
          b.asInt, layout, folded)
      else Some(Meta(0L, 0.0, b.asInt, layout, folded))
    }
  }

  /** Atomically commit marker JSON into `dir` (write to a dot-tmp,
    * rename over) — shared by the frozen build and [[LexIngest]].
    */
  private[ml] def commitMarker(fs: FileSystem, dir: String,
                               json: String): Unit = {
    val tmp = new Path(dir, "." + MarkerFile + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val mp = markerPath(dir)
    if (fs.exists(mp)) fs.delete(mp, false)
    require(fs.rename(tmp, mp),
      s"LexIndex: could not commit $tmp -> $mp")
  }

  /** Materialize the index. Refuses to overwrite a directory holding
    * data without a marker (not ours to clobber); an existing LexIndex
    * is rebuilt via the [[ParkSwap]] commit protocol (VERDICT r16
    * What's-wrong #1 — the documented re-index-on-a-cadence refresh
    * path must never destroy the last good index): the replacement
    * builds COMPLETE (postings, then marker) at the `.compact-tmp`
    * staging dir, then two atomic renames park the live index and move
    * the replacement in. A crash at any point leaves a complete
    * committed index at the live path or the parked copy ([[ParkSwap
    * .recover]] repairs on the next write entry), and a concurrent
    * [[bm25ReadTopK]] resolves through [[ParkSwap.readerDir]] — brief
    * retry across the swap instant, then the parked copy — so a
    * reader's files are never yanked mid-scan.
    */
  def write(corpus: DataFrame, idCol: String, textCol: String,
            path: String, buckets: Int = 64): Unit = {
    require(buckets >= 1, s"LexIndex: buckets must be >= 1 (got $buckets)")
    val spark = corpus.sparkSession
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // writer entry: roll back a crashed swap, drop a superseded parked
    // copy / stale tmp build (the GramStore discipline)
    ParkSwap.recover(fs, path)
    val prior = readMeta(spark, path)
    require(prior.forall(_.layout == "frozen"),
      s"$path is an ingestable lex store (layout bidpart, LexIngest) — " +
        "its refresh is append + compact, never a frozen re-write; " +
        "point the build at a fresh directory")
    val existing = prior.isDefined
    require(!fs.exists(p) || existing ||
        fs.listStatus(p).forall { s =>
          val n = s.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        },
      s"$path holds data but no $MarkerFile marker — not a LexIndex; " +
        "refusing to overwrite it (point the write at a fresh directory)")
    // the frozen statistics ride the postings pass as observed metrics
    // (r17 — guide §1.2): the previous shape ran a SECOND full
    // scan+tokenize just for the one-row (n_docs, avgdl) aggregate.
    // count/sum over integer-valued doubles are order-exact and
    // sum/count is the division Average performs, so the frozen values
    // are bit-identical to the old separate aggregate (docs with no
    // words still count toward both — they flow through the observe
    // before the explode drops them).
    val obs = new org.apache.spark.sql.Observation(
      "lexindex_stats_" + java.util.UUID.randomUUID())
    val docsRaw = corpus.select(col(idCol).as("id"),
        Curation.words(col(textCol)).as("__w"))
      .withColumn("dl", size(col("__w")).cast("double"))
    val docs = docsRaw
      .observe(obs, count(lit(1)).as("__n"), sum(col("dl")).as("__s"))
    val postings = docs
      .select(col("id"), col("dl"), explode(col("__w")).as("t"))
      .groupBy(col("id"), col("t"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .withColumn("tb", pmod(xxhash64(col("t")), lit(buckets)))

    def buildInto(tgt: String): Unit = {
      // one shuffle on the bucket key so each bucket lands as one file
      // — the IvfIngest.compact layout rule (a bucket is the read unit)
      postings.repartition(col("tb"))
        .write.partitionBy("tb").parquet(tgt + "/postings")
      val statsRow = obs.get
      // missing metrics = the observed subtree did not execute (a
      // cached identical sub-plan, or AQE pruning) — fall back to the
      // direct one-row aggregate (the pre-r17 shape, same exact values)
      val (nDocs, avgdl) =
        if (statsRow.contains("__n")) {
          val n = statsRow("__n").asInstanceOf[Long]
          (n, Option(statsRow("__s")).collect {
            case d: java.lang.Double if n > 0 => d.doubleValue / n
          }.getOrElse(0.0))
        } else {
          val r = docsRaw.agg(count(lit(1)), sum(col("dl"))).head()
          val n = r.getLong(0)
          (n, if (r.isNullAt(1) || n == 0) 0.0 else r.getDouble(1) / n)
        }
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.createObjectNode()
      root.put("version", 1) // tokenizer: Curation.words single-space split
      root.put("n_docs", nDocs)
      root.put("avgdl", java.lang.Double.toString(avgdl)) // exact round-trip
      root.put("buckets", buckets)
      // marker LAST: data is complete only once the marker exists (the
      // GramStore crash rule) — readers refuse a marker-less dir, and
      // a marker-bearing tmp is a COMPLETE build ParkSwap may commit
      commitMarker(fs, tgt, mapper.writeValueAsString(root))
    }

    if (existing) {
      buildInto(ParkSwap.tmpDir(path)) // the live index serves throughout
      ParkSwap.swap(fs, path) // parked copy drops on the NEXT write entry
    } else {
      if (fs.exists(p)) fs.delete(p, true) // dot/underscore leftovers only
      buildInto(path)
    }
  }

  /** Staleness report for an index against the corpus's CURRENT state
    * (VERDICT r16 missing #2 — the re-index cadence should be driven
    * by a number, not a calendar guess): recompute the same one-row
    * aggregate `write` froze (doc count + mean word length) over the
    * corpus as it stands and report the drift against the marker.
    * Cheap by construction — one aggregate over two narrow columns,
    * no tokenize-explode, no postings read.
    *
    * Interpretation contract (measured, `ScaleProof lexdrift`): BM25
    * staleness is a CORRECTNESS drift (df/idf and avgdl shift every
    * score), unlike ANN recall drift — but rankings move slowly:
    * top-10 overlap against a fresh index stays high through tens of
    * percent of corpus growth on self-similar corpora (numbers in
    * BASELINE.md), while every NEW document is invisible until the
    * re-index (the dominant staleness cost — `docDriftPct` IS the
    * fraction of the corpus your retrieval cannot see).
    */
  final case class Staleness(nDocsFrozen: Long, nDocsCurrent: Long,
                             avgdlFrozen: Double, avgdlCurrent: Double) {
    /** |current − frozen| / frozen, in percent (0 when frozen is 0). */
    def docDriftPct: Double =
      if (nDocsFrozen == 0L) 0.0
      else 100.0 * math.abs(nDocsCurrent - nDocsFrozen).toDouble / nDocsFrozen
    def avgdlDriftPct: Double =
      if (avgdlFrozen == 0.0) 0.0
      else 100.0 * math.abs(avgdlCurrent - avgdlFrozen) / avgdlFrozen
  }

  def staleness(corpus: DataFrame, textCol: String,
                path: String): Staleness = {
    val spark = corpus.sparkSession
    val fs0 = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val at = ParkSwap.readerDir(fs0, path)
    val meta = readMeta(spark, at).getOrElse(
      throw new IllegalArgumentException(
        s"$path carries no $MarkerFile marker — not a LexIndex"))
    // an ingestable store's "frozen" side is its live committed total —
    // with lex_ingest in the pipe the drift reads ~0, which is the
    // point: the ingest layout removes the blind fraction
    val (frozenN, frozenAvg) = meta.layout match {
      case "bidpart" =>
        val (n, dlSum) = LexIngest.storeStats(spark, at)
        (n, if (n == 0L) 0.0 else dlSum / n)
      case _ => (meta.nDocs, meta.avgdl)
    }
    val row = corpus
      .select(size(Curation.words(col(textCol))).cast("double").as("dl"))
      .agg(count(lit(1)), avg(col("dl"))).head()
    Staleness(frozenN, row.getLong(0), frozenAvg,
      if (row.isNullAt(1)) 0.0 else row.getDouble(1))
  }

  /** Batch BM25 top-k served from the index — [[CorpusStats.bm25TopK]]
    * semantics, bit-identical scores, reading O(query terms) of the
    * postings instead of scanning the corpus. One job for the whole
    * query set; the query side is side-table-small by convention, so
    * its distinct terms (and their hash buckets) collect to literals —
    * the bucket set prunes partitions at planning, the term set pushes
    * into row-group stats.
    */
  def bm25ReadTopK(spark: SparkSession, path: String, queries: DataFrame,
                   qidCol: String, qtextCol: String, k: Int = 10,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // resolve across an in-flight rebuild swap: brief retry, then the
    // complete parked copy — readers never mutate (ParkSwap contract)
    val fs0 = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val at = ParkSwap.readerDir(fs0, path)
    val meta = readMeta(spark, at).getOrElse(
      throw new IllegalArgumentException(
        s"$path carries no $MarkerFile marker — not a LexIndex (build " +
          "it with LexIndex.write or ingest with LexIngest; the marker " +
          "is authoritative for layout/buckets)"))
    // layout dispatch: frozen reads `postings/` under the marker's
    // authoritative n_docs/avgdl; bidpart ([[LexIngest]]) reads the
    // committed `bid=` batch partitions and computes n_docs/avgdl from
    // their stats sidecars — always current to the last committed
    // batch, no frozen statistic to drift
    val (nDocs, avgdl, postingsAll) = meta.layout match {
      case "bidpart" =>
        val (n, dlSum) = LexIngest.storeStats(spark, at)
        require(n > 0L,
          s"$path is an ingestable lex store with no committed " +
            "documents yet — append a batch before reading")
        require(LexIngest.dataFileCount(spark, at) > 0L,
          s"$path holds $n ingested documents but zero postings — " +
            "every text tokenized to nothing; BM25 over an all-empty " +
            "corpus is empty by construction")
        (n, dlSum / n, spark.read.parquet(at)
          .select(col("t"), col("id"), col("tf"), col("dl"), col("tb")))
      case _ =>
        (meta.nDocs, meta.avgdl, spark.read.parquet(at + "/postings"))
    }
    val qterms = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(Curation.words(col(qtextCol)))).as("t"))
    // ≤ |distinct query terms| (t, bucket) rows — bounded by the
    // side-table convention, the ivfReadTopKBatch probe-union rule.
    // Buckets compute through the SAME pmod(xxhash64) expression the
    // writer used, so a seed or casting mismatch between a driver-side
    // reimplementation and the stored layout is unrepresentable.
    val termRows = qterms.select(col("t"),
        pmod(xxhash64(col("t")), lit(meta.buckets.toLong)).as("tb"))
      .distinct().collect()
    val terms = termRows.map(_.getString(0)).toSeq
    val buckets = termRows.map(_.getLong(1)).distinct.toSeq
    val tf = postingsAll
      .filter(col("tb").isin(buckets: _*))
      .filter(col("t").isin(terms: _*))
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val termScore =
      log((lit(nDocs.toDouble) - col("df") + lit(0.5)) /
            (col("df") + lit(0.5)) + lit(1.0)) *
      (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
    val scored = tf.join(broadcast(dfreq), Seq("t"))
      .join(broadcast(qterms), Seq("t"))
      .groupBy(col("qid"), col("id"))
      .agg(round(sum(termScore), 6).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("doc"), col("score"))
  }
}
