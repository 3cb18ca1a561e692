package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact; one broadcast of the query
  * set, no shuffle of the corpus — scales linearly, the right exact plan
  * at any corpus size when |queries| is small). Scale path: IVF-style
  * bucketed search — assign vectors to the nearest of C centroids at write
  * time, probe only matching buckets at query time (touches ~1/C of the
  * corpus; partition-prunable when the corpus is written partitioned by
  * bucket).
  */
object Similarity {

  /** Dot product of two `array<double>` columns via the native codegen
    * expression ([[graft.functions.DotProductExpr]]): one fused primitive
    * loop instead of `aggregate(zip_with(...))`'s per-row intermediate
    * array + boxed lambda walk. Same index-ordered sum — bit-identical
    * results, oracle-safe.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.functions.DotProductExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Elementwise vector-sum aggregate ([[graft.functions.VectorSumAgg]]):
    * one array-typed aggregate column regardless of dim.
    */
  private[ml] def vecSum(c: Column, dim: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.functions.VectorSumAgg(
      GraftSqlBridge.expression(c), dim).toAggregateExpression())
  }

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Brute-force exact top-k neighbors for each query vector.
    * `queries`: (qid, qvec) — small, broadcast; `corpus`: (id, vec).
    * One narrow pass over the corpus per partition + a top-k window.
    * Ties broken by corpus id (deterministic).
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus.crossJoin(broadcast(queries))
    val qv = col(qvecCol).cast("array<double>")
    val cv = col(vecCol).cast("array<double>")
    val scored = joined.select(
      col(qidCol).as("qid"), col(idCol).as("id"),
      round(cosine(cv, qv), 6).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding outlier detection against the corpus centroid: each
    * vector's Euclidean distance to the per-dimension corpus mean,
    * z-scored over the distance distribution; `is_outlier` = z above
    * `zThresh`. Far-from-centroid vectors flag mislabeled, corrupted, or
    * out-of-distribution rows — the embedding-space complement of the
    * text quality signals.
    *
    * Scale: the centroid is a posexplode → per-dimension avg (a
    * dim-sized aggregate — map-side combined, tiny shuffle) COLLECTED
    * to the driver (dim doubles — bounded regardless of corpus size)
    * and folded back in as an array literal, so each row's distance is
    * a NARROW index-ordered fold — the r7 shape instead re-joined the
    * exploded table and re-aggregated by id, shuffling dim× the corpus
    * through an Exchange just to undo its own explode. The distance
    * stats are one scalar aggregate folded in as a broadcast single-row
    * cross join. Two corpus scans + one narrow pass, no pairwise
    * anything.
    *
    * Float determinism: distances round to 6 before the z stats, z
    * rounds to 4 before the threshold — both engines aggregate the same
    * rounded values, so sum-order noise (~1e-12) cannot flip a flag
    * (the per-dimension sum order inside `dist` was already
    * engine-dependent before rounding, in r7 as now).
    */
  def centroidOutliers(df: DataFrame, idCol: String, vecCol: String,
                       zThresh: Double = 2.0): DataFrame = {
    // NOTE: the centroid job runs EAGERLY at construction (the
    // bpeMergeTable precedent) — the returned frame folds it in as a
    // literal. Batch-only by design, like every whole-corpus stage.
    val vc = col(vecCol).cast("array<double>")
    val u = df.select(col(idCol).as("id"),
      posexplode(vc).as(Seq("i", "v")))
    val centroid = u.groupBy(col("i")).agg(avg(col("v")).as("m"))
      .orderBy(col("i")).collect()
      .map(r => if (r.isNullAt(1)) null
                else java.lang.Double.valueOf(r.getDouble(1)))
    // a dimension null in EVERY row averages to null — keep it null in
    // the literal so its terms drop below, like the old join shape
    val m = array(centroid.toSeq.map(c =>
      if (c == null) lit(null).cast("double") else lit(c.doubleValue())): _*)
    // join-shape fidelity on malformed rows: null/empty vectors had no
    // exploded rows → no output row; a null element or missing trailing
    // dim contributed nothing to the null-skipping sum → drop null
    // terms; a row with NO usable term keeps a null dist (both engines)
    val terms = filter(
      zip_with(vc, m, (x, c) => (x - c) * (x - c)), t => t.isNotNull)
    val d = df.filter(vc.isNotNull && size(vc) > 0)
      .select(col(idCol).as("id"),
        when(size(terms) > 0,
          round(sqrt(aggregate(terms, lit(0.0), _ + _)), 6)).as("dist"))
    val st = d.agg(avg(col("dist")).as("mu"), stddev_pop(col("dist")).as("sd"))
    // sd = 0 (degenerate corpus: all-identical embeddings, or one row)
    // would make z NaN, and NaN > thresh is true — flagging EVERY row as
    // an outlier. A zero-spread distribution has no outliers: z = 0.
    val z = when(col("sd") > 0,
      round((col("dist") - col("mu")) / col("sd"), 4)).otherwise(lit(0.0))
    d.crossJoin(broadcast(st))
      .select(col("id").as(idCol), col("dist"), z.as("z"),
        (z > zThresh).cast("int").as("is_outlier"))
  }

  /** IVF bucket assignment: nearest centroid index (argmax cosine).
    * At write time: `corpus.withColumn("bucket", assignBucket(...))
    * .write.partitionBy("bucket")` → query-time partition pruning
    * touches only probed buckets.
    *
    * Native kernel ([[graft.functions.CosineArgMaxExpr]]): the former
    * k-literal-tree form (one cosine subtree per centroid +
    * array_position/array_max) was bit-identical but plan-hostile —
    * Catalyst's per-task subexpression analysis over k nested CaseWhen
    * cosine trees measured tens of MINUTES at k=16/dim=64. The kernel
    * carries the centroid matrix as one plan reference, same
    * index-ordered arithmetic and first-equal argmax semantics.
    */
  def assignBucket(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.functions.CosineArgMaxExpr(
      GraftSqlBridge.expression(vec.cast("array<double>")),
      centroids.map(_.toArray).toArray))
  }

  /** Deterministic content-addressed seed sample: the `sampleN` rows with
    * the smallest `md5(id)` — a uniform pseudo-random subset whose
    * membership depends only on ids, selected by a distributed
    * per-partition top-k (`TakeOrderedAndProject`: every task keeps at
    * most `sampleN` candidates, the driver merges heads). This replaces
    * the former `row_number().over(Window.orderBy(id))` init, which
    * funneled the ENTIRE corpus through one task before every index
    * build — the canonical scale-killer this file's own callers warn
    * about. Exposed package-private so specs can assert the executed
    * plan carries no Window and no global sort.
    */
  private[ml] def seedCandidates(corpus: DataFrame, idCol: String,
                                 v: Column, sampleN: Int): DataFrame =
    // null / null-element vectors are excluded: the sample feeds DRIVER
    // arithmetic (maximin), which must not NPE on a malformed row
    corpus.filter(v.isNotNull && !exists(v, x => x.isNull))
      .select(v.as("v"), md5(col(idCol).cast("string")).as("h"))
      .orderBy(col("h")).limit(sampleN)

  /** Greedy maximin (farthest-point) seeding over a driver-small sample:
    * seed 0 is the sample head (smallest md5 — content-addressed,
    * deterministic), each next seed is the sample point with the largest
    * min-distance to the seeds chosen so far (ties broken by sample
    * order). O(sampleN·k·dim) driver compute on a k×128-row sample —
    * independent of corpus size — and a strictly better spread property
    * than the evenly-spaced-by-id init it replaces (ids need not
    * correlate with content; farthest-point provably 2-approximates the
    * k-center optimum on the sample).
    */
  private[ml] def maximinSeeds(sample: IndexedSeq[Seq[Double]],
                               k: Int): Seq[Seq[Double]] = {
    require(sample.nonEmpty, "seed sample is empty")
    def l2(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer(0)
    val picked = Array.fill(sample.length)(false); picked(0) = true
    val minD = Array.fill(sample.length)(Double.MaxValue)
    while (chosen.length < k) {
      val last = sample(chosen.last)
      var best = -1; var bestD = -1.0
      var i = 0
      while (i < sample.length) {
        val d = l2(sample(i), last)
        if (d < minD(i)) minD(i) = d
        if (!picked(i) && minD(i) > bestD) { bestD = minD(i); best = i }
        i += 1
      }
      chosen += best; picked(best) = true
    }
    chosen.map(sample).toSeq
  }

  /** How many sample rows the seed selection reads to the driver: enough
    * for maximin to see every real cluster at practical k, still tiny
    * (k×128 vectors) at any corpus size.
    */
  private def seedSampleN(k: Int): Int = math.max(256, 128 * k)

  /** Train IVF centroids with distributed k-means (Lloyd's): init =
    * deterministic maximin seeding over a content-addressed sample
    * ([[seedCandidates]] + [[maximinSeeds]] on direction-normalized
    * vectors — cosine k-means clusters directions), then `iters` rounds
    * of broadcast-assign → per-bucket elementwise mean. Each round is ONE
    * map-side-combined aggregation over the corpus (the k×dim result —
    * a few KB — is all that ever reaches the driver), so a round costs a
    * single scan at any corpus size: the training step that replaces the
    * `vec_id < 8` seed centroids in a production IVF build. Run once at
    * index-build time; the centroids then feed [[assignBucket]] at write
    * time and [[ivfTopK]] at query time.
    */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int = 5): Seq[Seq[Double]] = {
    val v = col(vecCol).cast("array<double>")
    // train on the MAJORITY shape (the modal vector length, ties to the
    // smaller — one tiny aggregate): an arbitrary first row would let a
    // single truncated vector at the head of the corpus poison the
    // whole training. Malformed rows (other lengths, null elements) are
    // excluded from seeding AND the Lloyd rounds — a null bucket key or
    // null per-dimension sum would otherwise NPE the driver fold.
    val dimRow = corpus.filter(v.isNotNull)
      .groupBy(size(v).as("d")).count()
      .orderBy(col("count").desc, col("d").asc).limit(1).collect()
    require(dimRow.nonEmpty, "trainCentroids: corpus has no vectors")
    val vdim = dimRow.head.getInt(0)
    val clean = corpus.filter(v.isNotNull && size(v) === vdim &&
      !exists(v, x => x.isNull))
    val sample = seedCandidates(clean, idCol, v, seedSampleN(k))
      .select(col("v")).collect().map(_.getSeq[Double](0).toIndexedSeq)
      .toIndexedSeq
    require(sample.nonEmpty, "trainCentroids: no well-formed vectors")
    // fewer vectors than k: train with what exists (the pre-r8 init
    // degraded the same way) — callers get sample.length centroids
    val kEff = math.min(k, sample.length)
    // maximin on unit vectors: cosine k-means separates DIRECTIONS, so
    // the spread that matters for seeding is angular, not magnitude
    val unit = sample.map { s =>
      val n = math.sqrt(s.map(x => x * x).sum)
      if (n > 0) s.map(_ / n) else s
    }
    var centroids: Seq[Seq[Double]] =
      maximinSeeds(unit, kEff).map(_.toSeq)
    val dim = centroids.head.length
    for (_ <- 1 to iters) {
      val assigned = clean.select(v.as("v"),
        assignBucket(col(vecCol), centroids).as("b"))
      // per-bucket elementwise sums + counts in one hash aggregate; the
      // sum is ONE array-typed aggregate expression (VectorSumAgg), so
      // plan width is constant in dim — the former per-dimension
      // sum(v[i]) fan-out carried dim expressions through the aggregate
      val agg = assigned.groupBy(col("b"))
        .agg(count(lit(1)).as("n"), vecSum(col("v"), dim).as("vs"))
        .collect()
      val updated = centroids.indices.map { b =>
        agg.find(_.getInt(0) == b) match {
          case Some(row) if row.getLong(1) > 0 =>
            val n = row.getLong(1).toDouble
            row.getSeq[Double](2).map(_ / n)
          case _ => centroids(b) // empty bucket keeps its centroid
        }
      }
      centroids = updated
    }
    centroids
  }

  /** Round half away from zero at 6 decimals on the scaled double —
    * the arithmetic DuckDB's `round(x, 6)` performs on DOUBLE, so both
    * engines snap k-means centroids to the SAME double and downstream
    * argmin distances compute from identical inputs.
    */
  private def round6(x: Double): Double = {
    val s = x * 1e6
    (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)) / 1e6
  }

  /** Rows [[kmeansAssign]] trains on and assigns: well-formed vectors of
    * the declared dim (no null array, no null elements, exact length).
    * Malformed rows are excluded from BOTH training and output — a null
    * bucket key would poison the driver fold, and the oracle applies the
    * same predicate.
    */
  private def kmeansClean(corpus: DataFrame, v: Column): DataFrame =
    corpus.filter(v.isNotNull && !exists(v, x => x.isNull))

  /** Deterministic distributed Lloyd k-means: init centroid `j` = the
    * elementwise mean of vectors whose `pmod(id, k) = j` (a hash-partition
    * init — no RNG, no order dependence), then `iters` rounds of
    * broadcast-argmin assignment (squared L2, first-wins ties — the
    * [[assignNearestL2]] kernel) → per-cluster elementwise mean. Every
    * centroid coordinate snaps to 6 decimals ([[round6]]) after each
    * update so an independent engine reproduces the exact trajectory —
    * this is the oracle-checkable complement of [[trainCentroids]]
    * (maximin cosine seeding, better clusters, but seeded from a sample
    * whose content-addressed order no SQL oracle reproduces cheaply).
    *
    * Scale: each round is ONE map-side-combined aggregate over the corpus
    * ([[vecSum]] — a single array-typed aggregate column), returning
    * k×dim doubles to the driver regardless of corpus size; the final
    * assignment is a narrow codegen projection. `iters + 1` scans total,
    * no shuffle wider than k rows. An empty cluster keeps its previous
    * centroid (the [[trainCentroids]] convention); an INIT bucket with
    * no rows (k exceeding the id-residue coverage — only possible when
    * the corpus has fewer than k distinct `pmod(id, k)` values) starts
    * at the zero vector, which then attracts nothing and persists
    * unless a later round assigns rows to it.
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, iters: Int): Seq[Seq[Double]] = {
    require(k > 0 && dim > 0 && iters >= 0, "kmeansCentroids: bad geometry")
    // INIT buckets come from pmod(id, k); a non-numeric id (string doc
    // ids are common) would cast to null, every init centroid would
    // silently collapse to the zero vector and the clustering would
    // degenerate to one cluster with no error. NUMERIC-string ids cast
    // cleanly and bucket exactly as numerics (long-standing callers —
    // ADVICE r13 #5 regressed them to a hard failure), so a StringType
    // id is accepted after ONE cheap short-circuit probe proves every
    // id parses; anything else (or a non-numeric string) fails loudly
    // with the xxhash64 hint.
    val v = col(vecCol).cast("array<double>")
    val clean = kmeansClean(corpus, v).filter(size(v) === dim)
    corpus.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case org.apache.spark.sql.types.StringType =>
        // the probe must reject non-FINITE parses too: 'NaN'/'Infinity'
        // strings cast to non-null doubles, but pmod(NaN, k) is NaN,
        // whose int cast is null — those rows would fall out of every
        // init bucket with no error, the silent degeneration this gate
        // exists to refuse
        val cast = col(idCol).cast("double")
        val bad = clean.filter(col(idCol).isNotNull &&
          (cast.isNull || isnan(cast) || cast === Double.PositiveInfinity ||
            cast === Double.NegativeInfinity)).limit(1).count()
        require(bad == 0L,
          s"kmeansCentroids: string id column `$idCol` holds " +
            "non-numeric or non-finite values — init buckets are " +
            "pmod(id, k) and such ids bucket to null, silently " +
            "collapsing the clustering; hash the id to long (e.g. " +
            "xxhash64) before training")
      case other => throw new IllegalArgumentException(
        s"kmeansCentroids: id column `$idCol` must be numeric (init " +
          s"buckets are pmod(id, k)); got $other — hash a string id to " +
          "long (e.g. xxhash64) before training")
    }
    def roundedMeans(bucket: Column,
        prev: Option[Seq[Seq[Double]]]): Seq[Seq[Double]] = {
      val agg = clean.groupBy(bucket.cast("int").as("b"))
        .agg(count(lit(1)).as("n"), vecSum(v, dim).as("vs"))
        .collect()
      (0 until k).map { b =>
        agg.find(r => !r.isNullAt(0) && r.getInt(0) == b) match {
          case Some(row) if row.getLong(1) > 0 =>
            val n = row.getLong(1).toDouble
            row.getSeq[Double](2).map(x => round6(x / n))
          case _ => prev.map(_(b)).getOrElse(Seq.fill(dim)(0.0))
        }
      }
    }
    var cen = roundedMeans(pmod(col(idCol), lit(k)), None)
    for (_ <- 1 to iters) cen = roundedMeans(assignNearestL2(v, cen), Some(cen))
    cen
  }

  /** Cluster assignment for every well-formed vector after
    * [[kmeansCentroids]] training: (id, cluster). The curation
    * entry-point for embedding-space clustering — topic balancing,
    * diversity mixing, per-cluster quality audits.
    */
  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int, dim: Int, iters: Int = 1): DataFrame = {
    val cen = kmeansCentroids(corpus, idCol, vecCol, k, dim, iters)
    val v = col(vecCol).cast("array<double>")
    kmeansClean(corpus, v).filter(size(v) === dim)
      .select(col(idCol),
        assignNearestL2(v, cen).cast("int").as("cluster"))
  }

  /** Cluster-balanced diversity sample: k-means the embedding space
    * ([[kmeansAssign]]), then keep at most `perCluster` rows per cluster
    * chosen by content-addressed pseudo-random order
    * ([[Curation.stratifiedSample]] — md5 of the id). Guarantees every
    * region of embedding space survives a downsample instead of letting
    * the head clusters crowd out the tail — the embedding-space
    * counterpart of source-stratified sampling. One shuffle on the
    * cluster key; the per-cluster limit executes as a group limit below
    * the sort (WindowGroupLimit), so no cluster is ever fully sorted.
    */
  def clusterSample(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, dim: Int, iters: Int, perCluster: Int): DataFrame = {
    val cen = kmeansCentroids(corpus, idCol, vecCol, k, dim, iters)
    val v = col(vecCol).cast("array<double>")
    val assigned = kmeansClean(corpus, v).filter(size(v) === dim)
      .withColumn("cluster", assignNearestL2(v, cen).cast("int"))
    Curation.stratifiedSample(assigned, Seq("cluster"), idCol, perCluster)
  }

  // ---- index geometry marker -----------------------------------------
  //
  // A written IVF index is only usable with the EXACT centroids (and PQ
  // books) that assigned its rows — probing with different geometry
  // silently prunes to partitions the matching rows aren't in, and
  // recall quietly collapses. That is the same mis-declared-geometry
  // hazard BucketedLayout's marker and dedup_ingest's contract marker
  // refuse, so the index gets the same treatment: the write half
  // records `_graft_ivf.json` (kind + centroids + books, driver-small
  // by definition) next to the data, marker-aware readers need NO
  // geometry arguments, and the legacy geometry-taking readers VERIFY
  // against the marker when one exists instead of trusting the caller.

  private[ml] val IvfMarkerFile = "_graft_ivf.json"

  private[ml] def ivfMarkerPath(path: String) =
    new org.apache.hadoop.fs.Path(path, IvfMarkerFile)

  /** Resolve the directory a reader consults — the live index, or the
    * parked copy while an [[IvfIngest.compact]] park-swap is in flight
    * (the [[ParkSwap.readerDir]] discipline; classic never-compacted
    * indexes resolve to themselves at the cost of one existence
    * probe). Readers never mutate; repair is writer-only.
    */
  private[ml] def indexReaderDir(spark: org.apache.spark.sql.SparkSession,
                                 path: String): String =
    ParkSwap.readerDir(
      ivfMarkerPath(path).getFileSystem(
        spark.sparkContext.hadoopConfiguration), path)

  private[ml] def writeIvfMarker(spark: org.apache.spark.sql.SparkSession,
                             path: String, kind: String,
                             centroids: Seq[Seq[Double]],
                             books: Seq[Seq[Seq[Double]]],
                             layout: Option[String] = None,
                             folded: Set[String] = Set.empty): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("kind", kind)
    layout.foreach(root.put("layout", _))
    val ca = root.putArray("centroids")
    centroids.foreach { c => val a = ca.addArray(); c.foreach(a.add) }
    if (books.nonEmpty) {
      val ba = root.putArray("books")
      books.foreach { b =>
        val sub = ba.addArray()
        b.foreach { c => val a = sub.addArray(); c.foreach(a.add) }
      }
    }
    if (folded.nonEmpty) {
      val fa = root.putArray("folded")
      folded.toSeq.sorted.foreach(fa.add)
    }
    // write-then-rename (the GramStore.writeMeta rule): a crash
    // mid-write must never leave a truncated marker in place — a
    // partial marker would read as marker-less and brick the index's
    // refusal checks. The dot-prefixed temp is invisible to parquet
    // reads; single-writer discipline makes the fixed temp name safe.
    val p = ivfMarkerPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path, "." + IvfMarkerFile + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false) // classic overwrite sites
    require(fs.rename(tmp, p),
      s"writeIvfMarker: could not commit $tmp -> $p")
  }

  /** The compaction ledger of an ingestable index ([[IvfIngest]]):
    * every batch id whose `bid=` partition a compact has folded into
    * the consolidated partition. Empty for classic single-write
    * indexes and never-compacted ingest indexes.
    */
  def ivfIndexFolded(spark: org.apache.spark.sql.SparkSession,
                     path: String): Set[String] = {
    val p = ivfMarkerPath(indexReaderDir(spark, path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Set.empty
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    val node = try new com.fasterxml.jackson.databind.ObjectMapper()
                     .readTree(txt)
               catch { case _: java.io.IOException => return Set.empty }
    Option(node.get("folded")).filter(_.isArray).map { arr =>
      import scala.jdk.CollectionConverters._
      arr.elements().asScala.map(_.asText).toSet
    }.getOrElse(Set.empty)
  }

  /** The geometry a written index was built with, or None for a
    * pre-marker (or foreign) directory: (kind, centroids, books).
    */
  def ivfIndexGeometry(spark: org.apache.spark.sql.SparkSession,
                       path: String)
      : Option[(String, Seq[Seq[Double]], Seq[Seq[Seq[Double]]])] = {
    val p = ivfMarkerPath(indexReaderDir(spark, path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = try mapper.readTree(txt)
               catch { case _: java.io.IOException => return None }
    def arr2(n: com.fasterxml.jackson.databind.JsonNode): Seq[Seq[Double]] =
      (0 until n.size).map(i =>
        (0 until n.get(i).size).map(j => n.get(i).get(j).asDouble))
    for {
      kind <- Option(node.get("kind")).filter(_.isTextual).map(_.asText)
      cen <- Option(node.get("centroids")).filter(_.isArray).map(arr2)
    } yield (kind, cen,
      Option(node.get("books")).filter(_.isArray)
        .map(b => (0 until b.size).map(i => arr2(b.get(i))).toSeq)
        .getOrElse(Seq.empty))
  }

  /** The layout a written index declares: "bidpart" for an ingestable
    * batch-partitioned index ([[IvfIngest]]), None for the classic
    * single-write layout (no layout field — every pre-ingest index).
    */
  def ivfIndexLayout(spark: org.apache.spark.sql.SparkSession,
                     path: String): Option[String] = {
    val p = ivfMarkerPath(indexReaderDir(spark, path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    val node = try new com.fasterxml.jackson.databind.ObjectMapper()
                     .readTree(txt)
               catch { case _: java.io.IOException => return None }
    Option(node.get("layout")).filter(_.isTextual).map(_.asText)
  }

  /** Marker-vs-caller verification for the legacy geometry-taking
    * readers: a marker-less index (pre-marker layouts) proceeds on the
    * caller's word, a present marker must MATCH — a silent geometry
    * mismatch is a recall collapse, not an error anyone sees.
    */
  private def requireIvfGeometry(spark: org.apache.spark.sql.SparkSession,
                                 path: String, kind: String,
                                 centroids: Seq[Seq[Double]],
                                 books: Seq[Seq[Seq[Double]]]): Unit =
    ivfIndexGeometry(spark, path).foreach { case (mk, mc, mb) =>
      require(mk == kind,
        s"index at $path was written as `$mk` but is being read as " +
          s"`$kind` — wrong reader for this layout")
      require(mc == centroids && (books.isEmpty || mb == books),
        s"index at $path was written under DIFFERENT geometry than " +
          "supplied — probing with foreign centroids/books silently " +
          "collapses recall; read without geometry arguments (the " +
          "marker is authoritative) or rebuild the index")
    }

  private[ml] def markerGeometry(spark: org.apache.spark.sql.SparkSession,
                             path: String, kind: String)
      : (Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) = {
    val (mk, cen, books) = ivfIndexGeometry(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"$path carries no $IvfMarkerFile marker — a pre-marker index " +
          "must be read through the geometry-taking overload (and " +
          "should be rebuilt to record its geometry)"))
    require(mk == kind, s"index at $path is `$mk`, not `$kind`")
    (cen, books)
  }

  /** Materialize an IVF index: the corpus written partitioned by its
    * centroid bucket. At query time [[ivfReadTopK]]'s bucket filter
    * becomes a PARTITION FILTER on this layout — a 100 TB corpus scan
    * touches only `nprobe` directories. (The docs on [[assignBucket]]
    * promised this layout; this is the write half, and IvfIndexSpec
    * proves the pruning appears in the executed plan.) The geometry
    * marker rides with the data so readers need no centroid arguments.
    */
  def ivfWriteIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    centroids: Seq[Seq[Double]], path: String): Unit = {
    corpus.withColumn("bucket", assignBucket(col(vecCol), centroids))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    writeIvfMarker(corpus.sparkSession, path, "flat", centroids, Seq.empty)
  }

  /** Marker-read IVF query — the recommended form: centroids come from
    * the index's own geometry marker, so probing with the WRONG
    * centroids (the silent recall collapse) is unrepresentable.
    */
  def ivfReadTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                  idCol: String, vecCol: String, query: Seq[Double],
                  k: Int, nprobe: Int): DataFrame =
    ivfReadTopK(spark, path, idCol, vecCol, query,
      markerGeometry(spark, path, "flat")._1, k, nprobe)

  /** Query a written IVF index: the query's `nprobe` nearest centroids
    * compute ON THE DRIVER (k small by definition), the scan filters to
    * those bucket partitions (pruned at planning, never read), and only
    * the surviving rows score. Same recall/latency trade as [[ivfTopK]]
    * with the scan cost of the probed fraction.
    */
  def ivfReadTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                  idCol: String, vecCol: String, query: Seq[Double],
                  centroids: Seq[Seq[Double]], k: Int,
                  nprobe: Int = 1): DataFrame = {
    val at = indexReaderDir(spark, path)
    requireIvfGeometry(spark, at, "flat", centroids, Seq.empty)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na * nb > 0) dot / (na * nb) else 0.0
    }
    val probes = centroids.zipWithIndex
      .sortBy { case (c, i) => (-cos(query, c), i) }
      .take(math.max(1, nprobe)).map(_._2)
    val q = array(query.map(lit): _*)
    spark.read.parquet(at)
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch-query read of a written flat IVF index — ONE job for the
    * whole query set where the per-query [[ivfReadTopK]] loop schedules
    * |queries| jobs (the [[pqAdcTopKBatch]]-documented bound). Each
    * query's probe set computes on its own row with the same native
    * top-idx kernel [[ivfTopK]] uses; the UNION of probed buckets
    * collects to the driver (≤ |centroids| ints — bounded regardless of
    * corpus or query-set size) so the scan's bucket filter is a
    * PLANNING-time partition filter on the written layout: a 100 TB
    * index read touches only the probed directories. A broadcast join
    * on `array_contains(probes, bucket)` then restricts each surviving
    * row to the queries that actually probed its bucket. Probe
    * selection is [[ivfTopK]]'s exactly (same kernel, ties toward the
    * HIGHER centroid index); [[ivfReadTopK]]'s driver-side sort ties
    * toward the lower index, so the two agree everywhere except on
    * exact centroid-sim ties.
    */
  def ivfReadTopKBatch(spark: org.apache.spark.sql.SparkSession,
                       path: String, idCol: String, vecCol: String,
                       queries: DataFrame, qidCol: String, qvecCol: String,
                       k: Int, nprobe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val at = indexReaderDir(spark, path)
    val centroids = markerGeometry(spark, at, "flat")._1
    val probed = queries.select(
      col(qidCol).as("qid"), col(qvecCol).as("__qv"),
      org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.CosineTopIdxExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(
            col(qvecCol).cast("array<double>")),
          centroids.map(_.toArray).toArray,
          math.max(1, nprobe))).as("__probe"))
    // the probe union as a LITERAL filter: collected before the scan
    // plan is built, so it prunes partitions at planning (the queries
    // side is side-table-small by convention — this action is cheap)
    val allProbed = probed.select(explode(col("__probe")).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val scored = spark.read.parquet(at)
      .filter(col("bucket").isin(allProbed: _*))
      .join(broadcast(probed),
        array_contains(col("__probe"), col("bucket")))
      .select(col("qid"), col(idCol).as("id"),
        round(cosine(col(vecCol).cast("array<double>"),
          col("__qv").cast("array<double>")), 6).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-SQ8 index: [[ivfWriteIndex]]'s bucket-partitioned layout with
    * [[sq8Encode]]'s per-vector int8 payload instead of the raw floats —
    * the middle rung of the index-size ladder (IVF-flat stores dim·4
    * bytes/vector, IVF-SQ8 dim+8, IVF-PQ m). Stored columns:
    * (id, scale, codes, bucket-partition); originals are NOT stored.
    */
  def ivfSqWriteIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      centroids: Seq[Seq[Double]], path: String): Unit = {
    val staged = sq8Staged(corpus, vecCol)
    staged
      .withColumn("bucket", assignBucket(col(vecCol), centroids))
      .select(col(idCol), col("__scale").as("scale"),
        col("__codes").as("codes"), col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    writeIvfMarker(corpus.sparkSession, path, "sq8", centroids, Seq.empty)
  }

  /** Marker-read IVF-SQ8 query ([[ivfReadTopK]]'s convention). */
  def ivfSqReadTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                    idCol: String, query: Seq[Double],
                    k: Int, nprobe: Int): DataFrame =
    ivfSqReadTopK(spark, path, idCol, query,
      markerGeometry(spark, path, "sq8")._1, k, nprobe)

  /** Query a written IVF-SQ8 index: probes compute on the driver
    * ([[ivfReadTopK]]'s path), the scan prunes to the probed bucket
    * partitions at planning, and each surviving row scores as
    * `scale · Σ code_i·q_i` — the [[sq8TopK]] arithmetic over the
    * codes-only payload, reading (dim+8)/(dim·4) of the flat index's
    * bytes. TakeOrdered top-k; approximate inner-product ranking
    * (recall recorded in BASELINE.md's SQ8 row).
    */
  def ivfSqReadTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                    idCol: String, query: Seq[Double],
                    centroids: Seq[Seq[Double]], k: Int,
                    nprobe: Int = 1): DataFrame = {
    val at = indexReaderDir(spark, path)
    requireIvfGeometry(spark, at, "sq8", centroids, Seq.empty)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na * nb > 0) dot / (na * nb) else 0.0
    }
    val probes = centroids.zipWithIndex
      .sortBy { case (c, i) => (-cos(query, c), i) }
      .take(math.max(1, nprobe)).map(_._2)
    val q = array(query.map(lit): _*)
    val dotQ = aggregate(
      zip_with(col("codes"), q, (c, x) => c.cast("double") * x),
      lit(0.0), (acc, x) => acc + x)
    spark.read.parquet(at)
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol), round(col("scale") * dotQ, 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch-query read of a written IVF-SQ8 index —
    * [[ivfReadTopKBatch]]'s one-job shape over the codes-only payload:
    * probe sets per query row ([[ivfTopK]]'s kernel, ties toward the
    * higher index), probe-union literal → PLANNING-time partition
    * pruning, one broadcast join, and each surviving row scores
    * `scale · Σ code_i·q_i` (the [[sq8TopK]] arithmetic) against the
    * query it collided with — reading (dim+8)/(dim·4) of the flat
    * index's bytes. Approximate inner-product ranking; per-query
    * window top-k.
    */
  def ivfSqReadTopKBatch(spark: org.apache.spark.sql.SparkSession,
                         path: String, idCol: String,
                         queries: DataFrame, qidCol: String,
                         qvecCol: String, k: Int,
                         nprobe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val at = indexReaderDir(spark, path)
    val centroids = markerGeometry(spark, at, "sq8")._1
    val probed = queries.select(
      col(qidCol).as("qid"),
      col(qvecCol).cast("array<double>").as("__qv"),
      org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.CosineTopIdxExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(
            col(qvecCol).cast("array<double>")),
          centroids.map(_.toArray).toArray,
          math.max(1, nprobe))).as("__probe"))
    val allProbed = probed.select(explode(col("__probe")).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val dotQ = aggregate(
      zip_with(col("codes"), col("__qv"), (c, x) => c.cast("double") * x),
      lit(0.0), (acc, x) => acc + x)
    val scored = spark.read.parquet(at)
      .filter(col("bucket").isin(allProbed: _*))
      .join(broadcast(probed),
        array_contains(col("__probe"), col("bucket")))
      .select(col("qid"), col(idCol).as("id"),
        round(col("scale") * dotQ, 6).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Squared L2 distance between two double-array columns — index-ordered
    * fold, so engine and SQL oracle share the operation order.
    */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Argmin assignment to centroids by squared L2 (first-wins
    * tie-break) — the PQ metric, vs [[assignBucket]]'s cosine. Rides
    * [[pqEncode]]'s native kernel as the m=1 case (one codebook = the
    * centroid set): the former per-centroid literal-tree form was the
    * plan-analysis blowup documented on [[assignBucket]]. Malformed
    * vectors (shorter than the centroid dim, or carrying null elements)
    * assign to NULL — the old form surfaced them as null too (its
    * null-padded distances made the argmin null); longer vectors score
    * their prefix, like the old slice.
    */
  def assignNearestL2(vec: Column, centroids: Seq[Seq[Double]]): Column =
    pqEncode(vec, Seq(centroids)).getItem(0)

  // ------------------------------------------------------------------
  // Product quantization (Jégou et al. 2011, "Product Quantization for
  // Nearest Neighbor Search"): the memory-scale path for ANN — a
  // dim-float vector compresses to m small codes (dim·4 bytes → m
  // bytes at k ≤ 256), and distances compute from per-subspace lookup
  // tables without touching the original vectors.
  // ------------------------------------------------------------------

  /** Train per-subspace PQ codebooks with distributed L2 k-means. ALL m
    * subspaces train in each pass: one posexplode to (subspace,
    * subvector) rows, one map-side-combined aggregate per round
    * producing m×k×(dim/m) sums — exactly k×dim doubles to the driver
    * per round, the [[trainCentroids]] shape, regardless of corpus
    * size. Deterministic init (evenly spaced rows in `idCol` order).
    */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int, k: Int, iters: Int = 5): Seq[Seq[Seq[Double]]] = {
    val v = col(vecCol).cast("array<double>")
    // modal vector length (ties to the smaller), not an arbitrary first
    // row — a truncated head row must not poison the subspace split
    val dimRow = corpus.filter(v.isNotNull)
      .groupBy(size(v).as("d")).count()
      .orderBy(col("count").desc, col("d").asc).limit(1).collect()
    require(dimRow.nonEmpty, "pqTrain: corpus is empty")
    val dim = dimRow.head.getInt(0)
    require(m > 0 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val subdim = dim / m
    val slices = array((0 until m).map(j =>
      slice(v, j * subdim + 1, subdim)): _*)
    // deterministic maximin seeding over a content-addressed sample
    // (same TakeOrdered shape as trainCentroids — NOT a global window);
    // null / wrong-dimension vectors are excluded up front (they would
    // surface rounds later as an opaque null aggregate row)
    val clean = corpus.filter(v.isNotNull && size(v) === dim &&
      !exists(v, x => x.isNull))
    val sample = seedCandidates(clean, idCol, v, seedSampleN(k))
      .select(col("v")).collect().map(_.getSeq[Double](0).toIndexedSeq)
      .toIndexedSeq
    require(sample.length >= k,
      s"need at least k=$k well-formed vectors, got ${sample.length}")
    // seeds chosen on FULL vectors (raw L2 — the PQ metric), sliced per
    // subspace below: the same row seeds code c in every subspace
    val seed = maximinSeeds(sample, k)
    var books: Seq[Seq[Seq[Double]]] = (0 until m).map(j =>
      seed.map(full => full.slice(j * subdim, (j + 1) * subdim).toSeq))
    val exploded = clean
      .select(posexplode(slices).as(Seq("j", "sub"))).persist()
    exploded.count()
    for (_ <- 1 to iters) {
      // per-row assignment against THIS row's subspace codebook — one
      // native dispatch (the former m-branch CaseWhen chain of literal
      // trees was the subexpression-analysis blowup assignBucket's doc
      // describes, multiplied by m)
      val assign = org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.PqSubAssignExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(col("j")),
          org.apache.spark.sql.GraftSqlBridge.expression(col("sub")),
          books.map(_.map(_.toArray).toArray).toArray))
      // one array-typed sum (VectorSumAgg) — plan width constant in
      // subdim, same data path (see trainCentroids)
      val agg = exploded.withColumn("b", assign)
        .groupBy(col("j"), col("b"))
        .agg(count(lit(1)).as("n"), vecSum(col("sub"), subdim).as("vs"))
        .collect()
      books = (0 until m).map { j =>
        (0 until k).map { b =>
          agg.find(r => r.getInt(0) == j && r.getInt(1) == b) match {
            case Some(row) if row.getLong(2) > 0 =>
              val cnt = row.getLong(2).toDouble
              row.getSeq[Double](3).map(_ / cnt)
            case _ => books(j)(b)
          }
        }
      }
    }
    exploded.unpersist(blocking = false)
    books
  }

  /** PQ-encode a vector to its m codes — one native pass over all m
    * subspaces ([[graft.functions.PqEncodeExpr]]; the codebooks ride as
    * one plan reference, not m×k×subdim literal nodes); at 100 TB this
    * is the compression pass of an index build, running at scan speed.
    */
  def pqEncode(vec: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.functions.PqEncodeExpr(
      GraftSqlBridge.expression(vec.cast("array<double>")),
      books.map(_.map(_.toArray).toArray).toArray))
  }

  /** Scalar (int8) quantization — the simple compression rung beside
    * [[pqEncode]]: per vector, symmetric max-abs scaling
    * `scale = max|v_i| / 127`, `code_i = floor(v_i/scale + 0.5)` (the
    * explicit half-up form both engines compute identically; banker's
    * `rint` would diverge from SQL). 4 bytes/dim → 1 byte/dim at scan
    * speed with the scale stored per row; decode is `code·scale`. Adds
    * `scale`, `codes` (int array; all-zero + scale 0 for the zero
    * vector) and the reconstruction `mse` — the audit column a
    * quantization sweep thresholds on. Pure per-row column arithmetic:
    * narrow, stream-safe, no shuffle at any corpus size.
    */
  def sq8Encode(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val staged = sq8Staged(df, vecCol)
    val v = col("__v")
    val err = transform(v, (x, i) =>
      x - element_at(col("__codes"), i + 1).cast("double") * col("__scale"))
    val mse = when(size(v) === 0, lit(0.0)).otherwise(
      aggregate(col("__err"), lit(0.0), (acc, e) => acc + e * e)
        / size(v).cast("double"))
    staged.withColumn("__err", err)
      .select(col(idCol),
        round(col("__scale"), 6).as("scale"),
        concat_ws(",", transform(col("__codes"),
          c => c.cast("string"))).as("codes"),
        round(mse, 6).as("mse"))
  }

  /** Stage the per-row SQ8 state: `__v` (double vector), `__scale`,
    * `__codes` — shared by [[sq8Encode]], [[sq8TopK]], the IVF-SQ8
    * index writer, and the embedding ingest-dedup stage.
    */
  private[graft] def sq8Staged(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val amax = array_max(transform(v, x => abs(x)))
    val scale = when(size(v) === 0, lit(0.0)).otherwise(amax / lit(127.0))
    val codes = transform(col("__v"), x =>
      when(col("__scale") === 0.0, lit(0L))
        .otherwise(floor(x / col("__scale") + lit(0.5)).cast("long"))
        .cast("int"))
    df.withColumn("__v", v)
      .withColumn("__scale", scale)
      .withColumn("__codes", codes)
  }

  /** Approximate top-k inner-product search over SQ8 codes — the int8
    * rung of the search ladder ([[bruteForceTopK]] exact floats,
    * [[pqAdcScore]] m-byte codes): per corpus row the score is
    * `scale · Σ code_i·q_i`, i.e. the inner product against the
    * DECODED vector, computed without materializing the decode. Same
    * broadcast-queries / per-query window top-k shape as the exact
    * search; at scale the codes are 4× smaller than the floats, so the
    * scan is 4× cheaper where the corpus is IO-bound.
    */
  def sq8TopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val staged = sq8Staged(corpus, vecCol)
    val joined = staged.crossJoin(broadcast(queries))
    val qv = col(qvecCol).cast("array<double>")
    val dotQ = aggregate(
      zip_with(col("__codes"), qv, (c, q) => c.cast("double") * q),
      lit(0.0), (acc, x) => acc + x)
    val scored = joined.select(
      col(qidCol).as("qid"), col(idCol).as("id"),
      round(col("__scale") * dotQ, 6).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Asymmetric-distance (ADC) scores from codes alone: the query's
    * per-subspace lookup tables compute ON THE DRIVER (m×k distances),
    * and each corpus row's approximate squared L2 is m table lookups on
    * its code array — the original vectors are never read. By
    * construction `adc(q, codes(x)) == l2Sq(q, decode(codes(x)))`
    * exactly (the per-subspace sums partition the dimensions).
    */
  def pqAdcScore(codes: Column, query: Seq[Double],
                 books: Seq[Seq[Seq[Double]]]): Column = {
    val subdim = books.head.head.length
    val luts: Seq[Seq[Double]] = books.zipWithIndex.map { case (book, j) =>
      val q = query.slice(j * subdim, (j + 1) * subdim)
      book.map(c => c.zip(q).map { case (a, b) =>
        (a - b) * (a - b) }.sum)
    }
    luts.zipWithIndex.map { case (lut, j) =>
      element_at(array(lut.map(lit): _*), codes.getItem(j) + 1)
    }.reduce(_ + _)
  }

  /** Batched ADC top-k: ONE broadcast of a (qid, lut) table — each
    * query's m×k' lookup table computed on the driver and flattened to
    * a single array, `lut[j·k' + c]` — joined against the codes table;
    * every (query, row) pair costs the same m lookups as
    * [[pqAdcScore]] but the whole query set is one job, not |queries|
    * scheduled TakeOrdereds. This is the shape a LARGE query set rides
    * (the per-query-literal form keeps its place for small sets, where
    * literal LUTs fold into whole-stage codegen). Top-k per qid via
    * the bruteForceTopK window (partitioned by qid — never global).
    */
  /** Upper bound on a single job's broadcast LUT payload, in doubles
    * (256 MB): per-qid top-k is independent, so a larger query set
    * splits into chunks whose results union exactly — the broadcast
    * never grows with |queries| toward Spark's 8 GB hard cap (or the
    * driver's heap building it).
    */
  private val MaxLutDoublesPerBatch = 32 << 20

  def pqAdcTopKBatch(codes: DataFrame, idCol: String, codesCol: String,
                     queryRows: Seq[(Long, Seq[Double])],
                     books: Seq[Seq[Seq[Double]]], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = books.length
    val kk = books.head.length
    val chunk = math.max(1, MaxLutDoublesPerBatch / (m * kk))
    if (queryRows.length > chunk)
      return queryRows.grouped(chunk)
        .map(pqAdcTopKBatch(codes, idCol, codesCol, _, books, k))
        .reduce(_ unionAll _)
    val luts = queryRows.map { case (qid, q) => (qid, flatAdcLut(q, books)) }
    val spark = codes.sparkSession
    import spark.implicits._
    val lutDf = luts.toDF("qid", "__lut")
    val scored = codes.crossJoin(broadcast(lutDf))
      .select(col("qid"), col(idCol).as("id"),
        adcLutScore(col(codesCol), col("__lut"), m, kk).as("d2"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("d2").asc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k).drop("rank")
  }

  /** Flattened ADC lookup table for one query vector (driver-side,
    * m·k' doubles): `lut(j·k' + c) = ||q_j − books(j)(c)||²`.
    */
  private def flatAdcLut(q: Seq[Double],
                         books: Seq[Seq[Seq[Double]]]): Seq[Double] = {
    val subdim = books.head.head.length
    books.zipWithIndex.flatMap { case (book, j) =>
      val qs = q.slice(j * subdim, (j + 1) * subdim)
      book.map(c => c.zip(qs).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
  }

  /** ADC score of a code array against a flattened-LUT column: m
    * element lookups, codegen'd array lambdas.
    */
  private def adcLutScore(codes: Column, lut: Column, m: Int,
                          kk: Int): Column =
    aggregate(
      zip_with(codes, sequence(lit(0), lit(m - 1)),
        (c, j) => element_at(lut, (j * kk + c + 1).cast("int"))),
      lit(0.0), _ + _)

  /** The reconstruction a code array stands for (driver-side helper for
    * verification and re-ranking).
    */
  def pqDecode(codes: Seq[Int], books: Seq[Seq[Seq[Double]]]): Seq[Double] =
    codes.zipWithIndex.flatMap { case (c, j) => books(j)(c) }

  /** ADC shortlist + exact re-rank (IVFADC+R): take k·refine candidates
    * per query from the codes-only index, fetch ONLY those rows'
    * vectors from the corpus (the shortlist — |queries|·k·refine rows —
    * broadcasts against the corpus scan), score exact squared L2, keep
    * top-k. The production refinement pattern: index IO stays nprobe/C
    * of the codes, the vector fetch is bounded by the shortlist rather
    * than the corpus, and quantization-noise displacement (the
    * non-monotone uniform tail recorded in BASELINE.md) disappears for
    * every neighbor the shortlist covers.
    */
  def ivfPqTopKRefined(spark: org.apache.spark.sql.SparkSession,
                       path: String, corpus: DataFrame, idCol: String,
                       vecCol: String, queryRows: Seq[(Long, Seq[Double])],
                       centroids: Seq[Seq[Double]],
                       books: Seq[Seq[Seq[Double]]], k: Int,
                       nprobe: Int = 1, refine: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val short = ivfPqTopKBatch(spark, path, idCol, queryRows,
      centroids, books, k * math.max(1, refine), nprobe)
      .select(col("qid"), col("id"))
    import spark.implicits._
    val queries = queryRows.toDF("qid", "qvec")
    val scored = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("__vec"))
      .join(broadcast(short), Seq("id"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("id"),
        l2Sq(col("__vec"), col("qvec")).as("d2"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("d2").asc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k).drop("rank")
  }

  // ------------------------------------------------------------------
  // IVF-PQ: the combined coarse + product quantizer (Jégou et al. 2011
  // §IV, IVFADC) — the architecture a 100 TB ANN corpus actually
  // ships. The coarse L2 quantizer partitions the corpus; PQ codes
  // store each vector's RESIDUAL against its bucket centroid; search
  // reads only the probed partitions' codes. IO is bounded by
  // nprobe/C of the index, memory by m bytes/vector, and the original
  // vectors are never read at query time because they are never
  // stored.
  // ------------------------------------------------------------------

  /** The bucket's centroid as a column: ONE `typedlit` plan reference
    * for the whole centroid table (never a per-element literal tree —
    * the CosineArgMaxExpr lesson).
    */
  private def centroidAt(bucket: Column,
                         centroids: Seq[Seq[Double]]): Column =
    element_at(typedlit(centroids.map(_.toSeq)), (bucket + 1).cast("int"))

  /** Train SHARED residual codebooks for an IVF-PQ index: every
    * vector's residual against its L2-assigned coarse centroid feeds
    * the same distributed k-means as [[pqTrain]] (shared books are the
    * standard choice — per-bucket books multiply model size by C for
    * marginal gain). One residual projection deep; the corpus is
    * scanned exactly as often as pqTrain scans it.
    */
  def ivfPqTrain(corpus: DataFrame, idCol: String, vecCol: String,
                 centroids: Seq[Seq[Double]], m: Int, k: Int,
                 iters: Int = 5): Seq[Seq[Seq[Double]]] = {
    val v = col(vecCol).cast("array<double>")
    val b = assignNearestL2(v, centroids)
    val res = corpus.select(col(idCol),
      zip_with(v, centroidAt(b, centroids), (x, y) => x - y).as("__res"))
    pqTrain(res, idCol, "__res", m, k, iters)
  }

  /** Write an IVF-PQ index: bucket-partitioned parquet of (id, codes)
    * where codes are the residual PQ codes — m small ints per vector,
    * vectors NOT stored. A malformed vector (wrong dim / null
    * elements) gets a null bucket and null codes: it lands in the
    * default partition and never matches a probe, surfacing in an
    * audit scan rather than poisoning search results.
    */
  def ivfPqWriteIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      centroids: Seq[Seq[Double]],
                      books: Seq[Seq[Seq[Double]]], path: String): Unit = {
    pqIndexRows(corpus, idCol, vecCol, centroids, books)
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    writeIvfMarker(corpus.sparkSession, path, "pq", centroids, books)
  }

  /** The (id, bucket, codes) projection an IVF-PQ layout stores —
    * shared by the one-shot write and [[IvfIngest.append]] so the two
    * layouts are bit-identical per row (L2 coarse assignment, residual
    * PQ codes, vectors never stored).
    */
  private[ml] def pqIndexRows(corpus: DataFrame, idCol: String,
                              vecCol: String, centroids: Seq[Seq[Double]],
                              books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    corpus.select(col(idCol), v.as("__v"),
        assignNearestL2(v, centroids).as("bucket"))
      .select(col(idCol), col("bucket"),
        pqEncode(zip_with(col("__v"),
          centroidAt(col("bucket"), centroids), (x, y) => x - y), books)
          .as("codes"))
  }

  /** Marker-read IVF-PQ query ([[ivfReadTopK]]'s convention): both the
    * coarse centroids AND the residual books come from the index's own
    * geometry marker.
    */
  def ivfPqReadTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                    idCol: String, query: Seq[Double],
                    k: Int, nprobe: Int): DataFrame = {
    val (cen, books) = markerGeometry(spark, path, "pq")
    ivfPqReadTopK(spark, path, idCol, query, cen, books, k, nprobe)
  }

  /** Marker-read batched IVF-PQ search ([[ivfPqTopKBatch]]). */
  def ivfPqTopKBatch(spark: org.apache.spark.sql.SparkSession, path: String,
                     idCol: String, queryRows: Seq[(Long, Seq[Double])],
                     k: Int, nprobe: Int): DataFrame = {
    val (cen, books) = markerGeometry(spark, path, "pq")
    ivfPqTopKBatch(spark, path, idCol, queryRows, cen, books, k, nprobe)
  }

  private def l2Driver(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** Query a written IVF-PQ index: the probe set and the per-probe
    * RESIDUAL lookup tables (`q − c_b` against the shared books)
    * compute on the driver — nprobe·m·k' doubles — the scan prunes to
    * the probed bucket partitions at planning, and each surviving row
    * scores with m lookups on its code array. The score is exact
    * squared L2 to the row's reconstruction (bucket centroid +
    * decoded residual): the IVFADC estimator.
    */
  def ivfPqReadTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                    idCol: String, query: Seq[Double],
                    centroids: Seq[Seq[Double]],
                    books: Seq[Seq[Seq[Double]]], k: Int,
                    nprobe: Int = 1): DataFrame =
    // the one-query projection of [[ivfPqTopKBatch]] — ONE probe/LUT/
    // prune/score implementation, not two copies to keep in sync
    ivfPqTopKBatch(spark, path, idCol, Seq(0L -> query),
      centroids, books, k, nprobe)
      .select(col("id").as(idCol), col("d2"))
      .orderBy(col("d2").asc, col(idCol).asc)

  /** Batched IVF-PQ search: ONE job for a whole query set. The
    * (qid, bucket, lut) probe table — |queries|·nprobe rows —
    * broadcasts against the partition-pruned scan (the union of all
    * probed buckets), each (query, row) pair costs m lookups, and the
    * qid-partitioned window takes top-k. The serving-path shape for
    * large query sets, mirroring [[pqAdcTopKBatch]].
    */
  def ivfPqTopKBatch(spark: org.apache.spark.sql.SparkSession, path: String,
                     idCol: String, queryRows: Seq[(Long, Seq[Double])],
                     centroids: Seq[Seq[Double]],
                     books: Seq[Seq[Seq[Double]]], k: Int,
                     nprobe: Int = 1): DataFrame = {
    requireIvfGeometry(spark, path, "pq", centroids, books)
    import org.apache.spark.sql.expressions.Window
    val m = books.length
    val kk = books.head.length
    // bound the probe-LUT broadcast like pqAdcTopKBatch (nprobe LUTs
    // per query); chunked results union exactly per qid
    val chunk = math.max(1,
      MaxLutDoublesPerBatch / (math.max(1, nprobe) * m * kk))
    if (queryRows.length > chunk)
      return queryRows.grouped(chunk)
        .map(ivfPqTopKBatch(spark, path, idCol, _, centroids, books, k,
          nprobe))
        .reduce(_ unionAll _)
    val probeRows = queryRows.flatMap { case (qid, q) =>
      centroids.zipWithIndex
        .sortBy { case (c, i) => (l2Driver(q, c), i) }
        .take(math.max(1, nprobe))
        .map { case (c, b) =>
          (qid, b, flatAdcLut(q.zip(c).map { case (a, x) => a - x }, books))
        }
    }
    val allBuckets = probeRows.map(_._2).distinct
    import spark.implicits._
    val luts = probeRows.toDF("qid", "bucket", "__lut")
    val scored = spark.read.parquet(indexReaderDir(spark, path))
      .filter(col("bucket").isin(allBuckets: _*))
      .join(broadcast(luts), Seq("bucket"))
      .select(col("qid"), col(idCol).as("id"),
        adcLutScore(col("codes"), col("__lut"), m, kk).as("d2"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("d2").asc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k).drop("rank")
  }

  /** IVF top-k: assign each query to its `nprobe` best buckets, search only
    * corpus rows in those buckets. Exactness degrades gracefully (standard
    * IVF recall/latency trade).
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              centroids: Seq[Seq[Double]], k: Int, nprobe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = corpus.withColumn("__bucket",
      assignBucket(col(vecCol), centroids))
    // nprobe buckets per query: indices of the nprobe largest centroid
    // sims (native kernel; same reverse(array_sort(struct(sim, idx)))
    // order — sim desc, ties idx desc)
    val probed = queries.withColumn("__probe",
      org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.CosineTopIdxExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(
            col(qvecCol).cast("array<double>")),
          centroids.map(_.toArray).toArray, nprobe)))
    val joined = bucketed.join(broadcast(probed),
      array_contains(col("__probe"), col("__bucket")))
    val scored = joined.select(col(qidCol).as("qid"), col(idCol).as("id"),
      round(cosine(col(vecCol).cast("array<double>"),
        col(qvecCol).cast("array<double>")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket for cosine similarity: sign-bit string of
    * `planes` fixed hyperplanes (deterministic seed-free planes derived
    * from index parity patterns would be weak — caller passes planes).
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    concat(planes.map { p =>
      val pc = array(p.map(lit): _*)
      when(dot(vec.cast("array<double>"), pc) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** All per-band sign-bit keys in ONE native expression. The
    * column-expression form ([[lshBucket]] per band) builds b×r
    * aggregate(zip_with(...)) trees over b×r×dim literal nodes — at 8×8×64
    * that's a plan whose analysis + codegen dominates the query (measured
    * ~2× the execution at sf0.1) and allocates an intermediate array per
    * plane per row. [[graft.functions.LshBandKeysExpr]] carries the plane
    * matrices as ONE plan reference and does the same index-ordered
    * multiply-add (bit-identical sums) with zero allocation, inside
    * whole-stage codegen (it replaced a tight-loop UDF in r6).
    */
  /** Deterministic Rademacher (±1) hyperplanes from an LCG (Knuth MMIX
    * constants), reproducible across runs — the plane source for banded
    * sign-LSH when the caller has no trained planes (the
    * ml_embed_neardup oracle uses the same generator). The ±1 draws
    * carry NO distinctness guarantee: only 2^dim sign patterns exist,
    * so at small `dim` duplicate planes are certain and degrade
    * candidate DIVERSITY (a duplicated plane wastes one of a band's r
    * bits), never correctness — every candidate still passes the exact
    * cosine verify. `dim` must equal the actual embedding length: the
    * key kernel multiplies index-by-index, so a shorter plane would
    * silently hash a prefix of each vector.
    */
  def rademacherBandPlanes(bands: Int, planesPerBand: Int,
                           dim: Int): Seq[Seq[Seq[Double]]] = {
    var s = 0x9E3779B97F4A7C15L
    def next(): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L; s
    }
    Seq.tabulate(bands, planesPerBand, dim)((_, _, _) =>
      if (next() < 0) -1.0 else 1.0)
  }

  /** Corpus-sized banded-LSH geometry — the sizing discipline
    * [[cosineNearDupPairs]]'s scaladoc prescribes, packaged so callers
    * apply it instead of hard-coding an r that silently saturates:
    * r = ⌈log₂(n / targetOccupancy)⌉ planes per band keeps expected
    * bucket occupancy ≈ targetOccupancy at any corpus size (fixed r is
    * the classic LSH scale trap — 2^r buckets saturate, occupancy grows
    * with n, and in-bucket candidate work grows n²; measured on the
    * two-tier fixture: 10× rows at r=8 → 98.7× candidate pairs), and
    * the band count rises WITH r because each extra bit per band lowers
    * a true pair's per-band collision odds — more OR-combined bands buy
    * the recall back. Work per band stays ~n·targetOccupancy, so total
    * candidate work grows ~n·log n instead of n².
    */
  def scaledLshGeometry(n: Long, dim: Int, targetOccupancy: Int = 8,
                        minPlanes: Int = 8): Seq[Seq[Seq[Double]]] = {
    require(dim > 0, "scaledLshGeometry: bad dim")
    val (b, r) = scaledLshBandsPlanes(n, targetOccupancy, minPlanes)
    rademacherBandPlanes(bands = b, planesPerBand = r, dim)
  }

  /** The (bands, planesPerBand) pair [[scaledLshGeometry]] sizes for a
    * corpus of `n` rows — exposed separately so config surfaces that
    * PIN geometry (the dedup_ingest store marker) can resolve and
    * record the numbers the plane builder will use.
    */
  def scaledLshBandsPlanes(n: Long, targetOccupancy: Int = 8,
                           minPlanes: Int = 8): (Int, Int) = {
    require(n > 0 && targetOccupancy > 0,
      "scaledLshBandsPlanes: bad geometry")
    val r = math.max(minPlanes, math.ceil(
      math.log(n.toDouble / targetOccupancy) / math.log(2.0)).toInt)
    (r, r)
  }

  /** Per-plane sign-LSH collision probability for two vectors at cosine
    * `c`: 1 − θ/π with θ = arccos(c) — the random-hyperplane identity
    * (Goemans–Williamson / Charikar, STOC'02). This is the analytic
    * base of the OR-of-bands recall model the r15 three-tier
    * measurement validated (predicted 0.802 vs measured 0.804 at
    * r = 16, b = 16, c = 0.91).
    */
  def lshPlaneCollision(c: Double): Double = {
    require(c >= -1.0 && c <= 1.0, s"lshPlaneCollision: cosine $c out of [-1,1]")
    1.0 - math.acos(c) / math.Pi
  }

  /** Analytic recall of OR-combined banded sign-LSH at cosine `c`:
    * 1 − (1 − p^r)^b with p = [[lshPlaneCollision]](c). Exposed so
    * specs and sizing decisions use the same closed form the planner
    * uses.
    */
  def lshOrOfBandsRecall(c: Double, bands: Int, planesPerBand: Int): Double = {
    require(bands > 0 && planesPerBand > 0, "lshOrOfBandsRecall: bad geometry")
    1.0 - math.pow(1.0 - math.pow(lshPlaneCollision(c), planesPerBand), bands)
  }

  /** Bands needed so [[lshOrOfBandsRecall]] at cosine `refCosine`
    * reaches `targetRecall` given `planesPerBand` sign bits per band:
    * b = ⌈ln(1 − targetRecall) / ln(1 − p^r)⌉. Sizing at the dedup
    * THRESHOLD cosine is the conservative floor — every pair the
    * operator should return sits at c ≥ threshold, where per-band
    * collision is strictly higher.
    */
  def lshBandsForRecall(targetRecall: Double, refCosine: Double,
                        planesPerBand: Int): Int = {
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"lshBandsForRecall: targetRecall $targetRecall out of (0,1)")
    require(planesPerBand > 0, "lshBandsForRecall: bad planesPerBand")
    val pr = math.pow(lshPlaneCollision(refCosine), planesPerBand)
    require(pr > 0.0, s"lshBandsForRecall: zero per-band collision at " +
      s"cosine $refCosine with r=$planesPerBand — unreachable target")
    math.max(1, math.ceil(
      math.log1p(-targetRecall) / math.log1p(-pr)).toInt)
  }

  /** Recall-targeted corpus-sized geometry: r from the occupancy law
    * ([[scaledLshBandsPlanes]] — bounded per-bucket candidate work at
    * any n) and b = max(r, [[lshBandsForRecall]]) so recall at
    * `refCosine` stays ≥ `targetRecall` at EVERY corpus size instead
    * of decaying ~2.5 points/decade under the square b = r geometry
    * (measured r15: 0.9805 → 0.9576 → 0.9297 across three decades at
    * threshold 0.9). The price is explicit and linear: candidate work
    * scales with b/r (≈2.2× at the x100 tier for target 0.95 at
    * c = 0.9) — bands bought back as recall, not hidden keyspace
    * saturation.
    */
  def recallLshBandsPlanes(n: Long, targetRecall: Double, refCosine: Double,
                           targetOccupancy: Int = 8,
                           minPlanes: Int = 8): (Int, Int) = {
    val (_, r) = scaledLshBandsPlanes(n, targetOccupancy, minPlanes)
    (math.max(r, lshBandsForRecall(targetRecall, refCosine, r)), r)
  }

  /** [[recallLshBandsPlanes]] materialized as Rademacher plane sets —
    * the recall-targeted sibling of [[scaledLshGeometry]].
    */
  def recallLshGeometry(n: Long, dim: Int, targetRecall: Double,
                        refCosine: Double, targetOccupancy: Int = 8,
                        minPlanes: Int = 8): Seq[Seq[Seq[Double]]] = {
    require(dim > 0, "recallLshGeometry: bad dim")
    val (b, r) = recallLshBandsPlanes(n, targetRecall, refCosine,
      targetOccupancy, minPlanes)
    rademacherBandPlanes(bands = b, planesPerBand = r, dim)
  }

  def lshBandKeys(vec: Column, bandPlanes: Seq[Seq[Seq[Double]]]): Column = {
    val planes: Array[Array[Array[Double]]] =
      bandPlanes.map(_.map(_.toArray).toArray).toArray
    // native expression (graft.functions.LshBandKeysExpr): the former
    // Scala UDF paid a Row→Seq conversion per vector and broke codegen;
    // same index-ordered sums, bit-identical keys
    // cast like the replaced UDF's Seq[Double] coercion did, so float
    // embedding columns keep working for any caller
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.LshBandKeysExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(
          vec.cast("array<double>")), planes))
  }

  /** Embedding-cosine near-duplicate pairs via BANDED random-hyperplane
    * LSH — the embedding analogue of [[Dedup.minhashPairs]]:
    *
    *  - `bandPlanes(b)` is the hyperplane set of band `b`; each band maps a
    *    vector to a 2^r-ary sign-bit key (r = planes per band). Bucket
    *    cardinality is 2^r PER BAND and is a free parameter: at 10⁹
    *    vectors you run r ≈ 20 (≈10⁶ buckets/band, ≈10³ vectors/bucket →
    *    ≈5·10⁵ candidate pairs/bucket, bounded), not the r you'd use at
    *    10³. A single constant-size bucket set would make the self-join
    *    O(n²/buckets) — the scale-killer this banding removes.
    *  - candidates are OR-combined across bands (a pair is a candidate if
    *    ANY band collides); the exact cosine is computed INSIDE the band
    *    self-join — where both normalized vectors are already present in
    *    the joined row — then thresholded, and only the surviving narrow
    *    (a, b, sim) rows are deduplicated across bands. A pair colliding
    *    in several bands recomputes an identical dot per band (the bands
    *    are OR-duplicates, ~1.2× at target occupancy), which is the
    *    right trade: the alternative — dedup narrow candidates first,
    *    then join the vectors back for one scoring pass — re-shuffles
    *    candidates × vector-width bytes TWICE (measured 8.5 GB and the
    *    dominant, GC-noisy cost at the 200k-vector x100 tier, r14
    *    decomposition), while the in-join dot ships the wide rows
    *    through ONE exchange (reused by both self-join sides) and every
    *    later shuffle is 24-byte rows, already threshold-filtered.
    *  - `maxBucketSize` drops degenerate buckets (a plane set aligned with
    *    the corpus distribution can pile mass into one key; a capped
    *    bucket contributes ≤ cap²/2 pairs instead of unbounded).
    *    Oversized buckets are found with one map-side-combined aggregate
    *    (column pruning keeps the vector out of its shuffle) and
    *    broadcast-anti-joined away (same shape as [[Dedup.minhashPairs]]),
    *    with no per-branch Exchange+Sort from a count window.
    *
    * The signature table (id + normalized vector + one key per band) is
    * deliberately NOT persisted (r14, measured): Spark 4's AQE wraps
    * each scan of a cached table in its own TableCacheQueryStage, whose
    * distinct stage ids make the two self-join side exchanges —
    * canonically EQUAL without the cache — non-reusable, so the persist
    * that once prevented double signature computation CAUSED a double
    * wide shuffle (measured at the 200k-vector x100 tier: 6 shuffle
    * stages / 2.73 GB written with the persist vs 4 / 1.37 GB without;
    * wall 3.9–15.9 s vs 3.1–6.7 s). Un-persisted, both sides share ONE
    * reused exchange — compute-once AND shuffle-once, with no cache
    * memory. The price is one extra scan+key pass in the narrow
    * oversized-bucket aggregate branch (embarrassingly parallel CPU;
    * the shuffle is the scarce resource at cluster scale).
    */
  /** Semantic dedup keep-set (SemDeDup, Abbas et al. 2023 "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication"): cluster embeddings, then inside each cluster drop
    * every row that has a senior (smaller-id) neighbor at cosine ≥
    * `threshold`. The third leg of corpus dedup — exact ([[Dedup.exact]])
    * catches copies, MinHash ([[Dedup.nearDupKeep]]) catches edits,
    * this catches REPHRASINGS that share no n-grams.
    *
    * The keep rule is the greedy min-id sweep (a row survives unless a
    * smaller-id row in its cluster is near it) — deterministic,
    * engine-independent, and exactly expressible in the SQL oracle,
    * unlike "keep the one closest to the centroid" which ties through
    * float centroid sums.
    *
    * Scale shape: assignment is a narrow broadcast argmax
    * ([[assignBucket]], centroids ride the plan as one reference);
    * vectors normalize ONCE before the self-join (the
    * [[cosineNearDupPairs]] lesson); the pair space is bounded by the
    * cluster partition — SemDeDup's own design point is k large enough
    * that clusters stay small (the paper uses 50k clusters for LAION).
    * Oversized clusters (> `maxClusterSize`) are exempted from pairing
    * wholesale (all their rows kept) instead of quadratically blowing
    * the join — the same conservative cap as the LSH band joins.
    */
  def semanticKeep(corpus: DataFrame, idCol: String, vecCol: String,
                   centroids: Seq[Seq[Double]], threshold: Double,
                   maxClusterSize: Int = 4096): DataFrame = {
    val base = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("b", assignBucket(col("v"), centroids))
      .withColumn("n", norm(col("v")))
    val sig = base.select(col("id"), col("b"),
      when(col("n") > 0, transform(col("v"), x => x / col("n")))
        .otherwise(col("v")).as("u"))
    val oversized = sig.groupBy(col("b")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxClusterSize).select(col("b"))
    val capped = sig.join(broadcast(oversized), Seq("b"), "left_anti")
    val l = capped.alias("l"); val r = capped.alias("r")
    // left_semi: each row needs ONE senior neighbor to be dropped — no
    // pair materialization, no distinct
    val dropped = l.join(r,
        col("l.b") === col("r.b") && col("r.id") < col("l.id") &&
          round(dot(col("l.u"), col("r.u")), 6) >= threshold,
        "left_semi")
      .select(col("l.id").as("__drop_id"))
    corpus.join(dropped, col(idCol) === col("__drop_id"), "left_anti")
  }

  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         bandPlanes: Seq[Seq[Seq[Double]]],
                         threshold: Double,
                         maxBucketSize: Int = 4096): DataFrame = {
    // normalize ONCE per vector (O(corpus)), so the per-pair verify is a
    // single dot product instead of dot + two norms (O(candidates) × 3 —
    // measured 3-4× of the whole query at sf0.1). The norm is materialized
    // into its own column first: an inline expression referenced from the
    // transform lambda would be re-evaluated per element (no CSE inside
    // lambda bodies — same pitfall as Dedup.shingles).
    val base = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("n", norm(col("v")))
    // the signature table is NOT persisted: both self-join sides read it
    // through one reused exchange (Spark 4 AQE wraps each cache scan in
    // its own TableCacheQueryStage, which defeats exchange reuse and
    // doubles the wide shuffle — measured r14, PLANS persist table)
    val sig = base.select(
      col("id"),
      when(col("n") > 0, transform(col("v"), x => x / col("n")))
        .otherwise(col("v")).as("u"),
      lshBandKeys(col("v"), bandPlanes).as("ks"))
    val banded = sig
      .select(col("id"), col("u"), posexplode(col("ks")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    val oversized = CapAudit.observed(
        banded.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucketSize),
        "cosine_pairs")
      .select(col("band"), col("key"))
    val capped = banded.join(broadcast(oversized), Seq("band", "key"), "left_anti")
    val l = capped.alias("l"); val r = capped.alias("r")
    // dot INSIDE the band join (both u's are in the joined row), filter,
    // THEN dedup the narrow survivors — see the scaladoc trade-off
    l.join(r, col("l.band") === col("r.band") &&
        col("l.key") === col("r.key") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        round(dot(col("l.u"), col("r.u")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .groupBy(col("a"), col("b")).agg(first(col("sim")).as("sim"))
  }

  /** Clustering-quality audit against a ground-truth label column:
    * per k-means cluster, the row count, the majority label (ties to
    * the smaller label), and the purity = majority fraction — the
    * standard external clustering metric, and the quick answer to "did
    * the embedding clusters recover the known classes?" before using
    * them for mixing or dedup.
    *
    * Scale: the label histogram is ONE map-side-combined aggregate of
    * at most k × |labels| rows; the majority pick is a WindowGroupLimit
    * over that tiny frame. Training cost is [[kmeansCentroids]]'s.
    */
  def clusterPurity(corpus: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, k: Int, dim: Int,
                    iters: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cen = kmeansCentroids(corpus, idCol, vecCol, k, dim, iters)
    val v = col(vecCol).cast("array<double>")
    val assigned = kmeansClean(corpus, v).filter(size(v) === dim)
      .select(assignNearestL2(v, cen).cast("int").as("cluster"),
        col(labelCol).as("label"))
    val hist = assigned.groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("c").desc, col("label").asc)
    val totals = Window.partitionBy(col("cluster"))
    hist
      .withColumn("n", sum(col("c")).over(totals))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("cluster"), col("n"),
        col("label").as("majority_label"),
        round(col("c").cast("double") / col("n"), 6).as("purity"))
  }

  /** Embedding-cosine incremental-ingestion near dedup: drop `incoming`
    * rows whose banded-LSH candidates in the REFERENCE corpus verify at
    * cosine ≥ `threshold` — [[graft.ml.Dedup.nearDupAgainst]]'s
    * embedding analogue, completing the against-a-reference leg of the
    * embedding dedup family (pairs = [[cosineNearDupPairs]], keep-set =
    * [[semanticKeep]]). The band join is incoming×reference instead of
    * a self-join — incremental batches never pair with themselves — and
    * the bucket cap counts BOTH sides jointly (a pile-up on either side
    * blows up the same join, the nearDupAgainst convention). Vectors
    * normalize once per row; the dot runs INSIDE the band join (the
    * r14 [[cosineNearDupPairs]] re-shape: re-joining vectors onto
    * deduplicated narrow candidates shipped candidate-count ×
    * vector-width bytes through two more exchanges — measured as the
    * dominant, GC-noisy cost at the x100 tier), and only surviving
    * incoming ids cross the final distinct. A pair colliding in
    * several bands recomputes an identical dot per band; the outcome
    * — "this incoming id has a verified reference neighbor" — is
    * band-count-invariant.
    */
  def cosineNearDupAgainst(incoming: DataFrame, ref: DataFrame,
      idCol: String, vecCol: String, bandPlanes: Seq[Seq[Seq[Double]]],
      threshold: Double, maxBucketSize: Int = 4096): DataFrame = {
    def sigOf(df: DataFrame, side: Int): DataFrame = {
      val base = df
        .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
        .withColumn("n", norm(col("v")))
      base.select(col("id"), lit(side).as("side"),
        when(col("n") > 0, transform(col("v"), x => x / col("n")))
          .otherwise(col("v")).as("u"),
        lshBandKeys(col("v"), bandPlanes).as("ks"))
    }
    // one persisted signature table carries both sides (side 0 =
    // incoming, 1 = reference); it feeds the band explode AND the
    // verify joins — the cosineNearDupPairs convention, CacheSweep-
    // released by the caller
    val sig = sigOf(incoming, 0).unionByName(sigOf(ref, 1)).persist()
    val banded = sig.select(col("id"), col("side"), col("u"),
        posexplode(col("ks")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    val oversized = CapAudit.observed(
        banded.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucketSize),
        "cosine_against")
      .select(col("band"), col("key"))
    val capped = banded.join(broadcast(oversized), Seq("band", "key"), "left_anti")
    val l = capped.filter(col("side") === 0).alias("l")
    val r = capped.filter(col("side") === 1).alias("r")
    val dirty = l.join(r, col("l.band") === col("r.band") &&
        col("l.key") === col("r.key") &&
        round(dot(col("l.u"), col("r.u")), 6) >= threshold)
      .select(col("l.id").as("iid")).distinct()
    incoming.join(dirty, col(idCol) === col("iid"), "left_anti")
  }

  /** Approximate k-NN graph over the whole corpus: every node's top-`k`
    * cosine neighbors AMONG its banded-LSH candidates
    * ([[cosineNearDupPairs]] with the threshold gate open — candidate
    * generation, capping, and one-scoring-per-pair are shared, not
    * reimplemented). The standard seed structure for NN-descent
    * refinement, graph-based semantic dedup, and label propagation; an
    * exact all-pairs graph is O(n²) by definition, so the LSH candidate
    * set IS the scale path (recall tunable via bands × planes, the
    * [[cosineNearDupPairs]] analysis).
    *
    * Each undirected candidate pair contributes both directed edges;
    * per-node top-k is a row_number window over (sim desc, dst asc) —
    * rank ≤ k executes as a WindowGroupLimit (per-partition heaps), and
    * the partition key `src` is bounded by the bucket cap, so no node
    * ever funnels an unbounded edge list through one task. Deterministic:
    * sims round to 6 before ranking, ties break on the neighbor id.
    */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String,
               bandPlanes: Seq[Seq[Seq[Double]]], k: Int,
               maxBucketSize: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = cosineNearDupPairs(corpus, idCol, vecCol, bandPlanes,
      threshold = -1.0, maxBucketSize)
    // both directed edges from ONE pass over the scored pairs (a unionAll
    // of two selects over `pairs` would re-run the candidate join and the
    // scoring — the double-execution the quantile gate was flagged for)
    val edges = pairs.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"), col("sim"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("sim"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("sim").desc, col("dst").asc)
    edges.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("rank"), col("dst"), col("sim"))
  }

  // ======================================================================
  // PCA / whitening
  // ======================================================================

  /** Outer-product-sum aggregate
    * ([[graft.functions.OuterProductSumAgg]]): one row-major dim²
    * array-typed aggregate column.
    */
  private[ml] def outerSum(c: Column, dim: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.functions.OuterProductSumAgg(
      GraftSqlBridge.expression(c), dim).toAggregateExpression())
  }

  /** The one-row (n, Σv, Σv·vᵀ) moment aggregate every covariance/PCA
    * consumer shares: ONE map-side-combined pass over the corpus, dim²+
    * dim+1 doubles on the exchange regardless of corpus size.
    */
  private def momentAgg(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    df.select(col(vecCol).cast("array<double>").as("__v"))
      .agg(count(lit(1)).cast("double").as("n"),
        vecSum(col("__v"), dim).as("s"),
        outerSum(col("__v"), dim).as("o"))

  /** Population covariance matrix of an embedding column as (i, j, cov)
    * rows — the feature-correlation diagnostic of a corpus (and the
    * distributed kernel under [[pcaTrain]]). cov(i,j) =
    * Σvᵢvⱼ/n − (Σvᵢ/n)(Σvⱼ/n), rounded to 6 for cross-engine stability.
    *
    * Scale: the corpus collapses to ONE dim²-buffer aggregate row
    * (map-side combined); the (i, j) explosion is a narrow projection of
    * that single row. Nothing else moves.
    */
  def covarianceMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    momentAgg(df, vecCol, dim)
      .select(col("n"), col("s"), posexplode(col("o")).as(Seq("p", "sp")))
      .select(
        (col("p") / dim).cast("long").as("i"),
        (col("p") % dim).cast("long").as("j"),
        // + 0.0 normalizes -0.0 → 0.0 (IEEE): DuckDB's round keeps the
        // negative zero of a tiny negative, Spark's drops it — same
        // number, different bytes, and the oracle hash compares bytes
        (round(col("sp") / col("n")
          - (element_at(col("s"), (col("p") / dim).cast("int") + 1) / col("n"))
          * (element_at(col("s"), (col("p") % dim).cast("int") + 1) / col("n")),
          6) + lit(0.0)).as("cov"))

  /** A trained PCA basis: `mean` (dim), `eigvals` desc (m), `components`
    * row-major (m × dim, orthonormal, sign-fixed so each row's
    * largest-|·| entry is positive — deterministic across runs).
    */
  case class PcaModel(mean: Array[Double], eigvals: Array[Double],
                      components: Array[Array[Double]])

  /** Train a PCA basis on an embedding column: the corpus collapses to
    * the single [[momentAgg]] row (dim² doubles to the driver — the
    * trainCentroids convention: model-sized driver state, never
    * corpus-sized), then a driver-local cyclic Jacobi eigensolve of the
    * dim×dim covariance. At dim ≤ a few thousand the solve is
    * milliseconds-to-seconds and independent of corpus size — the
    * distributed work is exactly one aggregate pass.
    */
  def pcaTrain(df: DataFrame, vecCol: String, dim: Int, m: Int): PcaModel = {
    require(m >= 1 && m <= dim, s"pcaTrain: m=$m out of range [1, $dim]")
    val row = momentAgg(df, vecCol, dim).head()
    val n = row.getDouble(0)
    require(n > 0, "pcaTrain: empty input")
    val s = row.getSeq[Double](1).toArray
    val o = row.getSeq[Double](2).toArray
    val mean = s.map(_ / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      o(i * dim + j) / n - mean(i) * mean(j))
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.indices.sortBy(i => -vals(i)).take(m)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(r => vecs(r)(c))
      // deterministic sign: largest-|entry| (first on ties) positive
      var best = 0
      for (i <- 1 until dim) if (math.abs(v(i)) > math.abs(v(best))) best = i
      if (v(best) < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, order.map(vals).toArray, comps)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: returns
    * (eigenvalues, eigenvectors-as-columns). O(dim³) per sweep, a
    * handful of sweeps to 1e-12 — driver-local by design (the matrix is
    * model-sized; distributing an eigensolve of a dim≤4096 matrix would
    * be all coordination and no work).
    */
  private[ml] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-12) {
      off = 0.0
      for (p <- 0 until n - 1; q <- p + 1 until n) {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > 1e-14) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 // theta == 0 → 45° rotation
              case x => x
            }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until n) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until n) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until n) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Project an embedding column onto a trained PCA basis (optionally
    * whitened — each component scaled by 1/√eigval, making the projected
    * population covariance the identity). One narrow native-kernel
    * projection ([[graft.functions.ProjectCenteredExpr]] — basis and
    * mean ride the plan as references, never literal trees); malformed
    * vectors project to null, the pqEncode contract.
    */
  def pcaProject(df: DataFrame, vecCol: String, model: PcaModel,
                 outCol: String = "pca",
                 whiten: Boolean = false): DataFrame = {
    val eps = 1e-12
    val mat =
      if (!whiten) model.components
      else model.components.zip(model.eigvals).map { case (row, ev) =>
        val scale = 1.0 / math.sqrt(math.max(ev, eps))
        row.map(_ * scale)
      }
    import org.apache.spark.sql.GraftSqlBridge
    df.withColumn(outCol, GraftSqlBridge.column(
      graft.functions.ProjectCenteredExpr(
        GraftSqlBridge.expression(col(vecCol).cast("array<double>")),
        mat, model.mean)))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke, Büttcher, SIGIR 2009
    * "Reciprocal rank fusion outperforms Condorcet and individual rank
    * learning methods"): fuse ANY per-query rankings — each a
    * (qid, id, rank) frame with rank 1-based — into one top-k by
    * `score(d) = Σ_r 1 / (rrfK + rank_r(d))`. Rank-only fusion needs
    * no score calibration between channels (BM25 log-scale vs cosine
    * in [−1, 1]), which is why it is the standard hybrid-retrieval
    * combiner. Optional per-ranking `weights` (weighted RRF:
    * `Σ_r w_r / (rrfK + rank_r)`) bias the fusion toward a channel
    * without re-introducing score calibration — a weight of 0
    * silences a channel entirely: its ranking is dropped BEFORE the
    * union, so the channel's frame never enters the plan (its scan is
    * skipped) and its documents cannot occupy top-k slots as score-0
    * tail fillers (ADVICE r15). The union carries (qid, id, rank,
    * weight) only; each document contributes ≤ |rankings| terms, so
    * the per-(qid, id) sum is a bounded deterministic add and
    * `round(…, 6)` pins both engines.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 10,
              rrfK: Int = 60,
              weights: Seq[Double] = Nil): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no rankings to fuse")
    require(weights.isEmpty || weights.size == rankings.size,
      s"rrfFuse: ${weights.size} weights for ${rankings.size} rankings")
    import org.apache.spark.sql.expressions.Window
    val ws = if (weights.isEmpty) Seq.fill(rankings.size)(1.0) else weights
    val live = rankings.zip(ws).filter(_._2 != 0.0)
    require(live.nonEmpty,
      "rrfFuse: every channel has weight 0 — nothing to fuse (drop " +
        "the stage instead of silencing all of its channels)")
    val all = live
      .map { case (r, w) =>
        r.select(col("qid"), col("id"), col("rank"), lit(w).as("__w")) }
      .reduce(_ unionByName _)
    val fused = all.groupBy(col("qid"), col("id"))
      .agg(round(sum(col("__w") / (lit(rrfK) + col("rank"))), 6).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  /** Hybrid retrieval: BM25 lexical top-`fetchK` and exact-cosine
    * embedding top-`fetchK` over the SAME corpus, RRF-fused to top-k —
    * the standard two-channel shape (a term-match channel that wins on
    * names/rare tokens, an embedding channel that wins on paraphrase;
    * fusion needs only ranks, see [[rrfFuse]]). Queries carry both a
    * text and a vector column. Scale shape: both channels broadcast
    * the (small by definition) query side and scan the corpus once
    * each; the fusion input is ≤ 2·|queries|·fetchK rank rows — the
    * corpus never shuffles. The semantic channel here is the EXACT
    * brute baseline; at index scale, serve it from a written ANN
    * index instead and fuse through [[rrfFuse]] directly — the
    * `hybrid_topk` stage's `index: {path}` shape, where the embedding
    * read prunes to the probed bucket directories
    * ([[ivfReadTopKBatch]] and its sq8/pq siblings return the same
    * (qid, id, rank) rows this function fuses).
    */
  def hybridTopK(corpus: DataFrame, idCol: String, textCol: String,
                 vecCol: String, queries: DataFrame, qidCol: String,
                 qtextCol: String, qvecCol: String, k: Int = 10,
                 fetchK: Int = 20, rrfK: Int = 60, k1: Double = 1.2,
                 b: Double = 0.75, lexWeight: Double = 1.0,
                 semWeight: Double = 1.0): DataFrame = {
    val lex = CorpusStats.bm25TopK(corpus, idCol, textCol,
        queries, qidCol, qtextCol, k = fetchK, k1 = k1, b = b)
      .select(col("qid"), col("doc").as("id"), col("rank"))
    val sem = bruteForceTopK(corpus, idCol, vecCol,
        queries, qidCol, qvecCol, k = fetchK)
      .select(col("qid"), col("id"), col("rank"))
    rrfFuse(Seq(lex, sem), k = k, rrfK = rrfK,
      weights = Seq(lexWeight, semWeight))
  }
}
