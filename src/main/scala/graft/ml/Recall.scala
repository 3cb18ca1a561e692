package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall harness: recall@k of the approximate paths (IVF bucket
  * probing, PQ/ADC code scoring) against exact brute force, per tuning
  * knob — the curve a tuner reads to pick nprobe / m for a target
  * recall. The reference has no ANN surface; this gates OUR scale paths
  * on the metric that actually matters (exactness gates alone cannot
  * say "nprobe=4 reaches 0.9 recall here").
  *
  * Scale shapes: ground truth is [[Similarity.bruteForceTopK]] (one
  * broadcast of the query set, no corpus shuffle); each IVF point is one
  * [[Similarity.ivfTopK]] run; recall joins are (|queries|·k)-row joins
  * — driver-tiny. PQ scoring reads codes only (m bytes/vector).
  */
object Recall {

  /** recall@k: fraction of (qid, id) pairs in `truth` also present in
    * `approx`. Both frames carry qid/id columns (the top-k outputs).
    */
  def recallAtK(truth: DataFrame, approx: DataFrame): Double = {
    val t = truth.select(col("qid"), col("id")).persist()
    val n = t.count().toDouble
    val hits = t.join(approx.select(col("qid"), col("id")), Seq("qid", "id"))
      .count().toDouble
    t.unpersist(blocking = false)
    if (n == 0) 0.0 else hits / n
  }

  /** IVF recall curve: recall@k for each nprobe, against cosine brute
    * force on the same corpus/queries. nprobe = |centroids| probes every
    * bucket — that point is exhaustive and must read 1.0 (the harness's
    * built-in sanity anchor).
    */
  def ivfRecallCurve(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     centroids: Seq[Seq[Double]], k: Int,
                     nprobes: Seq[Int]): Seq[(Int, Double)] = {
    val truth = Similarity.bruteForceTopK(corpus, idCol, vecCol,
      queries, qidCol, qvecCol, k).persist()
    truth.count()
    val curve = nprobes.map { np =>
      np -> recallAtK(truth, Similarity.ivfTopK(corpus, idCol, vecCol,
        queries, qidCol, qvecCol, centroids, k, np))
    }
    truth.unpersist(blocking = false)
    curve
  }

  /** Smallest `nprobe` whose MEASURED recall@k on a deterministic query
    * sample reaches `targetRecall` — the IVF sibling of the LSH/MinHash
    * `target_recall` sizing. LSH geometry is closed-form (the OR-of-bands
    * model), but IVF recall at a given nprobe depends on how the corpus
    * clusters around the trained centroids, so the contract is empirical:
    * sample queries content-addressed (smallest `md5(qid)` — the
    * [[Similarity.seedCandidates]] convention, deterministic for a given
    * query table), take exact brute-force truth for the sample, then walk
    * nprobe doubling from 1 and binary-refine to the minimal passing
    * value. Cost: ONE full-scan truth pass over the corpus (broadcast of
    * ≤ `sampleN` queries, no corpus shuffle) plus ≤ 2·log₂(C)
    * bucket-pruned sample searches — a one-time tuning pass at index
    * build, independent of the production query load.
    *
    * Returns (nprobe, measured sample recall at that nprobe). The
    * exhaustive point `nprobe = |centroids|` is the cap: if even it
    * misses `targetRecall` (possible only when truth contains rows the
    * bucketed scan cannot reach, e.g. malformed vectors assigned no
    * bucket), the cap is returned with its honest sub-target recall
    * rather than an error — probing wider than every bucket buys
    * nothing. Empty query table → ((1, 0.0)) (nothing to tune; the
    * [[recallAtK]] n = 0 convention).
    */
  def tuneNprobe(corpus: DataFrame, idCol: String, vecCol: String,
                 queries: DataFrame, qidCol: String, qvecCol: String,
                 centroids: Seq[Seq[Double]], k: Int,
                 targetRecall: Double, sampleN: Int = 16): (Int, Double) = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"tuneNprobe: target_recall must be in (0, 1], got $targetRecall")
    val sample = queries
      .select(col(qidCol), col(qvecCol),
        md5(col(qidCol).cast("string")).as("__h"))
      .orderBy(col("__h")).limit(sampleN).drop("__h")
      .persist()
    val nSample = sample.count()
    if (nSample == 0) { sample.unpersist(blocking = false); return (1, 0.0) }
    val truth = Similarity.bruteForceTopK(corpus, idCol, vecCol,
      sample, qidCol, qvecCol, k).persist()
    truth.count()
    def measure(np: Int): Double =
      recallAtK(truth, Similarity.ivfTopK(corpus, idCol, vecCol,
        sample, qidCol, qvecCol, centroids, k, np))
    val cMax = math.max(1, centroids.length)
    // doubling ascent: first passing power of two (or the exhaustive cap)
    var np = 1
    var rec = measure(np)
    while (rec < targetRecall && np < cMax) {
      np = math.min(np * 2, cMax)
      rec = measure(np)
    }
    // binary refine on the half-open (np/2, np]: doubling overshoots by
    // up to 2× and every probed bucket is a scanned bucket forever after.
    // Skipped when even the exhaustive cap missed target — no narrower
    // probe can pass where the cap did not.
    var lo = if (rec < targetRecall) np - 1
             else np / 2 // known-failing (or 0 when np == 1 passed outright)
    var hi = np
    var hiRec = rec
    while (hi - lo > 1) {
      val mid = lo + (hi - lo) / 2
      val r = measure(mid)
      if (r >= targetRecall) { hi = mid; hiRec = r } else lo = mid
    }
    truth.unpersist(blocking = false)
    sample.unpersist(blocking = false)
    (hi, hiRec)
  }

  /** Exact L2 top-k (the metric PQ approximates — cosine truth would
    * conflate quantization error with metric mismatch).
    */
  def bruteForceTopKL2(corpus: DataFrame, idCol: String, vecCol: String,
                       queries: DataFrame, qidCol: String, qvecCol: String,
                       k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus.crossJoin(broadcast(queries))
    val scored = joined.select(
      col(qidCol).as("qid"), col(idCol).as("id"),
      Similarity.l2Sq(col(vecCol).cast("array<double>"),
        col(qvecCol).cast("array<double>")).as("d2"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("d2").asc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k).drop("rank")
  }

  /** PQ/ADC top-k for one query against a pre-encoded code table
    * (id, codes): m lookups per row, vectors never read.
    */
  def pqTopK(codes: DataFrame, idCol: String, codesCol: String,
             query: Seq[Double], books: Seq[Seq[Seq[Double]]],
             k: Int): DataFrame =
    codes.select(col(idCol).as("id"),
        Similarity.pqAdcScore(col(codesCol), query, books).as("d2"))
      .orderBy(col("d2").asc, col("id").asc)
      .limit(k)

  /** PQ recall curve over subquantizer counts `ms`: for each m, train
    * codebooks, encode ONCE, then score codes via ADC and compare to
    * exact-L2 truth. Queries ride the driver (they are the small side
    * by definition).
    *
    * Two scoring shapes, chosen by query-set size: up to
    * [[BatchQueryThreshold]] queries, one TakeOrdered per query with
    * its LUT as a folded literal (whole-stage codegen, the measurement
    * harness's case); above it, ONE job via
    * [[Similarity.pqAdcTopKBatch]] — the per-query LUTs broadcast as a
    * table and every query scores in the same scan (the former
    * per-query loop scheduled |queries| jobs per m, the r8-documented
    * bound).
    */
  val BatchQueryThreshold = 64

  def pqRecallCurve(corpus: DataFrame, idCol: String, vecCol: String,
                    queryRows: Seq[(Long, Seq[Double])], k: Int,
                    ms: Seq[Int], pqK: Int = 16,
                    iters: Int = 3): Seq[(Int, Double)] = {
    // recallAtK's n==0 convention, before any training is paid for
    if (queryRows.isEmpty) return ms.map(_ -> 0.0)
    val spark = corpus.sparkSession
    import spark.implicits._
    val queries = queryRows.toDF("qid_src", "qvec")
    val truth = bruteForceTopKL2(corpus, idCol, vecCol,
      queries, "qid_src", "qvec", k).persist()
    truth.count()
    val curve = ms.map { m =>
      val books = Similarity.pqTrain(corpus, idCol, vecCol, m, pqK, iters)
      val codes = corpus.select(col(idCol).as("id"),
        Similarity.pqEncode(col(vecCol), books).as("codes")).persist()
      codes.count()
      val approx =
        if (queryRows.length > BatchQueryThreshold)
          Similarity.pqAdcTopKBatch(codes, "id", "codes", queryRows,
            books, k).select(col("qid"), col("id"))
        else queryRows.map { case (qid, qvec) =>
          pqTopK(codes, "id", "codes", qvec, books, k)
            .select(lit(qid).as("qid"), col("id"))
        }.reduce(_ unionAll _)
      val r = recallAtK(truth, approx)
      codes.unpersist(blocking = false)
      m -> r
    }
    truth.unpersist(blocking = false)
    curve
  }

  /** SQ8 recall@k vs the exact inner-product ranking on the same
    * corpus/queries — what the int8 rung's 4× compression costs in
    * ranking fidelity. One number: SQ8 has no probe/width knob; its
    * only error source is the ≤ scale/2 per-dimension rounding.
    */
  def sq8Recall(corpus: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, qidCol: String, qvecCol: String,
                k: Int): Double = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus.crossJoin(broadcast(queries))
    val dot = aggregate(
      zip_with(col(vecCol).cast("array<double>"),
        col(qvecCol).cast("array<double>"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    val truth = joined
      .select(col(qidCol).as("qid"), col(idCol).as("id"), dot.as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k).drop("rank")
    recallAtK(truth,
      Similarity.sq8TopK(corpus, idCol, vecCol, queries, qidCol, qvecCol, k))
  }

  /** IVF-PQ recall curve: recall@k vs exact L2 truth for each nprobe at
    * fixed (m, k') — the probe-width trade of the COMBINED index
    * ([[Similarity.ivfPqWriteIndex]]), which compounds IVF's missed
    * buckets with PQ's quantization error. Trains residual books, writes
    * a real bucket-partitioned index to a temp dir (the measurement runs
    * the same pruned-scan path production runs), and scores every nprobe
    * with ONE batched job ([[Similarity.ivfPqTopKBatch]]). Coarse
    * centroids come from the caller — on near-unit-norm corpora the
    * cosine-trained [[Similarity.trainCentroids]] output serves as the
    * L2 coarse quantizer.
    */
  def ivfPqRecallCurve(corpus: DataFrame, idCol: String, vecCol: String,
                       queryRows: Seq[(Long, Seq[Double])],
                       centroids: Seq[Seq[Double]], k: Int, m: Int,
                       pqK: Int, nprobes: Seq[Int], iters: Int = 3,
                       refine: Int = 0): Seq[(Int, Double)] =
    ivfPqRecallCurves(corpus, idCol, vecCol, queryRows, centroids, k, m,
      pqK, nprobes, Seq(refine), iters)(refine)

  /** Several refine variants against ONE trained/written index and ONE
    * brute-force truth — the harness measures refine=0 and refine=N on
    * the same books without retraining, re-cross-joining, or
    * re-writing (each of which dominates the curve's cost). The temp
    * index is removed when the curves are computed.
    */
  def ivfPqRecallCurves(corpus: DataFrame, idCol: String, vecCol: String,
                        queryRows: Seq[(Long, Seq[Double])],
                        centroids: Seq[Seq[Double]], k: Int, m: Int,
                        pqK: Int, nprobes: Seq[Int], refines: Seq[Int],
                        iters: Int = 3): Map[Int, Seq[(Int, Double)]] = {
    if (queryRows.isEmpty)
      return refines.map(_ -> nprobes.map(_ -> 0.0)).toMap
    val spark = corpus.sparkSession
    import spark.implicits._
    val queries = queryRows.toDF("qid_src", "qvec")
    val truth = bruteForceTopKL2(corpus, idCol, vecCol,
      queries, "qid_src", "qvec", k).persist()
    truth.count()
    val books = Similarity.ivfPqTrain(corpus, idCol, vecCol,
      centroids, m, pqK, iters)
    val dirPath = java.nio.file.Files.createTempDirectory("ivfpq-recall")
    val dir = dirPath.toString
    try {
      Similarity.ivfPqWriteIndex(corpus, idCol, vecCol, centroids, books,
        dir)
      refines.map { refine =>
        refine -> nprobes.map { np =>
          val approx =
            if (refine > 0)
              Similarity.ivfPqTopKRefined(spark, dir, corpus, idCol,
                vecCol, queryRows, centroids, books, k, np, refine)
            else Similarity.ivfPqTopKBatch(spark, dir, idCol,
              queryRows, centroids, books, k, np)
          np -> recallAtK(truth, approx)
        }
      }.toMap
    } finally {
      truth.unpersist(blocking = false)
      // recallAtK consumed every scan — the index is safe to delete
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** Deterministic structure-bearing corpus for the recall harness: each
    * cluster owns a `dim/nClusters` block of hot dimensions plus a
    * deterministic jitter on every dimension, so intra-cluster cosine is
    * high and inter-cluster cosine low — the corpus shape IVF/PQ are FOR
    * (the driver `embeddings` table is near-uniform on the sphere, the
    * worst case, and its curves alone would mis-size nprobe/m for real
    * workloads; BASELINE.md records both). Generated columnar via
    * `spark.range` — no driver-side materialization, any size.
    */
  def clusteredEmbeddings(spark: SparkSession, nClusters: Int,
                          perCluster: Int, dim: Int,
                          secondaryWeight: Double = 0.0): DataFrame = {
    require(dim % nClusters == 0, "dim must divide into nClusters blocks")
    val block = dim / nClusters
    // secondaryWeight > 0 lights a second, weaker block per vector
    // (cycling through the other clusters) — mixed-topic documents whose
    // true neighbors partly live in OTHER primary buckets, so the
    // recall curve interpolates between the clean-cluster bound (all
    // knobs saturate at 1.0) and the uniform worst case
    // the secondary branch only exists when a weight is requested: at
    // w=0 it would still MATCH and emit 0.0 where the cold floor is
    // 0.05, silently giving every vector an id-dependent "dark block"
    // and making the clean fixture not the documented one-block shape
    val secondary =
      if (secondaryWeight > 0)
        s"""WHEN CAST(d DIV $block AS INT) =
              CAST((id % $nClusters + 1 + (id DIV $nClusters)
                    % ${nClusters - 1}) % $nClusters AS INT)
            THEN ${secondaryWeight}d"""
      else ""
    spark.range(nClusters.toLong * perCluster)
      .select(col("id").as("vec_id"),
        expr(s"""transform(sequence(0, ${dim - 1}), d ->
          (CASE WHEN CAST(d DIV $block AS INT) = CAST(id % $nClusters AS INT)
                THEN 1.0
                $secondary
                ELSE 0.05 END)
          + 0.013d * CAST((id * 31 + d * 7) % 11 AS DOUBLE)
          + 0.003d * CAST((id * 13 + d * 5) % 23 AS DOUBLE))""")
          .as("embedding"))
  }

  /** One-shot harness main: prints the IVF and PQ recall tables for the
    * embeddings table of a testdata tier (worst-case near-uniform
    * corpus) AND the clustered fixture (the corpus shape ANN indexes
    * are built for) — both recorded in BASELINE.md.
    * Usage: runMain graft.ml.Recall [sfDir] [k]
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.table(spark, sfDir, "embeddings")
    val queryRows = emb.orderBy(col("vec_id")).limit(16)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    import spark.implicits._
    val queries = queryRows.toDF("qid_src", "qvec")
    val nCentroids = 16
    val cs = Similarity.trainCentroids(emb, "vec_id", "embedding",
      nCentroids, iters = 4)
    val ivf = ivfRecallCurve(emb, "vec_id", "embedding",
      queries, "qid_src", "qvec", cs, k,
      Seq(1, 2, 4, 8, nCentroids))
    println(s"IVF recall@$k (C=$nCentroids): " +
      ivf.map { case (np, r) => f"nprobe=$np:$r%.3f" }.mkString(" "))
    val pq = pqRecallCurve(emb, "vec_id", "embedding", queryRows, k,
      ms = Seq(4, 8, 16, 32))
    println(s"PQ/ADC recall@$k (k'=16): " +
      pq.map { case (m, r) => f"m=$m:$r%.3f" }.mkString(" "))
    val ipqBoth = ivfPqRecallCurves(emb, "vec_id", "embedding", queryRows,
      cs, k, m = 8, pqK = 16, Seq(1, 2, 4, 8, nCentroids),
      refines = Seq(0, 4))
    println(s"IVFPQ recall@$k (C=$nCentroids, m=8, k'=16): " +
      ipqBoth(0).map { case (np, r) => f"nprobe=$np:$r%.3f" }.mkString(" "))
    println(s"IVFPQ+R recall@$k (C=$nCentroids, m=8, k'=16, refine=4): " +
      ipqBoth(4).map { case (np, r) => f"nprobe=$np:$r%.3f" }.mkString(" "))
    println(f"SQ8 recall@$k (vs exact IP): " +
      f"${sq8Recall(emb, "vec_id", "embedding", queries, "qid_src", "qvec", k)}%.3f")

    // clustered fixtures: clean (the easy bound — every knob should
    // saturate) and mixed (secondary topic block — the realistic curve)
    for ((label, w) <- Seq("CLUSTERED" -> 0.0, "MIXED" -> 0.85)) {
      val cl = clusteredEmbeddings(spark, nClusters = 16,
        perCluster = 250, dim = 64, secondaryWeight = w).persist()
      cl.count()
      val clQueryRows = cl.orderBy(col("vec_id")).limit(16)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
      val clQueries = clQueryRows.toDF("qid_src", "qvec")
      val clCs = Similarity.trainCentroids(cl, "vec_id", "embedding",
        nCentroids, iters = 4)
      val clIvf = ivfRecallCurve(cl, "vec_id", "embedding",
        clQueries, "qid_src", "qvec", clCs, k, Seq(1, 2, 4, 8, nCentroids))
      println(s"$label IVF recall@$k (C=$nCentroids): " +
        clIvf.map { case (np, r) => f"nprobe=$np:$r%.3f" }.mkString(" "))
      val clPq = pqRecallCurve(cl, "vec_id", "embedding", clQueryRows, k,
        ms = Seq(4, 8, 16, 32))
      println(s"$label PQ/ADC recall@$k (k'=16): " +
        clPq.map { case (m, r) => f"m=$m:$r%.3f" }.mkString(" "))
      val clIpq = ivfPqRecallCurve(cl, "vec_id", "embedding", clQueryRows,
        clCs, k, m = 8, pqK = 16, Seq(1, 2, 4, 8, nCentroids))
      println(s"$label IVFPQ recall@$k (C=$nCentroids, m=8, k'=16): " +
        clIpq.map { case (np, r) => f"nprobe=$np:$r%.3f" }.mkString(" "))
      println(f"$label SQ8 recall@$k (vs exact IP): " +
        f"${sq8Recall(cl, "vec_id", "embedding", clQueries, "qid_src", "qvec", k)}%.3f")
      cl.unpersist(blocking = false)
    }
    spark.stop()
  }
}
