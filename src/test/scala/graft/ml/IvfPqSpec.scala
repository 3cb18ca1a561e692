package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The combined IVF-PQ index (IVFADC): residual codebooks, a
  * bucket-partitioned code-only layout, partition pruning in the plan,
  * and the ADC identity — every reported distance is EXACTLY the
  * squared L2 to the row's reconstruction (bucket centroid + decoded
  * residual). Training is float-iterative → the identity and plan
  * gates run on whatever books training produces (the PqSpec
  * convention).
  */
class IvfPqSpec extends SparkSpec {

  private val dim = 8
  private val m = 4
  private val kk = 4

  private val centroids = Seq(
    Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    Seq(0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    Seq(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0))

  private def corpus = {
    val s = spark
    import s.implicits._
    (0 until 30).map { i =>
      val base = Array.fill(dim)(0.0)
      base(i % 3) = 1.0
      base((i % 3) + 3) = 0.02 * (i / 3) // in-bucket spread
      base(7) = 0.01 * (i % 5)
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def l2(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("codes-only layout; pruned scan; every distance is the IVFADC value") {
    val books = Similarity.ivfPqTrain(corpus, "vec_id", "embedding",
      centroids, m, kk, iters = 3)
    assert(books.length == m && books.forall(_.length == kk)
      && books.forall(_.forall(_.length == dim / m)))
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    Similarity.ivfPqWriteIndex(corpus, "vec_id", "embedding",
      centroids, books, dir)
    // the index stores id + codes under bucket partitions — NO vectors
    val idx = spark.read.parquet(dir)
    assert(idx.columns.sorted.toSeq == Seq("bucket", "codes", "vec_id"))
    val parts = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(parts.toSeq == Seq("bucket=0", "bucket=1", "bucket=2"))

    val q = Seq(0.95, 0.05, 0.0, 0.0, 0.03, 0.0, 0.0, 0.02)
    val topk = Similarity.ivfPqReadTopK(spark, dir, "vec_id", q,
      centroids, books, k = 5, nprobe = 1)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("bucket"), plan)

    val got = topk.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 5)
    // probe 0 = the x-direction bucket
    assert(got.forall(_._1 % 3 == 0), got.toSeq.toString)
    // identity: d2 == l2(q, centroid_bucket + decode(codes)), per row
    val codeRows = idx.filter(col("bucket") === 0)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    got.foreach { case (id, d2) =>
      val recon = centroids(0).zip(Similarity.pqDecode(codeRows(id), books))
        .map { case (c, r) => c + r }
      assert(math.abs(d2 - l2(q, recon)) < 1e-9,
        s"id=$id d2=$d2 vs ${l2(q, recon)}")
    }
    // and the ranking is the ADC ranking of the probed bucket
    val expected = codeRows.toSeq.map { case (id, codes) =>
      val recon = centroids(0).zip(Similarity.pqDecode(codes, books))
        .map { case (c, r) => c + r }
      (id, l2(q, recon))
    }.sortBy { case (id, d) => (d, id) }.take(5).map(_._1)
    assert(got.map(_._1).toSeq == expected)
  }

  test("nprobe widens the searched partitions; batch equals the loop") {
    val books = Similarity.ivfPqTrain(corpus, "vec_id", "embedding",
      centroids, m, kk, iters = 3)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq2").toString
    Similarity.ivfPqWriteIndex(corpus, "vec_id", "embedding",
      centroids, books, dir)
    val q = Seq(0.7, 0.7, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val two = Similarity.ivfPqReadTopK(spark, dir, "vec_id", q,
      centroids, books, k = 20, nprobe = 2).collect().map(_.getLong(0))
    assert(two.forall(id => id % 3 == 0 || id % 3 == 1))
    assert(two.exists(_ % 3 == 0) && two.exists(_ % 3 == 1))

    val queryRows: Seq[(Long, Seq[Double])] = Seq(
      100L -> Seq(0.9, 0.0, 0.1, 0.0, 0.02, 0.0, 0.0, 0.0),
      101L -> Seq(0.0, 0.9, 0.1, 0.0, 0.0, 0.03, 0.0, 0.0),
      102L -> Seq(0.1, 0.1, 0.9, 0.0, 0.0, 0.0, 0.04, 0.0))
    val looped = queryRows.flatMap { case (qid, qv) =>
      Similarity.ivfPqReadTopK(spark, dir, "vec_id", qv,
        centroids, books, k = 4, nprobe = 2).collect()
        .map(r => (qid, r.getLong(0)))
    }.toSet
    val batched = Similarity.ivfPqTopKBatch(spark, dir, "vec_id",
      queryRows, centroids, books, k = 4, nprobe = 2)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batched == looped,
      s"only-batched=${batched -- looped} only-looped=${looped -- batched}")
    // the batch plan prunes partitions too, and broadcasts ONE probe table
    val plan = Similarity.ivfPqTopKBatch(spark, dir, "vec_id",
      queryRows, centroids, books, k = 4, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("BroadcastExchange"),
      plan)
  }

  test("exhaustive probe with fine books recovers the true L2 neighbor set") {
    // m=dim (subdim 1) and k'=16 codes per scalar on a 30-row corpus:
    // residual quantization is near-lossless, so nprobe=C must
    // reproduce the brute-force L2 top-k SET (order may swap on
    // quantization near-ties — scalar k-means at few iters can merge
    // residual values 0.02 apart) and the top-1 exactly
    val books = Similarity.ivfPqTrain(corpus, "vec_id", "embedding",
      centroids, m = dim, k = 16, iters = 4)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq3").toString
    Similarity.ivfPqWriteIndex(corpus, "vec_id", "embedding",
      centroids, books, dir)
    val q = Seq(0.9, 0.2, 0.1, 0.01, 0.02, 0.0, 0.0, 0.01)
    val got = Similarity.ivfPqReadTopK(spark, dir, "vec_id", q,
      centroids, books, k = 10, nprobe = centroids.length)
      .collect().map(_.getLong(0)).toSeq
    val brute = corpus.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .map { case (id, v) => (id, l2(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSeq
    assert(got.toSet == brute.toSet, s"got=$got brute=$brute")
    assert(got.head == brute.head, s"top-1: got=${got.head} brute=${brute.head}")
  }

  test("exact re-rank (IVFADC+R): shortlist covering the probes reproduces brute force exactly") {
    // coarse m=4/k'=4 books — DELIBERATELY lossy, so the unrefined ADC
    // ordering diverges; the re-rank must still reproduce brute-force
    // L2 exactly because the shortlist (k·refine = 30 ≥ corpus) covers
    // every candidate and the final scoring reads true vectors
    val books = Similarity.ivfPqTrain(corpus, "vec_id", "embedding",
      centroids, m, kk, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq4").toString
    Similarity.ivfPqWriteIndex(corpus, "vec_id", "embedding",
      centroids, books, dir)
    val queryRows: Seq[(Long, Seq[Double])] = Seq(
      200L -> Seq(0.9, 0.2, 0.1, 0.01, 0.02, 0.0, 0.0, 0.01),
      201L -> Seq(0.1, 0.8, 0.2, 0.0, 0.03, 0.01, 0.0, 0.0))
    val got = Similarity.ivfPqTopKRefined(spark, dir, corpus,
      "vec_id", "embedding", queryRows, centroids, books,
      k = 10, nprobe = centroids.length, refine = 3)
      .orderBy(col("qid"), col("d2"), col("id"))
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val all = corpus.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    queryRows.foreach { case (qid, q) =>
      val brute = all.map { case (id, v) => (id, l2(q, v)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSeq
      assert(got(qid) == brute, s"qid=$qid got=${got(qid)} brute=$brute")
    }
  }
}
