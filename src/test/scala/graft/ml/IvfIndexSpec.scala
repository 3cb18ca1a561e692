package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The IVF index WRITE/READ path: bucket-partitioned layout, partition
  * pruning visible in the executed plan (the 100 TB claim made
  * concrete), and read-side results matching the in-memory ivfTopK
  * semantics on the probed buckets.
  */
class IvfIndexSpec extends SparkSpec {

  private val dim = 4

  private def corpus = {
    val s = spark
    import s.implicits._
    // three well-separated directions so centroid buckets are stable
    (0 until 30).map { i =>
      val base = i % 3 match {
        case 0 => Seq(1.0, 0.0, 0.0, 0.0)
        case 1 => Seq(0.0, 1.0, 0.0, 0.0)
        case _ => Seq(0.0, 0.0, 1.0, 0.0)
      }
      (i.toLong, base.map(_ + (i / 3) * 0.001).toArray)
    }.toDF("vec_id", "embedding")
  }

  private val centroids = Seq(
    Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
    Seq(0.0, 0.0, 1.0, 0.0))

  test("write partitions by bucket; read plans a partition filter") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    Similarity.ivfWriteIndex(corpus, "vec_id", "embedding", centroids, dir)
    // one directory per non-empty bucket
    val parts = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(parts.toSeq == Seq("bucket=0", "bucket=1", "bucket=2"))

    val q = Seq(0.9, 0.1, 0.0, 0.0)
    val topk = Similarity.ivfReadTopK(spark, dir, "vec_id", "embedding",
      q, centroids, k = 5, nprobe = 1)
    // partition pruning is IN THE PLAN: the bucket filter appears as a
    // partition filter on the parquet scan, not a post-scan filter
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("bucket"))

    val ids = topk.collect().map(_.getLong(0))
    assert(ids.length == 5)
    // probe 0 is the x-direction bucket: every hit is ≡ 0 mod 3
    assert(ids.forall(_ % 3 == 0))
    // and the ranking matches brute force restricted to that bucket
    val brute = corpus.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id"),
        round(Similarity.cosine(col("embedding").cast("array<double>"),
          array(q.map(lit): _*)), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(5)
      .collect().map(_.getLong(0))
    assert(ids.toSeq == brute.toSeq)
  }

  test("batch read: one pruned scan serves every query, results match " +
      "ivfTopK per query") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf-batch").toString
    Similarity.ivfWriteIndex(corpus, "vec_id", "embedding", centroids, dir)
    // one query per direction + one between buckets
    val queries = Seq(
      (100L, Seq(0.9, 0.1, 0.0, 0.0)),
      (101L, Seq(0.0, 0.95, 0.05, 0.0)),
      (102L, Seq(0.7, 0.7, 0.0, 0.0))).toDF("qid_src", "qvec")
    val batch = Similarity.ivfReadTopKBatch(spark, dir,
      "vec_id", "embedding", queries, "qid_src", "qvec", k = 5, nprobe = 1)
    // pruning is IN THE PLAN (the written layout's partition filter)
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("bucket"))
    val got = batch.collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getInt(r.fieldIndex("rank")), r.getLong(r.fieldIndex("id"))))
      .toSet
    // per-query identity with the in-memory ivfTopK at the same
    // geometry/nprobe (same probe kernel by construction)
    val want = Similarity.ivfTopK(corpus, "vec_id", "embedding",
        queries, "qid_src", "qvec", centroids, k = 5, nprobe = 1)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getInt(r.fieldIndex("rank")), r.getLong(r.fieldIndex("id"))))
      .toSet
    assert(got == want, s"batch read diverged:\n$got\nvs\n$want")
    // only probed buckets were read: queries probe buckets {0, 1}, so
    // the scan must not touch bucket=2's directory (partition pruning,
    // asserted on the data actually returned at nprobe=2 width)
    val wide = Similarity.ivfReadTopKBatch(spark, dir,
      "vec_id", "embedding", queries, "qid_src", "qvec", k = 30,
      nprobe = 1).collect().map(r => r.getLong(r.fieldIndex("id")))
    assert(wide.forall(id => id % 3 == 0 || id % 3 == 1),
      "a bucket no query probed leaked into the batch result")
  }

  test("nprobe widens the searched buckets") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx2").toString
    Similarity.ivfWriteIndex(corpus, "vec_id", "embedding", centroids, dir)
    val q = Seq(0.7, 0.7, 0.0, 0.0) // between buckets 0 and 1
    val two = Similarity.ivfReadTopK(spark, dir, "vec_id", "embedding",
      q, centroids, k = 20, nprobe = 2).collect().map(_.getLong(0))
    assert(two.forall(id => id % 3 == 0 || id % 3 == 1))
    assert(two.exists(_ % 3 == 0) && two.exists(_ % 3 == 1))
  }

  test("the geometry marker travels with the index: marker-read needs " +
      "no centroids, foreign geometry is refused") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-mk").toString
    Similarity.ivfWriteIndex(corpus, "vec_id", "embedding", centroids, dir)
    val q = Seq(0.9, 0.1, 0.0, 0.0)
    // marker-read ≡ geometry-supplied read
    val viaMarker = Similarity.ivfReadTopK(spark, dir, "vec_id",
      "embedding", q, k = 5, nprobe = 1).collect().map(_.getLong(0))
    val viaArgs = Similarity.ivfReadTopK(spark, dir, "vec_id",
      "embedding", q, centroids, k = 5, nprobe = 1)
      .collect().map(_.getLong(0))
    assert(viaMarker.toSeq == viaArgs.toSeq)
    assert(Similarity.ivfIndexGeometry(spark, dir)
      .exists { case (k0, c, b) =>
        k0 == "flat" && c == centroids && b.isEmpty })
    // probing with DIFFERENT centroids would silently collapse recall —
    // the marker refuses it loudly instead
    val foreign = centroids.map(_.map(_ * 0.5))
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfReadTopK(spark, dir, "vec_id", "embedding", q,
        foreign, k = 5, nprobe = 1)
    }
    assert(e.getMessage.contains("DIFFERENT geometry"), e.getMessage)
    // the wrong READER for the layout is refused by kind
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfSqReadTopK(spark, dir, "vec_id", q, k = 5, nprobe = 1)
    }
    assert(e2.getMessage.contains("flat"), e2.getMessage)
    // a marker-less pre-r13 index still reads through the legacy
    // overload (caller's word), and the marker-read overload explains
    val p = new org.apache.hadoop.fs.Path(dir, "_graft_ivf.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
    assert(Similarity.ivfReadTopK(spark, dir, "vec_id", "embedding", q,
      centroids, k = 5, nprobe = 1).count() == 5)
    val e3 = intercept[IllegalArgumentException] {
      Similarity.ivfReadTopK(spark, dir, "vec_id", "embedding", q,
        k = 5, nprobe = 1)
    }
    assert(e3.getMessage.contains("no _graft_ivf.json"), e3.getMessage)
  }

  test("IVF-PQ marker carries the books too; sq8 kind round-trips") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-mk").toString
    val books = Similarity.ivfPqTrain(corpus, "vec_id", "embedding",
      centroids, m = 2, k = 4, iters = 2)
    Similarity.ivfPqWriteIndex(corpus, "vec_id", "embedding", centroids,
      books, dir)
    val q = Seq(0.9, 0.1, 0.0, 0.0)
    val viaMarker = Similarity.ivfPqReadTopK(s, dir, "vec_id", q,
      k = 5, nprobe = 1).collect().map(_.getLong(0))
    val viaArgs = Similarity.ivfPqReadTopK(s, dir, "vec_id", q, centroids,
      books, k = 5, nprobe = 1).collect().map(_.getLong(0))
    assert(viaMarker.toSeq == viaArgs.toSeq && viaMarker.length == 5)
    assert(Similarity.ivfIndexGeometry(s, dir)
      .exists { case (k0, c, b) => k0 == "pq" && c == centroids && b == books })
    // sq8: write + marker-read agree with geometry-supplied read
    val sqDir = java.nio.file.Files.createTempDirectory("ivfsq-mk").toString
    Similarity.ivfSqWriteIndex(corpus, "vec_id", "embedding", centroids,
      sqDir)
    val a = Similarity.ivfSqReadTopK(s, sqDir, "vec_id", q, k = 5,
      nprobe = 1).collect().map(_.getLong(0))
    val b = Similarity.ivfSqReadTopK(s, sqDir, "vec_id", q, centroids,
      k = 5, nprobe = 1).collect().map(_.getLong(0))
    assert(a.toSeq == b.toSeq)
  }
}
