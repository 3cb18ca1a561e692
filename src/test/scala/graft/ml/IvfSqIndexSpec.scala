package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The IVF-SQ8 index WRITE/READ path: codes-only bucket-partitioned
  * layout (originals not stored), partition pruning in the executed
  * plan, and read-side scores matching [[Similarity.sq8TopK]] restricted
  * to the probed bucket — the quantization is identical, so the
  * identity is exact, not approximate.
  */
class IvfSqIndexSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
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

  test("codes-only layout, partition pruning, sq8TopK identity on the probed bucket") {
    val dir = java.nio.file.Files.createTempDirectory("ivfsq-idx").toString
    Similarity.ivfSqWriteIndex(corpus, "vec_id", "embedding",
      centroids, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(parts.toSeq == Seq("bucket=0", "bucket=1", "bucket=2"))
    // the payload is codes-only: no embedding column survives on disk
    val stored = spark.read.parquet(dir)
    assert(stored.columns.sorted.toSeq ==
      Seq("bucket", "codes", "scale", "vec_id"))

    val q = Seq(0.9, 0.1, 0.0, 0.0)
    val topk = Similarity.ivfSqReadTopK(spark, dir, "vec_id",
      q, centroids, k = 5, nprobe = 1)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("bucket"))

    val got = topk.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.forall(_._1 % 3 == 0)) // probe 0 = the x-direction bucket
    // exact identity with the in-memory sq8 search on the same rows
    val s = spark
    import s.implicits._
    val qdf = Seq((0L, q)).toDF("qid_src", "qvec")
    val expected = Similarity.sq8TopK(
        corpus.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
        qdf, "qid_src", "qvec", k = 5)
      .orderBy("rank")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score")))
      .toSeq
    assert(got === expected)
  }

  test("batch read: pruned one-job scan matches the per-query reader") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfsq-batch").toString
    Similarity.ivfSqWriteIndex(corpus, "vec_id", "embedding",
      centroids, dir)
    val qRows = Seq(
      (100L, Seq(0.9, 0.1, 0.0, 0.0)),
      (101L, Seq(0.0, 0.95, 0.05, 0.0)))
    val queries = qRows.toDF("qid_src", "qvec")
    val batch = Similarity.ivfSqReadTopKBatch(spark, dir, "vec_id",
      queries, "qid_src", "qvec", k = 5, nprobe = 1)
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("bucket"))
    val got = batch.collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("id")),
        r.getDouble(r.fieldIndex("score")))).toSet
    // identity with the single-query reader per query (probe ties
    // cannot arise on this fixture, so the kernel/driver tie-break
    // difference is moot)
    val want = qRows.flatMap { case (qid, qv) =>
      Similarity.ivfSqReadTopK(spark, dir, "vec_id", qv, centroids,
          k = 5, nprobe = 1)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(got == want, s"batch sq8 read diverged:\n$got\nvs\n$want")
  }

  test("full probe equals whole-corpus sq8 search") {
    val dir = java.nio.file.Files.createTempDirectory("ivfsq-full").toString
    Similarity.ivfSqWriteIndex(corpus, "vec_id", "embedding",
      centroids, dir)
    val q = Seq(0.2, 0.5, 0.4, 0.0)
    val got = Similarity.ivfSqReadTopK(spark, dir, "vec_id",
        q, centroids, k = 7, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val s = spark
    import s.implicits._
    val qdf = Seq((0L, q)).toDF("qid_src", "qvec")
    val expected = Similarity.sq8TopK(corpus, "vec_id", "embedding",
        qdf, "qid_src", "qvec", k = 7)
      .orderBy("rank")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("score")))
      .toSeq
    assert(got === expected)
  }
}
