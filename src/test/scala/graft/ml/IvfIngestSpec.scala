package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental IVF index: bid-partition commits (the GramStore
  * discipline), replay idempotence, crash-staging reclaim, layout
  * refusals, and — the point — unchanged readers: the batch top-k over
  * an ingested index must equal the in-memory search over the union of
  * every batch.
  */
class IvfIngestSpec extends SparkSpec {

  private def mkBatch(ids: Range, offset: Int = 0) = {
    val s = spark
    import s.implicits._
    ids.map { i =>
      val base = (i + offset) % 3 match {
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

  test("two batches ingest; the batch reader equals in-memory search " +
      "over the union, partition-pruned") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf-ing").toString
    IvfIngest.create(spark, dir, centroids)
    assert(IvfIngest.append(mkBatch(0 until 15), "vec_id", "embedding",
      dir, "b1"))
    assert(IvfIngest.append(mkBatch(15 until 30), "vec_id", "embedding",
      dir, "b2"))
    val queries = Seq(
      (100L, Seq(0.9, 0.1, 0.0, 0.0)),
      (101L, Seq(0.0, 0.0, 0.95, 0.05))).toDF("qid_src", "qvec")
    val got = Similarity.ivfReadTopKBatch(spark, dir, "vec_id",
      "embedding", queries, "qid_src", "qvec", k = 5, nprobe = 1)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("bucket"),
      "bucket pruning must survive the bid-partitioned layout")
    val gotSet = got.collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getInt(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("id")))).toSet
    val union = mkBatch(0 until 30)
    val want = Similarity.ivfTopK(union, "vec_id", "embedding",
        queries, "qid_src", "qvec", centroids, k = 5, nprobe = 1)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getInt(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("id")))).toSet
    assert(gotSet == want, s"ingested read diverged:\n$gotSet\nvs\n$want")
  }

  test("appends are idempotent per batch id; create is idempotent on a " +
      "matching marker") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-ing2").toString
    IvfIngest.create(spark, dir, centroids)
    IvfIngest.create(spark, dir, centroids) // same geometry: no-op
    assert(IvfIngest.append(mkBatch(0 until 9), "vec_id", "embedding",
      dir, "b1"))
    val n1 = spark.read.parquet(dir).count()
    // the replay: same bid commits nothing
    assert(!IvfIngest.append(mkBatch(0 until 9), "vec_id", "embedding",
      dir, "b1"))
    assert(spark.read.parquet(dir).count() == n1,
      "a replayed batch id must not double-ingest")
    // foreign geometry at create: refused
    val e = intercept[IllegalArgumentException] {
      IvfIngest.create(spark, dir, centroids.reverse)
    }
    assert(e.getMessage.contains("DIFFERENT"))
  }

  test("crash staging is reclaimed; marker rules enforced") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-ing3").toString
    IvfIngest.create(spark, dir, centroids)
    // a crashed attempt left a staging dir: the retry reclaims it and
    // commits exactly once
    val stage = new java.io.File(dir, ".stage-b1")
    stage.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(stage, "junk").toPath, Array[Byte](1, 2, 3))
    assert(IvfIngest.append(mkBatch(0 until 9), "vec_id", "embedding",
      dir, "b1"))
    assert(!stage.exists(), "staging dir must be consumed by the commit")
    assert(spark.read.parquet(dir).count() == 9)
    // append without a marker: refused (geometry is pinned at create)
    val bare = java.nio.file.Files.createTempDirectory("ivf-bare").toString
    val e1 = intercept[IllegalArgumentException] {
      IvfIngest.append(mkBatch(0 until 3), "vec_id", "embedding",
        bare, "b1")
    }
    assert(e1.getMessage.contains("marker"))
    // marker-less directory holding data: never adopted
    mkBatch(0 until 3).write.mode("overwrite").parquet(bare)
    val e2 = intercept[IllegalArgumentException] {
      IvfIngest.create(spark, bare, centroids)
    }
    assert(e2.getMessage.contains("refusing to adopt"))
    // a classic single-write index is not ingestable (mixed partition
    // depths would break discovery)
    val classic = java.nio.file.Files
      .createTempDirectory("ivf-classic").toString
    Similarity.ivfWriteIndex(mkBatch(0 until 9), "vec_id", "embedding",
      centroids, classic)
    val e3 = intercept[IllegalArgumentException] {
      IvfIngest.append(mkBatch(9 until 12), "vec_id", "embedding",
        classic, "b1")
    }
    assert(e3.getMessage.contains("single-write"))
  }

  test("sq8 kind: codes-only ingest, batch reader matches whole-union " +
      "sq8 search at full probe") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf-ing-sq").toString
    IvfIngest.create(spark, dir, centroids, kind = "sq8")
    IvfIngest.append(mkBatch(0 until 15), "vec_id", "embedding", dir, "b1")
    IvfIngest.append(mkBatch(15 until 30), "vec_id", "embedding", dir, "b2")
    // codes-only payload on disk (plus the bid/bucket partition cols)
    val stored = spark.read.parquet(dir)
    assert(!stored.columns.contains("embedding"),
      "sq8 ingest must not store original vectors")
    val queries = Seq((100L, Seq(0.9, 0.1, 0.0, 0.0)))
      .toDF("qid_src", "qvec")
    val got = Similarity.ivfSqReadTopKBatch(spark, dir, "vec_id",
        queries, "qid_src", "qvec", k = 5, nprobe = 3)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        r.getDouble(r.fieldIndex("score")))).toSet
    // full probe ≡ whole-corpus sq8 search (scale is per-row, so
    // batch-wise quantization equals corpus-wise exactly)
    val want = Similarity.sq8TopK(mkBatch(0 until 30), "vec_id",
        "embedding", queries, "qid_src", "qvec", k = 5)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSet
    assert(got == want, s"sq8 ingest read diverged: $got vs $want")
  }
}
