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

  test("compact folds bids into one file per bucket; readers unchanged; " +
      "folded batches replay as no-ops; the ledger survives re-folds") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf-cpt").toString
    IvfIngest.create(spark, dir, centroids)
    IvfIngest.append(mkBatch(0 until 15), "vec_id", "embedding", dir, "b1")
    IvfIngest.append(mkBatch(15 until 30), "vec_id", "embedding", dir, "b2")
    val queries = Seq(
      (100L, Seq(0.9, 0.1, 0.0, 0.0)),
      (101L, Seq(0.0, 0.0, 0.95, 0.05))).toDF("qid_src", "qvec")
    def topk() = Similarity.ivfReadTopKBatch(spark, dir, "vec_id",
        "embedding", queries, "qid_src", "qvec", k = 5, nprobe = 1)
    val before = topk().collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("id")),
        r.getDouble(r.fieldIndex("sim")))).toSet
    val (fb, fa) = IvfIngest.compact(spark, dir)
    assert(fb > fa, s"fold must shrink the file count ($fb -> $fa)")
    assert(fa <= centroids.length,
      s"one file per bucket after the fold, got $fa")
    val bids = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("bid=")).toSet
    assert(bids == Set("bid=__compact"),
      s"only the consolidated partition survives, got $bids")
    // reader identical, still partition-pruned on bucket
    val after = topk()
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("bucket"))
    assert(after.collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("id")),
        r.getDouble(r.fieldIndex("sim")))).toSet == before,
      "the fold is a pure re-layout; results must be identical")
    // a batch folded away still no-ops: the ledger, not the directory
    assert(Similarity.ivfIndexFolded(spark, dir) == Set("b1", "b2"))
    val n = spark.read.parquet(dir).count()
    assert(!IvfIngest.append(mkBatch(0 until 15), "vec_id", "embedding",
      dir, "b1"), "a folded batch must replay as a no-op")
    assert(spark.read.parquet(dir).count() == n)
    // life goes on: post-fold appends commit, a re-fold unions them
    // into the consolidated partition and extends the ledger
    assert(IvfIngest.append(mkBatch(30 until 36), "vec_id", "embedding",
      dir, "b3"))
    IvfIngest.compact(spark, dir)
    assert(Similarity.ivfIndexFolded(spark, dir) == Set("b1", "b2", "b3"))
    assert(spark.read.parquet(dir).count() == 36)
    // the reserved consolidated bid is not appendable
    val e = intercept[IllegalArgumentException] {
      IvfIngest.append(mkBatch(0 until 3), "vec_id", "embedding",
        dir, "__compact")
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("a fold interrupted between its renames: readers resolve the " +
      "parked copy, the next writer entry rolls back and proceeds") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf-cpt2").toString
    IvfIngest.create(spark, dir, centroids)
    IvfIngest.append(mkBatch(0 until 12), "vec_id", "embedding", dir, "b1")
    // simulate the crash window: the live dir is parked, the rebuilt
    // tmp never moved in (an incomplete junk build stands in for it)
    assert(new java.io.File(dir)
      .renameTo(new java.io.File(dir + ".compact-old")))
    val tmp = new java.io.File(dir + ".compact-tmp")
    tmp.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(tmp, "junk").toPath, Array[Byte](9))
    // a reader in this state mutates nothing and reads the parked copy
    val queries = Seq((100L, Seq(0.9, 0.1, 0.0, 0.0))).toDF("q", "v")
    assert(Similarity.ivfReadTopKBatch(spark, dir, "vec_id", "embedding",
      queries, "q", "v", k = 3, nprobe = 1).count() == 3)
    assert(new java.io.File(dir + ".compact-old").exists(),
      "a reader must never repair the swap")
    // the next writer entry rolls back (parked copy restored, stale
    // tmp dropped) and the append commits against the restored state
    assert(IvfIngest.append(mkBatch(12 until 18), "vec_id", "embedding",
      dir, "b2"))
    assert(!new java.io.File(dir + ".compact-old").exists())
    assert(!tmp.exists())
    assert(spark.read.parquet(dir).count() == 18)
  }

  test("compact on an empty or classic index: no-op and loud refusal") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-cpt3").toString
    IvfIngest.create(spark, dir, centroids)
    assert(IvfIngest.compact(spark, dir) == ((0L, 0L)))
    // still ingestable after the no-op
    assert(IvfIngest.append(mkBatch(0 until 6), "vec_id", "embedding",
      dir, "b1"))
    val classic = java.nio.file.Files
      .createTempDirectory("ivf-cpt-classic").toString
    Similarity.ivfWriteIndex(mkBatch(0 until 9), "vec_id", "embedding",
      centroids, classic)
    val e = intercept[IllegalArgumentException] {
      IvfIngest.compact(spark, classic)
    }
    assert(e.getMessage.contains("nothing to fold"))
  }

  test("sq8 ingest compacts too: codes-only payload re-laid out, " +
      "reader equality preserved") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf-cpt-sq").toString
    IvfIngest.create(spark, dir, centroids, kind = "sq8")
    IvfIngest.append(mkBatch(0 until 15), "vec_id", "embedding", dir, "b1")
    IvfIngest.append(mkBatch(15 until 30), "vec_id", "embedding", dir, "b2")
    val queries = Seq((100L, Seq(0.9, 0.1, 0.0, 0.0))).toDF("q", "v")
    def topk() = Similarity.ivfSqReadTopKBatch(spark, dir, "vec_id",
        queries, "q", "v", k = 5, nprobe = 3).collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        r.getDouble(r.fieldIndex("score")))).toSet
    val before = topk()
    val (fb, fa) = IvfIngest.compact(spark, dir)
    assert(fb > fa && fa <= centroids.length)
    assert(!spark.read.parquet(dir).columns.contains("embedding"),
      "the fold must not invent columns; codes-only stays codes-only")
    assert(topk() == before)
  }

  test("pq kind: residual codes ingest under creation-pinned books; " +
      "batched reads equal the one-shot index, before and after a fold") {
    val union = mkBatch(0 until 30)
    val books = Similarity.ivfPqTrain(union, "vec_id", "embedding",
      centroids, m = 2, k = 4, iters = 2)
    // the reference point: the classic one-shot pq index on the union
    val classic = java.nio.file.Files
      .createTempDirectory("ivf-pq-classic").toString
    Similarity.ivfPqWriteIndex(union, "vec_id", "embedding", centroids,
      books, classic)
    val dir = java.nio.file.Files.createTempDirectory("ivf-pq-ing").toString
    // books are part of the creation pin: pq without them refuses
    val eNoBooks = intercept[IllegalArgumentException] {
      IvfIngest.create(spark, dir, centroids, kind = "pq")
    }
    assert(eNoBooks.getMessage.contains("codebooks"))
    IvfIngest.create(spark, dir, centroids, kind = "pq", books = books)
    IvfIngest.append(mkBatch(0 until 15), "vec_id", "embedding", dir, "b1")
    IvfIngest.append(mkBatch(15 until 30), "vec_id", "embedding", dir, "b2")
    assert(!spark.read.parquet(dir).columns.contains("embedding"),
      "pq ingest must not store original vectors")
    val queries = Seq(
      (100L, Seq(0.9, 0.1, 0.0, 0.0)),
      (101L, Seq(0.0, 0.0, 0.95, 0.05)))
    def res(path: String) = Similarity.ivfPqTopKBatch(spark, path,
        "vec_id", queries, k = 5, nprobe = 3).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("id")),
        r.getDouble(r.fieldIndex("d2")))).toSet
    val want = res(classic)
    assert(res(dir) == want,
      "ingested pq index diverged from the one-shot layout")
    val (fb, fa) = IvfIngest.compact(spark, dir)
    assert(fb > fa && fa <= centroids.length)
    assert(res(dir) == want, "the fold must not move a single code")
    assert(Similarity.ivfIndexFolded(spark, dir) == Set("b1", "b2"))
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
