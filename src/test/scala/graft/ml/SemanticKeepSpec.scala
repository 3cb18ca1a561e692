package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup semantic dedup: in-cluster senior-neighbor drops, cross-
  * cluster independence, degenerate vectors, the oversized-cluster cap,
  * and the YAML `dedup_semantic` stage end-to-end. 2-D vectors keep
  * every cosine hand-computable.
  */
class SemanticKeepSpec extends SparkSpec {

  // two orthogonal direction clusters; centroids passed explicitly
  private val centroids = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Seq(10.0, 0.0)),  // cluster A anchor
      (2L, Seq(9.9, 0.1)),   // cos vs 1 ≈ 0.99995 → dropped (senior = 1)
      (3L, Seq(8.0, 3.0)),   // cos vs 1 = 0.936 < 0.95 → kept
      (4L, Seq(0.0, 5.0)),   // cluster B anchor
      (5L, Seq(0.1, 4.9)),   // cos vs 4 ≈ 0.99979 → dropped (senior = 4)
      (6L, Seq(3.0, 4.0)),   // cos vs 4 = 0.8 → kept
      (7L, Seq(0.0, 0.0))    // zero vector: norm 0, similarity 0 → kept
    ).toDF("vec_id", "embedding")
  }

  test("drops rows with a senior in-cluster neighbor at ≥ threshold") {
    val kept = Similarity.semanticKeep(corpus, "vec_id", "embedding",
        centroids, threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L, 6L, 7L))
  }

  test("keeps all columns of surviving rows") {
    val kept = Similarity.semanticKeep(corpus, "vec_id", "embedding",
      centroids, threshold = 0.95)
    assert(kept.columns.toSeq == corpus.columns.toSeq)
  }

  test("seniority is the min-id sweep, not pair order") {
    val s = spark
    import s.implicits._
    // three mutual near-dups: only the smallest id survives
    val tri = Seq(
      (30L, Seq(5.0, 0.0)), (20L, Seq(5.0, 0.001)), (10L, Seq(5.0, 0.002))
    ).toDF("vec_id", "embedding")
    val kept = Similarity.semanticKeep(tri, "vec_id", "embedding",
        centroids, threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(10L))
  }

  test("oversized clusters are exempted wholesale, not exploded") {
    // cap of 2: cluster A holds ids 1,2,3 → exempt (2 kept despite its
    // senior near-dup); cluster B holds 4,5,6,7 → also over cap
    val kept = Similarity.semanticKeep(corpus, "vec_id", "embedding",
        centroids, threshold = 0.95, maxClusterSize = 2)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("dedup_semantic stage: trains centroids and applies the sweep") {
    val yaml =
      """pipeline:
        |  - type: dedup_semantic
        |    id_field: vec_id
        |    vec_field: embedding
        |    clusters: 2
        |    iters: 2
        |    threshold: 0.95
        |""".stripMargin
    val out = graft.pipeline.PipelineCompiler.compile(
      graft.pipeline.RuleLoader.fromYaml(yaml))(corpus).main
    val kept = out.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    // trained centroids may land anywhere, but near-identical pairs are
    // co-clustered by argmax regardless — the two juniors must go
    assert(!kept.contains(2L) && !kept.contains(5L))
    assert(kept.contains(1L) && kept.contains(4L))
  }

  test("plan: one cluster-size aggregate, bucket-keyed self-join, no cartesian") {
    val plan = Similarity.semanticKeep(corpus, "vec_id", "embedding",
      centroids, threshold = 0.95).queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), "pair space must be cluster-bounded")
  }
}
