package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LSH-candidate k-NN graph: per-node top-k among banded candidates,
  * both directed edges from one scored pass.
  */
class KnnGraphSpec extends SparkSpec {

  private def planes = Similarity.rademacherBandPlanes(4, 4, 3)

  /** 8 vectors in two antipodal direction groups — every within-group
    * pair collides in every band (identical sign patterns), so the
    * candidate set is dense within groups.
    */
  private def vecs = {
    import spark.implicits._
    val up = (0 until 4).map(i => (i.toLong, Seq(1.0, 1.0, 1.0 + i * 0.1)))
    val dn = (4 until 8).map(i => (i.toLong, Seq(-1.0, -1.0, -1.0 - i * 0.1)))
    (up ++ dn).toDF("vec_id", "embedding")
  }

  test("per-node degree is at most k; neighbors come from the same direction group") {
    val g = Similarity.knnGraph(vecs, "vec_id", "embedding", planes, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val bySrc = g.groupBy(_._1)
    assert(bySrc.values.forall(_.length <= 2), s"degree over k: ${bySrc.view.mapValues(_.length).toMap}")
    // same-direction cosines are ~1; if a cross-group pair ever became a
    // candidate its sim would be ~-1 and ranked out — every kept edge
    // stays within the group
    for ((src, rank @ _, dst, sim) <- g) {
      assert((src < 4) == (dst < 4), s"cross-group edge $src->$dst")
      assert(sim > 0.99, s"same-group sim should be ~1: $src->$dst $sim")
    }
    // ranks are 1..degree per node, dense
    for ((_, edges) <- bySrc)
      assert(edges.map(_._2).sorted.toSeq == (1 to edges.length).toSeq)
  }

  test("edges are symmetric candidates: src and dst swap-closed for k >= group size") {
    // with k = 3 every node keeps all 3 same-group neighbors — the edge
    // set must be exactly both directions of each within-group pair
    val g = Similarity.knnGraph(vecs, "vec_id", "embedding", planes, k = 3)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      grp <- Seq(0L until 4L, 4L until 8L); a <- grp; b <- grp if a != b
    } yield (a, b)).toSet
    assert(g == expected, s"edge set mismatch: ${g.diff(expected)} / ${expected.diff(g)}")
  }

  test("clustered corpus: graph recall vs the brute-force k-NN graph clears 0.8") {
    val k = 5
    val corpus = Recall.clusteredEmbeddings(spark, nClusters = 8,
      perCluster = 30, dim = 64)
    val planes = Similarity.rademacherBandPlanes(8, 8, 64)
    val approx = Similarity.knnGraph(corpus, "vec_id", "embedding", planes, k)
      .select(col("src").as("qid"), col("dst").as("id"))
    // ground truth: exact top-(k+1) per node with the self-match dropped
    val queries = corpus.select(col("vec_id").as("qid_src"),
      col("embedding").as("qvec"))
    val truth = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "qid_src", "qvec", k + 1)
      .filter(col("qid") =!= col("id"))
    val r = Recall.recallAtK(truth, approx)
    assert(r >= 0.8, f"knnGraph recall@$k on clustered data: $r%.3f")
  }

  test("plan: per-node top-k executes as a group limit, one window") {
    val plan = Similarity.knnGraph(vecs, "vec_id", "embedding", planes, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"top-k should push below the sort as a group limit:\n$plan")
  }
}
