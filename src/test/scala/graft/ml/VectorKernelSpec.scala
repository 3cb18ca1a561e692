package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native vector kernels' contracts, pinned directly:
  *
  *  - plan CONSTRUCTION stays cheap as k grows — the r7 literal-tree
  *    forms were bit-correct but their per-task subexpression analysis
  *    was super-linear in centroid count (measured 20+ CPU-minutes at
  *    k=16/dim=64 before the kernels; milliseconds after). This is the
  *    regression class the kernels exist to kill, so it gets a timing
  *    gate of its own.
  *  - CosineTopIdxExpr's probe order equals the Column formulation it
  *    replaced (`reverse(array_sort(struct(sim, idx)))` — sim desc,
  *    ties idx desc), pinned by comparison on tie-heavy data.
  */
class VectorKernelSpec extends SparkSpec {

  test("assignBucket/pqEncode plans construct fast at k=32 (no tree blowup)") {
    import spark.implicits._
    val dim = 64
    val df = (0L until 64L).map(i => (i, (0 until dim).map(d =>
      math.sin(i * 31 + d).abs))).toDF("vec_id", "embedding")
    val centroids = (0 until 32).map(c =>
      (0 until dim).map(d => ((c * 17 + d * 7) % 11 - 5) / 4.0))
    val books = (0 until 16).map(j => (0 until 16).map(c =>
      (0 until dim / 16).map(d => (c + d + j) * 0.25)))
    def planMs(mk: => org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      mk.queryExecution.executedPlan
      (System.nanoTime() - t0) / 1000000
    }
    val a = planMs(df.select(Similarity.assignBucket(col("embedding"), centroids)))
    val p = planMs(df.select(Similarity.pqEncode(col("embedding"), books)))
    // generous CI bound (cold JIT / loaded box); the literal-tree form
    // took MINUTES here, so the signal survives the slack
    assert(a < 20000, s"assignBucket planning took $a ms at k=32")
    assert(p < 20000, s"pqEncode planning took $p ms at m=16,k=16")
    // and the kernels really execute (no silent nulls on valid input)
    val buckets = df.select(Similarity.assignBucket(col("embedding"), centroids))
      .collect().map(_.getInt(0))
    assert(buckets.forall(b => b >= 0 && b < 32))
  }

  test("CosineTopIdxExpr order == reverse(array_sort(struct(sim, idx)))") {
    import spark.implicits._
    // duplicate centroids force sim ties → the idx-desc tie order must
    // match the replaced Column form exactly
    val centroids = Seq(
      Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0), // 0 and 2 tie
      Seq(-1.0, 0.0), Seq(0.6, 0.8))
    val df = Seq((1L, Seq(1.0, 0.1)), (2L, Seq(0.1, 1.0)),
      (3L, Seq(-0.9, 0.43))).toDF("qid", "qvec")
    val columnForm = {
      val qsims = array(centroids.indices.map { i =>
        val cc = array(centroids(i).map(lit): _*)
        struct(Similarity.cosine(col("qvec").cast("array<double>"), cc).as("sim"),
          lit(i).as("idx"))
      }: _*)
      transform(slice(reverse(array_sort(qsims)), 1, 3), s => s.getField("idx"))
    }
    val kernel = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.CosineTopIdxExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(
          col("qvec").cast("array<double>")),
        centroids.map(_.toArray).toArray, 3))
    val rows = df.select(col("qid"), columnForm.as("a"), kernel.as("b"))
      .orderBy("qid").collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"qid ${r.getLong(0)}: column ${r.getSeq[Int](1)} vs kernel ${r.getSeq[Int](2)}")
    }
  }
}
