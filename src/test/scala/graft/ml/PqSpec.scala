package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: training shape and improvement, encode/ADC
  * identities, and the scan-speed encode plan. Training is
  * float-iterative → convergence-gated (the trainCentroids precedent);
  * the ENCODE step is additionally DuckDB-oracle-gated
  * (ml_embed_pq_encode) with deterministic codebooks.
  */
class PqSpec extends SparkSpec {

  private val m = 4
  private val k = 4
  private val dim = 8

  private def vecs = {
    val s = spark
    import s.implicits._
    // two clear clusters per subspace half
    (0 until 32).map { i =>
      val base = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, (0 until dim).map(d =>
        base * (1.0 + d * 0.1) + (i / 2) * 0.01).toArray)
    }.toDF("vec_id", "embedding")
  }

  test("pqTrain returns m×k×subdim codebooks and reduces distortion") {
    val trained = Similarity.pqTrain(vecs, "vec_id", "embedding", m, k,
      iters = 4)
    assert(trained.length == m)
    assert(trained.forall(_.length == k))
    assert(trained.forall(_.forall(_.length == dim / m)))
    // reconstruction error: sum over rows of l2Sq(vec, decode(codes))
    def recon(books: Seq[Seq[Seq[Double]]]): Double = {
      val codes = Similarity.pqEncode(col("embedding"), books)
      val decoded = // reconstruct via ADC against the vector itself:
        // adc(x, codes(x)) == l2Sq(x, decode(codes(x)))
        vecs.select(col("vec_id"), codes.as("c"),
          col("embedding").cast("array<double>").as("v"))
      decoded.collect().map { r =>
        val rec = Similarity.pqDecode(r.getSeq[Int](1), books)
        r.getSeq[Double](2).zip(rec).map { case (a, b) =>
          (a - b) * (a - b) }.sum
      }.sum
    }
    val seedOnly = Similarity.pqTrain(vecs, "vec_id", "embedding", m, k,
      iters = 0)
    assert(recon(trained) <= recon(seedOnly) + 1e-9)
    assert(recon(trained) / vecs.count() < 0.1) // clusters actually found
  }

  test("ADC score equals exact l2Sq against the decoded vector") {
    val books = Similarity.pqTrain(vecs, "vec_id", "embedding", m, k,
      iters = 2)
    val q = (0 until dim).map(d => 0.3 + 0.05 * d)
    val rows = vecs.select(
        Similarity.pqEncode(col("embedding"), books).as("codes"),
        Similarity.pqAdcScore(
          Similarity.pqEncode(col("embedding"), books), q, books).as("adc"))
      .collect()
    rows.foreach { r =>
      val rec = Similarity.pqDecode(r.getSeq[Int](0), books)
      val exact = q.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(r.getDouble(1) - exact) < 1e-9)
    }
  }

  test("encode and ADC plans are narrow — no Exchange, no UDF") {
    val books = (0 until m).map(j => (0 until k).map(c =>
      (0 until dim / m).map(d => (c + d + j) * 0.25)))
    val plan = vecs.select(
        Similarity.pqAdcScore(
          Similarity.pqEncode(col("embedding"), books),
          Seq.fill(dim)(0.1), books))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(!plan.contains("ScalaUDF"))
  }

  test("wrong-dimension vector encodes to null, never a fabricated code") {
    val s = spark
    import s.implicits._
    val books = (0 until m).map(j => (0 until k).map(c =>
      (0 until dim / m).map(d => (c + d + j) * 0.25)))
    val rows = Seq(
      (1L, (0 until dim).map(_ * 0.1).toArray), // well-formed
      (2L, Array(0.1, 0.2))                     // short
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        Similarity.pqEncode(col("embedding"), books).as("c"))
      .orderBy("vec_id").collect()
    assert(rows(0).getSeq[Int](1).length == m)
    assert(rows(1).isNullAt(1),
      "a malformed vector must not silently land in code 0")
  }

  test("codes are dense in [0, k) and deterministic") {
    val books = (0 until m).map(j => (0 until k).map(c =>
      (0 until dim / m).map(d => ((c * 31 + d * 17 + j * 7) % 13 - 6) / 4.0)))
    val a = vecs.select(Similarity.pqEncode(col("embedding"), books).as("c"))
      .collect().map(_.getSeq[Int](0))
    a.foreach(codes => codes.foreach(c => assert(c >= 0 && c < k)))
    val b = vecs.select(Similarity.pqEncode(col("embedding"), books).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(a.toSeq == b.toSeq)
  }

  test("batched ADC top-k equals the per-query TakeOrdered loop") {
    val books = Similarity.pqTrain(vecs, "vec_id", "embedding", m, k,
      iters = 2)
    val codes = vecs.select(col("vec_id").as("id"),
      Similarity.pqEncode(col("embedding"), books).as("codes"))
    val queryRows: Seq[(Long, Seq[Double])] = (0 until 5).map(i =>
      (100L + i, (0 until dim).map(d => 0.2 * i - 0.4 + 0.05 * d): Seq[Double]))
    val topK = 6
    val looped = queryRows.flatMap { case (qid, q) =>
      Recall.pqTopK(codes, "id", "codes", q, books, topK)
        .select(lit(qid).as("qid"), col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }.toSet
    val batched = Similarity.pqAdcTopKBatch(codes, "id", "codes",
      queryRows, books, topK)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batched == looped,
      s"batched ADC diverged: only-batched=${batched -- looped} " +
        s"only-looped=${looped -- batched}")
    // ONE broadcast join, no per-query jobs: the plan must carry a
    // BroadcastExchange of the LUT table and a qid-partitioned window
    val plan = Similarity.pqAdcTopKBatch(codes, "id", "codes",
      queryRows, books, topK).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
  }
}
