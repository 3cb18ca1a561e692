package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scalar int8 quantization: hand-computable codes, the zero-vector
  * contract, code range, reconstruction-error accounting, and the
  * narrow-plan pin.
  */
class Sq8Spec extends SparkSpec {

  private def encode(rows: Seq[(Long, Seq[Float])]) = {
    val s = spark
    import s.implicits._
    Similarity.sq8Encode(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding")
  }

  test("hand-computed codes: symmetric max-abs half-up") {
    // amax = 2.54 → scale = 0.02; codes = floor(v/scale + .5):
    // 2.54/0.02 = 127; -1.27/0.02 = -63.5 → floor(-63) = -63; 0 → 0
    val r = encode(Seq((1L, Seq(2.54f, -1.27f, 0f)))).head()
    assert(r.getAs[Double]("scale") === 0.02)
    assert(r.getAs[String]("codes") === "127,-63,0")
  }

  test("codes stay within [-127, 127] for any vector") {
    val vecs = Seq(
      (1L, Seq(-3f, 3f, 2.9999f, -2.9999f)),
      (2L, Seq(1e-8f, -1e-8f)),
      (3L, Seq(42f)))
    encode(vecs).collect().foreach { r =>
      val cs = r.getAs[String]("codes").split(",").map(_.toInt)
      assert(cs.forall(c => c >= -127 && c <= 127), r.toString)
    }
  }

  test("zero vector: scale 0, zero codes, zero error") {
    val r = encode(Seq((1L, Seq(0f, 0f, 0f)))).head()
    assert(r.getAs[Double]("scale") === 0.0)
    assert(r.getAs[String]("codes") === "0,0,0")
    assert(r.getAs[Double]("mse") === 0.0)
  }

  test("reconstruction error: exact for scale-aligned values, bounded by (scale/2)^2") {
    // values that are exact multiples of scale reconstruct exactly
    val exact = encode(Seq((1L, Seq(1.27f, -1.27f, 0f)))).head()
    assert(exact.getAs[Double]("mse") === 0.0)
    // arbitrary vectors: per-dim error ≤ scale/2, so mse ≤ (scale/2)^2
    val r = encode(Seq((2L, Seq(0.73f, -0.11f, 0.559f, 0.002f)))).head()
    val bound = math.pow(r.getAs[Double]("scale") / 2.0, 2)
    assert(r.getAs[Double]("mse") <= bound + 1e-12)
    assert(r.getAs[Double]("mse") > 0.0)
  }

  test("sq8 top-k reproduces the exact inner-product ranking on separated vectors") {
    val s = spark
    import s.implicits._
    // well-separated directions: quantization error (≤ scale/2 per dim)
    // cannot reorder them
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0f, 1f, 0f)), (3L, Seq(0f, 0f, 1f)),
      (4L, Seq(0.9f, 0.1f, 0f)), (5L, Seq(-1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((0L, Seq(1f, 0.05f, 0f)))
      .toDF("qid_src", "qvec")
    val got = Similarity.sq8TopK(corpus, "vec_id", "embedding",
        queries, "qid_src", "qvec", k = 3)
      .orderBy("rank").collect().map(_.getAs[Long]("id")).toSeq
    assert(got === Seq(1L, 4L, 2L)) // exact IP order: 1.0, 0.905, 0.05
  }

  test("property sweep: 300 seeded random vectors hold every contract") {
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 300).map { i =>
      val dim = 1 + rnd.nextInt(96)
      val mag = math.pow(10.0, rnd.nextInt(7) - 3) // 1e-3 .. 1e3
      (i.toLong, Seq.fill(dim)(((rnd.nextDouble() * 2 - 1) * mag).toFloat))
    }
    val rows = encode(vecs).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    vecs.foreach { case (id, v) =>
      val r = rows(id)
      val codes = r.getAs[String]("codes").split(",").map(_.toInt)
      val scale = r.getAs[Double]("scale")
      assert(codes.length === v.length)
      assert(codes.forall(c => c >= -127 && c <= 127),
        s"id=$id codes out of range")
      assert(scale >= 0.0)
      // mse bound: per-dim error ≤ scale/2 (rounded outputs add ≤ 5e-7
      // apiece on both factors — absorb with a small epsilon)
      val bound = math.pow(scale / 2.0, 2) + 1e-6
      assert(r.getAs[Double]("mse") <= bound,
        s"id=$id mse=${r.getAs[Double]("mse")} bound=$bound")
    }
    // determinism: a second run is identical
    val again = encode(vecs).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("scale"),
        r.getAs[String]("codes"), r.getAs[Double]("mse"))).sortBy(_._1)
    val first = rows.toSeq.map { case (id, r) =>
      (id, r.getAs[Double]("scale"), r.getAs[String]("codes"),
        r.getAs[Double]("mse")) }.sortBy(_._1)
    assert(again.toSeq === first)
  }

  test("narrow plan: zero exchanges at any corpus size") {
    val plan = encode(Seq((1L, Seq(1f, 2f))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
