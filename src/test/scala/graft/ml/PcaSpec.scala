package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PCA/whitening: the one-pass moment aggregate, the driver-local
  * Jacobi eigensolve, and the native projection kernel.
  */
class PcaSpec extends SparkSpec {

  private def close(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) < tol

  test("jacobiEigen solves a hand-checkable symmetric matrix") {
    // [[2,1],[1,2]] → eigvals 3 (v=[1,1]/√2) and 1 (v=[1,-1]/√2)
    val (vals, vecs) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(close(sorted(0), 1.0) && close(sorted(1), 3.0))
    // eigen equation Av = λv for both columns
    for (c <- 0 until 2) {
      val v = Array(vecs(0)(c), vecs(1)(c))
      assert(close(2 * v(0) + v(1), vals(c) * v(0), 1e-8))
      assert(close(v(0) + 2 * v(1), vals(c) * v(1), 1e-8))
    }
  }

  test("covarianceMatrix matches the hand-computed population covariance") {
    val s = spark
    import s.implicits._
    // rows (1,2),(3,6),(5,4): means (3,4); centered x=(-2,0,2),
    // y=(-2,2,0) → var 8/3 each, cov = (4+0+0)/3 = 4/3
    val df = Seq(Seq(1f, 2f), Seq(3f, 6f), Seq(5f, 4f)).toDF("embedding")
    val out = Similarity.covarianceMatrix(df, "embedding", dim = 2)
      .orderBy("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2.666667), (0L, 1L, 1.333333),
      (1L, 0L, 1.333333), (1L, 1L, 2.666667)))
  }

  // anisotropic cloud with a known dominant direction: x along [1,1,0]/√2
  // with sd 3, plus small independent noise on all axes — deterministic
  // (hash-derived), no RNG
  private def cloud = {
    val s = spark
    import s.implicits._
    (0 until 400).map { i =>
      val t = ((i * 2654435761L) % 1000) / 1000.0 - 0.5   // ~U(-0.5, 0.5)
      val n1 = ((i * 40503L + 7) % 1000) / 10000.0 - 0.05 // small noise
      val n2 = ((i * 69069L + 13) % 1000) / 10000.0 - 0.05
      val main = 6.0 * t // sd ~1.7 along the main axis
      Seq((main * 0.70710678 + n1).toFloat,
        (main * 0.70710678 - n1).toFloat,
        n2.toFloat)
    }.toDF("embedding")
  }

  test("pcaTrain: orthonormal sign-fixed basis, descending eigvals, " +
       "dominant axis recovered") {
    val model = Similarity.pcaTrain(cloud, "embedding", dim = 3, m = 3)
    assert(model.eigvals.length == 3 && model.components.length == 3)
    // descending eigenvalues
    assert(model.eigvals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // orthonormal rows
    for (a <- 0 until 3; b <- 0 until 3) {
      val d = model.components(a).zip(model.components(b))
        .map { case (x, y) => x * y }.sum
      assert(close(d, if (a == b) 1.0 else 0.0, 1e-8), s"<$a,$b> = $d")
    }
    // sign convention: each row's largest-|entry| positive
    assert(model.components.forall(r => r(r.map(math.abs).zipWithIndex.max._2) > 0))
    // dominant axis ≈ [1,1,0]/√2 (up to the fixed sign)
    val c0 = model.components(0)
    assert(close(math.abs(c0(0)), 0.70710678, 1e-2), c0.mkString(","))
    assert(close(math.abs(c0(1)), 0.70710678, 1e-2))
    assert(math.abs(c0(2)) < 0.05)
    // eigen equation against the model's own covariance (via the frame)
    val cov = Similarity.covarianceMatrix(cloud, "embedding", dim = 3)
      .collect().map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2))).toMap
    for (r <- 0 until 3) {
      val v = model.components(r)
      for (i <- 0 until 3) {
        val av = (0 until 3).map(j => cov((i, j)) * v(j)).sum
        // rounded-cov input → 1e-5 tolerance
        assert(close(av, model.eigvals(r) * v(i), 1e-4),
          s"row $r: (Av)_$i=$av vs ${model.eigvals(r) * v(i)}")
      }
    }
  }

  test("pcaProject: projected covariance is diag(eigvals); whitened is I") {
    val model = Similarity.pcaTrain(cloud, "embedding", dim = 3, m = 2)
    val proj = Similarity.pcaProject(cloud, "embedding", model)
    val pcov = Similarity.covarianceMatrix(proj, "pca", dim = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(close(pcov((0L, 0L)), model.eigvals(0), 1e-4))
    assert(close(pcov((1L, 1L)), model.eigvals(1), 1e-4))
    assert(close(pcov((0L, 1L)), 0.0, 1e-4))
    val white = Similarity.pcaProject(cloud, "embedding", model,
      outCol = "w", whiten = true)
    val wcov = Similarity.covarianceMatrix(white, "w", dim = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(close(wcov((0L, 0L)), 1.0, 1e-3) && close(wcov((1L, 1L)), 1.0, 1e-3))
    assert(close(wcov((0L, 1L)), 0.0, 1e-3))
  }

  test("pcaProject: malformed vectors project to null, not garbage") {
    val s = spark
    import s.implicits._
    val model = Similarity.pcaTrain(cloud, "embedding", dim = 3, m = 2)
    val bad = Seq(Seq(1f, 2f), Seq(1f, 2f, 3f)).toDF("embedding") // first too short
    val out = Similarity.pcaProject(bad, "embedding", model)
      .select(col("pca")).collect()
    assert(out(0).isNullAt(0))
    assert(!out(1).isNullAt(0) && out(1).getSeq[Double](0).length == 2)
  }
}
