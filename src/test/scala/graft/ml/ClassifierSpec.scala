package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trainable quality classifier: feature determinism, gradient-descent
  * convergence on separable data, scan-speed scoring plan, and the
  * l2/bias featurization contract. Float-iterative training is
  * convergence-gated (the trainCentroids precedent), not SQL-oracle
  * bit-gated.
  */
class ClassifierSpec extends SparkSpec {

  private val dim = 32

  private def labeled = {
    val s = spark
    import s.implicits._
    val good = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a clear and well written paragraph about engines",
      "distributed systems need careful partitioning design",
      "the report covers quarterly results in detail")
    val bad = Seq(
      "buy cheap pills buy cheap pills buy cheap pills",
      "click here click here win win win",
      "zzz qqq xxx zzz qqq xxx",
      "free money free money free money now")
    (good.map((_, 1.0)) ++ bad.map((_, 0.0))).toDF("text", "label")
  }

  test("features: l2-normalized counts + bias, deterministic, empty-safe") {
    val s = spark
    import s.implicits._
    val rows = Seq("hello world hello", "").toDF("text")
      .select(Classifier.features(col("text"), dim).as("x"))
      .collect().map(_.getSeq[Double](0))
    rows.foreach(x => assert(x.length == dim + 1 && x.last == 1.0))
    // non-empty doc: unit l2 norm over the count components
    val nrm = math.sqrt(rows.head.init.map(v => v * v).sum)
    assert(math.abs(nrm - 1.0) < 1e-9)
    // empty doc: bias only
    assert(rows(1).init.forall(_ == 0.0))
    // identical across evaluations (content-addressed hashing, no RNG)
    val again = Seq("hello world hello").toDF("text")
      .select(Classifier.features(col("text"), dim).as("x"))
      .head().getSeq[Double](0)
    assert(again == rows.head)
  }

  test("training separates good from bad; scores order correctly") {
    val w = Classifier.trainLogReg(labeled, "text", "label", dim,
      iters = 60, lr = 2.0)
    assert(w.length == dim + 1)
    val scored = labeled.select(col("label"),
      Classifier.score(col("text"), w, dim).as("p")).collect()
    // perfect separation on the training set
    scored.foreach { r =>
      val (y, p) = (r.getDouble(0), r.getDouble(1))
      assert(if (y == 1.0) p > 0.5 else p < 0.5,
        s"label $y scored $p")
    }
    // and the decision is confident (margin, not chance)
    val goodMin = scored.filter(_.getDouble(0) == 1.0).map(_.getDouble(1)).min
    val badMax = scored.filter(_.getDouble(0) == 0.0).map(_.getDouble(1)).max
    assert(goodMin - badMax > 0.2)
  }

  test("scoring is a narrow codegen projection — no Exchange, no UDF") {
    val w = Seq.fill(dim + 1)(0.1)
    val plan = labeled.select(Classifier.score(col("text"), w, dim))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("features histogram matches the per-slot formulation exactly") {
    val s = spark
    import s.implicits._
    // the r7 formulation: one filter pass per output slot (the
    // O(dim·tokens) shape BucketCountsExpr replaced) — kept here as the
    // reference semantics the kernel must reproduce bit-for-bit
    def slowFeatures(text: org.apache.spark.sql.Column, d: Int) = {
      val bkts = transform(
        filter(Dedup.tokens(lower(text)), t => t =!= ""),
        t => Curation.hashBucket(t, d))
      val counts = transform(sequence(lit(0), lit(d - 1)),
        i => size(filter(bkts, b => b === i)).cast("double"))
      val nrm = sqrt(aggregate(counts, lit(0.0), (acc, v) => acc + v * v))
      concat(
        transform(counts, v => when(nrm > 0, v / nrm).otherwise(lit(0.0))),
        array(lit(1.0)))
    }
    val docs = Seq("the quick brown fox the fox", "a b c a b a", "",
      "one token", "repeat repeat repeat repeat").toDF("text")
    val fast = docs.select(Classifier.features(col("text"), 17).as("x"))
      .collect().map(_.getSeq[Double](0))
    val slow = docs.select(slowFeatures(col("text"), 17).as("x"))
      .collect().map(_.getSeq[Double](0))
    assert(fast.toSeq == slow.toSeq)
  }

  test("featurization cost scales with tokens, not dim") {
    val s = spark
    import s.implicits._
    val docs = (0 until 400).map(i =>
      (0 until 12).map(j => s"tok${(i * 7 + j * 3) % 50}").mkString(" "))
      .toDF("text")
    docs.persist().count()
    def time(d: Int): Long = {
      def once(): Long = {
        val t0 = System.nanoTime()
        docs.select(Classifier.features(col("text"), d).as("x"))
          .select(sum(element_at(col("x"), 1))).head()
        System.nanoTime() - t0
      }
      once(); math.min(once(), once()) // warm, then min of two
    }
    val small = time(64)
    val big = time(8192)
    docs.unpersist(blocking = false)
    // dim grew 128×; the one-pass kernel's per-row cost is
    // O(tokens + dim) (three linear passes), so the wall ratio must stay
    // far below linear-in-dim. The replaced O(dim·tokens) shape measured
    // >40× here; generous bound to keep CI quiet on a loaded machine.
    assert(big < small * 24,
      s"featurization at dim 8192 took ${big / 1e6}%.1f ms vs " +
        s"${small / 1e6}%.1f ms at dim 64 — scaling with dim")
  }

  test("more iterations do not hurt training loss") {
    def loss(w: Seq[Double]): Double = {
      val p = Classifier.score(col("text"), w, dim)
      labeled.select(avg(
        -(col("label") * log(greatest(p, lit(1e-12))) +
          (lit(1.0) - col("label")) *
            log(greatest(lit(1.0) - p, lit(1e-12))))).as("l"))
        .head().getDouble(0)
    }
    val w10 = Classifier.trainLogReg(labeled, "text", "label", dim,
      iters = 10, lr = 2.0)
    val w40 = Classifier.trainLogReg(labeled, "text", "label", dim,
      iters = 40, lr = 2.0)
    assert(loss(w40) <= loss(w10) + 1e-9)
  }
}
