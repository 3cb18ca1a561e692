package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier — the learned complement of
  * [[TextAnalysis.qualityScore]]'s heuristics (the fasttext-style linear
  * filter every production curation pipeline ends up training on labeled
  * good/bad examples, cf. the CCNet/GPT-3 quality-filter recipe):
  * hashed bag-of-words features + binary logistic regression trained by
  * full-batch gradient descent.
  *
  * Scale shapes:
  *  - featurization is a per-row Column expression (one md5 per token,
  *    then `dim` codegen'd bucket comparisons) — no shuffle, no UDF;
  *  - each training iteration is ONE explode + map-side-combined
  *    aggregate whose output is `dim+1` rows (the gradient vector) —
  *    the same driver-small shape as [[Similarity.trainCentroids]]; the
  *    corpus is never collected, labels never move;
  *  - scoring with trained weights is a pure narrow projection (the
  *    weights fold into the plan as literals) — scan speed at 100 TB.
  *
  * Training is float-iterative (like k-means), so it is spec-gated on
  * convergence/separation rather than bit-gated against a SQL oracle —
  * the [[Similarity.trainCentroids]] precedent.
  */
object Classifier {

  /** Deterministic token bucket in [0, dim): [[Curation.hashBucket]] —
    * ONE implementation of the content-addressed bucketing, so
    * featurization is identical across engines, runs, and cluster
    * layouts by construction.
    */
  private def bucketOf(tok: Column, dim: Int): Column =
    Curation.hashBucket(tok, dim)

  /** Hashed bag-of-words feature vector: `dim` l2-normalized bucket
    * counts plus a trailing bias component fixed at 1.0 (so the model's
    * intercept rides in the same weight vector). Lowercased whitespace
    * tokens. Empty documents featurize to the bias alone.
    *
    * Histogram + l2-normalize + bias run as ONE native pass over the
    * token buckets ([[graft.functions.HashedBowExpr]], O(tokens + dim)
    * per row) — the former per-slot `transform(sequence(...), i ->
    * size(filter(bkts, b == i)))` walked the bucket array dim times per
    * row (O(dim·tokens)), a 1000×+ blowup at realistic hashed-BoW dims
    * (2^12–2^18). Counts are exact integers and the norm the
    * index-ordered sum of their squares, so the fused kernel is
    * bit-identical to the old formulation — the `ml_classifier_margin`
    * oracle holds unchanged.
    */
  def features(text: Column, dim: Int): Column = {
    require(dim > 0, s"dim must be positive, got $dim")
    import org.apache.spark.sql.GraftSqlBridge
    // the whitespace split of "" is [""] — drop empty tokens so blank
    // documents featurize to the bias alone
    val bkts = transform(
      filter(Dedup.tokens(lower(text)), t => t =!= ""),
      t => bucketOf(t, dim))
    GraftSqlBridge.column(graft.functions.HashedBowExpr(
      GraftSqlBridge.expression(bkts), dim))
  }

  /** The linear margin w·x for a literal weight vector — an
    * index-ordered left fold over IEEE-exact operations (+, *, /,
    * sqrt), so it is bit-identical across engines and oracle-gateable;
    * [[score]] adds the sigmoid (whose `exp` is library-dependent and
    * therefore only convergence-gated).
    */
  def margin(text: Column, weights: Seq[Double], dim: Int): Column = {
    require(weights.length == dim + 1,
      s"weights must have dim+1=${dim + 1} components, got ${weights.length}")
    val x = features(text, dim)
    val w = array(weights.map(lit): _*)
    // same index-ordered multiply-add as aggregate(zip_with(...)), as a
    // native codegen'd loop — bit-identical, oracle-safe
    Similarity.dot(w, x)
  }

  /** σ(w·x) for a literal weight vector — scoring stays whole-stage
    * codegen with the weights inlined as an array literal.
    */
  def score(text: Column, weights: Seq[Double], dim: Int): Column =
    lit(1.0) / (lit(1.0) + exp(-margin(text, weights, dim)))

  /** Train binary logistic regression (labels 0/1) with L2
    * regularization. Returns `dim+1` weights (bias last). Each
    * iteration: one aggregate producing the `dim+1`-component gradient
    * (explode the per-row contribution `x·(σ(w·x) − y)` to (component,
    * value) pairs → hash aggregate → dim+1 rows to the driver), then a
    * driver-side weight update — gradient descent with the corpus
    * staying put.
    */
  def trainLogReg(df: DataFrame, textCol: String, labelCol: String,
                  dim: Int, iters: Int = 50, lr: Double = 1.0,
                  l2: Double = 0.0): Seq[Double] = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    val data = df.select(features(col(textCol), dim).as("x"),
      col(labelCol).cast("double").as("y")).persist()
    val n = data.count().toDouble
    require(n > 0, "training set is empty")
    var w = Array.fill(dim + 1)(0.0)
    for (_ <- 0 until iters) {
      val wc = array(w.toSeq.map(lit): _*)
      val margin = Similarity.dot(wc, col("x"))
      val err = lit(1.0) / (lit(1.0) + exp(-margin)) - col("y")
      // err is staged BEFORE the explode: an expression referenced from
      // inside a transform lambda is re-evaluated per element (no CSE in
      // lambda bodies), which made the r7 gradient O(dim²) per row; a
      // Generate's child projection evaluates it exactly once per row.
      // And hashed-BoW vectors are sparse: most of the dim+1 exploded
      // slots are exact ±0.0 contributions. Dropping them before the
      // aggregate cuts its input from dim·rows to ~tokens·rows (adding a
      // true zero to a double sum can never change it, and absent slots
      // already read as 0.0 below) — at dim 2^12+ this is the difference
      // between a gradient shuffle sized by the corpus and one sized by
      // the vocabulary
      val grad = data
        .select(err.as("e"), posexplode(col("x")))
        .select(col("pos"), (col("col") * col("e")).as("c"))
        .filter(col("c") =!= 0.0)
        .groupBy(col("pos")).agg(sum(col("c")).as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = w.zipWithIndex.map { case (wi, i) =>
        // standard LR: the intercept (last component) is unregularized —
        // shrinking it would bias every probability toward 0.5
        val reg = if (i == dim) 0.0 else l2 * wi
        wi - lr * (grad.getOrElse(i, 0.0) / n + reg)
      }
    }
    data.unpersist(blocking = false)
    w.toSeq
  }
}
