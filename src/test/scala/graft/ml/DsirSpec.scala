package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance resampling (Xie et al. 2023): feature accounting,
  * the importance-ranking property the selector exists for, degenerate
  * docs, determinism, and the Gumbel top-k contract.
  */
class DsirSpec extends SparkSpec {

  // raw corpus: two "target-like" docs, two "off-distribution" docs,
  // plus the exemplars themselves
  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "alpha beta gamma delta alpha beta"),
      (2L, "beta gamma delta alpha gamma beta"),
      (3L, "zulu yankee xray whiskey victor uniform"),
      (4L, "xray victor zulu whiskey yankee uniform"),
      (10L, "alpha beta gamma delta"),
      (11L, "gamma delta alpha beta")
    ).toDF("doc_id", "text")
  }

  private def weights = {
    val d = corpus
    Curation.dsirWeights(d, d.filter(col("doc_id") >= 10L),
      "doc_id", "text", buckets = 256, alpha = 1.0)
  }

  test("n_feats counts unigrams + bigrams; empty docs keep a zero row") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "a b c"), (2L, "one"), (3L, "")).toDF("doc_id", "text")
    val m = Curation.dsirWeights(d, d.filter($"doc_id" === 1L),
        "doc_id", "text", buckets = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_feats"), r.getAs[Double]("log_weight"))).toMap
    assert(m(1L)._1 === 5L) // 3 unigrams + 2 bigrams
    assert(m(2L)._1 === 1L)
    assert(m(3L) === ((0L, 0.0)))
  }

  test("target-like documents outweigh off-distribution documents") {
    val m = weights.collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("log_weight")).toMap
    assert(m(1L) > m(3L))
    assert(m(2L) > m(4L))
    // the exemplars themselves score highest of all
    assert(m(10L) > m(1L) && m(11L) > m(1L))
  }

  test("weights are deterministic across invocations") {
    val a = weights.orderBy("doc_id").collect().toSeq
    val b = weights.orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("gumbel top-k: k rows, a subset of the input, deterministic") {
    val sel = Curation.dsirSample(weights, "doc_id", k = 3)
    val rows = sel.collect()
    assert(rows.length === 3)
    val ids = rows.map(_.getLong(0)).toSet
    assert(ids.subsetOf(Set(1L, 2L, 3L, 4L, 10L, 11L)))
    assert(Curation.dsirSample(weights, "doc_id", k = 3)
      .collect().map(_.getLong(0)).toSet === ids)
    // scores carried through and ordered
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
  }

  test("selection plans as TakeOrdered, never a global sort") {
    val plan = Curation.dsirSample(weights, "doc_id", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Sort [score"))
  }

  test("scoring is a narrow plan: the LUT rides as one literal, no join") {
    // the hashed models collect at plan time (bounded: ≤ buckets rows);
    // the RETURNED scoring plan must be join-free and exchange-free
    val plan = weights.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert(!plan.contains("Exchange"))
  }
}
