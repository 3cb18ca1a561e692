package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion and the hybrid (BM25 + cosine) retrieval on
  * top of it: hand-computed RRF arithmetic, the union (not join)
  * fusion semantics, and the two-channel ranking property the fusion
  * exists for.
  */
class HybridRetrievalSpec extends SparkSpec {

  test("rrfFuse matches hand-computed reciprocal sums, ranks by score " +
      "then id, and honors k") {
    val s = spark
    import s.implicits._
    val a = Seq((7L, 1L, 1L), (7L, 2L, 2L)).toDF("qid", "id", "rank")
    val b = Seq((7L, 2L, 1L), (7L, 3L, 2L)).toDF("qid", "id", "rank")
    val out = Similarity.rrfFuse(Seq(a, b), k = 10).orderBy("rank")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // d2: 1/61 + 1/62 = 0.032522; d1: 1/61 = 0.016393; d3: 1/62 = 0.016129
    assert(out.map(t => (t._2, t._3)).toSeq ==
      Seq((1L, 2L), (2L, 1L), (3L, 3L)), out.toSeq.toString)
    val want = Seq(0.032522, 0.016393, 0.016129)
    out.map(_._4).zip(want).foreach { case (got, w) =>
      assert(math.abs(got - w) < 1e-9, s"score $got vs $w")
    }
    // equal scores break by id: two docs each appearing only at rank 1
    // of one channel
    val c = Seq((7L, 9L, 1L)).toDF("qid", "id", "rank")
    val d = Seq((7L, 4L, 1L)).toDF("qid", "id", "rank")
    val tie = Similarity.rrfFuse(Seq(c, d), k = 10).orderBy("rank")
      .collect().map(_.getLong(2))
    assert(tie.toSeq == Seq(4L, 9L))
    // k truncates
    assert(Similarity.rrfFuse(Seq(a, b), k = 1).count() == 1L)
  }

  private def corpus = {
    val s = spark
    import s.implicits._
    // doc 1: lexical match only; doc 2: semantic match only; doc 3:
    // BOTH channels; doc 4: neither
    Seq(
      (1L, "spark shuffle exchange partitions", Seq(0.0f, 1.0f)),
      (2L, "completely unrelated words here", Seq(1.0f, 0.02f)),
      (3L, "spark shuffle tuning notes", Seq(1.0f, 0.01f)),
      (4L, "nothing in common at all", Seq(0.0f, -1.0f)))
      .toDF("doc_id", "text", "embedding")
  }

  test("hybridTopK: a two-channel document outranks single-channel " +
      "ones; the fusion is a union (a channel miss is not fatal)") {
    val s = spark
    import s.implicits._
    val queries = Seq((100L, "spark shuffle", Seq(1.0f, 0.0f)))
      .toDF("qid", "qtext", "qvec")
    val out = Similarity.hybridTopK(corpus, "doc_id", "text", "embedding",
        queries, "qid", "qtext", "qvec", k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // doc 3 is in both channels' top ranks → must fuse to rank 1;
    // docs 1 (lexical-only) and 2 (semantic-only) still retrieved
    assert(out.head._2 == 3L, s"two-channel doc must win: ${out.toSeq}")
    val retrieved = out.map(_._2).toSet
    assert(retrieved.contains(1L) && retrieved.contains(2L),
      s"single-channel docs must survive the fusion: ${out.toSeq}")
  }

  test("weighted RRF: weights bias the fusion, a zero weight silences " +
      "its channel, and defaults reproduce the unweighted sum") {
    val s = spark
    import s.implicits._
    val a = Seq((7L, 1L, 1L), (7L, 2L, 2L)).toDF("qid", "id", "rank")
    val b = Seq((7L, 2L, 1L), (7L, 3L, 2L)).toDF("qid", "id", "rank")
    // unweighted == weights(1,1), value for value
    val plain = Similarity.rrfFuse(Seq(a, b), k = 10).orderBy("rank")
      .collect().toSeq
    val ones = Similarity.rrfFuse(Seq(a, b), k = 10,
      weights = Seq(1.0, 1.0)).orderBy("rank").collect().toSeq
    assert(plain == ones)
    // weight 0 silences channel b ENTIRELY (r16: the ranking is
    // dropped before the union, so b's docs cannot ride in as score-0
    // tail fillers and b's plan never executes): only a's docs rank
    val solo = Similarity.rrfFuse(Seq(a, b), k = 10,
        weights = Seq(1.0, 0.0)).orderBy("rank")
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(solo.map(_._1).toSeq == Seq(1L, 2L),
      s"a silenced channel's docs must not appear: ${solo.toSeq}")
    assert(solo.forall(_._2 > 0.0), "every surviving score is positive")
    // all-zero weights refuse instead of fusing nothing
    intercept[IllegalArgumentException] {
      Similarity.rrfFuse(Seq(a, b), weights = Seq(0.0, 0.0))
    }
    // a heavy semantic weight flips the winner: doc 3 (b-only, rank 2)
    // overtakes doc 1 (a-only, rank 1) at weight 3
    val heavy = Similarity.rrfFuse(Seq(a, b), k = 10,
        weights = Seq(1.0, 3.0)).orderBy("rank")
      .collect().map(_.getLong(2))
    assert(heavy.head == 2L && heavy.indexOf(3L) < heavy.indexOf(1L),
      s"weighting must re-rank: ${heavy.toSeq}")
    // arity mismatch refuses
    intercept[IllegalArgumentException] {
      Similarity.rrfFuse(Seq(a, b), weights = Seq(1.0))
    }
  }

  test("hybridTopK: a query with zero lexical hits still retrieves " +
      "semantically") {
    val s = spark
    import s.implicits._
    val queries = Seq((200L, "zzz qqq", Seq(1.0f, 0.0f)))
      .toDF("qid", "qtext", "qvec")
    val out = Similarity.hybridTopK(corpus, "doc_id", "text", "embedding",
        queries, "qid", "qtext", "qvec", k = 2)
      .orderBy("rank").collect()
    assert(out.nonEmpty, "semantic channel alone must produce results")
    assert(out.head.getLong(2) == 3L || out.head.getLong(2) == 2L,
      s"top hit must come from the cosine channel: ${out.toSeq}")
  }
}
