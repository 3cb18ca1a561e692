package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interpolated bigram language-model scoring (the CCNet perplexity
  * filter's distributed-trainable member): hand-computable corpus counts,
  * interpolation arithmetic, degenerate docs, and the ranking property
  * the filter exists for (in-distribution text scores above garbage).
  */
class BigramLmSpec extends SparkSpec {

  private val lambda = 0.9
  private val l2 = 1.0 - lambda // the double the engine actually uses

  private def score(rows: Seq[(Long, String)], lam: Double = lambda) = {
    val s = spark
    import s.implicits._
    CorpusStats.bigramLogProb(rows.toDF("doc_id", "text"),
        "doc_id", "text", lambda = lam)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob"))).toMap
  }

  test("hand-computed counts: p = λ·c2/c1(w1) + (1−λ)·c1(w2)/N") {
    // corpus: "a b", "a b", "a c" → unigrams a:3 b:2 c:1, N=6;
    // bigrams "a b":2, "a c":1
    val m = score(Seq((1L, "a b"), (2L, "a b"), (3L, "a c")))
    val pAB = lambda * 2.0 / 3.0 + l2 * 2.0 / 6.0
    val pAC = lambda * 1.0 / 3.0 + l2 * 1.0 / 6.0
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(m(1L) === ((1L, r6(math.log(pAB)))))
    assert(m(2L) === ((1L, r6(math.log(pAB)))))
    assert(m(3L) === ((1L, r6(math.log(pAC)))))
  }

  test("documents under two words keep a zero row") {
    val m = score(Seq((1L, "a b c d"), (2L, "solo"), (3L, ""), (4L, "  ")))
    assert(m(2L) === ((0L, 0.0)))
    assert(m(3L) === ((0L, 0.0)))
    assert(m(4L) === ((0L, 0.0)))
    assert(m(1L)._1 === 3L)
  }

  test("interpolation keeps every in-vocabulary bigram finite") {
    // "b a" never occurs as a bigram but both words are in vocabulary —
    // the unigram backoff keeps p > 0
    val m = score(Seq((1L, "a b"), (2L, "a b"), (3L, "b a")))
    assert(m(3L)._2 > Double.NegativeInfinity)
    assert(m(3L)._2 < m(1L)._2) // unseen bigram scores below the seen one
  }

  test("the filter's ranking property: natural order outscores scrambled") {
    // the LM sanity check: the SAME vocabulary in corpus-typical order
    // scores above a scrambled permutation (whose bigrams pair frequent
    // contexts with never-seen successors). Note what a self-trained
    // CONDITIONAL bigram model deliberately does NOT penalize: globally
    // unique tokens (each context occurs once, followed deterministically)
    // — vocabulary rarity is unigramLogProb's business; word-ORDER
    // anomaly is this score's.
    val natural = (1 to 5).map(i => (i.toLong, "the cat sat on the mat"))
    val scrambled = Seq((99L, "mat on cat the sat the"))
    val m = score(natural ++ scrambled)
    assert(m(1L)._2 > m(99L)._2)
  }

  test("reference-trained scoring penalizes OOV text (the CCNet property)") {
    val s = spark
    import s.implicits._
    val train = Seq((100L, "the cat sat on the mat"),
      (101L, "the dog sat on the rug")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the cat sat on the rug"),  // in-vocabulary, seen-ish bigrams
      (2L, "zq xv wk jn pf td")        // fully OOV
    ).toDF("doc_id", "text")
    val m = CorpusStats.bigramLogProbAgainst(corpus, train,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob"))).toMap
    // the self-trained conditional model scores unique-token noise HIGH
    // (deterministic singleton contexts); the reference-trained model
    // must score it at the add-one unigram floor, far below real text
    assert(m(1L)._2 > m(2L)._2 + 1.0,
      s"OOV must score far below in-vocab: $m")
    // hand check: every OOV position prices λ·0 + (1−λ)·(0+1)/(N+V+1);
    // train has N=12 tokens, V=7 types (the cat sat on mat dog rug)
    val floor = math.log((1.0 - 0.9) * 1.0 / (12.0 + 7.0 + 1.0))
    assert(m(2L)._2 === math.rint(floor * 1e6) / 1e6)
  }

  test("reference-trained scoring: every corpus row keeps a row") {
    val s = spark
    import s.implicits._
    val train = Seq((100L, "a b c")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val m = CorpusStats.bigramLogProbAgainst(corpus, train,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob"))).toMap
    assert(m(1L)._1 === 1L)
    assert(m(2L) === ((0L, 0.0)))
    assert(m(3L) === ((0L, 0.0)))
  }

  test("stupid backoff: each of the three branches scores its exact value") {
    val s = spark
    import s.implicits._
    // train counts: "a b c a b d" → uni a:2 b:2 c:1 d:1 (N=6, V=4);
    // bigrams: "a b":2, "b c":1, "c a":1, "b d":1; trigrams:
    // "a b c":1, "b c a":1, "c a b":1, "a b d":1
    val train = Seq((100L, "a b c a b d")).toDF("doc_id", "text")
    val a = 0.4
    // corpus doc exercises one trigram per branch:
    //   "a b c": trigram seen → c3/c(a b) = 1/2
    //   "b c d": unseen; suffix "c d" unseen; floor on d → a²·(1+1)/(6+4+1)
    //   "c a b": trigram seen → 1/1
    val corpus = Seq(
      (1L, "a b c"),                 // branch 1 only
      (2L, "x b d y"),               // "x b d": unseen, suffix "b d" seen
                                     //   → a·c(b d)/c(b) = a·1/2
                                     // "b d y": unseen, suffix "d y" unseen
                                     //   → floor on y: a²·(0+1)/11
      (3L, "zz")                     // < 3 tokens → 0 trigrams
    ).toDF("doc_id", "text")
    val m = CorpusStats.trigramStupidBackoff(corpus, train,
        "doc_id", "text", alpha = a)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("avg_logscore"))).toMap
    assert(m(1L)._1 === 1L)
    assert(m(1L)._2 === math.rint(math.log(0.5) * 1e6) / 1e6)
    val p1 = a * 1.0 / 2.0            // "x b d": backoff to c(b d)/c(b)
    val p2 = a * a * (0.0 + 1.0) / (6.0 + 4.0 + 1.0) // "b d y": floor
    val exp2 = (math.log(p1) + math.log(p2)) / 2.0
    assert(m(2L)._1 === 2L)
    assert(m(2L)._2 === math.rint(exp2 * 1e6) / 1e6)
    assert(m(3L) === ((0L, 0.0)))
  }

  test("lambda=1 is pure bigram MLE") {
    // single doc "a b a b": bigrams "a b":2, "b a":1; with λ=1 the
    // probabilities are c2/c1(w1): p(b|a)=2/2=1, p(a|b)=1/2
    val m = score(Seq((1L, "a b a b")), lam = 1.0)
    val expected = (math.log(1.0) + math.log(0.5) + math.log(1.0)) / 3.0
    assert(m(1L) === ((3L, math.rint(expected * 1e6) / 1e6)))
  }
}
