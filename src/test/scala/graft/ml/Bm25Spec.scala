package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 retrieval against a hand-computed Okapi oracle (k1=1.2, b=0.75,
  * Lucene-style idf = ln(1 + (N − df + 0.5)/(df + 0.5))).
  */
class Bm25Spec extends SparkSpec {

  private def run(k: Int = 10) = {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "apple banana apple"),        // dl=3, tf(apple)=2
      (2L, "banana cherry"),             // dl=2, tf(cherry)=1
      (3L, "cherry cherry cherry date")  // dl=4, tf(cherry)=3
    ).toDF("doc_id", "text")
    val queries = Seq((100L, "apple cherry")).toDF("qid", "qtext")
    CorpusStats.bm25TopK(corpus, "doc_id", "text",
        queries, "qid", "qtext", k = k)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
  }

  test("bm25TopK matches the hand-computed Okapi scores and order") {
    // N=3, avgdl=3. idf(apple)=ln(2.5/1.5+1), idf(cherry)=ln(1.5/2.5+1).
    // d1: ln(8/3)·(2·2.2)/(2+1.2·(0.25+0.75·3/3)) = 0.980829·1.375
    // d3: ln(1.6)·(3·2.2)/(3+1.2·(0.25+0.75·4/3)) = 0.470004·(6.6/4.5)
    // d2: ln(1.6)·(1·2.2)/(1+1.2·(0.25+0.75·2/3)) = 0.470004·(2.2/1.9)
    val out = run()
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((100L, 1L, 1L), (100L, 2L, 3L), (100L, 3L, 2L)))
    val expect = Seq(1.348640, 0.689339, 0.544215)
    out.map(_._4).zip(expect).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-6, s"score $got vs $want")
    }
  }

  test("bm25TopK honors k and drops docs sharing no query term") {
    val out = run(k = 2)
    assert(out.length == 2)          // k cuts the third hit
    assert(!out.exists(_._3 == 4L))  // "date"-only docs never appear
  }

  test("bm25TopK: query terms absent from the corpus contribute nothing") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val queries = Seq((7L, "zeta alpha")).toDF("qid", "qtext")
    val out = CorpusStats.bm25TopK(corpus, "doc_id", "text",
        queries, "qid", "qtext", k = 5)
      .orderBy("rank").collect()
    // only doc 1 matches (alpha); zeta matches nothing and must not
    // produce rows or poison df
    assert(out.map(_.getLong(2)).toSeq == Seq(1L))
  }
}
