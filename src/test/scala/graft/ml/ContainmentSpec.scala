package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Near-containment pairs: the quoted-inside relationship MinHash/Jaccard
  * near-dup structurally misses (the union dilutes J far below any usable
  * threshold while C stays ≈ 1).
  */
class ContainmentSpec extends SparkSpec {

  private val quote =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val host = ("long host document with plenty of its own words " +
    "surrounding the quoted passage " + quote +
    " and then a tail of further unrelated prose " +
    "one two three four five six seven eight nine ten eleven twelve " +
    "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty")

  test("a doc quoted inside a longer one scores high containment, low Jaccard") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, quote),
      (2L, host),
      (3L, "an entirely different document about engines and planners")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.5, maxDf = 64)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(pairs.contains((1L, 2L)), s"contained pair missing: $pairs")
    assert(pairs((1L, 2L)) == 1.0, s"full quote must score 1.0: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // the same pair under Jaccard near-dup: diluted below threshold
    val jac = Dedup.nearDupPairs(docs, "doc_id", "text",
      bands = 4, rowsPerBand = 3, k = 3, threshold = 0.5).count()
    assert(jac == 0L, "Jaccard at 0.5 must miss the contained pair")
  }

  test("maxDf cap: boilerplate grams generate no candidates") {
    val s = spark
    import s.implicits._
    // the shared text sits in MORE than maxDf docs → its grams are
    // index-ineligible and no pair forms (bounded fan-out by design)
    val docs = (0 until 10).map(i => (i.toLong, quote + s" suffix$i"))
      .toDF("doc_id", "text")
    val n = Dedup.containmentPairs(docs, "doc_id", "text",
      k = 3, threshold = 0.5, maxDf = 5).count()
    assert(n == 0L)
    // under a permissive cap the same corpus pairs up
    val m = Dedup.containmentPairs(docs, "doc_id", "text",
      k = 3, threshold = 0.5, maxDf = 64).count()
    assert(m == 45L, s"expected all 10·9/2 pairs, got $m")
  }
}
