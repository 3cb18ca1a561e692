package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Positional benchmark decontamination: spans are driven by membership
  * in the BENCHMARK gram set (not corpus-internal duplication), adjacent
  * covered intervals merge, clean documents pass through verbatim.
  * k = 4 throughout; tokens are single letters for countability.
  */
class DecontaminateSpec extends SparkSpec {

  private def frames = {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      // shares the 6-token passage "p q r s t u" with the benchmark at
      // positions 2..8 → covered gram starts {2,3,4} → span [2, 8)
      (1L, "a b p q r s t u c d"),
      // duplicated WITHIN the corpus (copy of doc 4) but absent from the
      // benchmark → decontamination must NOT flag it (dupSpans would)
      (3L, "one two three four five six seven"),
      (4L, "one two three four five six seven"),
      // two disjoint benchmark matches with a 2-token gap → two spans
      (5L, "p q r s g1 g2 w x y z"),
      // under k tokens — no grams, never flagged
      (6L, "s h o"),
      // clean doc with internal whitespace that must survive verbatim
      (7L, "keep   this    exact spacing")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "p q r s t u"),
      (101L, "m m w x y z m m")
    ).toDF("doc_id", "text")
    (corpus, bench)
  }

  private def spans = {
    val (corpus, bench) = frames
    CorpusStats.decontaminateSpans(corpus, "doc_id", "text",
      bench, "text", k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
  }

  test("benchmark overlap produces merged positional spans") {
    // doc 1: bench grams "p q r s"/"q r s t"/"r s t u" match at
    // positions 2,3,4 → one span [2, 8)
    assert(spans.contains((1L, 2L, 8L)))
  }

  test("corpus-internal duplication is NOT decontaminated") {
    assert(!spans.exists(s => s._1 == 3L || s._1 == 4L))
  }

  test("disjoint matches yield separate spans") {
    // doc 5: "p q r s" at 0 → [0,4); "w x y z" at 6 → [6,10)
    assert(spans.contains((5L, 0L, 4L)))
    assert(spans.contains((5L, 6L, 10L)))
  }

  test("under-k and clean documents yield no spans") {
    assert(!spans.exists(s => s._1 == 6L || s._1 == 7L))
  }

  test("removal cuts spans and passes clean docs through verbatim") {
    val (corpus, bench) = frames
    val cleaned = CorpusStats.decontaminate(corpus, "doc_id", "text",
        bench, "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(1L) === "a b c d")
    assert(cleaned(5L) === "g1 g2")
    // untouched docs keep their original whitespace exactly
    assert(cleaned(7L) === "keep   this    exact spacing")
    assert(cleaned(3L) === "one two three four five six seven")
    assert(cleaned.size === 6)
  }

  test("the benchmark gram set joins as a broadcast") {
    val (corpus, bench) = frames
    val plan = CorpusStats.decontaminateSpans(corpus, "doc_id", "text",
      bench, "text", k = 4).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
