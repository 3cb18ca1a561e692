package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-substring dedup (Lee et al. 2022 ExactSubstr): positional span
  * detection and removal. Cases are hand-computable: known shared
  * passages, within-doc repetition, adjacent-span merging, under-k docs,
  * whole-doc duplication, and the pass-through contract for clean docs.
  */
class DupSpansSpec extends SparkSpec {

  // k = 4 throughout. Tokens are single letters for countability.
  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      // docs 1 and 2 share the 6-token passage "p q r s t u" at
      // positions 2..8 (doc 1) and 0..6 (doc 2)
      (1L, "a b p q r s t u c d"),
      (2L, "p q r s t u x y z"),
      // doc 3 repeats "m n o p" WITHIN itself: covered intervals
      // [0,4) and [5,9) with position 4 ("w") uncovered — two spans
      (3L, "m n o p w m n o p"),
      // doc 4: clean, no duplicated 4-gram anywhere
      (4L, "one two three four five six seven"),
      // doc 5: under k tokens — contributes no grams, never flagged
      (5L, "s h o"),
      // doc 6: exact copy of doc 4 → whole-doc span [0, 7)
      (6L, "one two three four five six seven"),
      // doc 7: two ADJACENT passages duplicated against DIFFERENT
      // sources (doc 8 shares c1-c4, doc 9 shares d1-d4) — covered
      // intervals [0,4) and [4,8) touch and merge into [0,8), even
      // though no single 8-token substring is duplicated anywhere:
      // exactly the paper's per-position removal semantics
      (7L, "c1 c2 c3 c4 d1 d2 d3 d4"),
      (8L, "c1 c2 c3 c4 z1 z2 z3 z4"),
      (9L, "y1 y2 y3 y4 d1 d2 d3 d4")
    ).toDF("doc_id", "text")
  }

  private def spansOf(id: Long, sp: Map[Long, Seq[(Long, Long)]]) =
    sp.getOrElse(id, Seq.empty)

  test("dupSpans finds shared passages positionally") {
    val sp = Dedup.dupSpans(docs, "doc_id", "text", k = 4)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // shared passage "p q r s t u": 3 covered 4-gram starts each side
    assert(spansOf(1L, sp) == Seq((2L, 8L)))
    assert(spansOf(2L, sp) == Seq((0L, 6L)))
    // within-doc repetition: two disjoint spans, the uncovered "w" between
    assert(spansOf(3L, sp) == Seq((0L, 4L), (5L, 9L)))
    // whole-doc duplicates cover everything
    assert(spansOf(4L, sp) == Seq((0L, 7L)))
    assert(spansOf(6L, sp) == Seq((0L, 7L)))
    // under-k and clean docs absent
    assert(!sp.contains(5L))
    // adjacent passages duplicated against different sources merge
    assert(spansOf(7L, sp) == Seq((0L, 8L)))
    assert(spansOf(8L, sp) == Seq((0L, 4L)))
    assert(spansOf(9L, sp) == Seq((4L, 8L)))
  }

  test("dupSpans emits nothing on a dup-free corpus") {
    val s = spark
    import s.implicits._
    val clean = Seq((1L, "a b c d e f"), (2L, "g h i j k l"))
      .toDF("doc_id", "text")
    assert(Dedup.dupSpans(clean, "doc_id", "text", k = 4).count() == 0L)
  }

  test("removeDupSpans cuts flagged tokens, passes clean docs verbatim") {
    val out = Dedup.removeDupSpans(docs, "doc_id", "text", k = 4)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a b c d")
    assert(out(2L) == "x y z")
    assert(out(3L) == "w")      // both repeats cut, uncovered token stays
    assert(out(4L) == "")       // whole-doc dup: ALL occurrences removed
    assert(out(6L) == "")
    assert(out(5L) == "s h o")  // untouched, original text object
    assert(out(7L) == "")       // merged adjacent spans cover everything
    assert(out(8L) == "z1 z2 z3 z4")
    assert(out(9L) == "y1 y2 y3 y4")
    assert(out.size == 9)       // every row survives (text surgery, not row drop)
  }

  test("removeDupSpans preserves original whitespace of unedited docs") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "  padded   text   here  "), (2L, "other words"))
      .toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(df, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "  padded   text   here  ")
  }

  test("dupSpans plan: gram-keyed aggregate + join, id aggregate — no window, no cartesian") {
    val plan = Dedup.dupSpans(docs, "doc_id", "text", k = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "interval merging must be array-local")
    assert(!plan.contains("Cartesian"), "never pairwise")
  }
}
