package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Paragraph-level boilerplate dedup: cross-document exact-paragraph
  * removal with in-order reassembly ([[Dedup.paragraphDedup]]).
  */
class ParagraphDedupSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)], minDocs: Int = 2) = {
    val s = spark
    import s.implicits._
    Dedup.paragraphDedup(rows.toDF("doc_id", "text"), "doc_id", "text",
        minDocs = minDocs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
  }

  test("removes cross-doc duplicate paragraphs from ALL carriers") {
    val out = run(Seq(
      (1L, "common para\n\nunique one"),
      (2L, "common para\n\nunique two"),
      (3L, "all unique here"),
      (4L, ""),
      (5L, "common para")))
    assert(out.toSeq == Seq(
      (1L, "unique one", 2L, 1L),
      (2L, "unique two", 2L, 1L),
      (3L, "all unique here", 1L, 0L),
      (4L, "", 0L, 0L),
      (5L, "", 1L, 1L)))
  }

  test("within-document repetition is NOT removed (distinct-doc count)") {
    val out = run(Seq(
      (1L, "rep\n\nrep"),
      (2L, "other text")))
    assert(out(0) == ((1L, "rep\n\nrep", 2L, 0L)))
  }

  test("surviving paragraphs keep original order; trim + empty drop") {
    val out = run(Seq(
      (1L, "z end\n\n  common para \n\na start\n\n\n\n"),
      (2L, "common para"),
      (3L, "common para")))
    // "  common para " trims to the shared paragraph; the empty tail
    // split drops; order is positional (z before a), not lexical
    assert(out(0) == ((1L, "z end\n\na start", 3L, 1L)))
  }

  test("minDocs threshold: 3-doc paragraph survives minDocs=4") {
    val rows = Seq(
      (1L, "shared"), (2L, "shared"), (3L, "shared"))
    assert(run(rows, minDocs = 4).forall(_._2 == "shared"))
    assert(run(rows, minDocs = 3).forall(_._2 == ""))
  }
}
