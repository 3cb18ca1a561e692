package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental-ingestion dedup against a reference corpus: exact
  * drop-if-known, near-dup LSH+verify against the reference only (no
  * incoming self-pairs), under-shingle rows kept, plan sanity.
  */
class DedupAgainstSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different reference content here"),
      (3L, "the quick brown fox jumps over the lazy cat today")
    ).toDF("doc_id", "text")
  }

  private def incoming = {
    val s = spark
    import s.implicits._
    Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (11L, "the quick brown fox jumps over the lazy dog today now"), // near 1
      (12L, "entirely novel incoming text about engines"),
      (13L, "entirely novel incoming text about engines"), // dup WITHIN batch: kept (cross-corpus op)
      (14L, "xy") // under shingle size
    ).toDF("doc_id", "text")
  }

  test("dedupAgainstExact drops known texts, keeps batch-internal dups") {
    val kept = Dedup.dedupAgainstExact(incoming, corpus, "text")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(11L, 12L, 13L, 14L))
    assert(kept.columns.toSeq == incoming.columns.toSeq)
  }

  test("nearDupAgainst drops near-matches of the reference only") {
    val kept = Dedup.nearDupAgainst(incoming, corpus, "doc_id", "text",
      threshold = 0.4)
    // 10 exact-matches 1; 11 near-matches 1; 12/13 novel (their mutual
    // duplication is NOT against the reference); 14 has no shingles
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(12L, 13L, 14L))
  }

  test("empty reference keeps everything") {
    val kept = Dedup.nearDupAgainst(incoming, corpus.limit(0), "doc_id",
      "text", threshold = 0.4)
    assert(kept.count() == incoming.count())
  }

  test("cosineNearDupAgainst drops embedding near-matches of the reference only") {
    val s = spark
    import s.implicits._
    val planes = Similarity.rademacherBandPlanes(4, 4, 3)
    val ref = Seq(
      (1L, Seq(1.0, 1.0, 1.0)),
      (2L, Seq(-1.0, 2.0, -5.0))).toDF("vec_id", "embedding")
    val inc = Seq(
      (10L, Seq(1.0, 1.0, 1.01)),   // ~ref 1 → dropped
      (11L, Seq(-1.0, -1.0, -1.0)), // antipodal to ref 1: bands may
                                    // differ, cosine -1 never verifies
      (12L, Seq(5.0, -3.0, 0.5)),   // novel direction
      (13L, Seq(5.0, -3.0, 0.5))    // dup WITHIN batch: kept (cross-corpus op)
    ).toDF("vec_id", "embedding")
    val kept = Similarity.cosineNearDupAgainst(inc, ref, "vec_id",
        "embedding", planes, threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(11L, 12L, 13L), s"got $kept")
    // empty reference keeps everything
    val all = Similarity.cosineNearDupAgainst(inc, ref.limit(0), "vec_id",
      "embedding", planes, threshold = 0.9)
    assert(all.count() == 4)
  }
}
