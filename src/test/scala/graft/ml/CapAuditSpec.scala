package graft.ml

import graft.SparkSpec
import graft.pipeline.MetricsRegistry
import org.apache.spark.sql.functions._

/** The bucket-cap exemption audit (VERDICT r14 item 3): oversized-bucket
  * drops are the banded-LSH family's silent recall-loss mechanism under
  * saturation or skew, so every capped operator must COUNT what it
  * exempts. Accumulator-backed (plan-shape-independent — a
  * `Dataset.observe` under the band self-join is cloned by relation
  * dedup and silently reports nothing, measured on Spark 4.1), summed
  * into the engine's one metrics snapshot; values are readable
  * synchronously after the action.
  */
class CapAuditSpec extends SparkSpec {

  test("minhashPairs: a contrived pile-up fires the exemption counter; " +
      "a clean corpus keeps it zero") {
    val s = spark
    import s.implicits._
    CapAudit.reset()
    try {
      // 30 identical documents: one signature, so every band has ONE
      // bucket of 30 rows — far over a cap of 10. All pairs are
      // exempted away (the documented cap contract) and the audit must
      // say so.
      val dup = (1L to 30L).map(i => (i, "the same text appears here again"))
        .toDF("doc_id", "text")
      val pairs = Dedup.minhashPairs(dup, "doc_id", "text",
        bands = 4, rowsPerBand = 3, maxBucketSize = 10)
      assert(pairs.count() == 0L, "capped pile-up must yield no pairs")
      val snap = CapAudit.snapshot()
      val buckets = snap.getOrElse(("exempted_buckets", "cap_minhash_pairs"), 0L)
      val rows = snap.getOrElse(("exempted_rows", "cap_minhash_pairs"), 0L)
      // 4 bands × one oversized bucket of 30 rows. At-least-once
      // accumulator semantics: the branch executes once per broadcast
      // build, so a multiple of the true count means the plan executed
      // the branch that many times — ≥ is the audit contract (fires,
      // right order of magnitude), exactness is not.
      assert(buckets >= 4L && buckets % 4L == 0L,
        s"exempted_buckets = $buckets")
      assert(rows >= 120L && rows % 120L == 0L, s"exempted_rows = $rows")

      // distinct documents under the cap: zero exemptions — no phantom
      // counts from the clean path
      CapAudit.reset()
      val clean = (1L to 20L)
        .map(i => (i, s"document number $i talks about topic $i only"))
        .toDF("doc_id", "text")
      Dedup.minhashPairs(clean, "doc_id", "text",
        bands = 4, rowsPerBand = 3, maxBucketSize = 4096).count()
      assert(CapAudit.snapshot()
        .getOrElse(("exempted_rows", "cap_minhash_pairs"), 0L) == 0L)
    } finally CapAudit.reset()
  }

  test("cosineNearDupPairs: saturation-style pile-up is audited (the " +
      "embedding family, where the silent drop costs recall)") {
    val s = spark
    import s.implicits._
    CapAudit.reset()
    try {
      // 25 copies of one direction: every band maps them to a single
      // bucket; cap 8 exempts all of them in all 3 bands
      val emb = (1L to 25L).map(i => (i, Seq(1.0, 0.0, 0.0, 0.0)))
        .toDF("vec_id", "embedding")
      val planes = Similarity.rademacherBandPlanes(3, 2, 4)
      val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        planes, threshold = 0.9, maxBucketSize = 8)
      assert(pairs.count() == 0L)
      val snap = CapAudit.snapshot()
      val buckets = snap.getOrElse(("exempted_buckets", "cap_cosine_pairs"), 0L)
      val rows = snap.getOrElse(("exempted_rows", "cap_cosine_pairs"), 0L)
      assert(buckets >= 3L && buckets % 3L == 0L,
        s"exempted_buckets = $buckets")
      assert(rows >= 75L && rows % 75L == 0L, s"exempted_rows = $rows")
    } finally CapAudit.reset()
  }

  test("exemptions surface on the engine metrics snapshot and the " +
      "prometheus text under stage=cap_<op>") {
    val s = spark
    import s.implicits._
    MetricsRegistry.reset() // clears CapAudit too
    try {
      val dup = (1L to 30L).map(i => (i, "the same text appears here again"))
        .toDF("doc_id", "text")
      Dedup.minhashPairs(dup, "doc_id", "text",
        bands = 4, rowsPerBand = 3, maxBucketSize = 10).count()
      val snap = MetricsRegistry.snapshot()
      assert(snap.getOrElse(("exempted_buckets", "cap_minhash_pairs"), 0L) > 0L)
      val text = MetricsRegistry.prometheusText()
      assert(text.contains("""graft_exempted_buckets_total{stage="cap_minhash_pairs"}"""),
        text)
      assert(text.contains("""graft_exempted_rows_total{stage="cap_minhash_pairs"}"""),
        text)
    } finally MetricsRegistry.reset()
  }
}
