package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The written BM25 index: index-served retrieval must be
  * BIT-IDENTICAL to the full-scan [[CorpusStats.bm25TopK]] baseline
  * (same df/tf/dl/n_docs/avgdl, same term-score expression), the
  * postings scan must prune to the query terms' hash-bucket
  * partitions at planning, and the marker is authoritative.
  */
class LexIndexSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "spark shuffle exchange partitions"),
      (2L, "completely unrelated words here"),
      (3L, "spark shuffle tuning notes and more notes"),
      (4L, "nothing in common at all"),
      (5L, ""), // empty doc: counts toward n_docs/avgdl, no postings
      (6L, "spark spark spark shuffle")) // tf > 1
      .toDF("doc_id", "text")
  }

  private def queries = {
    val s = spark
    import s.implicits._
    Seq((100L, "spark shuffle"), (200L, "notes"),
      (300L, "zzz qqq")) // zero-hit query: no rows, not a crash
      .toDF("qid", "qtext")
  }

  test("index-served BM25 == full-scan bm25TopK, value for value " +
      "(df/avgdl/n_docs frozen at write are the same aggregates)") {
    val dir = java.nio.file.Files
      .createTempDirectory("lexidx").toString + "/idx"
    LexIndex.write(corpus, "doc_id", "text", dir, buckets = 8)
    val got = LexIndex.bm25ReadTopK(spark, dir, queries, "qid", "qtext",
      k = 5).orderBy("qid", "rank").collect().toSeq
    val want = CorpusStats.bm25TopK(corpus, "doc_id", "text", queries,
      "qid", "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    assert(got == want,
      s"index-served BM25 diverged from the scan:\n$got\nvs\n$want")
    // non-default k1/b are query-time knobs on the SAME stored facts
    val got2 = LexIndex.bm25ReadTopK(spark, dir, queries, "qid", "qtext",
      k = 5, k1 = 0.9, b = 0.4).orderBy("qid", "rank").collect().toSeq
    val want2 = CorpusStats.bm25TopK(corpus, "doc_id", "text", queries,
        "qid", "qtext", k = 5, k1 = 0.9, b = 0.4)
      .orderBy("qid", "rank").collect().toSeq
    assert(got2 == want2)
  }

  test("the postings scan prunes to the query terms' hash buckets at " +
      "planning; a one-term query reads one bucket") {
    val dir = java.nio.file.Files
      .createTempDirectory("lexidx-prune").toString + "/idx"
    LexIndex.write(corpus, "doc_id", "text", dir, buckets = 8)
    val s = spark
    import s.implicits._
    val one = Seq((1L, "notes")).toDF("qid", "qtext")
    val df = LexIndex.bm25ReadTopK(spark, dir, one, "qid", "qtext", k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("tb"),
      s"bucket pruning missing from the plan:\n$plan")
    // and the term literal pushes into the data filters too
    assert(plan.contains("notes"), s"term literal not pushed:\n$plan")
    assert(df.collect().map(_.getLong(2)).toSeq == Seq(3L))
  }

  test("marker discipline: reads refuse marker-less directories; " +
      "writes refuse to clobber foreign data; rebuild in place works") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("lexidx-marker").toString
    // marker-less directory with data: read refuses, write refuses
    val foreign = s"$root/foreign"
    corpus.write.parquet(foreign)
    val eRead = intercept[IllegalArgumentException] {
      LexIndex.bm25ReadTopK(spark, foreign, queries, "qid", "qtext")
    }
    assert(eRead.getMessage.contains("marker"))
    val eWrite = intercept[IllegalArgumentException] {
      LexIndex.write(corpus, "doc_id", "text", foreign)
    }
    assert(eWrite.getMessage.contains("refusing"))
    // a real index rebuilds in place (immutable-write contract)
    val dir = s"$root/idx"
    LexIndex.write(corpus.filter(col("doc_id") <= 3), "doc_id", "text",
      dir, buckets = 4)
    LexIndex.write(corpus, "doc_id", "text", dir, buckets = 8)
    val got = LexIndex.bm25ReadTopK(spark, dir, queries, "qid", "qtext",
      k = 5).orderBy("qid", "rank").collect().toSeq
    val want = CorpusStats.bm25TopK(corpus, "doc_id", "text", queries,
      "qid", "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    assert(got == want, "rebuild must serve the new corpus")
  }

  test("staleness: current-corpus doc count and avgdl drift against " +
      "the marker's frozen statistics, as percentages (r17)") {
    val dir = java.nio.file.Files
      .createTempDirectory("lexidx-stale").toString + "/idx"
    val v1 = corpus.filter(col("doc_id") <= 3)
    LexIndex.write(v1, "doc_id", "text", dir, buckets = 4)
    // same corpus: zero drift on both axes
    val same = LexIndex.staleness(v1, "text", dir)
    assert(same.nDocsFrozen == 3L && same.nDocsCurrent == 3L &&
      same.docDriftPct == 0.0 && same.avgdlDriftPct == 0.0, s"$same")
    // corpus doubled since the index froze: 100% doc drift, and the
    // avgdl moved (the grown half has different lengths)
    val grown = LexIndex.staleness(corpus, "text", dir)
    assert(grown.nDocsFrozen == 3L && grown.nDocsCurrent == 6L &&
      grown.docDriftPct == 100.0, s"$grown")
    assert(grown.avgdlDriftPct > 0.0, s"$grown")
    // not-an-index refuses loudly
    val e = intercept[IllegalArgumentException] {
      LexIndex.staleness(corpus, "text", dir + "-nope")
    }
    assert(e.getMessage.contains("marker"))
  }

  test("a rebuild interrupted between ParkSwap's renames never " +
      "destroys the last good index: readers serve the parked copy, " +
      "the next write entry repairs and rebuilds (VERDICT r16 #1)") {
    val root = java.nio.file.Files
      .createTempDirectory("lexidx-crash").toString
    val dir = s"$root/idx"
    val v1 = corpus.filter(col("doc_id") <= 3)
    LexIndex.write(v1, "doc_id", "text", dir, buckets = 4)
    val v1Want = LexIndex.bm25ReadTopK(spark, dir, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    // build the EXACT crash state a rebuild passes through between its
    // two renames: a complete replacement at .compact-tmp (a twin
    // build of the new corpus) and the live index parked
    val twin = s"$root/twin"
    LexIndex.write(corpus, "doc_id", "text", twin, buckets = 4)
    assert(new java.io.File(twin)
      .renameTo(new java.io.File(dir + ".compact-tmp")))
    assert(new java.io.File(dir)
      .renameTo(new java.io.File(dir + ".compact-old")))
    // mid-crash: the live path is gone, but the parked copy IS the
    // durable pre-rebuild index — reads resolve it (pre-fix code had
    // deleted the only index before the replacement was durable)
    val gotParked = LexIndex.bm25ReadTopK(spark, dir, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    assert(gotParked == v1Want,
      "mid-crash reads must serve the parked pre-rebuild index")
    // the next WRITE entry recovers (rolls the park back, clears the
    // stale tmp) and the rebuild completes normally
    LexIndex.write(corpus, "doc_id", "text", dir, buckets = 8)
    assert(!new java.io.File(dir + ".compact-tmp").exists())
    val got = LexIndex.bm25ReadTopK(spark, dir, queries, "qid", "qtext",
      k = 5).orderBy("qid", "rank").collect().toSeq
    val want = CorpusStats.bm25TopK(corpus, "doc_id", "text", queries,
      "qid", "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    assert(got == want, "post-recovery rebuild must serve the new corpus")
  }

  test("a reader racing a LIVE rebuild stalled between its renames " +
      "reads the parked copy; the swap completes and the parked copy " +
      "drops on the next write entry (the GramStore stall interleave)") {
    val root = java.nio.file.Files
      .createTempDirectory("lexidx-stall").toString
    val dir = s"$root/idx"
    val v1 = corpus.filter(col("doc_id") <= 3)
    LexIndex.write(v1, "doc_id", "text", dir, buckets = 4)
    val v1Want = LexIndex.bm25ReadTopK(spark, dir, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    ParkSwap.midSwapStall = () => Thread.sleep(4000)
    val rebuild = new Thread(() =>
      LexIndex.write(corpus, "doc_id", "text", dir, buckets = 8))
    val gotMidSwap = try {
      rebuild.start()
      // wait until the rebuild enters its swap (live dir parked)
      var spins = 0
      while (new java.io.File(dir).exists() && spins < 3000) {
        Thread.sleep(10); spins += 1
      }
      assert(!new java.io.File(dir).exists(), "never entered the swap")
      // the reader's retry expires inside the stall → parked copy;
      // pre-fix code had no parked copy to fall back to
      LexIndex.bm25ReadTopK(spark, dir, queries, "qid", "qtext", k = 5)
        .orderBy("qid", "rank").collect().toSeq
    } finally {
      rebuild.join()
      ParkSwap.midSwapStall = () => ()
    }
    assert(gotMidSwap == v1Want,
      "mid-swap reads must serve the pre-rebuild index, not fail")
    // the parked copy survives the swap (deferred drop) …
    assert(new java.io.File(dir + ".compact-old").exists(),
      "swap must defer the parked-copy drop to the next writer entry")
    // … fresh reads serve the new index …
    val got = LexIndex.bm25ReadTopK(spark, dir, queries, "qid", "qtext",
      k = 5).orderBy("qid", "rank").collect().toSeq
    val want = CorpusStats.bm25TopK(corpus, "doc_id", "text", queries,
      "qid", "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    assert(got == want)
    // … and the next write entry clears the superseded v1 copy before
    // its own swap parks the v2 index there (every in-place rebuild
    // leaves the PREVIOUS index parked until the next entry — the
    // deferred-drop contract, so the window is one rebuild cadence)
    LexIndex.write(corpus, "doc_id", "text", dir, buckets = 16)
    val parkedMarker = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir + ".compact-old/_graft_bm25.json")),
      "UTF-8")
    assert(parkedMarker.contains("\"buckets\":8"),
      s"the parked copy must be the superseding rebuild's predecessor " +
        s"(v2, buckets=8), not the stale v1: $parkedMarker")
  }
}
