package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The growing BM25 postings store: ingest-served retrieval must match
  * the full-scan [[CorpusStats.bm25TopK]] baseline over exactly the
  * committed batches (the structural no-staleness contract), appends
  * must be idempotent per batch id across the fold, the read must
  * prune to the query terms' hash buckets at planning, and layout
  * mismatches must refuse loudly.
  */
class LexIngestSpec extends SparkSpec {

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

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/store"

  private def ingestAll(store: String, batches: Int = 3): Unit = {
    LexIngest.create(spark, store, buckets = 8)
    for (b <- 0 until batches)
      assert(LexIngest.append(
        corpus.filter(pmod(col("doc_id"), lit(batches)) === b),
        "doc_id", "text", store, s"b$b"))
  }

  test("ingest-served BM25 == full-scan bm25TopK over the committed " +
      "batches, value for value — incl. non-default k1/b") {
    val store = fresh("lexing")
    ingestAll(store)
    val got = LexIndex.bm25ReadTopK(spark, store, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    val want = CorpusStats.bm25TopK(corpus, "doc_id", "text", queries,
      "qid", "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    assert(got == want,
      s"ingest-served BM25 diverged from the scan:\n$got\nvs\n$want")
    val got2 = LexIndex.bm25ReadTopK(spark, store, queries, "qid",
        "qtext", k = 5, k1 = 0.9, b = 0.4)
      .orderBy("qid", "rank").collect().toSeq
    val want2 = CorpusStats.bm25TopK(corpus, "doc_id", "text", queries,
        "qid", "qtext", k = 5, k1 = 0.9, b = 0.4)
      .orderBy("qid", "rank").collect().toSeq
    assert(got2 == want2)
  }

  test("growth is visible at the NEXT read — no frozen statistic, no " +
      "blind fraction (the structural staleness fix)") {
    val store = fresh("lexing-grow")
    LexIngest.create(spark, store, buckets = 8)
    val v1 = corpus.filter(col("doc_id") <= 3)
    assert(LexIngest.append(v1, "doc_id", "text", store, "b1"))
    val r1 = LexIndex.bm25ReadTopK(spark, store, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    val w1 = CorpusStats.bm25TopK(v1, "doc_id", "text", queries,
      "qid", "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    assert(r1 == w1, "v1 reads must serve exactly the committed batch")
    // a frozen index would not see doc 6 (tf-heavy `spark`) until a
    // re-index; the store serves it on the very next read
    assert(LexIngest.append(corpus.filter(col("doc_id") > 3),
      "doc_id", "text", store, "b2"))
    val r2 = LexIndex.bm25ReadTopK(spark, store, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    val w2 = CorpusStats.bm25TopK(corpus, "doc_id", "text", queries,
      "qid", "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    assert(r2 == w2, "post-append reads must serve the grown corpus")
    assert(r2 != r1, "doc 6 must re-rank the spark/shuffle query")
    // staleness on a live store reads ~0 — its "frozen" side is the
    // committed total
    val st = LexIndex.staleness(corpus, "text", store)
    assert(st.nDocsFrozen == 6L && st.docDriftPct == 0.0 &&
      st.avgdlDriftPct == 0.0, s"$st")
  }

  test("appends are idempotent per batch id; the fold preserves " +
      "results, resets the pending count, and keeps folded replays " +
      "as no-ops (the marker ledger)") {
    val store = fresh("lexing-fold")
    ingestAll(store)
    val before = LexIndex.bm25ReadTopK(spark, store, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    // replay pre-fold: directory probe no-op
    assert(!LexIngest.append(
      corpus.filter(pmod(col("doc_id"), lit(3)) === 1),
      "doc_id", "text", store, "b1"))
    assert(LexIngest.pendingBatchCount(spark, store) == 3)
    val (filesBefore, filesAfter) = LexIngest.compact(spark, store)
    assert(filesAfter < filesBefore,
      s"fold must shrink files: $filesBefore -> $filesAfter")
    assert(LexIngest.pendingBatchCount(spark, store) == 0)
    val after = LexIndex.bm25ReadTopK(spark, store, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    assert(after == before, "the fold is a pure re-layout")
    // replay post-fold: the bid directory is gone, the ledger remembers
    assert(!LexIngest.append(
      corpus.filter(pmod(col("doc_id"), lit(3)) === 1),
      "doc_id", "text", store, "b1"))
    val again = LexIndex.bm25ReadTopK(spark, store, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    assert(again == before, "a folded replay must not re-ingest")
    // the store keeps growing after the fold
    val s = spark
    import s.implicits._
    assert(LexIngest.append(
      Seq((7L, "spark notes again")).toDF("doc_id", "text"),
      "doc_id", "text", store, "b9"))
    val grown = LexIndex.bm25ReadTopK(spark, store, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    val wantGrown = CorpusStats.bm25TopK(
        corpus.union(Seq((7L, "spark notes again")).toDF("doc_id", "text")),
        "doc_id", "text", queries, "qid", "qtext", k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(grown == wantGrown)
  }

  test("the postings read prunes to the query terms' hash buckets at " +
      "planning across every batch partition") {
    val store = fresh("lexing-prune")
    ingestAll(store)
    val s = spark
    import s.implicits._
    val one = Seq((1L, "notes")).toDF("qid", "qtext")
    val df = LexIndex.bm25ReadTopK(spark, store, one, "qid", "qtext",
      k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("tb"),
      s"bucket pruning missing from the plan:\n$plan")
    assert(plan.contains("notes"), s"term literal not pushed:\n$plan")
    assert(df.collect().map(_.getLong(2)).toSeq == Seq(3L))
  }

  test("refusals: empty store read, append without create, layout " +
      "mixing both ways, geometry mismatch, foreign data") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("lexing-refuse").toString
    // created-but-empty store: read refuses (nothing committed)
    val empty = s"$root/empty"
    LexIngest.create(spark, empty, buckets = 4)
    val eEmpty = intercept[IllegalArgumentException] {
      LexIndex.bm25ReadTopK(spark, empty, queries, "qid", "qtext")
    }
    assert(eEmpty.getMessage.contains("no committed"))
    // append before create refuses
    val eNoCreate = intercept[IllegalArgumentException] {
      LexIngest.append(corpus, "doc_id", "text", s"$root/none", "b1")
    }
    assert(eNoCreate.getMessage.contains("create"))
    // appending into a FROZEN index refuses; frozen write over an
    // ingest store refuses (both directions of layout mixing)
    val frozen = s"$root/frozen"
    LexIndex.write(corpus, "doc_id", "text", frozen, buckets = 4)
    val eFrozen = intercept[IllegalArgumentException] {
      LexIngest.append(corpus, "doc_id", "text", frozen, "b1")
    }
    assert(eFrozen.getMessage.contains("frozen"))
    val eOver = intercept[IllegalArgumentException] {
      LexIndex.write(corpus, "doc_id", "text", empty, buckets = 4)
    }
    assert(eOver.getMessage.contains("ingestable"))
    // create-on-existing with different geometry refuses; matching
    // geometry is an idempotent no-op
    val eGeom = intercept[IllegalArgumentException] {
      LexIngest.create(spark, empty, buckets = 8)
    }
    assert(eGeom.getMessage.contains("DIFFERENT"))
    LexIngest.create(spark, empty, buckets = 4)
    // marker-less directory holding data: refuse to adopt
    val foreign = s"$root/foreign"
    corpus.write.parquet(foreign)
    val eForeign = intercept[IllegalArgumentException] {
      LexIngest.create(spark, foreign, buckets = 4)
    }
    assert(eForeign.getMessage.contains("refusing"))
    // compact on a frozen index refuses
    val eCompact = intercept[IllegalArgumentException] {
      LexIngest.compact(spark, frozen)
    }
    assert(eCompact.getMessage.contains("nothing to fold"))
  }

  test("an all-empty-text batch commits (its docs count toward " +
      "n_docs/avgdl) and an all-empty store refuses reads loudly") {
    val s = spark
    import s.implicits._
    val store = fresh("lexing-empty")
    LexIngest.create(spark, store, buckets = 4)
    assert(LexIngest.append(Seq((1L, ""), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text", store, "b1"))
    val (n, dl) = LexIngest.storeStats(spark, store)
    assert(n == 2L && dl == 0.0, s"($n, $dl)")
    val e = intercept[IllegalArgumentException] {
      LexIndex.bm25ReadTopK(spark, store, queries, "qid", "qtext")
    }
    assert(e.getMessage.contains("zero postings"))
    // words arriving later make the store readable, with the empty
    // docs still in n_docs (exactly the full-scan semantics)
    assert(LexIngest.append(Seq((3L, "spark notes"))
      .toDF("doc_id", "text"), "doc_id", "text", store, "b2"))
    val got = LexIndex.bm25ReadTopK(spark, store, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    val want = CorpusStats.bm25TopK(
        Seq((1L, ""), (2L, ""), (3L, "spark notes")).toDF("doc_id", "text"),
        "doc_id", "text", queries, "qid", "qtext", k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(got == want)
  }

  test("migrate: a frozen index adopts into a fresh store without " +
      "re-tokenizing — identical reads, then growth resumes") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("lexing-migrate").toString
    val frozen = s"$root/frozen"
    LexIndex.write(corpus, "doc_id", "text", frozen, buckets = 8)
    val store = s"$root/store"
    LexIngest.migrate(spark, frozen, store)
    // the migrated store serves the frozen index's exact results
    // (n_docs carried exactly; avgdl survives the product/sum
    // round-trip at the 6-dp rounding)
    val got = LexIndex.bm25ReadTopK(spark, store, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    val want = LexIndex.bm25ReadTopK(spark, frozen, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    assert(got == want,
      s"migrated store diverged from the frozen index:\n$got\nvs\n$want")
    // …and the reason to migrate: the corpus keeps growing from here
    assert(LexIngest.append(Seq((7L, "spark notes appended later"))
      .toDF("doc_id", "text"), "doc_id", "text", store, "b2"))
    val grown = LexIndex.bm25ReadTopK(spark, store, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    val wantGrown = CorpusStats.bm25TopK(
        corpus.union(Seq((7L, "spark notes appended later"))
          .toDF("doc_id", "text")),
        "doc_id", "text", queries, "qid", "qtext", k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(grown == wantGrown, "post-migration growth must serve")
    // empty docs carried through the marker stats: doc 5 has no
    // postings but still counts in n_docs
    assert(LexIngest.storeStats(spark, store)._1 == 7L)
    // refusals: a non-empty target; migrating an ingestable store
    val eTgt = intercept[IllegalArgumentException] {
      LexIngest.migrate(spark, frozen, store)
    }
    assert(eTgt.getMessage.contains("FRESH"))
    val eSrc = intercept[IllegalArgumentException] {
      LexIngest.migrate(spark, store, s"$root/other")
    }
    assert(eSrc.getMessage.contains("already an ingestable"))
  }

  test("a fold interrupted between ParkSwap's renames: readers " +
      "resolve the parked copy, the next writer entry rolls back " +
      "and proceeds (the IvfIngest interleave)") {
    val store = fresh("lexing-crash")
    ingestAll(store)
    val want = LexIndex.bm25ReadTopK(spark, store, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    // simulate the crash window: live dir parked, junk tmp never moved
    assert(new java.io.File(store)
      .renameTo(new java.io.File(store + ".compact-old")))
    val tmp = new java.io.File(store + ".compact-tmp")
    tmp.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(tmp, "junk").toPath, Array[Byte](9))
    // a reader in this state mutates nothing and reads the parked copy
    val mid = LexIndex.bm25ReadTopK(spark, store, queries, "qid",
      "qtext", k = 5).orderBy("qid", "rank").collect().toSeq
    assert(mid == want, "mid-crash reads must serve the parked copy")
    assert(new java.io.File(store + ".compact-old").exists(),
      "a reader must never repair the swap")
    // the next writer entry rolls back and the append commits
    val s = spark
    import s.implicits._
    assert(LexIngest.append(Seq((7L, "late words"))
      .toDF("doc_id", "text"), "doc_id", "text", store, "b9"))
    assert(!new java.io.File(store + ".compact-old").exists())
    assert(!tmp.exists())
    assert(LexIngest.pendingBatchCount(spark, store) == 4)
  }
}
