package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental gram-count store: batch counts must SUM exactly to
  * one-shot counts (the bit-identical-scores guarantee), appends are
  * idempotent per batch id, the orders marker refuses mixed shapes,
  * and compaction is a pure rewrite.
  */
class GramStoreSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "a cat and a dog"),
      (4L, "the cat sat"),
      (5L, "entirely novel words here")
    ).toDF("doc_id", "text")
  }

  private def freshStore(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"gram-$tag").toString
    s"$d/store"
  }

  private def countMap(store: String): Map[(Int, String), Long] =
    GramStore.counts(spark, store)
      .select("kind", "g", "c").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap

  test("two-batch append merges to the exact one-shot counts") {
    val store = freshStore("merge")
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", store, "b1")
    GramStore.append(docs.filter(col("doc_id") > 2), "text", store, "b2")
    val oneShot = CorpusStats.fusedGramCountsN(docs, "text", 2)
      .select("kind", "g", "c").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(countMap(store) == oneShot)
    assert(GramStore.orders(spark, store) == 2)
  }

  test("re-appending a batch id is a no-op (replay safety)") {
    val store = freshStore("idem")
    GramStore.append(docs, "text", store, "b1")
    val before = countMap(store)
    GramStore.append(docs, "text", store, "b1") // replay
    assert(countMap(store) == before, "replay double-counted")
    GramStore.append(docs.limit(1), "text", store, "b1") // even different data
    assert(countMap(store) == before)
    intercept[IllegalArgumentException](
      GramStore.append(docs, "text", store, ""))
    intercept[IllegalArgumentException](
      GramStore.append(docs, "text", store, "__compact"))
  }

  test("the orders marker refuses mixed shapes and raw directories") {
    val store = freshStore("orders")
    GramStore.append(docs, "text", store, "b1", orders = 2)
    val e = intercept[IllegalArgumentException] {
      GramStore.append(docs, "text", store, "b2", orders = 3)
    }
    assert(e.getMessage.contains("pinned to orders=2"), e.getMessage)
    // a trigram scorer over an orders-2 store is refused up front
    val e2 = intercept[IllegalArgumentException] {
      CorpusStats.trigramStupidBackoffFromStore(docs, store,
        "doc_id", "text")
    }
    assert(e2.getMessage.contains("orders >= 3"), e2.getMessage)
    // a raw parquet directory is not a store
    val raw = freshStore("raw")
    docs.write.parquet(raw)
    val e3 = intercept[IllegalArgumentException] {
      CorpusStats.bigramLogProbFromStore(docs, raw, "doc_id", "text")
    }
    assert(e3.getMessage.contains("_graft_grams.json"), e3.getMessage)
  }

  test("store-trained scores are row-identical to corpus-trained ones") {
    val train = docs.filter(col("doc_id") <= 3)
    val corpus = docs.filter(col("doc_id") > 3)
    val store = freshStore("score")
    GramStore.append(train.filter(col("doc_id") % 2 === 1), "text", store, "odd")
    GramStore.append(train.filter(col("doc_id") % 2 === 0), "text", store, "even")
    val direct = CorpusStats.bigramLogProbAgainst(corpus, train,
      "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq)
    graft.CacheSweep.sweep(spark)
    val fromStore = CorpusStats.bigramLogProbFromStore(corpus, store,
      "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq)
    graft.CacheSweep.sweep(spark)
    assert(direct.sameElements(fromStore))
    // trigram: same equality over an orders-3 store
    val store3 = freshStore("score3")
    GramStore.append(train, "text", store3, "all", orders = 3)
    val d3 = CorpusStats.trigramStupidBackoff(corpus, train,
      "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq)
    graft.CacheSweep.sweep(spark)
    val s3 = CorpusStats.trigramStupidBackoffFromStore(corpus, store3,
      "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq)
    graft.CacheSweep.sweep(spark)
    assert(d3.sameElements(s3))
  }

  test("compact folds per-batch rows; counts, marker, appends survive") {
    val store = freshStore("compact")
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", store, "b1")
    GramStore.append(docs.filter(col("doc_id") > 2), "text", store, "b2")
    val before = countMap(store)
    // a stale parked copy from a crashed previous compaction
    docs.limit(1).select(lit(0).as("kind"), col("text").as("g"),
        lit(9L).as("c"), lit("x").as("bid"))
      .write.parquet(store + ".compact-old")
    val (rowsBefore, rowsAfter) = GramStore.compact(spark, store)
    assert(rowsAfter < rowsBefore, s"$rowsBefore -> $rowsAfter")
    assert(countMap(store) == before, "compaction changed the counts")
    assert(GramStore.orders(spark, store) == 2, "marker lost in the swap")
    // r16: the parked pre-fold copy SURVIVES the swap (a reader that
    // fell through to it during a stalled swap may still be scanning);
    // the next writer entry drops it
    assert(new java.io.File(store + ".compact-old").exists())
    assert(!new java.io.File(store + ".compact-tmp").exists())
    // the store keeps growing after compaction — and the YOUNG parked
    // copy survives the writer entry (r17 age gate: the next entry in
    // a self-folding stream is the next micro-batch, seconds away —
    // well inside a timed-out reader's scan of the parked copy)
    GramStore.append(docs.filter(col("doc_id") === 5), "text", store, "b3")
    assert(new java.io.File(store + ".compact-old").exists(),
      "a writer entry inside the grace window must keep the parked copy")
    val again = countMap(store)
    assert(again(0 -> "novel") == 1L + before.getOrElse(0 -> "novel", 0L))
    // …and drops once the park has aged past the grace window (a
    // replayed append is a writer entry too)
    ParkSwap.parkedGraceMs = 0L
    try GramStore.append(docs.filter(col("doc_id") === 5), "text",
      store, "b3")
    finally ParkSwap.parkedGraceMs = 60000L
    assert(!new java.io.File(store + ".compact-old").exists(),
      "an aged parked copy must drop at the next writer entry")
    assert(countMap(store) == again, "the no-op replay changed counts")
  }

  // ---- r14 durability: crash windows, pruning, ledger, park-swap ----

  test("crash windows: marker lands before data; staging garbage and " +
      "unmarked directories cannot double-count") {
    // the reference state: one clean two-batch store
    val clean = freshStore("crash-ref")
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", clean, "b1")
    GramStore.append(docs.filter(col("doc_id") > 2), "text", clean, "b2")
    val expect = countMap(clean)

    // window 1 (the r13 flaw, inverted): crash AFTER the marker write,
    // BEFORE the first batch's commit rename — the store is pinned but
    // empty, and the retry must append exactly once
    val s1 = freshStore("crash-1")
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", s1, "b1")
    // simulate the crash state: drop the committed partition, keep the
    // marker (this is exactly what a crash between marker and commit
    // leaves, since the marker is written first)
    val part1 = new java.io.File(s1, "bid=b1")
    assert(part1.exists(), "commit should be a bid= partition directory")
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    rmrf(part1)
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", s1, "b1")
    GramStore.append(docs.filter(col("doc_id") > 2), "text", s1, "b2")
    assert(countMap(s1) == expect, "retry after marker-only crash")

    // window 2: crash mid-staging — a half-written hidden staging dir
    // is invisible to reads and reclaimed by the retry
    val s2 = freshStore("crash-2")
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", s2, "b1")
    val stage = new java.io.File(s2, ".stage-b2")
    stage.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(stage, "junk.parquet").toPath, Array[Byte](1, 2))
    // the staging dir must be invisible to reads: counts equal b1 alone
    val b1Only = {
      val ref = freshStore("crash-2-ref")
      GramStore.append(docs.filter(col("doc_id") <= 2), "text", ref, "b1")
      countMap(ref)
    }
    assert(countMap(s2) == b1Only, "staging garbage leaked into a read")
    GramStore.append(docs.filter(col("doc_id") > 2), "text", s2, "b2")
    assert(countMap(s2) == expect, "retry after staging crash")
    assert(!stage.exists(), "staging garbage reclaimed")

    // a directory holding data but no marker is refused, not adopted
    val s3 = freshStore("crash-3")
    docs.limit(1).select(lit(0).as("kind"), col("text").as("g"),
      lit(9L).as("c")).write.parquet(s3)
    new java.io.File(s3, "_SUCCESS").delete() // keep only real data files
    val e = intercept[IllegalArgumentException] {
      GramStore.append(docs, "text", s3, "b1")
    }
    assert(e.getMessage.contains("no _graft_grams.json"), e.getMessage)
  }

  test("marker writes are atomic: a crash mid-write leaves only the " +
      "dot-temp, and the retry starts clean") {
    // r14 review finding: writeMeta used create+write in place — a
    // crash mid-write left a TRUNCATED marker that readMeta refuses
    // forever (store bricked until hand-repaired). With write-then-
    // rename, the worst crash state is a dot-prefixed temp next to no
    // marker, which a retry simply overwrites.
    val s = freshStore("marker-atomic")
    new java.io.File(s).mkdirs()
    // simulate the crash state: temp written (even truncated), rename
    // never happened
    java.nio.file.Files.write(
      new java.io.File(s, "._graft_grams.json.tmp").toPath,
      """{"orders":""".getBytes("UTF-8"))
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", s, "b1")
    GramStore.append(docs.filter(col("doc_id") > 2), "text", s, "b2")
    val clean = freshStore("marker-atomic-ref")
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", clean, "b1")
    GramStore.append(docs.filter(col("doc_id") > 2), "text", clean, "b2")
    assert(countMap(s) == countMap(clean),
      "retry after a marker-temp crash must count exactly once")
    // and a successful append leaves no temp behind
    assert(!new java.io.File(s, "._graft_grams.json.tmp").exists())
    assert(new java.io.File(s, "_graft_grams.json").exists())
  }

  test("seen-check is a directory probe; a bid filter prunes " +
      "partitions in-plan") {
    val store = freshStore("prune")
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", store, "b1")
    GramStore.append(docs.filter(col("doc_id") > 2), "text", store, "b2")
    // commits are per-bid partition directories (the O(1) probe target)
    assert(new java.io.File(store, "bid=b1").exists())
    assert(new java.io.File(store, "bid=b2").exists())
    // and a bid-filtered read prunes to ONE directory in the plan (the
    // IvfIndexSpec convention) — the store never pays a full scan for
    // a replay probe even when read relationally
    val probe = GramStore.storeDf(spark, store)
      .filter(col("bid") === "b1")
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("bid"), plan)
    // the partition column is STRING by explicit schema — no inference
    assert(probe.schema("bid").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(probe.select("bid").distinct().collect().map(_.getString(0))
      .toSeq == Seq("b1"))
  }

  test("numeric-lookalike and path-hostile bids stay distinct " +
      "(no inference collision, escaped directories)") {
    val store = freshStore("escape")
    // "1" vs "01": partition-type inference would read both as int 1
    // and the second append's seen-check would false-positive — the
    // explicit string schema keeps them distinct
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", store, "1")
    GramStore.append(docs.filter(col("doc_id") > 2), "text", store, "01")
    val expect = {
      val ref = freshStore("escape-ref")
      GramStore.append(docs.filter(col("doc_id") <= 2), "text", ref, "a")
      GramStore.append(docs.filter(col("doc_id") > 2), "text", ref, "b")
      countMap(ref)
    }
    assert(countMap(store) == expect)
    val before = countMap(store)
    GramStore.append(docs, "text", store, "1") // replay
    GramStore.append(docs, "text", store, "01") // replay
    assert(countMap(store) == before)
    // a bid full of path-hostile characters round-trips through the
    // escaped directory name
    val hostile = "run 2026/08:15 a=b#x%y"
    GramStore.append(docs.limit(1), "text", store, hostile)
    val withHostile = countMap(store)
    GramStore.append(docs.limit(1), "text", store, hostile) // replay
    assert(countMap(store) == withHostile)
    assert(GramStore.storeDf(spark, store).select("bid").distinct()
      .collect().map(_.getString(0)).toSet == Set("1", "01", hostile))
  }

  test("compaction ledger: a batch replayed after its partition was " +
      "folded still no-ops (including an empty batch)") {
    val store = freshStore("ledger")
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", store, "b1")
    GramStore.append(docs.limit(0), "text", store, "empty") // zero rows
    val before = countMap(store)
    GramStore.compact(spark, store)
    assert(countMap(store) == before, "compaction changed the counts")
    // folded ids recorded from the partition DIRECTORIES, so the
    // empty batch's commit survives the fold too
    assert(GramStore.foldedBids(spark, store) == Set("b1", "empty"))
    // the exact corruption ADVICE r13 flagged: replay a pre-compaction
    // batch — the ledger, not the (gone) partition, must catch it
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", store, "b1")
    GramStore.append(docs, "text", store, "empty")
    assert(countMap(store) == before, "post-compaction replay double-counted")
    // a second compaction folds the ledger forward
    GramStore.append(docs.filter(col("doc_id") > 2), "text", store, "b2")
    GramStore.compact(spark, store)
    assert(GramStore.foldedBids(spark, store) == Set("b1", "empty", "b2"))
    GramStore.append(docs, "text", store, "b2")
    val ref = freshStore("ledger-ref")
    GramStore.append(docs, "text", ref, "all")
    assert(countMap(store) == countMap(ref))
  }

  test("interrupted park-swap: a READER falls back to the parked copy " +
      "without repairing; the next WRITER entry rolls back") {
    val store = freshStore("swapcrash")
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", store, "b1")
    GramStore.append(docs.filter(col("doc_id") > 2), "text", store, "b2")
    val before = countMap(store)
    // simulate a crash between rename(dir -> old) and rename(tmp -> dir):
    // no live store directory, the parked copy intact, a half-built tmp
    assert(new java.io.File(store)
      .renameTo(new java.io.File(store + ".compact-old")))
    new java.io.File(store + ".compact-tmp").mkdirs()
    // VERDICT r14 #3: a reader must NOT repair — a rollback here could
    // be stealing a LIVE compactor's park target. It outwaits the retry
    // window, reads the complete parked copy, and mutates nothing.
    assert(countMap(store) == before, "reader lost the parked counts")
    assert(!new java.io.File(store).exists(),
      "reader mutated the store (rolled back) — writer-only repair")
    assert(new java.io.File(store + ".compact-old").exists())
    assert(new java.io.File(store + ".compact-tmp").exists())
    // ADVICE r13: before recovery existed, the next append saw
    // exists=false and silently started a FRESH store — the parked
    // copy rolls back on WRITER entry and everything continues
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", store, "b1")
    assert(new java.io.File(store).exists())
    assert(!new java.io.File(store + ".compact-old").exists())
    assert(!new java.io.File(store + ".compact-tmp").exists())
    assert(countMap(store) == before, "replay after rollback double-counted")
    // and a later compact still works
    val (b, a) = GramStore.compact(spark, store)
    assert(a <= b)
    assert(countMap(store) == before)
  }

  test("a reader interleaved between compact's two renames retries; " +
      "the compaction completes (VERDICT r14 #3)") {
    // Build the EXACT mid-swap state a compactor passes through: a
    // complete tmp (built by a real compact of an identical store) and
    // the live dir parked. A background 'compactor' finishes the swap
    // 300 ms later; the reader's counts() must retry into the swapped
    // store instead of rolling the park back and making the
    // compactor's second rename fail — the r14 reader-repair race.
    val store = freshStore("swaprace")
    val twin = freshStore("swaprace-twin")
    for (s <- Seq(store, twin)) {
      GramStore.append(docs.filter(col("doc_id") <= 2), "text", s, "b1")
      GramStore.append(docs.filter(col("doc_id") > 2), "text", s, "b2")
    }
    val before = countMap(store)
    GramStore.compact(spark, twin) // twin now holds the post-fold state
    assert(new java.io.File(twin)
      .renameTo(new java.io.File(store + ".compact-tmp")))
    assert(new java.io.File(store)
      .renameTo(new java.io.File(store + ".compact-old")))
    // mid-swap. The 'compactor' completes after the reader has entered
    // its retry loop.
    @volatile var swapOk = false
    val compactor = new Thread(() => {
      Thread.sleep(300)
      val a = new java.io.File(store + ".compact-tmp")
        .renameTo(new java.io.File(store))
      val b = { // compact's final cleanup
        val old = new java.io.File(store + ".compact-old")
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(old); !old.exists()
      }
      swapOk = a && b
    })
    compactor.start()
    val read = countMap(store) // enters the retry window mid-swap
    compactor.join()
    assert(swapOk, "reader aborted the live compaction (park stolen " +
      "or tmp consumed) — the r14 reader-repair race")
    assert(read == before, "reader saw wrong counts across the swap")
    assert(GramStore.foldedBids(spark, store) == Set("b1", "b2"))
    assert(countMap(store) == before)
  }

  test("a compactor stalled >2 s between its renames: a reader that " +
      "fell through to the parked copy can still READ it after the " +
      "swap completes; the NEXT writer entry drops it (VERDICT r15 #2)") {
    val store = freshStore("swapstall")
    val twin = freshStore("swapstall-twin")
    for (s <- Seq(store, twin)) {
      GramStore.append(docs.filter(col("doc_id") <= 2), "text", s, "b1")
      GramStore.append(docs.filter(col("doc_id") > 2), "text", s, "b2")
    }
    val before = countMap(store)
    GramStore.compact(spark, twin) // stands in for the compactor's tmp
    assert(new java.io.File(twin)
      .renameTo(new java.io.File(store + ".compact-tmp")))
    val f = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the LIVE compactor stalls 4 s between its two renames (GC pause
    // / slow FS) — longer than the reader's 2 s retry window
    ParkSwap.midSwapStall = () => Thread.sleep(4000)
    val compactor = new Thread(() => ParkSwap.swap(f, store))
    val resolved = try {
      compactor.start()
      // reader arrives mid-swap: first rename done, live dir missing
      var spins = 0
      while (new java.io.File(store).exists() && spins < 1000) {
        Thread.sleep(10); spins += 1
      }
      assert(!new java.io.File(store).exists(), "never entered the swap")
      // the reader's 2 s retry expires INSIDE the stall and it
      // resolves to the parked copy — holding that path while it scans
      val r = ParkSwap.readerDir(f, store)
      compactor.join()
      r
    } finally ParkSwap.midSwapStall = () => ()
    assert(resolved == store + ".compact-old",
      "the stalled-swap fallback must resolve the parked copy")
    // the compactor completed its swap while the reader still holds
    // the parked path — pre-r16, swap deleted it out from under them
    assert(new java.io.File(store + ".compact-old").exists(),
      "swap must defer the parked-copy drop to the next writer entry")
    val parkedSum = spark.read.parquet(resolved)
      .agg(sum(col("c"))).head().getLong(0)
    val liveSum = spark.read.parquet(store)
      .agg(sum(col("c"))).head().getLong(0)
    assert(parkedSum == liveSum,
      "parked pre-fold counts must sum to the folded store's")
    // fresh readers resolve the live folded store
    assert(ParkSwap.readerDir(f, store) == store)
    assert(countMap(store) == before)
    // a writer entry inside the grace window KEEPS the parked copy
    // (r17 age gate — this reader's scan may still be running); an
    // entry past the grace drops it
    GramStore.append(docs.filter(col("doc_id") === 5), "text", store, "b3")
    assert(new java.io.File(store + ".compact-old").exists(),
      "the grace window must outlive the next writer entry")
    ParkSwap.parkedGraceMs = 0L
    try GramStore.append(docs.filter(col("doc_id") === 5), "text",
      store, "b3")
    finally ParkSwap.parkedGraceMs = 60000L
    assert(!new java.io.File(store + ".compact-old").exists())
    assert(countMap(store)(0 -> "novel") == before(0 -> "novel") + 1L)
  }

  test("legacy (bid-as-column) stores migrate in place, preserving " +
      "per-batch idempotence") {
    val store = freshStore("legacy")
    // fabricate a pre-r14 store: un-partitioned rows with bid as a
    // data column, and a marker that pins only the orders
    CorpusStats.fusedGramCountsN(docs.filter(col("doc_id") <= 2), "text", 2)
      .select(col("kind"), col("g"), col("c"))
      .withColumn("bid", lit("old1"))
      .write.parquet(store)
    java.nio.file.Files.write(
      new java.io.File(store, "_graft_grams.json").toPath,
      """{"orders":2}""".getBytes("UTF-8"))
    assert(GramStore.orders(spark, store) == 2)
    // reading works pre-migration
    assert(countMap(store).nonEmpty)
    // the next append migrates to the partitioned layout
    GramStore.append(docs.filter(col("doc_id") > 2), "text", store, "b2")
    assert(new java.io.File(store, "bid=old1").exists(), "not migrated")
    assert(new java.io.File(store, "bid=b2").exists())
    val ref = freshStore("legacy-ref")
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", ref, "x")
    GramStore.append(docs.filter(col("doc_id") > 2), "text", ref, "y")
    assert(countMap(store) == countMap(ref))
    // the legacy batch's idempotence survives the migration
    GramStore.append(docs, "text", store, "old1")
    assert(countMap(store) == countMap(ref), "legacy bid replayed as new")
  }

  test("perplexity_score model: trigram — YAML wiring, store training, " +
      "knob hygiene") {
    def run(yaml: String, in: org.apache.spark.sql.DataFrame =
        docs) = graft.pipeline.PipelineCompiler.compile(
      graft.pipeline.RuleLoader.fromYaml(yaml))(in).main
    val store3 = freshStore("yaml3")
    GramStore.append(docs, "text", store3, "all", orders = 3)
    // store-trained trigram through the stage == the operator directly
    val scored = run(
      s"""pipeline:
         |  - type: perplexity_score
         |    id_field: doc_id
         |    text_field: text
         |    model: trigram
         |    train: {store: "$store3"}
         |""".stripMargin)
    assert(scored.columns.contains("lm_n_trigrams") &&
      scored.columns.contains("lm_logprob"))
    val expect = CorpusStats.trigramStupidBackoff(docs, docs,
      "doc_id", "text")
    assert(scored.select("doc_id", "lm_n_trigrams", "lm_logprob")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      expect.orderBy("doc_id").collect().map(_.toSeq).toSeq)
    graft.CacheSweep.sweep(spark)
    // the quantile gate composes on the trigram score unchanged
    val gated = run(
      s"""pipeline:
         |  - type: perplexity_score
         |    id_field: doc_id
         |    text_field: text
         |    model: trigram
         |    alpha: 0.4
         |    train: {store: "$store3"}
         |    min_logprob_quantile: 0.5
         |""".stripMargin)
    assert(gated.count() < docs.count() && gated.count() > 0)
    graft.CacheSweep.sweep(spark)
    // a smoothing knob for the OTHER model is refused, not ignored
    val e1 = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: perplexity_score\n    id_field: doc_id\n" +
        "    text_field: text\n    model: trigram\n    lambda: 0.9\n")
    }
    assert(e1.getMessage.contains("alpha"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: perplexity_score\n    id_field: doc_id\n" +
        "    text_field: text\n    alpha: 0.4\n")
    }
    assert(e2.getMessage.contains("lambda"), e2.getMessage)
    // a trigram scorer over an orders-2 store is refused up front
    val store2 = freshStore("yaml2")
    GramStore.append(docs, "text", store2, "all", orders = 2)
    val e3 = intercept[IllegalArgumentException] {
      run(s"pipeline:\n  - type: perplexity_score\n    id_field: doc_id\n" +
        s"    text_field: text\n    model: trigram\n" +
        s"    train: {store: \"$store2\"}\n")
    }
    assert(e3.getMessage.contains("orders >= 3"), e3.getMessage)
    // unknown model name: loud
    val e4 = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: perplexity_score\n    id_field: doc_id\n" +
        "    text_field: text\n    model: fourgram\n")
    }
    assert(e4.getMessage.contains("bigram | trigram"), e4.getMessage)
  }

  test("stats_ingest stage: explicit batch_id in batch mode, " +
      "pass-through rows, store feeds perplexity_score") {
    val s = spark
    val store = freshStore("stage")
    def run(yaml: String) = graft.pipeline.PipelineCompiler.compile(
      graft.pipeline.RuleLoader.fromYaml(yaml))(docs).main
    // no batch_id in batch mode: refused with the double-count rationale
    val e = intercept[IllegalArgumentException] {
      run(s"pipeline:\n  - type: stats_ingest\n    text_field: text\n" +
        s"    store: $store\n")
    }
    assert(e.getMessage.contains("batch_id"), e.getMessage)
    // with one: rows pass through unchanged, counts land
    val out = run(
      s"""pipeline:
         |  - type: stats_ingest
         |    text_field: text
         |    store: $store
         |    batch_id: run-a
         |""".stripMargin)
    assert(out.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      docs.orderBy("doc_id").collect().map(_.toSeq).toSeq)
    assert(countMap(store).nonEmpty)
    // and perplexity_score trains from it (store == its own input here,
    // so scores equal the self-exemplar bigramLogProbAgainst form)
    val scored = graft.pipeline.PipelineCompiler.compile(
      graft.pipeline.RuleLoader.fromYaml(
        s"""pipeline:
           |  - type: perplexity_score
           |    id_field: doc_id
           |    text_field: text
           |    train: {store: "$store"}
           |""".stripMargin))(docs).main
    val expect = CorpusStats.bigramLogProbAgainst(docs, docs,
      "doc_id", "text")
    assert(scored.select("doc_id", "lm_n_bigrams", "lm_logprob")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      expect.orderBy("doc_id").collect().map(_.toSeq).toSeq)
    graft.CacheSweep.sweep(spark)
    // path + store together is ambiguous: refused
    val e2 = intercept[IllegalArgumentException] {
      graft.pipeline.PipelineCompiler.compile(
        graft.pipeline.RuleLoader.fromYaml(
          s"""pipeline:
             |  - type: perplexity_score
             |    id_field: doc_id
             |    text_field: text
             |    train: {store: "$store", path: "/nope"}
             |""".stripMargin))(docs).main
    }
    assert(e2.getMessage.contains("not both"), e2.getMessage)
  }
}
