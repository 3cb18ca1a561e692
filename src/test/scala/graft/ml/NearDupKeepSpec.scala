package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected-component keep-one selection over near-dup pairs: a CHAIN of
  * near-dups (a~b, b~c, but a and c less similar) must still collapse to
  * one kept doc — the transitive case pair-lists alone can't express.
  */
class NearDupKeepSpec extends SparkSpec {

  /** Pin the DISTRIBUTED label-propagation path (r17): the small-graph
    * driver union-find would otherwise absorb every fixture here, and
    * these tests exist to exercise the iterative machinery (hop
    * warm-up, pointer jumping, convergence probe). Path equality is
    * spec'd separately in ComponentPropertySpec.
    */
  private def withDistributedComponents[T](f: => T): T = {
    val old = Dedup.componentSmallGraphBound
    Dedup.componentSmallGraphBound = 0
    try f finally Dedup.componentSmallGraphBound = old
  }

  test("nearDupKeep collapses transitive chains and keeps singletons") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base + " lambda"),            // ~doc1
      (3L, base + " lambda mu"),         // ~doc2 (chain)
      (10L, "totally different words entirely here nothing shared at all"),
      (11L, "short")                      // < k tokens → singleton
    ).toDF("doc_id", "text")
    val kept = Dedup.nearDupKeep(docs, "doc_id", "text",
        bands = 4, rowsPerBand = 3, k = 3, threshold = 0.5)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    // 1,2,3 cluster → keep 1; 10 and 11 are singletons
    assert(kept == Seq(1L, 10L, 11L), s"got $kept")
  }

  test("nearDupClusters labels every doc; roots are exactly the keep set") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base + " lambda"),
      (3L, base + " lambda mu"),
      (10L, "totally different words entirely here nothing shared at all"),
      (11L, "short")
    ).toDF("doc_id", "text")
    val labels = Dedup.nearDupClusters(docs, "doc_id", "text",
        bands = 4, rowsPerBand = 3, k = 3, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 11L),
      s"got $labels")
    // invariant: the distinct labels are exactly nearDupKeep's survivors
    val kept = Dedup.nearDupKeep(docs, "doc_id", "text",
        bands = 4, rowsPerBand = 3, k = 3, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(labels.values.toSet == kept)
  }

  test("leakageSafeSplit: near-dup clusters never straddle a split boundary") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // many near-dup clusters of 3 (ids 3i, 3i+1, 3i+2 share a long prefix
    // per-cluster) so at 80/10/10 some clusters land in each split
    val docs = (0 until 60).map { i =>
      val stem = base + s" cluster$i word$i token$i extra$i more$i"
      (i.toLong, stem + (i % 3 match {
        case 0 => ""
        case 1 => " lambda"
        case _ => " lambda mu"
      }))
    }.toDF("doc_id", "text")
    val out = Dedup.leakageSafeSplit(docs, "doc_id", "text",
      trainPct = 80, validPct = 10,
      bands = 4, rowsPerBand = 3, k = 3, threshold = 0.5)
    val rows = out.select("doc_id", "cluster", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 60)
    // every doc of a cluster carries the same split
    rows.groupBy(_._2).foreach { case (cl, grp) =>
      assert(grp.map(_._3).toSet.size == 1,
        s"cluster $cl straddles splits: ${grp.toSeq}")
    }
    // the split of a cluster equals hashSplit of its root id (so a
    // dup-free corpus degrades to plain hashSplit)
    val roots = rows.map(_._2).distinct.toSeq.toDF("id")
    val expect = roots.select(col("id"),
        Curation.hashSplit(col("id"), 80, 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, cl, s) =>
      assert(s == expect(cl), s"doc $id: split $s != hashSplit($cl)=${expect(cl)}")
    }
    // sanity: with 20 clusters the 80/10/10 hash actually split them
    assert(rows.map(_._3).toSet.size >= 2, "expected at least two splits used")
    // conflicting percentages fail loudly
    intercept[IllegalArgumentException] {
      Dedup.leakageSafeSplit(docs, "doc_id", "text", trainPct = 95, validPct = 10)
    }
  }

  test("keepFromPairs turns an arbitrary edge list into a min-id keep set") {
    import spark.implicits._
    val ids = (1L to 7L).toDF("doc_id")
    // components: {1,2,3} (chain), {5,6}; 4 and 7 singletons
    val pairs = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val kept = Dedup.keepFromPairs(ids, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(kept == Seq(1L, 4L, 5L, 7L), s"got $kept")
  }

  test("simhashPairs maxHamming verifies candidates on the full fingerprint") {
    import spark.implicits._
    // identical texts: hamming 0; a heavily-edited text still sharing a
    // 16-bit band could appear as a candidate but fails a 0-bit verify
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "nothing in common with the others at all whatsoever")
    ).toDF("doc_id", "text")
    val strict = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $strict")
    // default keeps the historical candidates-only contract (superset)
    val cands = Dedup.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict.subsetOf(cands))
  }

  test("a 50-node chain graph converges without driver blowup") {
    import spark.implicits._
    // a PATH of overlapping docs: doc i ~ doc i+1 only. The periodic
    // localCheckpoint keeps each round's plan and the persisted-RDD
    // chain bounded instead of many plans deep.
    val words = (0 until 60).map(i => s"w$i")
    val docs = (0 until 50).map { i =>
      (i.toLong, words.slice(i, i + 10).mkString(" "))
    }.toDF("doc_id", "text")
    val kept = Dedup.nearDupKeep(docs, "doc_id", "text",
        bands = 6, rowsPerBand = 2, k = 3, threshold = 0.2, maxRounds = 60)
      .collect().map(_.getLong(0)).toSeq.sorted
    // each adjacent pair shares 9 of 10 words (Jaccard well over 0.2);
    // the whole path is ONE component → only doc 0 survives
    assert(kept == Seq(0L), s"got $kept")
  }

  test("componentMins: pointer jumping makes a 1024-path converge in O(log d) rounds") {
    import spark.implicits._
    // the worst case for plain min-propagation: a path graph of diameter
    // 1023, where one-hop-per-round takes 1023 rounds (the round-10
    // watch-list shape — a 100 TB near-dup graph with long chains).
    // Hop-then-jump at least doubles every label's reach per round, so
    // convergence must land within ~2·log₂(1024) + slack, and every
    // node's root must be the true component min (node 0).
    val n = 1024
    val ids = (0 until n).map(_.toLong).toDF("id")
    val fwd = (0 until n - 1).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val edges = fwd.union(fwd.select(col("b").as("a"), col("a").as("b")))
      .persist()
    val (settled, rounds) =
      withDistributedComponents(Dedup.componentMins(ids, edges, maxRounds = 100))
    val roots = settled.select(countDistinct(col("root")).as("d"),
      min(col("root")).as("m"), count(lit(1)).as("n")).collect().head
    assert(roots.getLong(0) == 1L && roots.getLong(1) == 0L &&
      roots.getLong(2) == n.toLong,
      s"path must collapse to one root 0: $roots")
    assert(rounds <= 25, s"pointer jumping promises O(log d) rounds on a " +
      s"1024-path (~20 incl. the convergence-probe round); took $rounds")
    edges.unpersist(blocking = false)
  }

  test("componentMins: hop-only warm-up converges small clusters without " +
      "ever jumping; results match across jumpFrom settings") {
    import spark.implicits._
    // pair + triangle + singleton: everything settles within the default
    // 2-round warm-up, so convergence must be detected in a hop-only
    // round (the pre-jump invariant: hop-unchanged ⟹ component-uniform
    // roots) — 3 rounds total (2 doing work + 1 confirming), never more
    val ids = Seq(1L, 2L, 5L, 6L, 7L, 42L).toDF("id")
    val fwd = Seq((1L, 2L), (5L, 6L), (6L, 7L)).toDF("a", "b")
    val edges = fwd.union(fwd.select(col("b").as("a"), col("a").as("b")))
    val (settled, rounds) =
      withDistributedComponents(Dedup.componentMins(ids, edges, maxRounds = 20))
    val m = settled.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 5L,
      42L -> 42L), s"got $m")
    assert(rounds <= 3, s"tiny clusters must settle in the warm-up: $rounds")
    // the gate changes WHEN jumping starts, never the fixed point: a
    // 10-path under jump-always (jumpFrom=1), the default warm-up, and
    // hop-only (jumpFrom > maxRounds) lands on identical labels
    val pids = (0 until 10).map(_.toLong).toDF("id")
    val pfwd = (0 until 9).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val pedges = pfwd.union(pfwd.select(col("b").as("a"), col("a").as("b")))
    val results = Seq(1, 3, 100).map { jf =>
      withDistributedComponents(
        Dedup.componentMins(pids, pedges, maxRounds = 50, jumpFrom = jf))
        ._1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(results.forall(_ == results.head),
      s"jumpFrom must not change the fixed point: $results")
    assert(results.head.values.forall(_ == 0L))
  }

  test("componentMins: disjoint components keep independent mins; singletons self-root") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 7L, 8L, 99L).toDF("id")
    val fwd = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val edges = fwd.union(fwd.select(col("b").as("a"), col("a").as("b")))
    val (settled, _) =
      withDistributedComponents(Dedup.componentMins(ids, edges, maxRounds = 20))
    val m = settled.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L,
      99L -> 99L), s"got $m")
  }

  test("minhash/simhash bucket cap bounds identical-doc pile-ups") {
    import spark.implicits._
    // 2000 identical docs: every one lands in the SAME (band, key) bucket
    // in all bands. Uncapped, the self-join would emit ~2M pairs per band
    // (O(bucket²) — the classic web-dedup skew); with the cap the bucket
    // is dropped and the join completes with zero candidate pairs.
    val docs = (0 until 2000).map(i => (i.toLong, "the same exact document text repeated"))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val mh = Dedup.minhashPairs(docs, "doc_id", "text",
      bands = 4, rowsPerBand = 3, k = 3, maxBucketSize = 100).count()
    val sh = Dedup.simhashPairs(docs, "doc_id", "text",
      maxBucketSize = 100).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(mh == 0L && sh == 0L, s"capped buckets must emit no pairs: $mh/$sh")
    assert(secs < 60.0, f"bounded time expected, took $secs%.1f s")
    // sanity: SMALL buckets still pair up under the same cap
    val few = (0 until 5).map(i => (i.toLong, "another duplicated body of text here"))
      .toDF("doc_id", "text")
    assert(Dedup.minhashPairs(few, "doc_id", "text",
      bands = 4, rowsPerBand = 3, k = 3, maxBucketSize = 100).count() == 10L)
  }

  test("minhashBandsRows: S-curve sizing pinned — geometry from the " +
      "dedup contract, not a hand-me-down (r15)") {
    // the closed form itself, and the legacy default's actual contract:
    // 4x3 at threshold 0.8 is 0.943 recall but lets ~23% of
    // half-threshold noise through as candidates
    assert(math.abs(Dedup.jaccardBandRecall(0.8, 4, 3) - 0.9433) < 5e-4)
    assert(math.abs(Dedup.jaccardBandRecall(0.4, 4, 3) - 0.2325) < 5e-4)
    // sized geometries: recall >= target at the threshold AND noise
    // rate <= 5% at threshold/2 — by construction, pinned by value
    assert(Dedup.minhashBandsRows(0.8, 0.9) == ((8, 6)))
    assert(Dedup.minhashBandsRows(0.9, 0.9) == ((4, 6)))
    val (b, r) = Dedup.minhashBandsRows(0.8, 0.9)
    assert(Dedup.jaccardBandRecall(0.8, b, r) >= 0.9)
    assert(Dedup.jaccardBandRecall(0.4, b, r) <= 0.05)
    // a low-threshold contract is HONESTLY expensive (147 bands at
    // Jaccard 0.5) — the sizing surfaces the cost instead of silently
    // under-recalling like an undersized hand-pick would
    assert(Dedup.minhashBandsRows(0.5, 0.9) == ((147, 6)))
    // noise at-or-above the threshold is refused, not absorbed
    intercept[IllegalArgumentException] {
      Dedup.minhashBandsRows(0.8, 0.9, noiseJaccard = 0.8)
    }
    // the sized geometry actually runs: same pair semantics as an
    // explicit (bands, rows) call
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "completely different words with nothing shared at all")
    ).toDF("doc_id", "text")
    val sized = Dedup.minhashPairs(docs, "doc_id", "text",
      bands = b, rowsPerBand = r).collect().map(x =>
      (x.getLong(0), x.getLong(1))).toSet
    assert(sized.contains((1L, 2L)), s"near pair missed: $sized")
    assert(!sized.contains((1L, 3L)) && !sized.contains((2L, 3L)),
      s"noise paired: $sized")
  }
}
