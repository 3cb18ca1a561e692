package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edit-distance dedup: the length-band blocking must be LOSSLESS
  * (checked against a driver-side brute-force pair set), each pair
  * must surface exactly once, the bucket cap must surface through the
  * CapAudit counters, and the keep step must collapse transitive
  * chains to the component minimum.
  */
class FuzzyDedupSpec extends SparkSpec {

  /** Deterministic short-string corpus with planted typo families:
    * ids 0..n-1 map onto `base(i % 7)` plus i/7 edits appended — so
    * family members sit at controlled distances and different
    * families are far apart.
    */
  private def corpus(n: Int) = {
    val s = spark
    import s.implicits._
    val bases = Seq("alpha query", "beta search", "gamma filter",
      "delta join", "epsilon scan", "zeta sort", "eta merge")
    (0 until n).map { i =>
      val extra = "x" * (i / 7)
      (i.toLong, bases(i % 7) + extra)
    }.toDF("id", "s")
  }

  private def lev(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    m(a.length)(b.length)
  }

  private def brutePairs(rows: Seq[(Long, String)], d: Int) = {
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dist = lev(sa, sb) if dist <= d
    } yield (ia, ib, dist)).toSet
  }

  test("blocking is lossless: banded pairs == brute-force pairs, each " +
      "exactly once") {
    val df = corpus(49)
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    for (d <- Seq(1, 2, 3); blocking <- Seq("length", "segment")) {
      val got = Dedup.fuzzyDupPairs(df, "id", "s", maxDist = d,
          blocking = blocking).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(got.length == got.toSet.size,
        s"d=$d $blocking: a pair surfaced more than once")
      assert(got.toSet == brutePairs(rows, d),
        s"d=$d $blocking: banded pairs diverged from brute force")
    }
  }

  test("segment blocking is lossless on adversarial shapes: equal " +
      "lengths, cross-length, tiny strings, indel position shifts") {
    val s = spark
    import s.implicits._
    // tiny strings (segments go empty), pure indels at the front
    // (max position shift), substitutions at segment boundaries
    val rows = Seq(
      (1L, ""), (2L, "a"), (3L, "ab"), (4L, "ba"), (5L, "xy"),
      (10L, "abcdefghij"), (11L, "XXabcdefghij"), // 2 inserts at front
      (12L, "abcdefghijXX"),                      // 2 inserts at back
      (13L, "abXdefghij"),                        // boundary substitution
      (20L, "mnopqrstuv"), (21L, "mnopqrstuv"))   // exact twin
    val df = rows.toDF("id", "s")
    for (d <- Seq(1, 2, 3)) {
      val got = Dedup.fuzzyDupPairs(df, "id", "s", maxDist = d,
          blocking = "segment").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brutePairs(rows, d),
        s"d=$d: segment pairs diverged from brute force")
    }
  }

  test("segment blocking's candidate set is content-selective where " +
      "length banding goes quadratic on a same-length pile") {
    val s = spark
    import s.implicits._
    // 300 DISTINCT content-diverse same-length keys (hash hex — the
    // "real titles" shape, no shared template) + one planted typo
    // twin: length banding must candidate every pair (n²/2), segment
    // blocking only rows that actually share a slot's content. NB a
    // TEMPLATED pile ("item-00001-tail") shares whole slots and
    // collides segment keys too — that shape is the cap's business,
    // where dropping one slot key still leaves the other slots
    // finding pairs (see the losslessness-under-cap contract).
    def key(i: Int): String = java.security.MessageDigest
      .getInstance("MD5").digest(i.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val pile = (0 until 300).map(i => (i.toLong, key(i)))
    val df = (pile :+ (900L, key(7).updated(3, 'Z'))).toDF("id", "s")
    val lenCand = Dedup.fuzzyLengthCandidates(df, "id", "s", 2, 1 << 20)
      .count()
    val segCand = Dedup.fuzzySegmentCandidates(df, "id", "s", 2, 1 << 20)
      .count()
    assert(lenCand >= 301L * 300 / 2, s"length banding candidates: $lenCand")
    assert(segCand < lenCand / 100,
      s"segment blocking must be content-selective: $segCand vs $lenCand")
    // and the planted substitution pair is still found
    val pairs = Dedup.fuzzyDupPairs(df, "id", "s", maxDist = 2,
      blocking = "segment").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((7L, 900L)),
      s"planted typo pair lost: ${pairs.toSeq}")
  }

  test("adjacent-length pairs cross the band boundary in both " +
      "directions (the 3-emit join finds them regardless of id order)") {
    val s = spark
    import s.implicits._
    // lengths 5 and 7 with maxDist 2: buckets 2 and 3 — only the
    // boundary crossing finds these; both id orders exercised
    val df = Seq((1L, "aaaaa"), (2L, "aaaaaxy"),
      (10L, "bbbbbxy"), (9L, "bbbbb")).toDF("id", "s")
    val got = Dedup.fuzzyDupPairs(df, "id", "s", maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 2), (9L, 10L, 2)), s"got $got")
  }

  test("the bucket cap exempts a pile-up VISIBLY (CapAudit counters), " +
      "and other bands keep pairing (length blocking)") {
    val s = spark
    import s.implicits._
    CapAudit.reset()
    // 40 equal-length keys pile into one band; a two-row family lives
    // at a different length and must still pair
    val pile = (0 until 40).map(i => (i.toLong, f"key-$i%04d"))
    val ok = Seq((100L, "longer-field-aa"), (101L, "longer-field-ab"))
    val df = (pile ++ ok).toDF("id", "s")
    val got = Dedup.fuzzyDupPairs(df, "id", "s", maxDist = 2,
        maxBucketSize = 10, blocking = "length").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 101L)),
      s"capped band must drop, uncapped band must pair: $got")
    val snap = CapAudit.snapshot()
    val exempted = snap.getOrElse(("exempted_rows", "cap_fuzzy_dedup"), 0L)
    assert(exempted >= 40L && exempted % 40L == 0L,
      s"exemption must be counted (at-least-once), got $snap")
    CapAudit.reset()
  }

  test("segment blocking degrades GRACEFULLY under a capped slot: the " +
      "counters fire, and pairs sharing an uncapped segment still pair") {
    val s = spark
    import s.implicits._
    CapAudit.reset()
    // the pile shares its first two slots ("key-0NNN": "ke", "y-0") —
    // both blow the cap of 10 and get exempted VISIBLY; the planted
    // family's pair survives because its own slots stay under the cap.
    // NB pile neighbors ("key-0012"~"key-0013", dist 1) differ in the
    // capped-exempt slots' complement, so they are genuinely lost —
    // the documented graceful-degradation contract, counted not silent
    val pile = (0 until 40).map(i => (i.toLong, f"key-$i%04d"))
    val ok = Seq((100L, "longer-field-aa"), (101L, "longer-field-ab"))
    val df = (pile ++ ok).toDF("id", "s")
    val got = Dedup.fuzzyDupPairs(df, "id", "s", maxDist = 2,
        maxBucketSize = 10, blocking = "segment").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 101L)), s"got $got")
    val snap = CapAudit.snapshot()
    val exempted = snap.getOrElse(("exempted_rows", "cap_fuzzy_dedup"), 0L)
    assert(exempted >= 80L,
      s"shared-slot exemptions must be counted, got $snap")
    CapAudit.reset()
  }

  test("fuzzyAgainst keeps exactly the incoming rows with no reference " +
      "string within maxDist (brute-force equality, three distances)") {
    val df = corpus(49)
    val incoming = df.filter(col("id") % 3 === 0)
    val ref = df.filter(col("id") % 3 =!= 0)
    val incRows = incoming.collect().map(r => (r.getLong(0), r.getString(1)))
    val refRows = ref.collect().map(r => (r.getLong(0), r.getString(1)))
    for (d <- Seq(1, 2, 3); blocking <- Seq("length", "segment")) {
      val want = incRows.filter { case (_, sa) =>
        !refRows.exists { case (_, sb) => lev(sa, sb) <= d }
      }.map(_._1).toSet
      val got = Dedup.fuzzyAgainst(incoming, ref, "id", "s", maxDist = d,
          blocking = blocking)
        .collect().map(_.getLong(0)).toSet
      assert(got == want,
        s"d=$d $blocking: kept set diverged from brute force")
    }
  }

  test("fuzzyAgainst: null-field incoming rows always survive; the cap " +
      "exempts a pile-up visibly while other bands keep dropping") {
    val s = spark
    import s.implicits._
    CapAudit.reset()
    // reference pile at one length saturates its bucket; an incoming
    // twin of the pile must SURVIVE (capped — counted), an incoming
    // twin at another length must DROP, a null row must survive
    val pile = (0 until 40).map(i => (1000L + i, f"key-$i%04d"))
    val refOk = Seq((2000L, "longer-field-aa"))
    val ref = (pile ++ refOk).toDF("id", "s")
    val inc = Seq((1L, Some("key-0000")), (2L, Some("longer-field-ab")),
      (3L, None)).toDF("id", "s")
    val kept = Dedup.fuzzyAgainst(inc, ref, "id", "s", maxDist = 2,
      maxBucketSize = 10).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L),
      s"capped bucket keeps, uncapped drops, null survives: $kept")
    val snap = CapAudit.snapshot()
    val exempted = snap.getOrElse(("exempted_rows", "cap_fuzzy_against"), 0L)
    assert(exempted >= 41L, s"joint exemption must be counted, got $snap")
    CapAudit.reset()
  }

  test("histogram prefilter bound: k random edits move the packed " +
      "histogram L1 by at most 2k — the losslessness invariant, " +
      "saturation and surrogate pairs included (r17)") {
    import graft.functions.{CharHistExpr, NibbleL1Expr}
    import org.apache.spark.unsafe.types.UTF8String
    def h(s: String): Long = CharHistExpr.hist(UTF8String.fromString(s))
    def l1(a: String, b: String): Int = NibbleL1Expr.l1(h(a), h(b))
    // alphabet biased toward repeats so saturating nibbles (count 15)
    // actually occur; includes a non-BMP code point (one CHAR edit in
    // levenshtein terms, two UTF-16 units)
    val alpha = "aab0𝕏cde ff".toCharArray // raw chars incl. surrogate
    val alphaCps = new String(alpha).codePoints().toArray
    val rnd = new scala.util.Random(42)
    def randCp(): String =
      new String(Character.toChars(alphaCps(rnd.nextInt(alphaCps.length))))
    def randStr(nCps: Int): String =
      (0 until nCps).map(_ => randCp()).mkString
    for (_ <- 0 until 500) {
      val a = randStr(1 + rnd.nextInt(60))
      val k = 1 + rnd.nextInt(3)
      var b = a
      for (_ <- 0 until k) {
        // one edit at a CODE POINT boundary (insert | delete | subst)
        val cps = b.codePoints().toArray
        val at = if (cps.isEmpty) 0 else rnd.nextInt(cps.length)
        val edited: Array[Int] = rnd.nextInt(3) match {
          case 0 => // insert
            (cps.take(at) :+ randCp().codePointAt(0)) ++ cps.drop(at)
          case 1 if cps.nonEmpty => // delete
            cps.take(at) ++ cps.drop(at + 1)
          case _ if cps.nonEmpty => // substitute
            cps.updated(at, randCp().codePointAt(0))
          case _ => cps
        }
        b = new String(edited, 0, edited.length)
      }
      assert(l1(a, b) <= 2 * k,
        s"bound violated: l1=${l1(a, b)} > ${2 * k} for\n`$a`\n`$b`")
    }
    // saturation: 40 repeats vs 60 repeats of one char read as equal
    // nibbles (15 vs 15) — the filter only ever UNDER-estimates
    assert(l1("x" * 40, "x" * 60) == 0)
    // and two unrelated strings separate far beyond any small bound
    assert(l1("abcdefghij", "0123456789zz") > 4)
  }

  test("dedup_ingest fused cap (r18): one aggregate reproduces both " +
      "legs' separate per-leg cap accounting exactly where caps fire") {
    val s = spark
    import s.implicits._
    // shared-template piles so slot keys collide: the batch pile alone
    // sits UNDER the mid cap while batch+store breaches it — the self
    // cap (batch occupancy) and joint cap (total occupancy) must then
    // exempt DIFFERENT key sets, which is exactly what the fused
    // aggregate's (__bn, __n) split encodes
    val batch = (0 until 25).map(i => (i.toLong, f"key-$i%04d")) ++
      Seq((100L, "alpha query aa"), (101L, "alpha query ab"))
    val store = (0 until 30).map(i => f"key-$i%04dq") ++
      Seq("alpha query ac", "key-0000x")
    val bdf = Dedup.compactRows(batch.toDF("id", "s"), "id", "s").persist()
    val rf = Dedup.compactRows(
      store.toDF("fstr").withColumn("__rid", lit(0L)), "__rid", "fstr")
      .persist()
    def pset(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    var sawCapFire = false
    val t0 = new Dedup.CacheTracker
    val selfUncapped = pset(Dedup.fuzzySegmentCandidatesFromRows(
      bdf, 2, 1 << 20, "t_unc", t0))
    for (cap <- Seq(3, 10, 40, 1 << 20)) {
      val t1 = new Dedup.CacheTracker
      val (selfNew, crossNew) = Dedup.fuzzySegmentDropCandidates(
        bdf, Some(rf), 2, cap, "t_new", t1)
      val t2 = new Dedup.CacheTracker
      val selfOld = Dedup.fuzzySegmentCandidatesFromRows(
        bdf, 2, cap, "t_old", t2)
      val crossOld = Dedup.fuzzySegmentCrossCandidates(
        bdf, rf, 2, cap, "t_old", t2)
      val sn = pset(selfNew)
      assert(sn == pset(selfOld), s"self candidates diverge at cap $cap")
      assert(pset(crossNew.get) == pset(crossOld),
        s"cross candidates diverge at cap $cap")
      if (sn != selfUncapped) sawCapFire = true
      (t1.frames ++ t2.frames).foreach(_.unpersist())
    }
    t0.frames.foreach(_.unpersist())
    assert(sawCapFire,
      "fixture too small: no cap ever changed the self candidate set")
    bdf.unpersist(); rf.unpersist()
  }

  test("fuzzyDedupKeep collapses a transitive typo chain to the " +
      "component minimum") {
    val s = spark
    import s.implicits._
    // chain: a--b at 1, b--c at 1, a--c at 2 (> maxDist=1) — component
    // semantics keep ONE survivor where greedy pairwise would keep two
    val df = Seq((1L, "report"), (2L, "reporx"), (3L, "reporxy"),
      (9L, "unrelated string")).toDF("id", "s")
    val kept = Dedup.fuzzyDedupKeep(df, "id", "s", maxDist = 1)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 9L), s"expected component-min keep, got $kept")
  }
}
