package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {

  test("ngramArray keeps multiplicity, drops empties, empty under n words") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b a b"),    // bigrams: "a b", "b a", "a b" — dup kept
      (2L, "  x   y  "),  // multi-space: words are x, y
      (3L, "solo"),       // under n → empty
      (4L, "")            // empty → empty
    ).toDF("id", "text")
    val out = df.select(col("id"),
        CorpusStats.ngramArray(col("text"), 2).as("g"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    assert(out(0) == Seq("a b", "b a", "a b"))
    assert(out(1) == Seq("x y"))
    assert(out(2).isEmpty && out(3).isEmpty)
  }

  test("ngramTopK counts and deterministic tie-break") {
    val s = spark
    import s.implicits._
    val df = Seq("a b a b", "a b c", "c a").toDF("text")
    // bigrams: "a b"×3, "b a"×1, "b c"×1, "c a"×1
    val top = CorpusStats.ngramTopK(df, "text", n = 2, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("contamination counts shared shingles against the benchmark set") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps"), // shares "the quick brown", "quick brown fox" with bench
      (2L, "entirely different words here")
    ).toDF("doc_id", "text")
    val bench = Seq("the quick brown fox", "unrelated benchmark text")
      .toDF("text")
    val out = CorpusStats.contamination(corpus, "doc_id", "text",
        bench, "text", k = 3, threshold = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
    // doc 1: 3 shingles, 2 shared (bench has "the quick brown","quick brown fox")
    assert(out(0) == ((1L, 3L, 2L, 0.666667, 1)))
    assert(out(1) == ((2L, 2L, 0L, 0.0, 0)))
  }

  test("docFreqStats: df over distinct words, zero row for empty doc") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b"),   // df(a)=3, df(b)=2 → min 2, avg 2.5
      (2L, "a b a"), // distinct a,b → same stats
      (3L, "a"),     // df(a)=3
      (4L, "")       // no words → zeros
    ).toDF("doc_id", "text")
    val out = CorpusStats.docFreqStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) == ((1L, 2L, 2L, 2.5)))
    assert(out(1) == ((2L, 2L, 2L, 2.5)))
    assert(out(2) == ((3L, 1L, 3L, 3.0)))
    assert(out(3) == ((4L, 0L, 0L, 0.0)))
  }

  test("packChunks matches the sequential fold and spans boundaries") {
    val s = spark
    import s.implicits._
    // 100 docs, irregular token counts incl. zeros; ctx 64 so many docs
    // straddle chunk boundaries
    val docs = (0L until 100L).map(i => (i, (i * 7 % 50))).toDF("id", "tok")
    val out = Curation.packChunks(docs, "id", col("tok"), ctxLen = 64,
        buckets = 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // sequential reference
    var off = 0L
    (0L until 100L).foreach { i =>
      val tok = i * 7 % 50
      val first = off / 64
      val last = (off + math.max(tok, 1) - 1) / 64
      val n = if (tok == 0) 0L else last - first + 1
      assert(out(i.toInt) == ((i, tok, off, first, last, n)),
        s"doc $i: got ${out(i.toInt)}")
      off += tok
    }
    // at least one doc must span 2+ chunks for the boundary math to count
    assert(out.exists(_._6 >= 2))
    // the prefix sum must be distributed: no single-partition exchange
    val plan = Curation.packChunks(docs, "id", col("tok"), 64, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global window detected in plan:\n$plan")
  }

  test("packChunks handles empty input and a single doc") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "tok")
    assert(Curation.packChunks(empty, "id", col("tok"), 64).count() == 0)
    val one = Seq((7L, 200L)).toDF("id", "tok")
    val r = Curation.packChunks(one, "id", col("tok"), 64).collect()(0)
    assert((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((7L, 0L, 0L, 3L, 4L)))
  }

  test("unigramLogProb: corpus MLE averages, zero row for empty doc") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a a b"), // corpus: a×2, b×2, c×1 → N=5
      (2L, "b c"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = CorpusStats.unigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def lp(counts: Seq[Int]) =
      math.round(counts.map(c => math.log(c) - math.log(5)).sum
        / counts.size * 1e6) / 1e6
    assert(out(0) == ((1L, 3L, lp(Seq(2, 2, 2)))))
    assert(out(1) == ((2L, 2L, lp(Seq(2, 1)))))
    assert(out(2) == ((3L, 0L, 0.0)))
  }

  test("dupNgramStats: grams shared across docs counted once per doc") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d"),   // grams: "a b c", "b c d"
      (2L, "x a b c y"), // grams: "x a b", "a b c", "b c y"
      (3L, "q r")        // under n → zero grams
    ).toDF("doc_id", "text")
    val out = CorpusStats.dupNgramStats(df, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) == ((1L, 2L, 1L, 0.5)))       // "a b c" shared
    assert(out(1) == ((2L, 3L, 1L, 0.333333)))
    assert(out(2) == ((3L, 0L, 0L, 0.0)))
  }

  test("centroidOutliers: distances, z-scores, and the flag") {
    val s = spark
    import s.implicits._
    // nine origin vectors + one far point (pop-z caps at sqrt(n-1), so
    // n must be large enough for z>2 to be reachable at all):
    // centroid (3,4), inlier dist 5, outlier dist 45 → mu 9, sd 12,
    // z_out = 3.0, z_in = -0.3333 — all exact in floating point
    val df = ((1L to 9L).map(i => (i, Seq(0.0f, 0.0f))) :+
      (10L, Seq(30.0f, 40.0f))).toDF("vec_id", "embedding")
    val out = graft.ml.Similarity.centroidOutliers(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getInt(3)))
    assert(out.map(_._4).toSeq == Seq.fill(9)(0) :+ 1)
    assert(out(0) == ((1L, 5.0, -0.3333, 0)))
    assert(out(9) == ((10L, 45.0, 3.0, 1)))
  }

  test("centroidOutliers: null/empty vectors drop, null elements skip") {
    val s = spark
    import s.implicits._
    // join-shape fidelity: a null/empty vector had no exploded rows →
    // no output row; a null ELEMENT contributed nothing to the sum
    val df = Seq(
      (1L, Seq[java.lang.Float](0.0f, 0.0f)),
      (2L, Seq[java.lang.Float](3.0f, null)), // null element: dist from dim 0 only
      (3L, null.asInstanceOf[Seq[java.lang.Float]]),
      (4L, Seq.empty[java.lang.Float]),
      (5L, Seq[java.lang.Float](null, null)) // no usable term: null dist row
    ).toDF("vec_id", "embedding")
    val out = graft.ml.Similarity.centroidOutliers(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 5L)) // 3, 4 dropped
    assert(!out.take(2).exists(_.isNullAt(1)), "no null distances for usable rows")
    assert(out(2).isNullAt(1), "all-null row keeps a null dist (oracle parity)")
  }

  test("centroidOutliers: zero-spread corpus flags NOTHING (sd = 0)") {
    val s = spark
    import s.implicits._
    // all-identical embeddings → every dist = 0 → sd = 0. The naive
    // (dist-mu)/sd is NaN, and NaN > thresh is TRUE in both Spark and
    // DuckDB — which would flag every row. Guarded: z = 0, no outliers.
    val df = (1L to 5L).map(i => (i, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = graft.ml.Similarity.centroidOutliers(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
      .map(r => (r.getDouble(2), r.getInt(3)))
    assert(out.toSeq == Seq.fill(5)((0.0, 0)))
  }

  test("weightedSample: deterministic, nested across rates, rate-shaped") {
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val lo = Curation.weightedSample(df, "id", "src",
      Map("src0" -> 0.3), defaultRate = 0.5).collect().map(_.getLong(0)).toSet
    val hi = Curation.weightedSample(df, "id", "src",
      Map("src0" -> 0.6), defaultRate = 0.5).collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi), "rate increase must only ADD rows")
    val again = Curation.weightedSample(df, "id", "src",
      Map("src0" -> 0.3), defaultRate = 0.5).collect().map(_.getLong(0)).toSet
    assert(again == lo, "content-addressed: identical across runs")
    // rough rate check: src0 at 0.3 keeps ~75 of 250, others ~125 of 250
    val bySrc = Curation.weightedSample(df, "id", "src",
        Map("src0" -> 0.3), defaultRate = 0.5)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") < bySrc("src1"))
    assert(math.abs(bySrc("src0") - 75L) < 25)
    intercept[IllegalArgumentException] {
      Curation.weightedSample(df, "id", "src", Map("src0" -> 1.5))
    }
  }

  test("redactPii masks emails, IPs, phones; leaves clean text alone") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "mail bob.smith+x@sub.example.org now",
      "src 192.168.0.1 dst 10.0.255.7",
      "call +49 151 1234567 today",
      "phone (030) 123-4567 works",
      "nothing to hide here",
      "v1.2 is not an ip, 1.2.3 neither"
    ).toDF("text")
    val out = df.select(TextAnalysis.redactPii(col("text"))).collect()
      .map(_.getString(0))
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "src <IP> dst <IP>")
    assert(out(2) == "call <PHONE> today")
    assert(out(3) == "phone <PHONE> works")
    assert(out(4) == "nothing to hide here")
    assert(out(5) == "v1.2 is not an ip, 1.2.3 neither")
  }

  test("corpusProfile: exact per-stratum counts, vocab, dup pressure") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("web", "a b c"),
      ("web", "a b c"),        // exact dup → n_texts 2 < n_docs 3
      ("web", "a d"),
      ("books", "x y z w"),
      ("books", "")            // empty doc: 0 tokens, counts toward docs
    ).toDF("source", "text")
    val m = CorpusStats.corpusProfile(df, "source", "text")
      .collect().map(r => r.getAs[String]("stratum") -> r).toMap
    val web = m("web")
    assert(web.getAs[Long]("n_docs") === 3L)
    assert(web.getAs[Long]("n_tokens") === 8L)
    assert(web.getAs[Long]("min_tokens") === 2L)
    assert(web.getAs[Long]("max_tokens") === 3L)
    assert(web.getAs[Long]("n_vocab") === 4L)  // a b c d
    assert(web.getAs[Long]("n_texts") === 2L)
    assert(web.getAs[Double]("avg_chars") ===
      math.rint((5 + 5 + 3) / 3.0 * 1e6) / 1e6)
    val books = m("books")
    assert(books.getAs[Long]("n_docs") === 2L)
    assert(books.getAs[Long]("min_tokens") === 0L)
    assert(books.getAs[Long]("n_vocab") === 4L)
    assert(books.getAs[Long]("n_texts") === 2L)
  }

  test("zipfFit recovers the slope of an exactly-Zipfian corpus") {
    val s = spark
    import s.implicits._
    // token w_r repeated floor(1000/r) times: frequencies follow r^-1
    // exactly (up to integer floors), so the log-log fit must sit near -1
    val body = (1 to 50).flatMap(r => Seq.fill(1000 / r)(f"w$r%03d"))
    val df = Seq(Tuple1(body.mkString(" "))).toDF("text")
    val row = CorpusStats.zipfFit(df, "text", topN = 50).head()
    assert(row.getAs[Long]("n_types") === 50L)
    assert(row.getAs[Long]("n_tokens") === body.length.toLong)
    val slope = row.getAs[Double]("zipf_slope")
    assert(slope > -1.05 && slope < -0.95, s"expected ~ -1, got $slope")
    // a uniform corpus (all frequencies equal) fits slope 0
    val uni = Seq(Tuple1((1 to 20).map(i => f"u$i%02d").mkString(" ")))
      .toDF("text")
    val flat = CorpusStats.zipfFit(uni, "text", topN = 20).head()
    assert(flat.getAs[Double]("zipf_slope") === 0.0)
    intercept[IllegalArgumentException](CorpusStats.zipfFit(df, "text", 1))
    // a degenerate corpus (1 distinct token) zeroes the least-squares
    // denominator — the slope must come back EXPLICITLY null, not NaN
    val one = Seq(Tuple1("same same same")).toDF("text")
    val deg = CorpusStats.zipfFit(one, "text", topN = 5).head()
    assert(deg.getAs[Long]("n_types") === 1L)
    assert(deg.isNullAt(deg.fieldIndex("zipf_slope")))
    assert(deg.isNullAt(deg.fieldIndex("zipf_intercept")))
  }
}
