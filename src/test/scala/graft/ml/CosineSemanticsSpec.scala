package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic pin for the r14 in-join-dot re-shape of
  * [[Similarity.cosineNearDupPairs]] / [[Similarity.cosineNearDupAgainst]]:
  * the operator's contract is EXACTLY "round-6 exact cosine over every
  * band-colliding, cap-surviving pair, OR-combined across bands" — the
  * driver recomputes that definition from the engine's own signature
  * table and the outputs must match row-for-row. Guards the dedup-after
  * vs dedup-before-scoring equivalence (a pair colliding in k bands
  * must appear once) and the against-variant's existence semantics.
  */
class CosineSemanticsSpec extends SparkSpec {

  private def planes(bands: Int, perBand: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    var s = 0x9E3779B97F4A7C15L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    Seq.tabulate(bands, perBand, dim)((_, _, _) => if (next() < 0) -1.0 else 1.0)
  }

  // deterministic corpus: LCG doubles in [-1, 1), clusters guaranteed by
  // duplicating some vectors with small sign-preserving perturbations
  private def corpus(n: Int, dim: Int) = {
    var s = 42L
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    val base = Seq.fill(n / 2)(Seq.fill(dim)(next()))
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((2L * i, v), (2L * i + 1, v.map(x => x * 0.9 + 0.01)))
    }
    val sp = spark
    import sp.implicits._
    rows.toDF("id", "v")
  }

  private def keysOf(df: org.apache.spark.sql.DataFrame,
                     bp: Seq[Seq[Seq[Double]]]): Map[Long, Seq[Any]] =
    df.select(col("id"),
        Similarity.lshBandKeys(col("v"), bp).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap

  private def normOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
    df.select(col("id"), col("v")).collect().map { r =>
      val v = r.getSeq[Double](1)
      val n = math.sqrt(v.map(x => x * x).sum)
      r.getLong(0) -> (if (n > 0) v.map(_ / n) else v)
    }.toMap

  test("pairs == exact cosine over band-colliding pairs (driver recompute)") {
    val dim = 8
    val bp = planes(4, 4, dim)
    val df = corpus(40, dim)
    val threshold = 0.4
    val ks = keysOf(df, bp)
    val u = normOf(df)
    val expected = (for {
      a <- ks.keys; b <- ks.keys if a < b
      if ks(a).zip(ks(b)).exists { case (x, y) => x == y } // any band collides
    } yield {
      val sim = BigDecimal(u(a).zip(u(b)).map { case (x, y) => x * y }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, sim)
    }).filter(_._3 >= threshold).toSet
    assert(expected.nonEmpty, "fixture produced no expected pairs")
    // the dedup path must actually be exercised: some pair collides in >1 band
    assert(ks.keys.exists(a => ks.keys.exists(b => a < b &&
      ks(a).zip(ks(b)).count { case (x, y) => x == y } > 1)),
      "fixture has no multi-band collision — dedup path untested")
    val got = Similarity.cosineNearDupPairs(df, "id", "v", bp,
        threshold = threshold, maxBucketSize = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"operator/defn diverged:\nonly-op=${got -- expected}\nonly-defn=${expected -- got}")
  }

  test("knnGraph == per-node top-k over the banded candidate edges " +
      "(driver recompute)") {
    val dim = 8
    val bp = planes(4, 4, dim)
    val df = corpus(40, dim)
    val k = 3
    val ks = keysOf(df, bp)
    val u = normOf(df)
    // candidate UNDIRECTED pairs by band collision, scored exactly
    val pairs = (for {
      a <- ks.keys; b <- ks.keys if a < b
      if ks(a).zip(ks(b)).exists { case (x, y) => x == y }
    } yield {
      val sim = BigDecimal(u(a).zip(u(b)).map { case (x, y) => x * y }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, sim)
    }).toSeq
    // both directed edges; per node: top-k by (sim desc, dst asc)
    val expected = pairs.flatMap { case (a, b, s) => Seq((a, b, s), (b, a, s)) }
      .groupBy(_._1).toSeq.flatMap { case (src, es) =>
        es.sortBy(e => (-e._3, e._2)).take(k).zipWithIndex
          .map { case ((_, dst, s), i) => (src, i + 1, dst, s) }
      }.toSet
    val got = Similarity.knnGraph(df, "id", "v", bp, k = k,
        maxBucketSize = 4096)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected,
      s"knnGraph/defn diverged:\nonly-op=${got -- expected}\nonly-defn=${expected -- got}")
  }

  test("against-variant drops exactly the incoming ids with a verified " +
      "band-colliding reference neighbor") {
    val dim = 8
    val bp = planes(4, 4, dim)
    val all = corpus(40, dim)
    // twin pairs are (2i, 2i+1); route them so the fixture MIXES
    // outcomes: base i % 3 == 0 keeps both twins in incoming (no near
    // reference → kept), == 1 splits them (near reference → dropped),
    // == 2 puts both in reference
    def side(id: Long): Int = ((id / 2) % 3, id % 2) match {
      case (0, _) => 0 // both twins incoming
      case (1, 0) => 0 // split: even twin incoming…
      case (1, _) => 1 // …odd twin reference
      case _ => 1      // both twins reference
    }
    val sideU = udf((id: Long) => side(id))
    val incoming = all.filter(sideU(col("id")) === 0)
    val ref = all.filter(sideU(col("id")) === 1)
    val threshold = 0.4
    val ks = keysOf(all, bp)
    val u = normOf(all)
    val incIds = ks.keys.filter(side(_) == 0)
    val refIds = ks.keys.filter(side(_) == 1).toSeq
    val dirty = incIds.filter { a =>
      refIds.exists { b =>
        ks(a).zip(ks(b)).exists { case (x, y) => x == y } && {
          val sim = BigDecimal(u(a).zip(u(b)).map { case (x, y) => x * y }.sum)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          sim >= threshold
        }
      }
    }.toSet
    assert(dirty.nonEmpty && dirty.size < incIds.size,
      "fixture must mix kept and dropped incoming rows")
    val kept = Similarity.cosineNearDupAgainst(incoming, ref, "id", "v",
        bp, threshold = threshold, maxBucketSize = 4096)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == incIds.toSet -- dirty,
      s"against-variant diverged: kept=$kept expectedKept=${incIds.toSet -- dirty}")
  }
}
