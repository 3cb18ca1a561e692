package graft.ml

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.Gen.Parameters
import org.scalacheck.rng.Seed

/** Property-based soundness for [[Dedup.keepFromPairs]] /
  * `componentMins`: on random graphs the distributed min-label
  * propagation (hop-only warm-up + pointer jumping + per-round
  * checkpointing) must agree with an independent driver-side union-find.
  * Deterministic seed — no flaky CI. Graph shapes span the regimes that
  * exercise different code paths: sparse random (mostly tiny clusters →
  * warm-up settles them), a long chain (log-diameter jumping), and
  * dense blocks (high-degree propagation).
  */
class ComponentPropertySpec extends SparkSpec {

  /** Reference union-find with path compression. */
  private def refComponents(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root of each node = MIN id of its component (union by min above,
    // plus a final sweep to fully compress)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def edgeGen(n: Int): Gen[List[(Long, Long)]] =
    Gen.listOfN(n, for {
      a <- Gen.choose(0L, n - 1L)
      b <- Gen.choose(0L, n - 1L) if a != b
    } yield (a, b))

  test("keepFromPairs agrees with a reference union-find on random graphs") {
    val s = spark
    import s.implicits._
    val n = 40
    val seed = Seed(20260814L)
    val cases = Iterator.iterate(seed)(_.next).take(6).toSeq
    for (sd <- cases) {
      val edges = edgeGen(n)(Parameters.default, sd)
        .getOrElse(Nil).distinct
      val expectKeep = refComponents(n, edges).collect {
        case (id, root) if id == root => id
      }.toSeq.sorted
      val ids = (0L until n.toLong).toDF("doc_id")
      val pairs = edges.toDF("a", "b")
      // BOTH componentMins paths must agree with the reference: the
      // small-graph driver union-find (default bound — these fixtures
      // are far under it) and the distributed label propagation
      // (pinned via bound = 0) — the r17 fast path is exactly a
      // re-layout of this spec's own reference algorithm
      val got = Dedup.keepFromPairs(ids, "doc_id", pairs, maxRounds = 30)
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(got == expectKeep,
        s"driver-path mismatch on ${edges.size} edges: got $got " +
          s"expected $expectKeep")
      val oldBound = Dedup.componentSmallGraphBound
      Dedup.componentSmallGraphBound = 0
      val gotDist =
        try Dedup.keepFromPairs(ids, "doc_id", pairs, maxRounds = 30)
          .collect().map(_.getLong(0)).toSeq.sorted
        finally Dedup.componentSmallGraphBound = oldBound
      assert(gotDist == expectKeep,
        s"distributed-path mismatch on ${edges.size} edges: got $gotDist " +
          s"expected $expectKeep")
    }
  }

  test("keepFromPairs handles chain, blocks, and empty edge list exactly") {
    val s = spark
    import s.implicits._
    val n = 30
    val ids = (0L until n.toLong).toDF("doc_id")
    // one long chain: single component, keep 0
    val chain = (0 until n - 1).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    assert(Dedup.keepFromPairs(ids, "doc_id", chain, maxRounds = 30)
      .collect().map(_.getLong(0)).toSeq == Seq(0L))
    // three dense blocks of 10: keeps 0, 10, 20
    val blocks = (for {
      blk <- 0 until 3; i <- 0 until 10; j <- i + 1 until 10
    } yield ((blk * 10 + i).toLong, (blk * 10 + j).toLong)).toDF("a", "b")
    assert(Dedup.keepFromPairs(ids, "doc_id", blocks, maxRounds = 30)
      .collect().map(_.getLong(0)).toSeq.sorted == Seq(0L, 10L, 20L))
    // no edges: everything is a singleton
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.keepFromPairs(ids, "doc_id", none, maxRounds = 30)
      .count() == n)
  }
}
