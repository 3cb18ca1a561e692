package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The x100 replica transform ([[ScaleProof.permuted]]) and the
  * candidate-pair counters the r14 three-tier artifact records.
  */
class ScaleProofSpec extends SparkSpec {

  private val alphabet =
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

  test("permuted is the identity at replica 0") {
    val (from, to) = ScaleProof.permuted(0)
    assert(from == to && from == alphabet)
  }

  test("permuted is a bijection on the alphabet for every replica") {
    for (i <- 0 until ScaleProof.Replicas100) {
      val (from, to) = ScaleProof.permuted(i)
      assert(from == alphabet, s"replica $i: domain drifted")
      assert(to.length == from.length && to.toSet == from.toSet,
        s"replica $i: not a permutation")
      // case structure mirrors: upper(perm(lower)) == perm(upper)
      val lowerMap = from.zip(to).toMap
      for (c <- 'a' to 'z')
        assert(lowerMap(c.toUpper) == lowerMap(c).toUpper,
          s"replica $i: case mirror broken at $c")
      // digits stay digits, letters stay letters (token-class shape is
      // preserved, so quality heuristics see the same statistics)
      for ((f, t) <- from.zip(to))
        assert(f.isDigit == t.isDigit && f.isLetter == t.isLetter)
    }
  }

  test("permuted is deterministic and distinct across replicas") {
    val (_, a1) = ScaleProof.permuted(7)
    val (_, a2) = ScaleProof.permuted(7)
    assert(a1 == a2)
    val maps = (0 until ScaleProof.Replicas100)
      .map(i => ScaleProof.permuted(i)._2)
    assert(maps.distinct.size == maps.size, "two replicas share a map")
  }

  test("rotation saturates at period 26 where permutation does not") {
    // the defect that forced the x100 scheme: rotation maps letter-only
    // words identically in replicas i and i+26
    val word = "container"
    def apply(m: (String, String), s: String): String =
      s.map(c => { val j = m._1.indexOf(c); if (j < 0) c else m._2(j) })
    assert(apply(ScaleProof.rotated(3), word) ==
           apply(ScaleProof.rotated(29), word))
    assert(apply(ScaleProof.permuted(3), word) !=
           apply(ScaleProof.permuted(29), word))
  }

  test("character bijection preserves in-replica shingle structure") {
    // shingle intersection/union sizes are invariant under any per-char
    // bijection — the property that makes each replica an isomorphic
    // copy of the workload rather than new data
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "completely different text with no overlap at all 42")
    ).toDF("doc_id", "text")
    def shingleSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[String]] =
      df.select(col("doc_id"),
          graft.ml.Dedup.shingles(col("text"), 3).as("sh"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val base = shingleSets(docs)
    for (i <- Seq(1, 29, 99)) {
      val (from, to) = ScaleProof.permuted(i)
      val mapped = shingleSets(docs.withColumn("text",
        translate(col("text"), from, to)))
      for (a <- base.keys; b <- base.keys) {
        assert((base(a) intersect base(b)).size ==
               (mapped(a) intersect mapped(b)).size,
          s"replica $i: intersection size drifted for ($a,$b)")
        assert(base(a).size == mapped(a).size)
      }
      // and the mapped shingles are DISJOINT from the originals (no
      // cross-replica leakage for these texts)
      for (a <- base.keys)
        assert((base(a) intersect mapped(a)).isEmpty,
          s"replica $i: shingles collide with replica 0")
    }
  }

  test("candidate-pair counters match hand counts on a tiny frame") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scaleproof-cnt").toString
    // documents: two docs sharing one 3-gram, a third disjoint
    Seq((0L, "a b c d"), (1L, "a b c e"), (2L, "x y z w"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // shared grams: "a b c" df=2 → C(2,2)=1 candidate pair; all others df=1
    assert(ScaleProof.containmentCandidatePairs(spark, dir) == 1L)
    // embeddings: two identical vectors land in every band's same bucket,
    // one orthogonal-ish vector may or may not share buckets — counter
    // must be ≥ bands (the identical pair collides in all of them)
    val v = Seq.fill(64)(1.0f)
    Seq((0L, v), (1L, v), (2L, Seq.tabulate(64)(j => if (j % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val geo = graft.ml.Similarity.scaledLshGeometry(3L, 64)
    val bands = geo.size
    assert(ScaleProof.lshCandidatePairs(spark, dir) >= bands.toLong)
  }

  test("planted near-dup partners carry EXACT cosines, and scaled-" +
      "geometry LSH recall@0.9 clears the floor (VERDICT r14 item 2)") {
    import org.apache.spark.sql.functions._
    val s = spark
    val emb = Tables.table(s, "/root/testdata/sf0.001", "embeddings")
    val embMax = 500L
    val planted = ScaleProof.plantNearDups(emb, embMax)
    assert(planted.count() == 2 * embMax, "planting dropped rows")
    // exactness: pair (i, i + embMax) must have cosine
    // PlantCosines(i % 5) to fp precision — the construction
    // u' = c·û + √(1−c²)·ŵ⊥ is exact by algebra, and this pins the
    // implementation to it (measured error ~9e-16)
    val l = planted.filter(col("vec_id") < embMax).alias("l")
    val r = planted.filter(col("vec_id") >= embMax)
      .withColumn("vec_id", col("vec_id") - embMax).alias("r")
    val err = l.join(r, "vec_id")
      .select(col("vec_id"), graft.ml.Similarity.cosine(
        col("l.embedding"), col("r.embedding")).as("c"))
      .withColumn("want", element_at(
        array(ScaleProof.PlantCosines.map(lit): _*),
        (col("vec_id") % 5).cast("int") + 1))
      .select(max(abs(col("c") - col("want")))).head().getDouble(0)
    assert(err < 1e-9, s"planted cosine error $err")
    // recall floor: at n=1000 the scaled geometry is the 8×8 floor;
    // expected recall@0.9 ≈ 0.95+ analytically (per-plane collision
    // 1 − θ/π, OR over 8 bands) — the floor guards the ORDER, not the
    // decimal, so a geometry or keying regression fails loudly while
    // plane-seed tweaks pass
    val dir = java.nio.file.Files.createTempDirectory("recall-floor").toString
    planted.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val (recall, perC, truthPerC) =
      ScaleProof.recallAtThreshold(s, dir, embMax, threshold = 0.9)
    assert(truthPerC == 100L)
    assert(recall >= 0.9, s"recall@0.9 = $recall (per-c: $perC)")
    // the easiest cosine must be essentially perfect — 0.99 pairs
    // collide in some band with near-certainty at r = 8
    assert(perC(0.99) >= 95L, s"recall at c=0.99: ${perC(0.99)}/100")
  }
}
