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

  test("recall-targeted geometry: analytic model pinned, sizing law " +
      "pinned, and buying bands buys measured recall (r15)") {
    import graft.ml.Similarity
    // closed-form pins of the OR-of-bands model the r15 three-tier
    // measurement validated: at the x100 square geometry (16×16) the
    // model predicts 0.802 recall at c=0.91 — the measured row was
    // 0.804 (SCALE_X100_r15.json)
    assert(math.abs(Similarity.lshPlaneCollision(0.91) - 0.8639) < 5e-4)
    assert(math.abs(
      Similarity.lshOrOfBandsRecall(0.91, 16, 16) - 0.8021) < 5e-4)
    // band sizing at the x100/expected-corpus scales: the numbers the
    // stage surface resolves for target 0.95 at threshold 0.9
    assert(Similarity.lshBandsForRecall(0.95, 0.9, 16) == 35)
    assert(Similarity.recallLshBandsPlanes(400000L, 0.95, 0.9) == ((35, 16)))
    assert(Similarity.recallLshBandsPlanes(1000000L, 0.95, 0.9) == ((41, 17)))
    // r is the occupancy law's (never shrunk) and b never drops below
    // r even when the target is trivially met
    assert(Similarity.recallLshBandsPlanes(100L, 0.5, 0.99) == ((8, 8)))
    // unreachable targets are refused, not silently clamped
    intercept[IllegalArgumentException] {
      Similarity.lshBandsForRecall(1.0, 0.9, 8)
    }
    // e2e on the planted fixture: the recall-targeted geometry's
    // measured recall is at least the square geometry's (model says
    // 0.949 → 0.988 at c=0.91 for 8 → 12 bands at n=1000)
    import org.apache.spark.sql.functions._
    val s = spark
    val emb = Tables.table(s, "/root/testdata/sf0.001", "embeddings")
    val embMax = 500L
    val planted = ScaleProof.plantNearDups(emb, embMax)
    val dir = java.nio.file.Files.createTempDirectory("recall-tgt").toString
    planted.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val (sqRecall, _, _) =
      ScaleProof.recallAtThreshold(s, dir, embMax, threshold = 0.9)
    val (tgtRecall, tgtPerC, _) = ScaleProof.recallAtThreshold(
      s, dir, embMax, threshold = 0.9, targetRecall = Some(0.98))
    assert(tgtRecall >= sqRecall,
      s"recall-targeted $tgtRecall < square $sqRecall")
    assert(tgtRecall >= 0.95,
      s"recall-targeted geometry under its own model: $tgtRecall " +
        s"(per-c: $tgtPerC)")
    // and the price is visible in the same counters the x100 artifact
    // records: more bands → more candidate pairs, linearly in b/r
    val sqCand = ScaleProof.lshCandidatePairs(s, dir)
    val tgtCand = ScaleProof.lshCandidatePairs(s, dir,
      targetRecall = Some(0.98))
    assert(tgtCand > sqCand,
      s"recall bands bought no candidates? $tgtCand <= $sqCand")
  }

  test("ingest-path recall matches the exact-verify path on the planted " +
      "fixture: SQ8 quantized verify costs nothing measurable at a 0.01 " +
      "threshold margin (r15)") {
    import org.apache.spark.sql.functions._
    val s = spark
    val emb = Tables.table(s, "/root/testdata/sf0.001", "embeddings")
    val embMax = 500L
    val planted = ScaleProof.plantNearDups(emb, embMax)
    // exact-verify reference: cosineNearDupPairs at the same geometry
    // the ingest store pins (expected_corpus 1000 → the 8×8 floor, the
    // same sizing recallAtThreshold resolves at n = 1000)
    val dir = java.nio.file.Files.createTempDirectory("recall-ing").toString
    planted.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val (exactRecall, exactPerC, _) =
      ScaleProof.recallAtThreshold(s, dir, embMax, threshold = 0.9)
    // ingest path: ONE batch through dedup_ingest mode embedding —
    // same Rademacher planes, but the verify decodes BOTH sides from
    // SQ8 codes (the only vector representation the store holds).
    // Every planted partner (c ≥ 0.91) is junior by id to its base, so
    // the senior sweep's drop set restricted to partner ids IS the
    // found set — quantization flips only pairs within the SQ8 cosine
    // error (~1e-3 at dim 64) of the threshold, and the nearest
    // planted cosine sits 0.01 above it.
    val store = java.nio.file.Files
      .createTempDirectory("recall-ing-store").toString + "/keys"
    val admitted = graft.pipeline.PipelineCompiler.compile(
      graft.pipeline.RuleLoader.fromYaml(
        s"""pipeline:
           |  - type: dedup_ingest
           |    mode: embedding
           |    id_field: vec_id
           |    vec_field: embedding
           |    dim: 64
           |    threshold: 0.9
           |    expected_corpus: 1000
           |    store: $store
           |""".stripMargin))(planted)
      .main.select("vec_id").collect().map(_.getLong(0)).toSet
    val detected = (0L until embMax)
      .count(i => !admitted.contains(i + embMax))
    val ingestRecall = detected.toDouble / embMax
    // base vectors never drop (corpus max pairwise cosine ~0.48)
    assert((0L until embMax).forall(admitted.contains),
      "a base vector was dropped — cross-pair contamination")
    info(f"exact-verify recall $exactRecall%.4f (per-c $exactPerC), " +
      f"ingest SQ8 recall $ingestRecall%.4f")
    assert(math.abs(ingestRecall - exactRecall) <= 0.02,
      f"SQ8 ingest recall $ingestRecall%.4f vs exact $exactRecall%.4f — " +
        "quantized verify is flipping near-threshold pairs")
    assert(ingestRecall >= 0.9, f"ingest recall floor: $ingestRecall%.4f")
  }
}
