package graft.ml

import graft.SparkSpec

/** cosineNearDupPairs bucket cap: identical embeddings pile into one
  * (band, key) bucket — the cap must drop it (no O(bucket²) blow-up)
  * while small buckets still pair, mirroring the Dedup LSH cap test.
  */
class CosineCapSpec extends SparkSpec {

  // deterministic ±1 planes (same LCG family as GraftQueriesML)
  private def planes(bands: Int, perBand: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    var s = 0x9E3779B97F4A7C15L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    Seq.tabulate(bands, perBand, dim)((_, _, _) => if (next() < 0) -1.0 else 1.0)
  }

  test("embedding bucket cap bounds identical-vector pile-ups") {
    import spark.implicits._
    val dim = 8
    val vec = Seq.tabulate(dim)(i => 0.1 * (i + 1))
    val many = (0 until 1000).map(i => (i.toLong, vec)).toDF("id", "v")
    val t0 = System.nanoTime()
    val capped = Similarity.cosineNearDupPairs(many, "id", "v",
      planes(2, 4, dim), threshold = 0.9, maxBucketSize = 50).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(capped == 0L, s"capped bucket must emit no pairs, got $capped")
    assert(secs < 60.0, f"bounded time expected, took $secs%.1f s")

    // below the cap the same vectors DO pair (sim = 1.0 ≥ threshold)
    val few = (0 until 5).map(i => (i.toLong, vec)).toDF("id", "v")
    val pairs = Similarity.cosineNearDupPairs(few, "id", "v",
      planes(2, 4, dim), threshold = 0.9, maxBucketSize = 50).count()
    assert(pairs == 10L, s"5 identical vectors → C(5,2)=10 pairs, got $pairs")
  }
}
