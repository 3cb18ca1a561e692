package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected-component keep-one selection over near-dup pairs: a CHAIN of
  * near-dups (a~b, b~c, but a and c less similar) must still collapse to
  * one kept doc — the transitive case pair-lists alone can't express.
  */
class NearDupKeepSpec extends SparkSpec {

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

  test("a 50-node chain graph converges without driver blowup") {
    import spark.implicits._
    // a PATH of overlapping docs: doc i ~ doc i+1 only. Min-label
    // propagation advances one hop per round, so 50 nodes force ~50
    // rounds — the periodic localCheckpoint keeps each round's plan and
    // the persisted-RDD chain bounded instead of 50 plans deep.
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
}
