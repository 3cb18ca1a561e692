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
}
