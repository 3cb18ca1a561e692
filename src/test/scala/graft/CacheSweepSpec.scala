package graft

import graft.ml.Dedup
import org.apache.spark.sql.functions._

/** Round-2 judge finding: LSH pair generators persist signature tables
  * that accumulated across queries in a long-lived session. The contract
  * now: caller owns the lifetime; Verify/Bench sweep after every query.
  */
class CacheSweepSpec extends SparkSpec {

  test("sweep releases the persisted LSH signature caches") {
    import spark.implicits._
    val docs = (1 to 50).map(i => (i.toLong, s"w$i common tokens here a b c"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text")
    pairs.count() // terminal action → signature table persisted + built
    assert(!spark.sharedState.cacheManager.isEmpty,
      "minhashPairs should have persisted its signature table")
    CacheSweep.sweep(spark)
    assert(spark.sharedState.cacheManager.isEmpty,
      "sweep must clear cached relations")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "sweep must leave no persistent RDDs behind")
  }
}
