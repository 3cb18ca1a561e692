package graft

/** Plan-shape regression guard: the exchange budget of every headline
  * query is pinned, so a future change that silently adds a shuffle —
  * the classic 100 TB regression, invisible at test scale — fails CI
  * instead of the cluster. Counts use the ScaleProof convention
  * (Exchange lines, ReusedExchange excluded) on the pre-execution
  * physical plan; narrow queries pin to EXACTLY zero.
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def exchanges(name: String): Int =
    GraftQueries.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("ReusedExchange"))

  test("narrow queries plan ZERO exchanges") {
    val narrow = Seq("ml_quality_score", "ml_repetition", "ml_lang_id",
      "ml_token_count", "ml_fingerprint", "ml_hash_split",
      "ml_weighted_sample", "ml_pii_redact", "ml_chunk_spans",
      "ml_embed_lsh_bucket", "ml_embed_pq_encode")
    narrow.foreach { q =>
      assert(exchanges(q) == 0, s"$q grew a shuffle")
    }
  }

  test("shuffling queries stay within their exchange budget") {
    val budgets = Map(
      "ml_dedup_exact" -> 3,       // key aggregate + keep-set join
      "ml_shuffle_layout" -> 1,    // ONE hash exchange on the shard
      "ml_stratified_sample" -> 1, // ONE exchange on the stratum key
      "ml_dedup_against" -> 2,     // key distinct + anti join
      "ml_minhash_pairs" -> 10,
      "ml_embed_neardup" -> 9,
      "ml_neardup_against" -> 16,
      "ml_dup_ngrams" -> 4,
      "ml_doc_freq" -> 4,
      "ml_curation_pipeline" -> 2,
      "ml_ngram_topk" -> 1,        // one aggregate; top-k is TakeOrdered
      "ml_pack_chunks" -> 3,
      "q1_agg" -> 1)
    budgets.foreach { case (q, budget) =>
      val n = exchanges(q)
      assert(n <= budget, s"$q plans $n exchanges, budget $budget")
    }
  }
}
