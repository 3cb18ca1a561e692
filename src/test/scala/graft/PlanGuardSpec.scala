package graft

/** Plan-shape regression guard: the exchange budget of EVERY oracle
  * query is pinned, so a future change that silently adds a shuffle —
  * the classic 100 TB regression, invisible at test scale — fails CI
  * instead of the cluster. Counts use [[ScaleProof.planExchanges]]
  * (Exchange lines; ReusedExchange and InMemoryRelation-cached subtrees
  * excluded — a cache builds once at plan time) on the pre-execution
  * physical plan; narrow queries pin to EXACTLY zero, shuffling queries
  * to a ceiling (AQE may plan fewer).
  *
  * `ml_neardup_keep`'s label propagation runs EAGERLY at plan build
  * (persisted rounds + a final localCheckpoint), so its returned plan
  * is a scan of the settled id→root table — the budget below covers
  * that final plan; the per-round shapes (one join + one aggregate,
  * lineage-truncated) are NearDupSpec's business.
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def exchanges(name: String): Int =
    ScaleProof.planExchanges(GraftQueries.queries(name)(spark, dir))

  /** Queries whose plan must be completely narrow: any Exchange at all
    * is a regression (scan-speed operators at 100 TB).
    */
  private val narrow = Seq(
    // filter DSL compiles to a pushed-down scan predicate
    "filter_lucene_bool", "filter_lucene_daterange", "filter_lucene_group",
    "filter_lucene_null", "filter_lucene_range", "filter_lucene_sigma",
    "filter_lucene_wildcard",
    // per-row text / embedding / curation kernels
    "ml_quality_score", "ml_repetition", "ml_lang_id", "ml_token_count",
    "ml_text_normalize", "ml_gopher_quality", "ml_dedup_lines",
    "ml_c4_line_filter",
    // hashed bucket models collect at plan time (bounded reductions, the
    // bpe_merges convention); the returned scoring plan is one narrow
    // LUT-fold projection, selection a TakeOrdered on top
    "ml_dsir_weights", "ml_dsir_sample",
    "ml_fingerprint", "ml_hash_split", "ml_weighted_sample",
    // per-stratum counts collect at plan time (bounded reduction); the
    // returned plan is the narrow content-addressed keep filter
    "ml_temperature_sample",
    // token totals collect at plan time (the bpe_merges convention);
    // the returned plan is the narrow keep filter
    "ml_token_budget_sample",
    "ml_pii_redact", "ml_chunk_spans", "ml_embed_lsh_bucket",
    "ml_embed_pq_encode", "ml_embed_sq8",
    // k-means training collects per-round (bounded k×dim reductions, the
    // bpe_merges convention); the returned assignment is one narrow
    // native-argmin projection over a pushed-down scan
    "ml_kmeans_assign",
    "ml_classifier_margin", "ml_multimodal_decode",
    "ml_audio_pcm", "ml_audio_flac", "ml_lang_mix", "ml_pii_cards",
    "ml_multimodal_audio", "ml_multimodal_pdf", "ml_multimodal_video",
    "ml_multimodal_image", "ml_multimodal_pixels",
    // driver-side merge table (computed before the plan; the result is
    // a parallelized literal) and the merge-application projection
    "ml_bpe_merges", "ml_bpe_tokens",
    // every processor conformance query is a guarded narrow projection
    "proc_amides", "proc_calculator", "proc_clusterer", "proc_concatenator",
    "proc_datetime_extractor", "proc_decoder_base64", "proc_decoder_clf",
    "proc_decoder_cri", "proc_decoder_decolorize", "proc_decoder_docker",
    "proc_decoder_json", "proc_decoder_logfmt", "proc_decoder_nginx",
    "proc_decoder_syslog", "proc_decoder_syslog5424", "proc_deduplicator",
    "proc_deleter", "proc_dissector", "proc_dissector_append",
    "proc_domain_label_extractor", "proc_domain_resolver", "proc_dropper",
    "proc_field_manager", "proc_generic_adder", "proc_generic_resolver",
    "proc_grokker", "proc_ip_informer", "proc_key_checker", "proc_labeler",
    "proc_list_comparison", "proc_network_comparison", "proc_pre_detector",
    "proc_pseudonymizer", "proc_pseudonymizer_substring", "proc_replacer",
    "proc_replacer_template", "proc_requester", "proc_selective_extractor",
    "proc_string_splitter", "proc_template_replacer", "proc_timestamp_differ",
    "proc_timestamper",
    // sort_limit plans as TakeOrderedAndProject — no exchange
    "q17_pipeline_sort")

  /** Ceilings for the shuffling queries (measured r8, sf0.001; a bump
    * above the ceiling means a new shuffle crept into the plan).
    */
  private val budgets = Map(
    "ml_contamination" -> 4,
    "ml_corpus_profile" -> 9, // three strata-keyed aggregates + two joins
                              // (≤ strata rows each side)
    "ml_curation_pipeline" -> 2,
    "ml_dedup_against" -> 2,
    "ml_dedup_exact" -> 3,
    "ml_doc_freq" -> 4,
    "ml_dup_ngrams" -> 4,
    "ml_dup_spans" -> 3,       // gram count agg + gram join + id agg
    "ml_dup_spans_clean" -> 4, // dupSpans + span-table id agg; doc join broadcasts
    "ml_semantic_keep" -> 6,   // cluster-size agg + in-cluster self-join + anti
    "ml_bm25_topk" -> 7,       // all post-broadcast-prune (query-term-
                               // sized); tf persisted — ONE corpus scan
                               // subtree, excluded from the count by
                               // the tree traversal (r12: cached plans
                               // are no longer double-booked)
    "ml_bm25_index" -> 5,      // the bm25 tail over a bucket-pruned
                               // postings read instead of the corpus
                               // scan: no tokenize/explode subtree at
                               // all, df agg + score agg + window —
                               // 2 fewer exchanges than ml_bm25_topk
                               // and the corpus never enters the plan
    "ml_bm25_ingest" -> 5,     // the ml_bm25_index tail verbatim: the
                               // ingest appends run at plan-BUILD time
                               // (the ann_ingest convention), so the
                               // returned plan is the same bucket-
                               // pruned postings read — bid partitions
                               // add directories, not exchanges
    "ml_para_dedup" -> 5,      // digest distinct+count, anti-join, reassembly agg
    "ml_embed_covariance" -> 1, // ONE dim²-buffer moment aggregate; explode narrow
    "ml_embed_ivf_topk" -> 2,
    "ml_ivf_kmeans_topk" -> 2,  // same probe/score plan, trained centroids
    "ml_ann_pipeline" -> 2,    // the ivf_kmeans plan reached through the
                               // ann_topk YAML stage (corpus persisted
                               // by stagedInput — cache subtree excluded;
                               // queries side table broadcasts)
    "ml_ann_ingest" -> 2,      // written-index batch read: bucket-pruned
                               // scan + broadcast probe join + the
                               // per-query window top-k exchange
    "ml_embed_neardup" -> 7,   // r14: dot computed IN the band join —
                               // the narrow-candidate → wide verify-join
                               // re-shuffle (2 exchanges) is gone
    "ml_embed_neardup_recall" -> 7, // same plan, recall-targeted 17x9
                               // geometry — more bands widen the band
                               // explode, never the exchange count
    "ml_embed_outlier" -> 2,   // dim-sized centroid to driver; dist narrow
    "ml_embed_topk" -> 2,
    "ml_embed_sq8_topk" -> 2, // broadcast queries + per-query window top-k
    "ml_cluster_purity" -> 2,  // cluster-label histogram + tiny window
    "ml_cluster_sample" -> 1,  // one shuffle on the cluster key (top-k
                               // is a WindowGroupLimit below the sort)
    "ml_hybrid_topk" -> 13,    // bm25 channel (persisted tf feeds df +
                               // scoring, broadcast-pruned) + cosine
                               // channel (broadcast queries, window
                               // top-k) + the RRF fuse agg/window; both
                               // channels broadcast the query side, so
                               // the corpus never shuffles — the counted
                               // exchanges carry ≤ 2·|q|·fetch_k rank
                               // rows and query-term-sized aggregates
    "ml_hybrid_index" -> 10,   // ml_hybrid_topk with the semantic
                               // channel served from the written flat
                               // index: the brute channel's 3
                               // exchanges become a bucket-pruned scan
                               // + broadcast probe join + the same
                               // per-query window top-k — the bm25
                               // channel and RRF fuse are unchanged
    "ml_fuzzy_against" -> 17,  // segment cross shape: emit-union cap agg
                               // (persisted; its broadcast appears under
                               // each of the 4 anti-joins), two oriented
                               // candidate legs, dirty distinct, final
                               // anti join + spec orderBy. Plan-TEXT
                               // count; executed stages reuse the cap
                               // broadcast and both legs' exchanges
    "ml_fuzzy_ingest" -> 2,    // returned plan is the union of two
                               // settled (localCheckpoint) batches +
                               // spec orderBy; the per-batch machinery
                               // runs eagerly at plan build
    "ml_fuzzy_pairs_seg" -> 5, // one oriented join (idx x probe emits
                               // over one persisted compact projection),
                               // persisted cap agg, canonical distinct
                               // + spec orderBy
    "ml_fuzzy_pairs" -> 6,     // banded self-join (two sides keyed on
                               // the length bucket) + the spec orderBy;
                               // the cap-count agg/anti branch replans
                               // per join side over the PERSISTED
                               // narrow (id, s, len, bkt) projection
                               // (the minhashPairs sig-persist shape —
                               // the duplicated branch aggregates
                               // cached short-field rows)
    "ml_fuzzy_keep" -> 2,      // settled checkpoint scan (componentMins
                               // truncates lineage) + keep filter
    "ml_jaccard_pairs" -> 8,
    "ml_containment_pairs" -> 7, // df-capped inverted-index self-join:
                               // gram agg, semi, per-doc n, pair agg,
                               // two n joins, orderBy (occ cache inside)
    "ml_knn_graph" -> 7,       // the embed_neardup candidate machinery
                               // + the per-node top-k window shuffle
    "ml_minhash_pairs" -> 6,   // persisted signature table (excluded
                               // from the count) + banded bucket joins
    "ml_minhash_signature" -> 1,
    "ml_embed_neardup_against" -> 7, // two-sided band join, dot in-join
                               // (r14) — no narrow-candidate verify
                               // re-join
    "ml_neardup_against" -> 10,
    "ml_neardup_clusters" -> 2, // r17 small-graph path: the root map is
                               // a driver union-find broadcast (one
                               // BroadcastExchange) + the spec orderBy —
                               // no hidden checkpoint scan anymore
    "ml_cluster_split" -> 3,   // label join back to the corpus (2 sides)
                               // + the spec's orderBy range exchange
    "ml_neardup_keep" -> 2,    // r17 small-graph path (see
                               // ml_neardup_clusters) + keep filter
    "ml_ngram_topk" -> 1,
    "ml_quality_budget" -> 2,  // boundary-band window + the spec orderBy
                               // (band totals collect at plan time)
    "ml_zipf_fit" -> 2,        // token count agg + bounded top-N tail
                               // (vocab cache inside)
    "ml_pack_chunks" -> 3,
    "ml_shuffle_layout" -> 1,
    "ml_simhash" -> 1,
    "ml_simhash_keep" -> 2,    // r17 small-graph path (see
                               // ml_neardup_clusters) + keep filter
    "ml_simhash_pairs" -> 7,
    "ml_image_ahash" -> 1,     // mapPartitions hash kernel + orderBy
    "ml_audio_ahash" -> 1,     // same shape over PCM frame energies
    "ml_media_against" -> 8,   // two-sided banded Hamming match + anti
                               // (persisted two-side fp table inside)
    "ml_media_recipe" -> 4,    // composed envelope→dedup_media→split:
                               // the keep semi-join + spec orderBy; r17
                               // small-graph components add the
                               // broadcast root map to the RETURNED
                               // plan (the old budget hid the settled
                               // work behind a plan-time checkpoint)
    "ml_image_neardup" -> 7,   // banded 64-bit Hamming join (the
                               // simhash_pairs shape over image hashes)
    "ml_stratified_sample" -> 1,
    "ml_unigram_logprob" -> 5, // fused one-pass count training (r12):
                               // the persisted vocab table leaves only
                               // the price join + per-doc agg live
    "ml_bigram_logprob" -> 7,  // ONE fused+persisted gram-count pass
                               // (r12) + vocab-keyed prob-table joins +
                               // one gram-keyed doc join + id agg
                               // (occurrence shuffles carry 16-byte md5
                               // digests, not gram strings — r11)
    "ml_lm_buckets" -> 3,      // same LM-at-plan-build shape as quantile
    "ml_lm_quantile" -> 3,     // the LM subtree executes at plan-build
                               // time behind the scores persist (r12) —
                               // the RETURNED plan is two cache scans
                               // joined; the threshold is a plan-time
                               // scalar folded in as a literal
    "ml_trigram_backoff" -> 11, // the bigram_xent shape + one more count
                               // level (two extra type-keyed left joins)
    "ml_trigram_backoff_store" -> 11, // same scoring plan; counts come
                               // from the store's bid partitions
    "ml_bigram_xent" -> 9,     // the bigram-LM shape with a corpus-type
                               // distinct + three LEFT prob-table joins
    "ml_bigram_xent_store" -> 9, // the same returned plan; the store
                               // appends run at plan-build time and the
                               // merged count table persists like the
                               // fused train pass
    "ml_decontam_spans" -> 3,  // bench digests broadcast; gram join + id agg
    "ml_decontam_clean" -> 4,  // spans + span-table id agg; doc join broadcasts
    "ml_pretrain_recipe" -> 3, // 5-stage composed recipe: every corpus-
                               // training stage (LM gate, DSIR models)
                               // executes at plan-build time behind its
                               // persist, so the RETURNED plan is cache
                               // scans + the keep joins + TakeOrdered;
                               // the training cost shows in wall time
                               // (the honest metric), not in the
                               // returned plan's exchange count
    "proc_geoip_enricher" -> 1,   // mmdb ranges broadcast-joined
    "proc_pseudonym_mapping" -> 1, // mapping side output aggregate
    "q10_rollup" -> 1,
    "q11_sessionize" -> 1,
    "q12_asof_join" -> 2,
    "q13_pipeline_agg" -> 2,
    "q14_pipeline_join" -> 3,
    "q15_pipeline_window" -> 1,
    "q16_pipeline_dedup" -> 1,
    "q18_pipeline_sessionize" -> 1,
    "q19_pipeline_running" -> 1,
    "q1_agg" -> 1,
    "q2_join_broadcast" -> 4,
    "q3_topk_window" -> 1,
    "q4_running_window" -> 1,
    "q5_semi_join" -> 1,
    "q6_anti_join" -> 1,
    "q7_distinct_agg" -> 2,
    "q8_set_ops" -> 5,
    "q9_wordcount_explode" -> 1)

  test("every oracle query is covered by a budget") {
    val covered = narrow.toSet ++ budgets.keySet
    val missing = SparkEntry.queries.keySet -- covered
    assert(missing.isEmpty,
      s"queries without an exchange budget: ${missing.toSeq.sorted}")
    val stale = covered -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"budgets for removed queries: ${stale.toSeq.sorted}")
  }

  test("narrow queries plan ZERO exchanges") {
    val bad = narrow.flatMap { q =>
      val n = exchanges(q)
      if (n != 0) Some(s"$q planned $n exchanges") else None
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("shuffling queries stay within their exchange budget") {
    val bad = budgets.toSeq.sortBy(_._1).flatMap { case (q, budget) =>
      val n = exchanges(q)
      if (n > budget) Some(s"$q plans $n exchanges, budget $budget") else None
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }
}
