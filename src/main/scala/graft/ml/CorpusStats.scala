package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level statistics for training-data curation: n-gram frequency
  * tables, benchmark-contamination detection, and token document-frequency
  * (rarity) signals. These are the cross-document complement of
  * [[TextAnalysis]]'s per-row signals — each involves exactly the shuffles
  * its semantics force and nothing more.
  *
  * Scale shapes (the 100 TB reading):
  *  - n-gram counts: explode → ONE map-side-combined hash aggregate;
  *    the shuffle carries (gram, partial count) pairs — vocabulary-sized,
  *    not corpus-sized. Top-k is `TakeOrderedAndProject` (per-partition
  *    heaps + driver merge of k rows), never a global sort.
  *  - contamination: the benchmark side of the join is an eval set —
  *    small BY DEFINITION — so it broadcasts; the corpus side stays a
  *    narrow explode feeding one per-doc aggregate.
  *  - document frequency: two aggregates (per-token df, per-doc stats)
  *    plus one token-keyed join; all integer arithmetic until a single
  *    final division, so engine and oracle agree bit-exactly.
  */
object CorpusStats {

  /** Consecutive word n-grams, multiplicity kept, via the native
    * [[graft.functions.NgramsExpr]] kernel (the HOF composition —
    * `transform(sequence(...))` over a split — is CodegenFallback and
    * interpreted per row). Words = single-space split, empties removed
    * ([[Curation.words]] semantics). Under n words → empty array.
    */
  def ngramArray(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.NgramsExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(text), n))

  /** Corpus n-gram frequency table: (ngram, cnt). One explode + one
    * map-side-combined aggregate.
    */
  def ngramCounts(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(explode(ngramArray(col(textCol), n)).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("cnt"))

  /** Top-k corpus n-grams with a total-order tie-break (count desc, gram
    * asc) so the cut is deterministic across engines and runs. The
    * orderBy+limit pair plans as TakeOrderedAndProject: per-partition
    * top-k heaps, k rows to the driver — no global sort at any scale.
    */
  def ngramTopK(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    ngramCounts(df, textCol, n)
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)

  /** Benchmark-contamination check (the train/test-leak gate every
    * training-data pipeline needs): for each corpus document, how many of
    * its distinct k-word shingles also appear anywhere in the benchmark
    * set, and the overlap fraction of the document's own shingle set.
    *
    * `contaminated` = overlap_frac ≥ threshold (as int for cross-engine
    * stability). Documents with fewer than k words carry no shingle
    * evidence and must be pre-filtered by the caller (same contract as
    * the MinHash family).
    *
    * The benchmark's distinct-shingle set is broadcast — eval benchmarks
    * are small by definition, and this keeps the corpus side a narrow
    * explode feeding one per-doc aggregate (no corpus shuffle beyond it).
    */
  def contamination(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val benchSh = bench
      .select(explode(Dedup.shingles(col(benchTextCol), k)).as("s"))
      .distinct()
    val docSh = corpus.select(col(idCol).as("id"),
      Dedup.shingles(col(textCol), k).as("sh"))
    val shared = docSh.select(col("id"), explode(col("sh")).as("s"))
      .join(broadcast(benchSh), Seq("s"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared"))
    docSh.select(col("id"), size(col("sh")).cast("long").as("n_shingles"))
      .join(shared, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("overlap_frac",
        round(col("n_shared").cast("double") / col("n_shingles"), 6))
      .withColumn("contaminated",
        (col("overlap_frac") >= threshold).cast("int"))
  }

  /** Per-document unigram language-model score — the corpus-aware quality
    * signal (a cheap stand-in for model perplexity): the average natural
    * log-probability of the document's token occurrences under the
    * corpus's own unigram MLE distribution, `avg(ln cnt(t) − ln N)`.
    * Boilerplate and template text scores high (common tokens); garbage
    * and wrong-language text scores low. Returns every input row with
    * `n_tokens` and `avg_logprob` (0.0 for empty docs).
    *
    * Scale: ONE token-count aggregate (vocabulary-sized output), the
    * corpus total folded in as a broadcast single-row cross join (the
    * count never touches the driver), one token-keyed join back, one
    * per-doc aggregate. The same two-aggregate shape as [[docFreqStats]].
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(Curation.words(col(textCol))).as("t"))
    // lazy-persisted (the bigramLogProb convention, CacheSweep-released):
    // the corpus-total branch and the price join prune this aggregate
    // differently, so without the cache each would re-run the token
    // explode over the whole corpus
    val cnt = tok.groupBy(col("t")).agg(count(lit(1)).as("c")).persist()
    val total = cnt.agg(sum(col("c")).as("n"))
    val per = tok.join(cnt, Seq("t"))
      .crossJoin(broadcast(total))
      .groupBy(col("id")).agg(
        count(lit(1)).as("n_tokens"),
        round(avg(log(col("c").cast("double")) - log(col("n").cast("double"))), 6)
          .as("avg_logprob"))
    df.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** Substring-level duplication signal (the n-gram approximation of
    * suffix-array dedup, Lee et al. 2022 "Deduplicating Training Data
    * Makes Language Models Better"): per document, how many of its
    * DISTINCT word n-grams also occur in at least one OTHER document,
    * and that count as a fraction of the document's n-gram set. High
    * `dup_frac` with a low exact/MinHash signal flags partially-copied
    * text (quotes, boilerplate paragraphs) that whole-document dedup
    * misses.
    *
    * Scale: same two-aggregate + token-keyed-join shape as
    * [[docFreqStats]] — the gram table is vocabulary-sized, the join key
    * is the gram, nothing is ever pairwise.
    */
  def dupNgramStats(df: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    val dg = df.select(col(idCol).as("id"),
      explode(array_distinct(ngramArray(col(textCol), n))).as("g"))
    // dg is distinct per (id, g), so count(*) = number of docs carrying g
    val gc = dg.groupBy(col("g")).agg(count(lit(1)).as("docs"))
    val per = dg.join(gc, Seq("g"))
      .groupBy(col("id")).agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("docs") >= 2, 1L).otherwise(0L)).as("n_dup"))
    df.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(round(col("n_dup").cast("double") / col("n_grams"), 6),
          lit(0.0)).as("dup_frac"))
  }

  /** BM25 top-k text retrieval (Robertson/Spärck Jones; the Okapi
    * formulation with the Lucene-style always-positive idf
    * `ln(1 + (N − df + 0.5)/(df + 0.5))`): for each query, the k
    * highest-scoring corpus documents with a deterministic total order
    * (rounded score desc, doc id asc). This is the lexical complement of
    * the embedding ANN family — decontamination sweeps, quality-example
    * mining, and eval-set retrieval all want it over raw text.
    *
    * Scale (the 100 TB reading): the query set is small BY DEFINITION
    * (like [[contamination]]'s benchmark side), so its distinct term set
    * broadcasts and prunes the exploded corpus token stream BEFORE any
    * shuffle — the only corpus-wide work is the scan + explode + broadcast
    * semi-filter, which runs at scan speed. Everything downstream
    * (tf, df, scoring) operates on the query-term-matched subset:
    *  - `tf` groups (id, term) — all occurrences of a doc's terms live in
    *    ONE input row, so the partial aggregate collapses them map-side
    *    and the exchange carries distinct (doc, query-term) pairs only;
    *  - `df` is a query-term-sized aggregate, rebroadcast with the
    *    corpus stats (N, avgdl — one tiny aggregate; doc lengths are
    *    integer-valued doubles so the sum is exact in any order);
    *  - per-query top-k is a row_number window that plans as
    *    WindowGroupLimit (per-partition heaps, never a full sort).
    * Nothing is ever pairwise in the corpus.
    */
  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qidCol: String, qtextCol: String,
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // corpus statistics ride the tf pass as observed metrics (r17 —
    // guide §1.2 "don't compute things twice"): the previous shape ran
    // a SECOND full scan+tokenize just for the one-row (n_docs, avgdl)
    // aggregate. count/sum over integer-valued doubles are order-exact,
    // and sum/count is the same IEEE division Average performs, so the
    // literals below are bit-identical to the old crossJoin(stats) —
    // the same argument (and the same literal formulation) as
    // [[LexIndex.bm25ReadTopK]]'s frozen marker statistics, which the
    // shared ml_bm25_* oracle already gates.
    val obs = new org.apache.spark.sql.Observation(
      "bm25_stats_" + java.util.UUID.randomUUID())
    val docsRaw = corpus.select(col(idCol).as("id"),
        Curation.words(col(textCol)).as("__w"))
      .withColumn("dl", size(col("__w")).cast("double"))
    val docs = docsRaw
      .observe(obs, count(lit(1)).as("__n"), sum(col("dl")).as("__s"))
    // persisted (the minhashPairs convention): the query side feeds
    // BOTH the qset semi-filter and the scoring join — one scan+split
    // of the query table, not one per broadcast build
    val qterms = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(Curation.words(col(qtextCol)))).as("t"))
      .persist()
    val qset = qterms.select(col("t")).distinct()
    // persisted (the minhashPairs convention): tf feeds BOTH the df
    // aggregate and the scoring join — without the persist each branch
    // replans the corpus scan + explode, doubling the only
    // corpus-proportional work in the query
    val tf = docs.select(col("id"), col("dl"), explode(col("__w")).as("t"))
      .join(broadcast(qset), Seq("t"))
      .groupBy(col("id"), col("t"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .persist()
    // eager: materializing tf here (it is persisted — the work happens
    // exactly once either way) delivers the observed corpus statistics,
    // which fold into the score expression as literals; the stats
    // subtree disappears from the plan instead of re-scanning the corpus
    tf.count()
    val statsRow = obs.get
    // the observed metrics arrive only when the observed subtree
    // actually EXECUTED: if tf's persist aliased an identical plan a
    // previous caller already cached (the CacheManager matches by plan
    // fingerprint), the count above read the cache and the observe
    // node never ran — fall back to the direct one-row aggregate over
    // the un-observed subtree (the pre-r17 shape, same exact values)
    val (nDocs, avgdl) =
      if (statsRow.contains("__n")) {
        val n = statsRow("__n").asInstanceOf[Long].toDouble
        (n, Option(statsRow("__s")).collect {
          case d: java.lang.Double if n > 0 => d.doubleValue / n
        }.getOrElse(0.0))
      } else {
        val r = docsRaw.agg(count(lit(1)), sum(col("dl"))).head()
        val n = r.getLong(0).toDouble
        (n, if (r.isNullAt(1) || n == 0) 0.0 else r.getDouble(1) / n)
      }
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    // the term-score arithmetic mirrors the oracle SQL token for token
    // (same literal structure, same association) so both engines compute
    // bit-identical per-term scores; only the ≤|query|-term sum is
    // order-sensitive, and the final round(…, 6) absorbs that ulp
    val termScore =
      log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)) *
      (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
    val scored = tf.join(broadcast(dfreq), Seq("t"))
      .join(broadcast(qterms), Seq("t"))
      .groupBy(col("qid"), col("id"))
      .agg(round(sum(termScore), 6).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("doc"), col("score"))
  }

  /** Per-document token-rarity signals from corpus document frequency:
    * over each document's DISTINCT words, the df of its rarest word
    * (`min_df`), the mean df (`avg_df`), and the distinct-word count.
    * Low `min_df`/`avg_df` flags documents built from corpus-rare
    * vocabulary — the threshold-free form of a "rare token fraction"
    * filter (a fixed rarity cutoff is corpus-dependent; min/mean df is
    * not).
    *
    * Words = [[Curation.words]] (single-space split, empties removed).
    * Documents with no words keep a row with zeros. All-integer until
    * the one final division, so the oracle matches bit-exactly.
    */
  def docFreqStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dt = df.select(col(idCol).as("id"),
      explode(array_distinct(Curation.words(col(textCol)))).as("t"))
    val dfreq = dt.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val stats = dt.join(dfreq, Seq("t"))
      .groupBy(col("id")).agg(
        count(lit(1)).as("n_distinct"),
        min(col("df")).as("min_df"),
        sum(col("df")).as("__sum_df"))
    df.select(col(idCol).as("id")).join(stats, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("min_df"), lit(0L)).as("min_df"),
        coalesce(round(col("__sum_df").cast("double") / col("n_distinct"), 6),
          lit(0.0)).as("avg_df"))
  }

  /** Per-document interpolated bigram language-model score — the
    * CCNet-style perplexity filter (Wenzek et al. 2020 score documents
    * with a KenLM n-gram model; this is the distributed-trainable
    * Jelinek-Mercer bigram member of that family, one step up the ladder
    * from [[unigramLogProb]]):
    *
    *   p(w2 | w1) = λ·c(w1 w2)/c(w1) + (1−λ)·c(w2)/N
    *
    * trained on the corpus's own counts and scored as the mean natural
    * log-probability over each document's bigram positions (documents
    * with < 2 words keep a row with zeros; perplexity = exp(−avg), left
    * to the caller — it is monotone in the score, so filters threshold
    * `avg_logprob` directly). The interpolation keeps every in-vocabulary
    * bigram finite (a word unseen as a bigram head still has a unigram
    * count ≥ 1, since bigram heads come from the same corpus).
    *
    * What the signal measures: word-ORDER anomaly — frequent contexts
    * followed by never-seen successors (scrambled text, keyword stuffing,
    * wrong-language islands inside in-vocabulary text) score low. What a
    * self-trained CONDITIONAL model deliberately does not penalize:
    * globally unique vocabulary (a once-seen context is deterministically
    * predictive) — that rarity axis is [[unigramLogProb]]'s business, and
    * a production filter thresholds both.
    *
    * Scale: the unigram and bigram count tables train in ONE corpus
    * pass — both gram kinds ride a single explode as `(kind, gram)`
    * entries into one digest-keyed map-side-combined aggregate whose
    * TYPE-sized output persists lazily (the minhashPairs convention,
    * released by [[graft.CacheSweep]]); the two vocabulary tables are
    * `kind` filters over the cached result. The persist is what makes
    * the sharing real: the four consumers (two prob-table joins, the
    * corpus total, the bigram count) are column-pruned DIFFERENTLY by
    * Catalyst, so their aggregate subtrees are not canonically equal
    * and exchange reuse can never fire — without the cache each
    * consumer re-runs the corpus explode (measured: 4 corpus-sized
    * aggregate executions for the previous two-aggregate form). One
    * corpus pass + three cache scans replaces all of it; the cached
    * table is vocabulary-sized, orders of magnitude below the corpus.
    * The per-TYPE probability table is assembled with two
    * token-keyed joins on the vocabulary tables (never per-occurrence);
    * the corpus total folds in as a broadcast single-row cross join;
    * the doc side is ONE gram-keyed join feeding one per-doc aggregate
    * — the [[unigramLogProb]] shape with a bigram key. Nothing is
    * pairwise. The occurrence-sized shuffles (the fused count agg,
    * doc-side price join) key on 16-byte md5 digests of the gram — the
    * [[Dedup.dupSpans]] convention — never on gram strings; only the
    * vocabulary-sized tables carry text (needed to price each type).
    * Digest equality stands in for gram equality (collisions accepted
    * at 2^-64 scale, same as the dup-span family), so results are
    * identical to string-keyed joins and the oracle can keep its
    * string keys.
    */
  /** One-pass gram-count training shared by the bigram LMs: unigrams
    * (`kind` 0) and bigrams (`kind` 1) of `textCol` ride a single
    * explode into one map-side-combined count aggregate. Callers
    * persist the result (it is TYPE-sized) and split it with `kind`
    * filters — the persist, not exchange reuse, is what shares the
    * corpus pass: differently-pruned consumers never canonicalize to
    * the same exchange (see [[bigramLogProb]]'s scale note).
    *
    * The aggregate groups on the gram TEXT with a bare count, not on
    * its digest with a `first(text)` rider: a pure count keeps the
    * fixed-width-buffer HashAggregate fast path, where any
    * variable-width aggregation buffer (first/max over strings) demotes
    * the whole corpus-sized pass to SortAggregate — measured ~2× slower
    * at sf0.1. Bigram text (two words) is the same order as a 16-byte
    * digest, so the TYPE-sized shuffle rows are no wider than the
    * digest+rider layout; the digest is projected AFTER the aggregate
    * for the occurrence-sized joins downstream. Output: `(kind,
    * gd = md5 digest, c = count, g = gram text)` — the only tables
    * that carry gram text.
    */
  private def fusedGramCounts(df: DataFrame, textCol: String): DataFrame =
    fusedGramCountsN(df, textCol, 2)

  /** [[fusedGramCounts]] generalized to orders 1..n (kind = order−1):
    * ONE explode trains every count table — the shape the bigram
    * (n=2) and trigram (n=3) LMs and the [[GramStore]] appends share.
    */
  private[graft] def fusedGramCountsN(df: DataFrame, textCol: String,
                                   orders: Int): DataFrame = {
    require(orders >= 1 && orders <= 5, s"gram orders 1..5, got $orders")
    val legs = (1 to orders).map { n =>
      if (n == 1) transform(Curation.words(col(textCol)),
        w => struct(lit(0).as("kind"), w.as("g")))
      else transform(ngramArray(col(textCol), n),
        b => struct(lit(n - 1).as("kind"), b.as("g")))
    }
    df.select(explode(concat(legs: _*)).as("e"))
      .select(col("e.kind").as("kind"), col("e.g").as("g"))
      .groupBy(col("kind"), col("g"))
      .agg(count(lit(1)).as("c"))
      .select(col("kind"), unhex(md5(col("g"))).as("gd"),
        col("c"), col("g"))
  }

  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
                    lambda: Double = 0.9): DataFrame = {
    // ONE pass over the token stream counts both gram kinds; `first(g)`
    // is well-defined per digest (bijective modulo accepted collisions)
    // and keeps the text off the wide side of the shuffle
    val counts = fusedGramCounts(df, textCol).persist()
    val uni = counts.filter(col("kind") === 0)
      .select(col("g").as("t"), col("c").as("c1"))
    val total = uni.agg(sum(col("c1")).cast("double").as("n"))
    val big = df.select(col(idCol).as("id"),
      explode(ngramArray(col(textCol), 2)).as("g"))
      .select(col("id"), unhex(md5(col("g"))).as("gd"))
    val bcnt = counts.filter(col("kind") === 1)
      .select(col("gd"), col("c").as("c2"), col("g"))
    // words contain no spaces (single-space split), so the bigram key
    // splits back losslessly into its two tokens
    val parts = bcnt
      .withColumn("__w1", element_at(split(col("g"), " "), 1))
      .withColumn("__w2", element_at(split(col("g"), " "), 2))
    // per-TYPE probability: mirror the oracle SQL token for token (same
    // literal structure, same association) for bit-identical doubles
    val probs = parts
      .join(uni.select(col("t").as("__w1"), col("c1").as("__cw1")), Seq("__w1"))
      .join(uni.select(col("t").as("__w2"), col("c1").as("__cw2")), Seq("__w2"))
      .crossJoin(broadcast(total))
      .select(col("gd"),
        (lit(lambda) * col("c2").cast("double") / col("__cw1").cast("double") +
         lit(1.0 - lambda) * col("__cw2").cast("double") / col("n"))
          .as("p"))
    val per = big.select(col("id"), col("gd")).join(probs, Seq("gd"))
      .groupBy(col("id")).agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log(col("p"))), 6).as("avg_logprob"))
    df.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** Per-stratum corpus profile — the summary report a curation run
    * starts and ends with (what changed?): per `strataCol` value, the
    * document count, token totals and bounds, distinct-token vocabulary
    * size, distinct-text count (exact-dup pressure), and mean char
    * length. All EXACT (no sketches) and integer until the one final
    * division, so the oracle matches bit-for-bit.
    *
    * Scale: one narrow pass computes per-doc counts; the per-stratum
    * scalar stats are ONE map-side-combined aggregate (≤ strata rows
    * out). Vocabulary size needs distinct (stratum, token) — that is a
    * token-keyed distinct aggregate whose shuffle carries distinct
    * pairs, vocabulary-sized per stratum, never corpus-sized; same for
    * the 16-byte distinct-text digests. Three aggregates, nothing
    * pairwise, output ≤ strata rows.
    */
  def corpusProfile(df: DataFrame, strataCol: String,
                    textCol: String): DataFrame = {
    val staged = df.select(col(strataCol).as("stratum"),
      col(textCol).as("__t"),
      Curation.words(col(textCol)).as("__w"))
    val scalar = staged.groupBy(col("stratum")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("__w"))).cast("long").as("n_tokens"),
      min(size(col("__w"))).cast("long").as("min_tokens"),
      max(size(col("__w"))).cast("long").as("max_tokens"),
      sum(length(col("__t"))).cast("long").as("__chars"))
    val vocab = staged
      .select(col("stratum"), explode(array_distinct(col("__w"))).as("t"))
      .distinct()
      .groupBy(col("stratum")).agg(count(lit(1)).as("n_vocab"))
    val texts = staged
      .select(col("stratum"), md5(col("__t")).as("h")).distinct()
      .groupBy(col("stratum")).agg(count(lit(1)).as("n_texts"))
    scalar.join(vocab, Seq("stratum"), "left")
      .join(texts, Seq("stratum"), "left")
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        col("min_tokens"), col("max_tokens"),
        coalesce(col("n_vocab"), lit(0L)).as("n_vocab"),
        coalesce(col("n_texts"), lit(0L)).as("n_texts"),
        round(col("__chars").cast("double") / col("n_docs"), 6)
          .as("avg_chars"))
  }

  /** Reference-trained bigram LM scoring — the full CCNet architecture
    * (Wenzek et al. 2020): the model trains on a CLEAN exemplar corpus
    * and scores a different one, so out-of-vocabulary text is penalized
    * (the property [[bigramLogProb]]'s self-trained form deliberately
    * lacks — see its scaladoc). Per corpus-document mean natural log of
    *
    *   p(w2 | w1) = λ·c(w1 w2)/c(w1)              (0 when w1 unseen)
    *              + (1−λ)·(c(w2)+1)/(N+V+1)       (add-one over vocab)
    *
    * with counts from TRAIN only; V = train vocabulary size, N = train
    * token count. Every position stays finite: unseen words fall back
    * to the add-one unigram floor 1/(N+V+1), so a fully-OOV document
    * scores ≈ ln(λ·0 + (1−λ)/(N+V+1)) — far below in-distribution text.
    *
    * Scale: train-side work is ONE fused pass (both vocabulary count
    * tables from a single persisted [[fusedGramCounts]] aggregate — the
    * [[bigramLogProb]] shape and caching convention) + two scalars; the
    * corpus side runs ONE persisted gram explode whose cache feeds both
    * the type-distinct and the occurrence table, DISTINCTs its bigram
    * types, prices each TYPE with three vocabulary-keyed left joins,
    * then one gram-keyed join back per occurrence — never
    * per-occurrence pricing, never pairwise. Occurrence-sized shuffles (the fused count agg, the
    * corpus type-distinct, the price join) key on 16-byte md5 digests,
    * the [[bigramLogProb]] / [[Dedup.dupSpans]] convention.
    */
  def bigramLogProbAgainst(corpus: DataFrame, train: DataFrame,
                           idCol: String, textCol: String,
                           lambda: Double = 0.9): DataFrame =
    bigramScoreFromCounts(corpus, fusedGramCounts(train, textCol),
      idCol, textCol, lambda)

  /** [[bigramLogProbAgainst]] trained from an incremental [[GramStore]]
    * instead of a training CORPUS — the 100 TB retraining shape: the
    * store's merged count table is vocabulary-sized (never re-scanning
    * the exemplar corpus), and because batch counts sum exactly to the
    * one-shot counts, the scores are BIT-IDENTICAL to training on the
    * concatenated corpus (oracle-gated: ml_bigram_xent_store replays
    * the direct computation).
    */
  def bigramLogProbFromStore(corpus: DataFrame, store: String,
                             idCol: String, textCol: String,
                             lambda: Double = 0.9): DataFrame = {
    val spark = corpus.sparkSession
    require(GramStore.orders(spark, store) >= 2,
      s"bigram scoring needs a gram store of orders >= 2 at $store")
    bigramScoreFromCounts(corpus, GramStore.counts(spark, store),
      idCol, textCol, lambda)
  }

  private def bigramScoreFromCounts(corpus: DataFrame, counts0: DataFrame,
                                    idCol: String, textCol: String,
                                    lambda: Double): DataFrame = {
    val counts = counts0.persist()
    val uni = counts.filter(col("kind") === 0)
      .select(col("g").as("t"), col("c").as("c1"))
    val stats = uni.agg(sum(col("c1")).cast("double").as("n"),
      count(lit(1)).cast("double").as("v"))
    val bcnt = counts.filter(col("kind") === 1)
      .select(col("gd"), col("c").as("c2"))
    // ONE corpus gram explode feeds BOTH the occurrence table and the
    // type-distinct — persisted, because the two consumers prune the
    // subtree differently (id+digest vs bare text) and can never
    // canonicalize to a shared exchange (the fusedGramCounts finding,
    // train side); un-persisted, the corpus-sized explode + word split
    // ran TWICE. Digests compute on the cached read so the cache rows
    // stay (id, gram) narrow. CacheSweep-released.
    val grams = corpus.select(col(idCol).as("id"),
      explode(ngramArray(col(textCol), 2)).as("g")).persist()
    val big = grams.select(col("id"), unhex(md5(col("g"))).as("gd"))
    // type table: text-keyed distinct (map-side combined — TYPE-sized
    // shuffle), digest projected AFTER — a `first(g)` rider would
    // demote this corpus-occurrence-sized pass from HashAggregate to
    // SortAggregate (the fusedGramCounts finding), where a bare
    // distinct keeps the hash fast path with an empty buffer
    val types = grams.select(col("g")).distinct()
      .select(unhex(md5(col("g"))).as("gd"), col("g"))
      .withColumn("__w1", element_at(split(col("g"), " "), 1))
      .withColumn("__w2", element_at(split(col("g"), " "), 2))
    // per-TYPE price, mirrored token for token in the oracle SQL
    val probs = types
      .join(bcnt, Seq("gd"), "left")
      .join(uni.select(col("t").as("__w1"), col("c1").as("__cw1")),
        Seq("__w1"), "left")
      .join(uni.select(col("t").as("__w2"), col("c1").as("__cw2")),
        Seq("__w2"), "left")
      .crossJoin(broadcast(stats))
      .select(col("gd"),
        (lit(lambda) * coalesce(
            col("c2").cast("double") / col("__cw1").cast("double"),
            lit(0.0)) +
         lit(1.0 - lambda) *
           (coalesce(col("__cw2"), lit(0L)).cast("double") + lit(1.0)) /
           (col("n") + col("v") + lit(1.0))).as("p"))
    val per = big.select(col("id"), col("gd")).join(probs, Seq("gd"))
      .groupBy(col("id")).agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log(col("p"))), 6).as("avg_logprob"))
    corpus.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"))
  }

  /** Positional benchmark decontamination (the removal counterpart of
    * [[contamination]], with [[Dedup.dupSpans]]'s positional semantics):
    * maximal token spans `[span_start, span_end)` of each corpus document
    * whose every position is covered by some k-gram that ALSO occurs in
    * the benchmark set. This is the eval-leak surgery step every
    * published pretraining recipe runs before training — flag-level
    * contamination ([[contamination]]) tells you WHICH documents overlap;
    * this tells you WHERE, so the span can be cut instead of dropping the
    * whole document.
    *
    * Scale: the benchmark gram set is an eval set — small BY DEFINITION —
    * so its distinct digests broadcast; the corpus side is one posexplode
    * joined against that broadcast (16-byte md5 keys, never gram text)
    * feeding ONE id-keyed aggregate; the interval merge is the local
    * array arithmetic shared with [[Dedup.dupSpans]]. No corpus shuffle
    * beyond the per-doc aggregate.
    */
  def decontaminateSpans(corpus: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchTextCol: String,
                         k: Int = 8): DataFrame = {
    val benchG = bench
      .select(explode(ngramArray(col(benchTextCol), k)).as("g"))
      .withColumn("g", md5(col("g")))
      .distinct()
    val covered = Dedup.gramOccurrences(corpus, idCol, textCol, k)
      .join(broadcast(benchG), Seq("g"))
      .select("id", "p")
    Dedup.positionsToSpans(covered, idCol, k)
  }

  /** Apply [[decontaminateSpans]] removal: cut every token inside a
    * benchmark-overlapping span (same surgery contract as
    * [[Dedup.removeDupSpans]] — untouched documents pass through
    * verbatim; edited ones are re-joined with single spaces).
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    k: Int = 8): DataFrame =
    Dedup.cutSpans(corpus,
      decontaminateSpans(corpus, idCol, textCol, bench, benchTextCol, k),
      idCol, textCol)

  /** Reference-trained trigram LM with STUPID BACKOFF (Brants et al.
    * 2007, "Large Language Models in Machine Translation" — the scoring
    * scheme invented precisely for corpus-scale count LMs: no
    * discounting to fit, just relative frequencies with a constant
    * back-off multiplier α, which is why it distributes as pure count
    * joins). Per corpus-document mean natural log of
    *
    *   S(w3 | w1 w2) = c(w1w2w3)/c(w1w2)                (trigram seen)
    *                 | α · c(w2w3)/c(w2)                (bigram seen)
    *                 | α² · (c(w3)+1)/(N+V+1)           (add-one floor)
    *
    * with counts from TRAIN only. Pure Brants scores an unseen word 0 —
    * the add-one unigram floor ([[bigramLogProbAgainst]]'s convention)
    * keeps every position finite instead, so a fully-OOV document
    * scores far below in-distribution text rather than −∞.
    *
    * Scale: the [[bigramLogProbAgainst]] architecture with one more
    * level — ALL THREE train count tables ride a single fused explode
    * into one persisted TYPE-sized aggregate (kinds 0/1/2); the corpus
    * side runs ONE persisted trigram explode feeding both the
    * occurrence table and the type-distinct, prices each type with five
    * vocabulary-keyed left joins (trigram, both sub-bigrams by digest,
    * two unigrams) + a broadcast scalar, then one gram-keyed join back
    * per occurrence. Occurrence-sized shuffles key on 16-byte md5
    * digests throughout; nothing pairwise.
    */
  def trigramStupidBackoff(corpus: DataFrame, train: DataFrame,
                           idCol: String, textCol: String,
                           alpha: Double = 0.4): DataFrame =
    trigramScoreFromCounts(corpus,
      fusedGramCountsN(train, textCol, 3), idCol, textCol, alpha)

  /** [[trigramStupidBackoff]] trained from an incremental [[GramStore]]
    * (orders ≥ 3) — the [[bigramLogProbFromStore]] convention.
    */
  def trigramStupidBackoffFromStore(corpus: DataFrame, store: String,
                                    idCol: String, textCol: String,
                                    alpha: Double = 0.4): DataFrame = {
    val spark = corpus.sparkSession
    require(GramStore.orders(spark, store) >= 3,
      s"trigram scoring needs a gram store of orders >= 3 at $store")
    trigramScoreFromCounts(corpus, GramStore.counts(spark, store),
      idCol, textCol, alpha)
  }

  private def trigramScoreFromCounts(corpus: DataFrame, counts0: DataFrame,
                                     idCol: String, textCol: String,
                                     alpha: Double): DataFrame = {
    val counts = counts0
      .persist() // one count pass shared by the five price joins
    val uni = counts.filter(col("kind") === 0)
      .select(col("g").as("t"), col("c").as("c1"))
    val stats = uni.agg(sum(col("c1")).cast("double").as("n"),
      count(lit(1)).cast("double").as("v"))
    val bi = counts.filter(col("kind") === 1)
      .select(col("gd").as("bd"), col("c").as("cb"))
    val tri = counts.filter(col("kind") === 2)
      .select(col("gd"), col("c").as("c3"))
    // one persisted corpus trigram explode for BOTH consumers (the
    // bigramLogProbAgainst corpus-side convention — see its scale note)
    val grams = corpus.select(col(idCol).as("id"),
      explode(ngramArray(col(textCol), 3)).as("g")).persist()
    val occ = grams.select(col("id"), unhex(md5(col("g"))).as("gd"))
    val types = grams.select(col("g")).distinct()
      .select(unhex(md5(col("g"))).as("gd"), col("g"))
      .withColumn("__w1", element_at(split(col("g"), " "), 1))
      .withColumn("__w2", element_at(split(col("g"), " "), 2))
      .withColumn("__w3", element_at(split(col("g"), " "), 3))
      .withColumn("__pre", unhex(md5(concat_ws(" ", col("__w1"), col("__w2")))))
      .withColumn("__suf", unhex(md5(concat_ws(" ", col("__w2"), col("__w3")))))
    // per-TYPE price, mirrored token for token in the oracle SQL
    val probs = types
      .join(tri, Seq("gd"), "left")
      .join(bi.select(col("bd").as("__pre"), col("cb").as("__cpre")),
        Seq("__pre"), "left")
      .join(bi.select(col("bd").as("__suf"), col("cb").as("__csuf")),
        Seq("__suf"), "left")
      .join(uni.select(col("t").as("__w2"), col("c1").as("__c2")),
        Seq("__w2"), "left")
      .join(uni.select(col("t").as("__w3"), col("c1").as("__c3u")),
        Seq("__w3"), "left")
      .crossJoin(broadcast(stats))
      .select(col("gd"),
        when(col("c3").isNotNull,
            col("c3").cast("double") / col("__cpre").cast("double"))
          .when(col("__csuf").isNotNull,
            lit(alpha) * col("__csuf").cast("double") /
              col("__c2").cast("double"))
          .otherwise(lit(alpha) * lit(alpha) *
            (coalesce(col("__c3u"), lit(0L)).cast("double") + lit(1.0)) /
            (col("n") + col("v") + lit(1.0)))
          .as("p"))
    val per = occ.join(probs, Seq("gd"))
      .groupBy(col("id")).agg(
        count(lit(1)).as("n_trigrams"),
        round(avg(log(col("p"))), 6).as("avg_logscore"))
    corpus.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("avg_logscore"), lit(0.0)).as("avg_logscore"))
  }

  /** Zipf-law audit: least-squares slope of ln(frequency) against
    * ln(rank) over the `topN` most frequent tokens, plus the corpus
    * totals. Natural language sits near slope −1 (Zipf 1949); a corpus
    * whose slope drifts far from that after a curation run has had its
    * head (boilerplate removal too aggressive) or tail (over-dedup)
    * distorted — the one-number distribution check next to
    * [[corpusProfile]]'s per-stratum counts. Output: one row
    * `(n_tokens, n_types, zipf_slope, zipf_intercept)`.
    *
    * Scale: ONE token-keyed count aggregate (vocabulary-sized shuffle);
    * the rank/fit runs on the topN rows only — `orderBy.limit(topN)`
    * plans as TakeOrderedAndProject (per-partition heaps, never a global
    * sort), and the single-partition rank window after it sees exactly
    * topN rows, a bounded driver-small tail like the k-means centroid
    * sums. Ties rank by token text so the fit is deterministic on both
    * engines.
    */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 100): DataFrame = {
    require(topN >= 2, s"zipfFit needs topN >= 2, got $topN")
    val tc = df.select(explode(Curation.words(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .persist() // two consumers: totals + top-N (CacheSweep-released)
    val totals = tc.agg(sum(col("c")).cast("long").as("n_tokens"),
      count(lit(1)).as("n_types"))
    val top = tc.orderBy(col("c").desc, col("t").asc).limit(topN)
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("t").asc)))
    val xy = top.select(log(col("r").cast("double")).as("x"),
      log(col("c").cast("double")).as("y"))
    // the oracle SQL mirrors this exact expression structure so the
    // doubles agree to well inside round-6
    // fewer than 2 fitted points makes the least-squares denominator
    // avg(x²)−avg(x)² zero — return an EXPLICIT null slope for the
    // degenerate corpus (≤1 distinct token) instead of a silent NaN
    val fit = xy.agg(
      when(count(lit(1)) >= 2,
        (avg(col("x") * col("y")) - avg(col("x")) * avg(col("y"))) /
          (avg(col("x") * col("x")) - avg(col("x")) * avg(col("x"))))
        .as("slope"),
      avg(col("x")).as("mx"), avg(col("y")).as("my"))
    totals.crossJoin(fit)
      .select(col("n_tokens"), col("n_types"),
        round(col("slope"), 6).as("zipf_slope"),
        round(col("my") - col("slope") * col("mx"), 6)
          .as("zipf_intercept"))
  }
}
