package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: Gopher-style
  * repetition quality signals (Rae et al. 2021, "Scaling Language Models" —
  * repetitious documents are low-quality signals), deterministic
  * hash-based dataset splits, and stratified per-group sampling.
  *
  * Scale notes:
  *  - the repetition signals are pure per-row expressions (codegen'd HOFs,
  *    no shuffle, no UDF) — they run at scan speed on any corpus size;
  *  - hash splits are content-addressed (md5 of the id), so the same
  *    document lands in the same split on every run and on every cluster —
  *    no RNG state, no coordination;
  *  - stratified sampling is one shuffle on the stratum key with a
  *    WindowGroupLimit-able rank — the per-stratum limit pushes below the
  *    sort, so oversized strata never materialize fully.
  */
object Curation {

  /** Split on single spaces, empties removed — the signals' shared
    * token array. Exposed so callers computing SEVERAL signals stage it
    * ONCE per row (a `.select` alias column): the split dominated the
    * repetition query when evaluated per signal (PLANS.md r6).
    */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Fraction of word occurrences that are repeats of an earlier word:
    * `1 - distinct/total` (0 for empty docs). High values flag
    * keyword-stuffed or boilerplate text.
    */
  def dupWordFrac(text: Column): Column = dupWordFracOf(words(text))

  def dupWordFracOf(w: Column): Column =
    when(size(w) === 0, 0.0).otherwise(
      lit(1.0) - size(array_distinct(w)).cast("double") / size(w))

  /** Same signal over adjacent word bigrams — catches phrase-level
    * repetition that unigram stats miss (0 for docs under 2 words).
    */
  def dupBigramFrac(text: Column): Column = dupBigramFracOf(words(text))

  def dupBigramFracOf(w: Column): Column = {
    val n = size(w)
    val bigrams = zip_with(
      slice(w, lit(1), n - 1), slice(w, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    when(n < 2, 0.0).otherwise(
      lit(1.0) - size(array_distinct(bigrams)).cast("double") / (n - 1))
  }

  /** Occurrence share of the single most frequent word (0 for empty
    * docs) — the "top n-gram fraction" family's n=1 member. The max
    * multiplicity is ONE native sort+run-scan expression
    * ([[graft.functions.TopRunExpr]]); the previous
    * `aggregate`-over-sorted-runs was interpreted (CodegenFallback HOF)
    * and measured ~40% of the whole repetition query.
    */
  def topWordFrac(text: Column): Column = topWordFracOf(words(text))

  def topWordFracOf(w: Column): Column = {
    val maxCount = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.TopRunExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(w)))
    when(size(w) === 0, 0.0)
      .otherwise(maxCount.cast("double") / size(w))
  }

  /** Deterministic bucket in [0, buckets) from the md5 of the id —
    * identical on Spark and any SQL engine with md5, so split membership
    * is reproducible across systems.
    */
  def hashBucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
      .cast("int") % buckets

  /** Content-addressed train/validation/test split: percentages out of
    * 100 (the remainder is `test`).
    */
  def hashSplit(id: Column, trainPct: Int, validPct: Int): Column = {
    val b = hashBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + validPct, "validation")
      .otherwise("test")
  }

  /** Exact integer division that stays in Column algebra: subtract the
    * remainder first so the double division is of an exact multiple
    * (bit-exact for quotients < 2^53 — `floor(a/b)` on raw doubles is
    * not, and `Column` has no `div`).
    */
  private def idiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / lit(b)).cast("long")

  /** Concat-and-chunk sequence packing — the standard LLM pre-training
    * layout: documents are conceptually concatenated in `idCol` order and
    * cut into fixed `ctxLen`-token chunks; each document's global token
    * offset determines which chunks it lands in. Returns the input ids
    * with `n_tokens`, `tok_offset` (tokens before this doc), and the
    * `first_chunk`/`last_chunk`/`n_chunks` span (empty docs span no
    * chunk).
    *
    * The global offset is a DISTRIBUTED PREFIX SUM, not a single-partition
    * window: documents bucket by id range; per-bucket token totals (at
    * most `buckets` rows — driver-small like
    * [[Similarity.trainCentroids]]'s k×dim sums) come back to the driver,
    * prefix offsets per bucket go back out as a broadcast join, and the
    * within-bucket cumulative sum is a window partitioned BY BUCKET. A
    * naive `Window.orderBy(id)` with no partition spec would pull the
    * entire corpus through one task — the canonical scale-killer this
    * two-phase shape exists to avoid.
    */
  def packChunks(df: DataFrame, idCol: String, nTokens: Column, ctxLen: Int,
                 buckets: Int = 256): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    require(df.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packChunks needs a numeric id to range-bucket the prefix sum; " +
        s"'$idCol' is ${df.schema(idCol).dataType.simpleString} — " +
        "derive one first (e.g. shuffleLayout's shard+pos)")
    val base = df.select(col(idCol).cast("long").as("id"),
      nTokens.cast("long").as("tok"))
    val bounds = base.agg(min(col("id")), max(col("id"))).head()
    if (bounds.isNullAt(0))
      return base.select(col("id").as(idCol), col("tok").as("n_tokens"),
        lit(0L).as("tok_offset"), lit(0L).as("first_chunk"),
        lit(0L).as("last_chunk"), lit(0L).as("n_chunks"))
    val minId = bounds.getLong(0)
    val span = math.max(1L, (bounds.getLong(1) - minId) / buckets + 1)
    val bucketed = base.withColumn("__b", idiv(col("id") - minId, span))
    val totals = bucketed.groupBy(col("__b")).agg(sum(col("tok")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.scanLeft((-1L, 0L)) { case ((_, acc), (b, t)) =>
      (b, acc + t)
    }.sliding(2).map { case Array((_, acc), (b, _)) => (b, acc) }.toSeq
    val s = df.sparkSession
    import s.implicits._
    val baseDf = bases.toDF("__b", "__base")
    val w = Window.partitionBy(col("__b")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = col("__base") + coalesce(sum(col("tok")).over(w), lit(0L))
    val firstChunk = idiv(col("tok_offset"), ctxLen.toLong)
    val lastChunk =
      idiv(col("tok_offset") + greatest(col("tok"), lit(1L)) - 1, ctxLen.toLong)
    bucketed.join(broadcast(baseDf), Seq("__b"))
      .withColumn("tok_offset", off)
      .select(col("id").as(idCol), col("tok").as("n_tokens"),
        col("tok_offset"), firstChunk.as("first_chunk"),
        lastChunk.as("last_chunk"),
        when(col("tok") === 0, 0L)
          .otherwise(lastChunk - firstChunk + 1).as("n_chunks"))
  }

  /** Sliding-window chunk spans — the retrieval/fine-tuning complement
    * of [[packChunks]]'s concat-and-chunk layout: each document yields
    * windows of `size` tokens stepping by `size - overlap`, the last
    * window truncated at the document end (empty docs yield none). One
    * row per (doc, window): purely narrow — a per-row `sequence` +
    * `explode`, no shuffle, stream-safe — so it chunks 100 TB at scan
    * speed. Integer-only arithmetic: engine and oracle agree exactly.
    */
  /** Window starts for [[chunkSpans]] — shared by the op and the
    * `chunk_spans` stage so the boundary rule (and the DuckDB oracle
    * pinning it) has exactly one implementation.
    */
  private[graft] def chunkStarts(tok: Column, size: Int, overlap: Int): Column = {
    require(size > 0, s"size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap (size $size)")
    val step = size - overlap
    when(tok <= 0, array().cast("array<long>"))
      .otherwise(sequence(lit(0L), tok - 1, lit(step.toLong)))
  }

  private[graft] def chunkEnd(start: Column, size: Int, tok: Column): Column =
    least(start + size, tok)

  def chunkSpans(df: DataFrame, idCol: String, nTokens: Column,
                 size: Int, overlap: Int): DataFrame = {
    val tok = nTokens.cast("long")
    df.select(col(idCol), tok.as("n_tokens"),
        posexplode(chunkStarts(tok, size, overlap)))
      .select(col(idCol), col("n_tokens"),
        col("pos").cast("long").as("chunk_idx"),
        col("col").as("start"),
        chunkEnd(col("col"), size, col("n_tokens")).as("end"))
  }

  /** Data-mixing sampler: keep each row with a per-stratum RATE (e.g.
    * up-weight books, down-weight web), decided content-addressed — the
    * row survives iff `hashBucket(id, buckets) < rate·buckets`. The same
    * document keeps the same fate across runs, engines, and clusters
    * (no RNG state), and a rate change only adds/removes the delta
    * (buckets are nested: rate 0.5's kept set contains rate 0.3's).
    *
    * Purely narrow — a codegen'd filter at scan speed, no shuffle; the
    * rate table is config-sized and compiles to a literal CASE chain.
    */
  def weightedSample(df: DataFrame, idCol: String, strataCol: String,
                     rates: Map[String, Double], defaultRate: Double = 1.0,
                     buckets: Int = 10000): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val cut = rates.foldLeft(lit(math.round(defaultRate * buckets).toInt)) {
      case (acc, (s, r)) =>
        when(col(strataCol) === s, math.round(r * buckets).toInt).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), buckets) < cut)
  }

  /** Temperature-based mixture sampling (the mT5/multilingual-training
    * convention, Xue et al. 2021 §3.1): stratum `s` keeps rows at a rate
    * making its expected share ∝ n_s^α — α < 1 UP-samples tail strata
    * (low-resource languages, rare sources) and flattens the head,
    * α = 1 is proportional (no reweighting). Given a total keep
    * `fraction` f, the expected kept count of stratum s is
    * f·N·p_s with p_s = n_s^α / Σ_t n_t^α, so the rate is
    * min(1, f·N·p_s / n_s); keep/drop is the content-addressed
    * [[hashBucket]] convention via [[weightedSample]] — reproducible
    * across engines and runs, no RNG. Rows with a NULL stratum drop
    * (they belong to no mixture component).
    *
    * Scale: ONE map-side-combined count aggregate (≤ |strata| rows to
    * the driver — a mixture has tens of sources), rates fold back as a
    * literal CASE, the keep filter is narrow. Expected counts are
    * STATISTICAL (hash-uniform), the [[tokenBudgetSample]] note.
    */
  def temperatureSample(df: DataFrame, idCol: String, strataCol: String,
                        alpha: Double, fraction: Double,
                        buckets: Int = 10000): DataFrame = {
    require(alpha > 0 && alpha <= 1,
      s"temperatureSample: alpha must be in (0, 1], got $alpha")
    require(fraction > 0 && fraction <= 1,
      s"temperatureSample: fraction must be in (0, 1], got $fraction")
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("s"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val totalN = counts.map(_._2).sum.toDouble
    // cross-engine determinism rides the CUT QUANTIZATION, not the sum
    // order: z's last-ulp noise (engines fold the pows in different
    // orders) only matters if a rate lands within ~1e-12 of a 1/buckets
    // rounding boundary — the same defense weightedSample's integer cut
    // already provides for caller-computed rates
    val z = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val rates = counts.map { case (s, n) =>
      s -> math.min(1.0,
        fraction * totalN * (math.pow(n.toDouble, alpha) / z) / n.toDouble)
    }.toMap
    weightedSample(df, idCol, strataCol, rates, defaultRate = 0.0, buckets)
  }

  /** Token-budget mixture sampling — the data-mixing step of a training
    * recipe ("30 B tokens of web, all of code, at most 5 B of forums"):
    * each stratum's sampling rate scales so its EXPECTED kept-token
    * count hits its token budget (`min(1, budget/total)`), and rows
    * keep/drop content-addressed on the [[hashBucket]] convention —
    * reproducible across engines and runs, no RNG state. Strata already
    * inside budget keep everything. Returns surviving rows plus
    * `n_tokens` and the applied `mix_rate` (quantized to 1/buckets) for
    * audit.
    *
    * Scale shape: ONE map-side-combined aggregate for the per-stratum
    * token totals (≤ |strata| rows to the driver — a mixture has tens
    * of sources, not millions), rates fold back as a literal CASE, and
    * the keep filter is narrow. The budget is STATISTICAL
    * (hash-uniform): at corpus scale the kept-token count concentrates
    * tightly around it; an exact cut would need a global sort by hash —
    * the scale-killer [[shuffleLayout]]'s doc warns about.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
                        strataCol: String, budgets: Map[String, Long],
                        defaultBudget: Long = Long.MaxValue,
                        buckets: Int = 10000): DataFrame = {
    require((budgets.values ++ Seq(defaultBudget)).forall(_ >= 0),
      "token budgets must be non-negative")
    require(buckets > 0, "buckets must be positive")
    val withTok = df.withColumn("n_tokens",
      TextAnalysis.tokenCount(col(textCol)))
    // per-stratum totals at plan time (the quality_model/bpe training
    // convention): a driver-small map, never a per-row subquery
    val totals = withTok.groupBy(col(strataCol).cast("string").as("__s"))
      .agg(sum(col("n_tokens")).as("__total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val cut = totals.foldLeft(lit(buckets)) { case (acc, (s, total)) =>
      val budget = budgets.getOrElse(s, defaultBudget)
      val rate = if (total <= 0) 1.0
        else math.min(1.0, budget.toDouble / total)
      when(col(strataCol).cast("string") === s,
        math.round(rate * buckets).toInt).otherwise(acc)
    }
    withTok.filter(hashBucket(col(idCol), buckets) < cut)
      .withColumn("mix_rate", cut.cast("double") / buckets)
  }

  /** Quality-ranked token-budget selection — "train on the BEST N
    * tokens" (the DataComp-LM / SlimPajama selection step, where a
    * classifier or heuristic score ranks documents and the top of the
    * ranking fills the budget). Keeps exactly the rows a global
    * `ORDER BY score DESC, id` prefix-cut would keep: a row survives iff
    * the total tokens of strictly-better-ranked rows is < `budget` (so
    * the budget-crossing row is kept and completes the budget — the
    * keep-first-overrun convention).
    *
    * Unlike [[tokenBudgetSample]] (statistical hash-uniform thinning,
    * no ranking) this is an EXACT ordered cut — and the scale shape is
    * the point: a naive global sort + running sum is a range exchange
    * plus a single-partition window over the corpus. Instead, scores
    * (contract: [0, 1], ties allowed) quantize into `buckets` bands;
    * band totals come to the driver (≤ buckets rows — the packChunks
    * two-phase prefix-sum convention); whole bands above the cut keep
    * everything, bands below drop everything, and ONLY the single
    * boundary band runs a within-band running-sum window (corpus/buckets
    * rows through one task). Quantization changes nothing: score-desc
    * order refines band order, and score ties always share a band, so
    * the kept set is identical to the global-sort semantics the oracle
    * replays. Appends `n_tokens`.
    */
  def qualityBudgetSelect(df: DataFrame, idCol: String, scoreCol: String,
                          nTokens: Column, budget: Long,
                          buckets: Int = 1024): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // a NULL score has no place in a ranking cut: it would band to a
    // null __qb whose driver-side group key unboxes to 0 and collides
    // with band 0's token total, silently dropping real top-band rows —
    // unrankable rows are excluded BEFORE banding instead
    val staged = df.filter(col(scoreCol).isNotNull)
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("__qb", least(greatest(
        floor((lit(1.0) - col(scoreCol)) * buckets).cast("int"), lit(0)),
        lit(buckets - 1)))
    val totals = staged.groupBy(col("__qb"))
      .agg(sum(col("n_tokens")).as("__t"))
      .collect().filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    var cum = 0L
    var fullBands = List.empty[Int]
    var boundary = Option.empty[(Int, Long)] // (band, tokens before it)
    (0 until buckets).foreach { b =>
      val t = totals.getOrElse(b, 0L)
      if (t > 0) {
        if (cum + t <= budget) fullBands ::= b
        else if (cum < budget && boundary.isEmpty) boundary = Some((b, cum))
        cum += t
      }
    }
    val keepFull =
      if (fullBands.isEmpty) staged.filter(lit(false))
      else staged.filter(col("__qb").isin(fullBands: _*))
    val keepBoundary = boundary match {
      case None => staged.filter(lit(false))
      case Some((b, before)) =>
        val w = Window.partitionBy(col("__qb"))
          .orderBy(col(scoreCol).desc, col(idCol).asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        staged.filter(col("__qb") === b)
          .withColumn("__cx", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .filter(lit(before) + col("__cx") < budget)
          .drop("__cx")
    }
    keepFull.unionByName(keepBoundary).drop("__qb")
  }

  /** Deterministic global shuffle layout — the final step of a
    * training-data writer (examples must reach the trainer in an order
    * uncorrelated with curation order, and the order must be
    * reproducible): each row gets a content-addressed shard and a
    * position within it, ordered by md5 of the id.
    *
    * The scale shape is the whole point: a naive `orderBy(md5(id))` is a
    * GLOBAL SORT — range exchange plus full sort of the corpus. Sharding
    * first means one hash exchange on the shard key and a sort of only
    * each shard's rows (`shards` ≫ executor count keeps them small);
    * writers then emit one file per shard (`partitionBy(shard)`) and
    * trainers read shards in any order, rows in position order. md5
    * ordering within shard + md5 shard assignment = the same uniform
    * shuffle a RNG would give, with no RNG state to coordinate.
    */
  def shuffleLayout(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val w = Window.partitionBy(col("shard"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("shard", hashBucket(col(idCol), shards))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Keep at most `k` rows per stratum, chosen deterministically by md5
    * of the id (a content-addressed "random" order). One shuffle on the
    * stratum key; the rank filter executes as a group limit below the
    * sort, so no stratum is ever fully sorted in memory.
    */
  def stratifiedSample(df: DataFrame, strata: Seq[String], idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** DSIR data selection (Xie et al. 2023 "Data Selection for Language
    * Models via Importance Resampling"): score each raw document by the
    * log importance ratio of its hashed n-gram features under
    * bag-of-hashed-ngram models of a small TARGET corpus (the
    * distribution you want more of) vs the RAW corpus:
    *
    *   log w(x) = Σ_{f ∈ features(x)} [ ln p̂_target(bucket(f))
    *                                   − ln p̂_raw(bucket(f)) ]
    *
    * with add-α smoothed bucket probabilities p̂(b) = (c(b)+α)/(N+α·D).
    * Features are unigrams + bigrams ([[words]] semantics) hashed into
    * `buckets` buckets via the md5-half convention ([[Dedup.md5half]]),
    * so any engine with md5 reproduces the bucketing exactly. Returns
    * every raw row's id with `n_feats` and `log_weight` (0 for
    * feature-less docs).
    *
    * Scale: the two hashed-feature models are ≤ `buckets` counters each,
    * so they train with one map-side-combined aggregate apiece and come
    * back to the driver as a bounded reduction (the quality_model /
    * bpe_merges convention — the model is plan-time state, like any
    * trained model). The log-ratio LUT then rides the RETURNED plan as a
    * single literal map (one plan reference — the VectorKernels lesson:
    * never k per-entry expression trees), and scoring is a fully NARROW
    * projection: per row, hash features and fold lookups in array order.
    * No join, no shuffle, no join-back for zero-feature docs (an empty
    * feature array folds to 0.0 natively). At 100 TB the scoring pass is
    * scan-speed; the only other corpus-proportional work is the two
    * training aggregates.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, buckets: Int = 1024,
                  alpha: Double = 1.0): DataFrame =
    dsirWeightsAndCount(raw, target, idCol, textCol, buckets, alpha)._1

  /** [[dsirWeights]] plus the raw-corpus ROW COUNT, recovered from the
    * same training aggregate instead of a separate `df.count()` pass:
    * each raw row contributes one `-1` sentinel entry alongside its
    * hashed features, so the bucket-model reduction (which already
    * scans the corpus) counts documents for free — callers sizing a
    * `fraction:` keep-set (CurationStages.dsirSample) save one full
    * corpus pass at plan time. Bucket ids are non-negative, so the
    * sentinel can never collide; null/feature-less texts still count
    * (the sentinel rides a coalesce around the feature array).
    */
  def dsirWeightsAndCount(raw: DataFrame, target: DataFrame, idCol: String,
                          textCol: String, buckets: Int = 1024,
                          alpha: Double = 1.0): (DataFrame, Long) = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    def featArr(text: Column): Column =
      concat(words(text), CorpusStats.ngramArray(text, 2))
    // bounded driver reduction: ≤ `buckets`+1 (bucket, count) rows
    def bucketCounts(df: DataFrame, docSentinel: Boolean): Map[Long, Long] = {
      val bs = transform(featArr(col(textCol)),
        f => Dedup.md5half(f, 0) % buckets)
      val entries =
        if (docSentinel)
          concat(array(lit(-1L)),
            coalesce(bs, array().cast("array<bigint>")))
        else bs
      df.select(explode(entries).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val crAll = bucketCounts(raw, docSentinel = true)
    val nDocs = crAll.getOrElse(-1L, 0L)
    val cr = crAll - (-1L)
    val ct = bucketCounts(target, docSentinel = false)
    (dsirScored(raw, idCol, textCol, buckets, alpha, cr, ct), nDocs)
  }

  /** [[dsirWeightsAndCount]] when the target is a FILTERED SUBSET of the
    * raw corpus (the stage's `target_filter` shape): both bucket models
    * ride ONE training aggregate — every exploded feature row carries an
    * is-target flag and the target count is a conditional sum — so the
    * corpus is tokenized once instead of twice at plan time (r17, guide
    * §1.2). Counts are identical integers to the two-pass form by
    * construction (the flag partitions the same exploded rows the
    * filtered pass would have kept), so weights are bit-identical.
    */
  def dsirWeightsAndCountFiltered(raw: DataFrame, targetPred: Column,
                                  idCol: String, textCol: String,
                                  buckets: Int = 1024,
                                  alpha: Double = 1.0): (DataFrame, Long) = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    def featArr(text: Column): Column =
      concat(words(text), CorpusStats.ngramArray(text, 2))
    val bs = transform(featArr(col(textCol)),
      f => Dedup.md5half(f, 0) % buckets)
    val entries = concat(array(lit(-1L)),
      coalesce(bs, array().cast("array<bigint>")))
    // ≤ `buckets`+1 rows back: (bucket, raw count, target count)
    val rows = raw.select(explode(entries).as("b"),
        coalesce(targetPred, lit(false)).cast("long").as("t"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("c"), sum(col("t")).as("ct"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val nDocs = rows.get(-1L).map(_._1).getOrElse(0L)
    val real = rows - (-1L)
    val cr = real.map { case (b, (c, _)) => b -> c }
    val ct = real.collect { case (b, (_, t)) if t > 0 => b -> t }
    (dsirScored(raw, idCol, textCol, buckets, alpha, cr, ct), nDocs)
  }

  /** Shared scoring tail of the two trainers: log-ratio LUT from the
    * bucket-count maps, then the narrow per-row fold. The smoothed
    * log-prob mirrors the oracle SQL token for token (same literal
    * structure, same association) for bit-identical doubles.
    */
  private def dsirScored(raw: DataFrame, idCol: String, textCol: String,
                         buckets: Int, alpha: Double,
                         cr: Map[Long, Long],
                         ct: Map[Long, Long]): DataFrame = {
    def featArr(text: Column): Column =
      concat(words(text), CorpusStats.ngramArray(text, 2))
    def logProb(c: Double, n: Double): Double =
      math.log((c + alpha) / (n + alpha * buckets))
    val nRaw = cr.values.sum.toDouble
    val nTgt = ct.values.sum.toDouble
    def ratio(crB: Long, ctB: Long): Double =
      logProb(ctB.toDouble, nTgt) - logProb(crB.toDouble, nRaw)
    // every scored feature's bucket exists in `cr` (the doc IS part of
    // raw); the coalesce default is the both-unseen smoothing mass
    val entries = cr.keys.toSeq.sorted
      .map(b => b -> ratio(cr(b), ct.getOrElse(b, 0L)))
    val lut = map_from_arrays(
      lit(entries.map(_._1).toArray), lit(entries.map(_._2).toArray))
    val unseen = lit(ratio(0L, 0L))
    val scored = raw
      .withColumn("__f", featArr(col(textCol)))
      .select(col(idCol),
        size(col("__f")).cast("long").as("n_feats"),
        round(aggregate(
          transform(col("__f"), f =>
            coalesce(element_at(lut, Dedup.md5half(f, 0) % buckets), unseen)),
          lit(0.0), (acc, x) => acc + x), 6).as("log_weight"))
    scored
  }

  /** Gumbel top-k importance resampling over [[dsirWeights]] output —
    * the paper's sampling-without-replacement step, derandomized: each
    * doc's Gumbel noise comes from the md5 of its own id (content-
    * addressed, reproducible on any engine), and the k largest perturbed
    * scores are the sample (equivalent in distribution to weighted
    * sampling without replacement ∝ exp(log_weight)).
    *
    * `orderBy(…).limit(k)` plans as TakeOrderedAndProject — per-partition
    * top-k heaps, k rows to the driver, no global sort at any scale.
    */
  def dsirSample(weights: DataFrame, idCol: String, k: Int): DataFrame = {
    val u = (Dedup.md5half(col(idCol).cast("string"), 0).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    weights
      .withColumn("score", round(col("log_weight") + -log(-log(u)), 6))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
