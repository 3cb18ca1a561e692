package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-proof harness (VERDICT r5 item 5): replicate the sf0.1 tables
  * 10× into structure-preserving, non-colliding copies (≈ sf1), run the
  * headline queries at both tiers, and report wall time + plan shape so
  * BASELINE.md can record near-linear scaling evidence.
  *
  * Replication must keep the WORKLOAD shape honest — naive 10× copies
  * would make every document an exact dup of its 9 clones and blow the
  * near-dup pair count up 100×, proving nothing about 10× data. Instead
  * each replica is an isomorphic copy that cannot collide with the
  * others:
  *
  *  - documents: replica i rotates letters and digits by i
  *    (`translate`) — shingle sets within a replica keep EXACTLY the
  *    same Jaccard structure, while shingles across replicas are
  *    disjoint → near-dup pairs scale exactly 10×.
  *  - embeddings: replica i flips the sign of dimension j iff
  *    hash(i,j) is odd — a diagonal orthogonal map, so all in-replica
  *    cosines (and norms) are bit-preserved while cross-replica cosines
  *    decorrelate → ANN/near-dup structure scales exactly 10×.
  *  - events: ids offset per replica; the chain queries are narrow
  *    per-row pipelines, so replication is plain row growth.
  *
  * Usage: `runMain graft.ScaleProof [outDir]` — writes replicas under
  * outDir (default /tmp/graft-sf1) once (reused if present), then
  * prints one JSON line per (query, tier).
  */
object ScaleProof {

  val Replicas = 10

  private val lower = "abcdefghijklmnopqrstuvwxyz"
  private val upper = lower.toUpperCase(java.util.Locale.ROOT)
  private val digits = "0123456789"

  private def rot(s: String, i: Int): String =
    s.substring(i % s.length) + s.substring(0, i % s.length)

  /** Letter/digit rotation for replica `i` — identity at i=0. */
  private[graft] def rotated(i: Int): (String, String) =
    (lower + upper + digits,
      rot(lower, i) + rot(upper, i) + rot(digits, i))

  /** Per-replica seeded alphabet PERMUTATION for the x100 tier (VERDICT
    * r13 item 3). Rotation — the x10 scheme — has period 26 on letters
    * and 10 on digits: at 100 replicas, replicas i and i+26 map every
    * letter-only word IDENTICALLY, so whole shingles collide across
    * replicas and the pair queries would measure replication leakage,
    * not 100× data. A Fisher–Yates permutation seeded by the replica id
    * keeps the in-replica shingle structure exactly (any character
    * bijection does: shingles map bijectively, so intersections, unions
    * and document frequencies are preserved one-for-one), while two
    * replicas map a whole k-word shingle identically only if their
    * permutations agree on EVERY distinct character in it — probability
    * ≤ (1/26)^m for m distinct letters, negligible at shingle width 3.
    * Residual cross-replica leakage is measured, not assumed: the x100
    * runner records same-replica purity for the pair queries. Identity
    * at i = 0, so the original corpus is replica 0 verbatim (the
    * rotation convention).
    *
    * Uppercase mirrors the lowercase permutation, preserving case
    * structure the way rotation did (case-folding pipelines see the
    * same token statistics either way).
    */
  private[graft] def permuted(i: Int): (String, String) = {
    val id = lower + upper + digits
    if (i == 0) (id, id)
    else {
      val rnd = new scala.util.Random(
        0x9E3779B97F4A7C15L ^ (i.toLong * 6364136223846793005L))
      val pl = rnd.shuffle(lower.toList).mkString
      val pd = rnd.shuffle(digits.toList).mkString
      (id, pl + pl.toUpperCase(java.util.Locale.ROOT) + pd)
    }
  }

  /** Fingerprint of the source tables (path, length, mtime per file) —
    * the reuse marker carries it so replicas of REGENERATED testdata
    * rebuild instead of silently comparing base-vs-x10 across different
    * corpora in the official artifact.
    */
  private def sourceFingerprint(src: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    Seq("events", "documents", "embeddings").flatMap { t =>
      val f = new java.io.File(src, s"$t.parquet")
      if (f.exists()) walk(f).map(x =>
        s"${x.getPath}:${x.length}:${x.lastModified}")
      else Seq.empty
    }.mkString("\n")
  }

  def buildReplicas(spark: SparkSession, src: String, out: String): Unit = {
    val done = new java.io.File(out, "_REPLICAS_OK")
    val fp = sourceFingerprint(src)
    if (done.exists() &&
        new String(java.nio.file.Files.readAllBytes(done.toPath),
          "UTF-8") == fp) return
    new java.io.File(out).mkdirs()

    val ev = Tables.table(spark, src, "events")
    val evMax = ev.agg(max("event_id")).head().getLong(0) + 1
    (0 until Replicas).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i * evMax))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val docs = Tables.table(spark, src, "documents")
    val docMax = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until Replicas).map { i =>
      val (from, to) = rotated(i)
      docs
        .withColumn("doc_id", col("doc_id") + lit(i * docMax))
        .withColumn("text", translate(col("text"), from, to))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = Tables.table(spark, src, "embeddings")
    val embMax = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until Replicas).map { i =>
      emb
        .withColumn("vec_id", col("vec_id") + lit(i * embMax))
        .withColumn("embedding",
          // diagonal ±1 map per (replica, dimension): orthogonal, so
          // in-replica cosines are preserved bit-for-bit
          transform(col("embedding"), (x, j) =>
            when(pmod(hash(lit(i), j), lit(2)) === 0, x).otherwise(-x)))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    java.nio.file.Files.write(done.toPath, fp.getBytes("UTF-8"))
  }

  /** x100 fixture (VERDICT r13 item 3): 100 permutation-isomorphic
    * replicas of the sf0.1 `documents` and `embeddings` tables — the two
    * tables the flagship scalers read. `events` (and the TPC-H tables)
    * are deliberately omitted: no flagship query touches them, and the
    * tier exists to test the claimed growth laws one decade past x10,
    * not to re-replicate the whole warehouse. Character maps come from
    * [[permuted]] (rotation saturates at 26 replicas); embeddings reuse
    * the diagonal ±1 map, which is collision-free at any replica count
    * (hash(i, j) keys the sign).
    */
  val Replicas100 = 100

  def buildReplicas100(spark: SparkSession, src: String, out: String): Unit = {
    val done = new java.io.File(out, "_REPLICAS_OK")
    val fp = s"n=$Replicas100\n" + sourceFingerprint(src)
    if (done.exists() &&
        new String(java.nio.file.Files.readAllBytes(done.toPath),
          "UTF-8") == fp) return
    new java.io.File(out).mkdirs()

    val docs = Tables.table(spark, src, "documents")
    val docMax = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until Replicas100).map { i =>
      val (from, to) = permuted(i)
      docs
        .withColumn("doc_id", col("doc_id") + lit(i * docMax))
        .withColumn("text", translate(col("text"), from, to))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = Tables.table(spark, src, "embeddings")
    val embMax = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until Replicas100).map { i =>
      emb
        .withColumn("vec_id", col("vec_id") + lit(i * embMax))
        .withColumn("embedding",
          transform(col("embedding"), (x, j) =>
            when(pmod(hash(lit(i), j), lit(2)) === 0, x).otherwise(-x)))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    java.nio.file.Files.write(done.toPath, fp.getBytes("UTF-8"))
  }

  /** Exact-cosine planted near-duplicates (VERDICT r14 item 2): for
    * every base vector u with ‖u‖ > 0, a partner at EXACTLY cosine c —
    * u' = c·û + √(1−c²)·ŵ⊥, where w is a deterministic per-id
    * pseudo-random vector and ŵ⊥ its component orthogonal to û,
    * normalized. c cycles [[PlantCosines]] by `vec_id % 5`, all above
    * the production near-dup threshold 0.9, so ground truth AT the
    * threshold is known by construction: pair (i, i + `embMax`) has
    * cosine exactly `PlantCosines(i % 5)`. Replication with the
    * diagonal ±1 sign map preserves every in-replica cosine
    * bit-for-bit, so the truth set scales exactly with the replica
    * count — the fixture that turns "per-band collision survives the r
    * growth at production thresholds" from theory into a measured
    * recall row (PLANS r14's honesty note: `scaledLshGeometry` trades
    * NEAR-threshold recall for bounded candidate work; this measures
    * how much, where users actually run dedup).
    *
    * Every intermediate is materialized into its own column — a lambda
    * referencing an inline expression re-evaluates it per element (no
    * CSE inside lambda bodies, the Dedup.shingles pitfall).
    */
  val PlantCosines: Seq[Double] = Seq(0.91, 0.93, 0.95, 0.97, 0.99)

  def plantNearDups(emb: DataFrame, embMax: Long, dim: Int = 64): DataFrame = {
    val base = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("__v"))
      .withColumn("__n", sqrt(aggregate(col("__v"), lit(0.0d),
        (a, x) => a + x * x)))
      .filter(col("__n") > 0)
      .withColumn("__u", transform(col("__v"), x => x / col("__n")))
      .withColumn("__w", transform(sequence(lit(0), lit(dim - 1)),
        j => pmod(hash(col("vec_id"), j), lit(1000)).cast("double")
          / lit(500.0) - lit(1.0)))
      .withColumn("__d", aggregate(
        zip_with(col("__w"), col("__u"), (a, b) => a * b),
        lit(0.0d), (acc, x) => acc + x))
      .withColumn("__wp", zip_with(col("__w"), col("__u"),
        (a, b) => a - col("__d") * b))
      .withColumn("__np", sqrt(aggregate(col("__wp"), lit(0.0d),
        (a, x) => a + x * x)))
      .filter(col("__np") > 1e-9)
      .withColumn("__c", element_at(array(PlantCosines.map(lit): _*),
        (col("vec_id") % 5).cast("int") + 1))
      .withColumn("__s", sqrt(lit(1.0) - col("__c") * col("__c")) / col("__np"))
    base.select(col("vec_id"), col("__v").as("embedding"))
      .unionByName(base.select(
        (col("vec_id") + lit(embMax)).as("vec_id"),
        zip_with(col("__u"), col("__wp"),
          (a, b) => col("__c") * a + col("__s") * b).as("embedding")))
  }

  /** The recall fixture's three tiers: base = sf0.1 embeddings +
    * planted partners (ids offset by embMax), x10/x100 = sign-map
    * replicas (in-replica cosines preserved exactly; cross-replica
    * decorrelated). One parquet per tier under `out`.
    */
  def buildRecallTiers(spark: SparkSession, src: String,
                       out: String): Seq[(String, String, Int)] = {
    val done = new java.io.File(out, "_RECALL_OK")
    val fp = sourceFingerprint(src)
    val emb = Tables.table(spark, src, "embeddings")
    val embMax = emb.agg(max("vec_id")).head().getLong(0) + 1
    val newMax = 2 * embMax
    val tiers = Seq(("base", s"$out/base", 1), ("x10", s"$out/x10", 10),
      ("x100", s"$out/x100", 100))
    if (!(done.exists() && new String(java.nio.file.Files.readAllBytes(
        done.toPath), "UTF-8") == fp)) {
      new java.io.File(out).mkdirs()
      // materialize the planted base ONCE, replicate from the parquet
      // scan: a 100-branch union whose every branch re-plans the full
      // planting subtree (norms, orthogonalization, per-element
      // lambdas) spends minutes in analysis alone, while scan-per-
      // branch is the r14 buildReplicas100 shape and compiles in
      // seconds
      plantNearDups(emb, embMax)
        .write.mode("overwrite").parquet(s"$out/base/embeddings.parquet")
      val planted = spark.read.parquet(s"$out/base/embeddings.parquet")
      for ((_, dir, replicas) <- tiers.drop(1)) {
        (0 until replicas).map { i =>
          planted
            .withColumn("vec_id", col("vec_id") + lit(i * newMax))
            .withColumn("embedding",
              transform(col("embedding"), (x, j) =>
                when(pmod(hash(lit(i), j), lit(2)) === 0, x).otherwise(-x)))
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
      java.nio.file.Files.write(done.toPath, fp.getBytes("UTF-8"))
    }
    tiers
  }

  /** Recall@`threshold` of the scaled-geometry LSH pair operator on a
    * recall-fixture tier: found = the operator's output restricted to
    * planted pairs (partner offset `embMax`, same replica), truth =
    * planted pairs whose exact cosine clears the threshold (known from
    * the id's cosine bucket). Returns (overall recall, per-cosine hit
    * counts, truth per cosine).
    */
  def recallAtThreshold(spark: SparkSession, dir: String, embMax: Long,
                        threshold: Double,
                        targetRecall: Option[Double] = None)
      : (Double, Map[Double, Long], Long) = {
    val emb = Tables.table(spark, dir, "embeddings")
    val n = emb.count()
    // targetRecall selects the recall-targeted geometry (bands grown
    // past r until the OR-of-bands model at the THRESHOLD cosine — the
    // conservative floor — reaches the target); None is the square
    // occupancy geometry whose per-decade recall decay this measures
    val geo = targetRecall match {
      case Some(tr) => graft.ml.Similarity.recallLshGeometry(
        n, 64, tr, refCosine = threshold)
      case None => graft.ml.Similarity.scaledLshGeometry(n, 64)
    }
    val newMax = 2 * embMax
    require(n % newMax == 0 && embMax % 5 == 0,
      s"recall tier $dir: $n rows is not a whole number of replicas of " +
        s"$newMax (plantNearDups dropped rows?) — truth accounting invalid")
    val found = graft.ml.Similarity.cosineNearDupPairs(
        emb, "vec_id", "embedding", geo, threshold, maxBucketSize = 4096)
      .filter(col("b") - col("a") === lit(embMax) &&
        pmod(col("a"), lit(newMax)) < lit(embMax))
      // embMax and newMax are multiples of 5, so a % 5 == base id % 5 =
      // the planted-cosine bucket
      .groupBy(pmod(col("a"), lit(5)).as("bucket"))
      .agg(count(lit(1)).as("hits"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    CacheSweep.sweep(spark)
    val replicas = n / newMax
    val truthPerBucket = (embMax / 5) * replicas
    val eligible = PlantCosines.zipWithIndex.filter(_._1 >= threshold)
    val perC = eligible.map { case (c, i) =>
      c -> found.getOrElse(i, 0L)
    }.toMap
    val recall =
      perC.values.sum.toDouble / (truthPerBucket * eligible.size)
    (recall, perC, truthPerBucket)
  }

  /** LSH candidate-pair count at the tier's scaled geometry: Σ over
    * (band, key) buckets of C(n, 2), eligible buckets only (n ≤
    * `maxBucketSize`, mirroring [[graft.ml.Similarity.cosineNearDupPairs]]'s
    * cap) — the pre-distinct join volume, i.e. exactly the quantity that
    * grew 98.7× for 10× rows under fixed-r geometry (NOTES_r13) and that
    * [[graft.ml.Similarity.scaledLshGeometry]]'s n·log n claim bounds.
    * Recorded per tier in the x100 artifact so the growth law is
    * measured, not extrapolated.
    */
  def lshCandidatePairs(spark: SparkSession, dir: String,
                        maxBucketSize: Int = 4096,
                        targetRecall: Option[Double] = None): Long = {
    val emb = Tables.table(spark, dir, "embeddings")
    val geo = targetRecall match {
      case Some(tr) => graft.ml.Similarity.recallLshGeometry(
        emb.count(), 64, tr, refCosine = 0.9)
      case None => graft.ml.Similarity.scaledLshGeometry(emb.count(), 64)
    }
    val banded = emb
      .select(col("vec_id").as("id"),
        posexplode(graft.ml.Similarity.lshBandKeys(col("embedding"), geo)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    val row = banded.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") <= maxBucketSize)
      // integer DIV: `/` on longs is SQL double division — lossy past
      // 2^53 and the wrong type for an exact count
      .agg(coalesce(sum(expr("(n * (n - 1)) DIV 2")), lit(0L)).as("pairs"))
      .head()
    row.getLong(0)
  }

  /** Containment inverted-index candidate-pair count: Σ over eligible
    * grams (df ≤ `maxDf`) of C(df, 2) — the exact output volume of
    * [[graft.ml.Dedup.containmentPairs]]'s index self-join before the
    * (a,b) aggregation, replicating the operator's own df accounting
    * (occurrence counts over the same shingle explode).
    */
  def containmentCandidatePairs(spark: SparkSession, dir: String,
                                k: Int = 3, maxDf: Int = 64): Long = {
    val d = Tables.table(spark, dir, "documents")
    val grams = d
      .select(col("doc_id").as("id"),
        explode(graft.ml.Dedup.shingles(col("text"), k)).as("g"))
      .select(unhex(md5(col("g"))).as("gd"))
    grams.groupBy(col("gd")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .agg(coalesce(sum(expr("(df * (df - 1)) DIV 2")), lit(0L)))
      .head().getLong(0)
  }

  /** Per-tier LM input sizes for the xent/backoff amortization-floor
    * claim (NOTES_r13's decomposition, extended a decade): corpus
    * bigram occurrences and distinct types, and the train-side unigram
    * vocabulary — the three quantities that scaled exactly 10× at x10.
    */
  def xentInputs(spark: SparkSession, dir: String): (Long, Long, Long) = {
    val d = Tables.table(spark, dir, "documents")
    val words = filter(split(col("text"), " "), x => x =!= "")
    val corpus = d.filter(col("doc_id") % 53 =!= 0)
      .select(words.as("w")).filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1]))"))
        .as("g"))
    // one pass over the corpus explode for both counts — a separate
    // count + distinct().count() re-executes the full split+explode
    val row = corpus.agg(count(lit(1)), count_distinct(col("g"))).head()
    val vocab = d.filter(col("doc_id") % 53 === 0)
      .select(explode(words).as("t")).distinct().count()
    (row.getLong(0), row.getLong(1), vocab)
  }

  final case class TierResult(query: String, tier: String, rows: Long,
                              secMin: Double, secs: Seq[Double],
                              exchanges: Int, rounds: Int = -1)

  /** Exchange count of the PRE-execution physical plan — the plan-shape
    * metric every artifact reports. Counts Exchange NODES (shuffle or
    * broadcast) by tree traversal, excluding ReusedExchange and anything
    * nested inside an InMemoryRelation: a cached relation's plan
    * describes how the cache WAS built (it executed exactly once, at
    * plan-build time), not work the returned plan performs — counting
    * it would double-book every persisted subtree and misread a
    * deliberate share-one-execution persist as added shuffles. The
    * traversal gets the cache exclusion for free (InMemoryTableScan has
    * no children; the cached plan hangs off the relation object, not
    * the tree), where the previous line-counting convention could not —
    * the relation's printed subtree is textually indistinguishable from
    * live plan lines. AQE wrappers are stepped through explicitly.
    */
  def planExchanges(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case _: ReusedExchangeExec => 0
      case e: Exchange => 1 + e.children.map(walk).sum
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  /** The two-tier headline subset (shared with [[Bench]]'s embedded
    * scale section).
    */
  def headline: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "events_chain" -> ((s, d) => BenchChains.eventsChain(s, d)),
      "pipeline_chain" -> ((s, d) => BenchChains.pipelineChain(s, d)),
      "ml_minhash_pairs" -> GraftQueries.queries("ml_minhash_pairs"),
      // the two banded-embedding queries size their LSH geometry TO THE
      // TIER (Similarity.scaledLshGeometry — the operator's documented
      // discipline): a fixed r=8 keyspace (256 buckets/band) saturates
      // at x10 — measured 98.7× candidate-pair growth for 10× rows with
      // replicas landing in DISTINCT buckets (avg 9.97/10 distinct band
      // keys per original), so the blow-up was geometry, not the
      // replica construction. At the base tier the scaled geometry
      // reproduces the oracle's (8,8) exactly, keeping base numbers
      // comparable across rounds.
      "ml_embed_neardup" -> ((s, d) => {
        val emb = Tables.table(s, d, "embeddings")
        graft.ml.Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
            graft.ml.Similarity.scaledLshGeometry(emb.count(), 64),
            threshold = 0.4, maxBucketSize = 4096)
          .orderBy("a", "b")
      }),
      "ml_neardup_keep" -> GraftQueries.queries("ml_neardup_keep"),
      // round-7 surfaces: corpus-aggregate ops and the composed curation
      // pipeline (stage wiring + dedup + split + sample), BPE training
      "ml_dup_ngrams" -> GraftQueries.queries("ml_dup_ngrams"),
      "ml_bpe_merges" -> GraftQueries.queries("ml_bpe_merges"),
      "ml_curation_pipeline" -> GraftQueries.queries("ml_curation_pipeline"),
      "ml_neardup_against" -> GraftQueries.queries("ml_neardup_against"),
      "ml_embed_pq_encode" -> GraftQueries.queries("ml_embed_pq_encode"),
      // round-10 surfaces: the positional ExactSubstr dedup (gram-keyed,
      // corpus-token-sized shuffle) and SemDeDup (cluster-bounded pairs)
      "ml_dup_spans" -> GraftQueries.queries("ml_dup_spans"),
      "ml_semantic_keep" -> GraftQueries.queries("ml_semantic_keep"),
      // round-10 second wave: the bigram-LM scorer (vocabulary-keyed
      // joins — sublinear shuffle), DSIR (plan-time bucket models +
      // narrow LUT scoring), and positional decontamination (broadcast
      // bench digests)
      "ml_bigram_logprob" -> GraftQueries.queries("ml_bigram_logprob"),
      // round-12 third session: the reference-trained LM (corpus side =
      // type-distinct + price join; nothing double-executes — the 2.4×
      // x10 ratio is two corpus explodes scaling with the rotated-replica
      // vocabulary, see NOTES_r12)
      "ml_bigram_xent" -> GraftQueries.queries("ml_bigram_xent"),
      "ml_dsir_weights" -> GraftQueries.queries("ml_dsir_weights"),
      "ml_decontam_clean" -> GraftQueries.queries("ml_decontam_clean"),
      // the composed 5-stage recipe — the end-to-end scale claim
      "ml_pretrain_recipe" -> GraftQueries.queries("ml_pretrain_recipe"),
      // round-12 surfaces: deterministic k-means (plan-time training is
      // the dominant cost — iters+1 corpus aggregates; the returned
      // assignment is narrow) and the LSH-candidate k-NN graph (the
      // embed_neardup bucket machinery + per-node WindowGroupLimit)
      "ml_kmeans_assign" -> GraftQueries.queries("ml_kmeans_assign"),
      // tier-scaled geometry — see ml_embed_neardup above
      "ml_knn_graph" -> ((s, d) => {
        val emb = Tables.table(s, d, "embeddings")
        graft.ml.Similarity.knnGraph(emb, "vec_id", "embedding",
          graft.ml.Similarity.scaledLshGeometry(emb.count(), 64),
          k = 3, maxBucketSize = 4096)
      }),
      // round-12 third session: the df-capped containment inverted index
      // (fan-out bounded by construction; measured x10/base 1.83 at 7
      // exchanges in a quiet-ish window)
      "ml_containment_pairs" -> GraftQueries.queries("ml_containment_pairs"),
      // the deepest count-LM (three vocabulary tables, five price
      // joins); measured x10/base 2.07 at 11 exchanges
      "ml_trigram_backoff" -> GraftQueries.queries("ml_trigram_backoff"))

  /** Run the two-tier headline subset; one [[TierResult]] per
    * (query, tier). Callers own warm-up (and the quiet-window gate —
    * [[LoadGate]]; Bench gates before calling, [[main]] gates at
    * launch).
    *
    * Discipline matches the headline's measure() (r14 item 4): min of 3
    * rebuild-and-run passes, +2 passes when the median of the first
    * three is sub-second — a single contended run can't corrupt the
    * signal OR suppress the extra passes, and min≈median in `secs`
    * proves the window was quiet.
    */
  def run(spark: SparkSession, tiers: Seq[(String, String)],
          runs: Int = 3,
          queries: Seq[(String, (SparkSession, String) => DataFrame)] = headline)
      : Seq[TierResult] =
    for ((name, fn) <- queries; (tier, dir) <- tiers) yield {
      graft.ml.Dedup.lastComponentRounds.set(-1)
      val df = fn(spark, dir)
      // the iterative operators run their settle loop driver-side
      // during construction — rounds-to-settle is known here (-1 for
      // non-iterative queries)
      val rounds = graft.ml.Dedup.lastComponentRounds.get.intValue
      val exchanges = planExchanges(df)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        CacheSweep.sweep(spark)
        dt
      }
      val first = (1 to runs).map(_ => once())
      // median-of-first-3 trigger, exactly measure()'s discipline: one
      // contended outlier must not suppress the extra passes — that
      // noisy case is what min-of-N exists for (ADVICE r14)
      val times = if (runs >= 3 && first.sorted.apply(1) < 1.0)
                    first ++ Seq.fill(2)(once())
                  else first
      val rows = fn(spark, dir).count()
      CacheSweep.sweep(spark)
      TierResult(name, tier, rows, times.min, times, exchanges, rounds)
    }

  /** The x100 flagship subset (VERDICT r13 item 3): the five queries
    * whose growth laws were, until r14, extrapolations from one decade —
    * the scaled-geometry LSH pair (n·log n candidate-work claim), the
    * df-capped containment index, and the two trained count-LMs
    * (amortization-floor claim).
    */
  val flagship100: Seq[String] = Seq("ml_bigram_xent", "ml_embed_neardup",
    "ml_knn_graph", "ml_containment_pairs", "ml_trigram_backoff",
    // r15: the iterative component sweep (rounds-to-settle recorded —
    // the log-diameter claim was measured only to x10) and the
    // output-proportional span dedup
    "ml_neardup_keep", "ml_dup_spans")

  private def session(): SparkSession = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  /** Three-tier run over the flagship subset: base (sf0.1), x10
    * (rotation replicas), x100 (permutation replicas), with per-tier
    * candidate-pair counts, LM input sizes, and same-replica purity for
    * the pair queries. `runMain graft.ScaleProof x100 [out10] [out100]`;
    * one JSON line per fact — redirect to the committed artifact.
    */
  private def mainX100(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val out10 = args.headOption.getOrElse("/tmp/graft-sf1")
    val out100 = args.drop(1).headOption.getOrElse("/tmp/graft-sf10")
    // optional trailing args: run only these queries (local iteration,
    // the generic main's convention); counters/purity skip absent ones
    val only = args.drop(2).toSet
    val spark = session()
    val gate = LoadGate.await(300, tag = "scale-x100")
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"""{"load_gate":$gate,"heap_max_mb":$heapMb,"procs":${Runtime.getRuntime.availableProcessors()}}""")
    buildReplicas(spark, src, out10)
    buildReplicas100(spark, src, out100)
    val picked = headline.filter(q => flagship100.contains(q._1) &&
      (only.isEmpty || only(q._1)))
    picked.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      CacheSweep.sweep(spark)
    }
    val tiers = Seq("base" -> src, "x10" -> out10, "x100" -> out100)
    for (r <- run(spark, tiers, queries = picked)) {
      val rounds = if (r.rounds >= 0) s""","rounds":${r.rounds}""" else ""
      println(f"""{"query":"${r.query}","tier":"${r.tier}","rows":${r.rows},"sec_min":${r.secMin}%.3f,"sec_all":[${r.secs.map(t => f"$t%.3f").mkString(",")}],"exchanges":${r.exchanges}$rounds}""")
    }
    // growth-law inputs, AFTER the timings so the extra executions can't
    // warm or contend with them
    val docMax = Tables.table(spark, src, "documents")
      .agg(max("doc_id")).head().getLong(0) + 1
    val embMax = Tables.table(spark, src, "embeddings")
      .agg(max("vec_id")).head().getLong(0) + 1
    for ((tier, dir) <- tiers) {
      val lsh = lshCandidatePairs(spark, dir)
      CacheSweep.sweep(spark)
      val cont = containmentCandidatePairs(spark, dir)
      CacheSweep.sweep(spark)
      val (occ, types, vocab) = xentInputs(spark, dir)
      CacheSweep.sweep(spark)
      // same-replica purity of the two pair queries on replica tiers:
      // in-replica pairs are the structure-preserving signal; the
      // leftover is chance cross-replica collision (thresholded pair
      // queries) measured, not assumed away
      val purity = if (tier == "base") "" else {
        // ONE aggregate pass per query: total and same-replica counts
        // together — a count-then-filtered-count would execute the full
        // pair query twice per tier, and these are the tier's most
        // expensive plans
        def frac(df: DataFrame, off: Long): String = {
          val row = df.agg(count(lit(1)),
            coalesce(sum(when(
              floor(col("a") / off) === floor(col("b") / off), 1L)
              .otherwise(0L)), lit(0L))).head()
          CacheSweep.sweep(spark)
          s"""{"pairs":${row.getLong(0)},"same_replica":${row.getLong(1)}}"""
        }
        val nd = picked.find(_._1 == "ml_embed_neardup")
          .map(q => s""","embed_neardup_purity":${frac(q._2(spark, dir), embMax)}""")
          .getOrElse("")
        val cp = picked.find(_._1 == "ml_containment_pairs")
          .map(q => s""","containment_purity":${frac(q._2(spark, dir), docMax)}""")
          .getOrElse("")
        nd + cp
      }
      println(s"""{"tier":"$tier","lsh_candidate_pairs":$lsh,"containment_candidate_pairs":$cont,"bigram_occurrences":$occ,"bigram_types":$types,"train_vocab":$vocab$purity}""")
    }
    spark.stop()
  }

  /** Recall-at-threshold across the three tiers (VERDICT r14 item 2):
    * `runMain graft.ScaleProof recall [outDir]` — one JSON line per
    * tier with overall recall@0.9 and the per-planted-cosine hit
    * counts; redirect into the round's scale artifact.
    */
  /** Deterministic title-like corpus for the fuzzy-blocking growth
    * rows: n base rows of 3–6 pseudo-random words (3–8 chars, derived
    * from md5 of the row id — content-diverse, lengths 11–53), plus a
    * one-edit twin for every 100th row. Planted twins = n/100, the
    * ground truth the recall column divides by.
    */
  private[graft] def fuzzyTitleFixture(spark: SparkSession,
                                       n: Long): DataFrame = {
    val base = spark.range(n).toDF("id")
      .withColumn("nw", (conv(substring(md5(col("id").cast("string")), 1, 2),
        16, 10).cast("int") % 4) + 3)
      .withColumn("title", concat_ws(" ",
        slice(transform(sequence(lit(0), lit(5)), i =>
          substring(concat(md5(concat(col("id").cast("string"), i)),
            md5(concat(i, col("id").cast("string")))), 1, 8)
            .substr(lit(1), (conv(substring(md5(concat(col("id"),
              lit("w"), i)), 1, 2), 16, 10).cast("int") % 6) + 3)),
          lit(1), col("nw"))))
      .select(col("id"), col("title"))
    base.unionByName(base.filter(col("id") % 100 === 0)
      .select((col("id") + n).as("id"),
        concat(col("title").substr(lit(1), length(col("title")) - 1),
          lit("z")).as("title")))
  }

  /** Fuzzy-blocking growth rows: `runMain graft.ScaleProof fuzzy`.
    * The committed evidence behind shipping PassJoin segment blocking
    * as the fuzzy default (PLANS round-15, fourth session): per
    * (tier, blocking, cap) — candidate-pair count (deterministic by
    * construction), planted-pair recall, CapAudit row exemptions, and
    * wall seconds. Length bands run at the SHIPPED cap (what a user
    * gets) and uncapped at the 100k tier only (the uncapped 1M band
    * join is the ~10¹⁰-candidate shape the row extrapolates, not
    * runs). One JSON line per configuration.
    */
  private def mainFuzzy(): Unit = {
    import graft.ml.{CapAudit, Dedup}
    val spark = session()
    val gate = LoadGate.await(300, tag = "fuzzy")
    println(s"""{"load_gate":$gate}""")
    // r16 extends the measurement one decade (10M rows — the counted
    // row behind PLANS' ~16M-candidate extrapolation) and adds the
    // SHIPPED default configuration (segment @ cap 4096, ADVICE r15)
    // at every tier, so the artifact carries a measured recall row for
    // what users actually get. Length bands stay capped past 100k
    // (their uncapped same-length join is the ~10¹⁰-candidate shape
    // the rows exist to condemn, not to run).
    for (n <- Seq(100000L, 1000000L, 10000000L)) {
      val df = fuzzyTitleFixture(spark, n).persist()
      val planted = df.count() - n
      val configs = Seq(("length", 4096), ("length", 1 << 20),
        ("segment", 4096), ("segment", 1 << 20))
        .filterNot { case (b, cap) =>
          b == "length" && cap > 4096 && n > 100000L }
      for ((blocking, cap) <- configs) {
        CapAudit.reset()
        val t0 = System.nanoTime()
        val cand = Dedup.fuzzyCandidatePairs(df, "id", "title", 2, cap,
          blocking, "fuzzy_dedup").count()
        val tCand = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val found = Dedup.fuzzyDupPairs(df, "id", "title", 2, cap,
          blocking).count()
        val tPairs = (System.nanoTime() - t1) / 1e9
        val exempted = CapAudit.snapshot()
          .getOrElse(("exempted_rows", "cap_fuzzy_dedup"), 0L)
        // r17: the segment path now carries the histogram prefilter
        // (CharHistExpr/NibbleL1), so `candidates` above is the
        // SURVIVING set the verify pays for. Count the same tier with
        // the filter disabled — the raw birthday-term set — and
        // HARD-REQUIRE the verified result is identical: the
        // losslessness proof, measured at every tier, not argued.
        val noFilter =
          if (blocking != "segment") ""
          else {
            Dedup.disableHistPrefilter = true
            try {
              val t2 = System.nanoTime()
              val raw = Dedup.fuzzyCandidatePairs(df, "id", "title", 2,
                cap, blocking, "fuzzy_dedup").count()
              val tRaw = (System.nanoTime() - t2) / 1e9
              val t3 = System.nanoTime()
              val foundRaw = Dedup.fuzzyDupPairs(df, "id", "title", 2,
                cap, blocking).count()
              val tPairsRaw = (System.nanoTime() - t3) / 1e9
              require(foundRaw == found,
                s"prefilter lost pairs at tier $n: $found vs $foundRaw")
              f""","candidates_nofilter":$raw,"cand_sec_nofilter":$tRaw%.2f,"pairs_sec_nofilter":$tPairsRaw%.2f"""
            } finally Dedup.disableHistPrefilter = false
          }
        println(f"""{"fuzzy_tier":$n,"blocking":"$blocking","cap":$cap,"candidates":$cand,"planted":$planted,"found":$found,"exempted_rows":$exempted,"cand_sec":$tCand%.2f,"pairs_sec":$tPairs%.2f$noFilter}""")
      }
      df.unpersist()
    }
    spark.stop()
  }

  /** IVF ingest under distribution drift: `runMain graft.ScaleProof
    * drift [outDir]` — the ingest family's one previously-unmeasured
    * claim ("a tuned nprobe restores recall against drift meanwhile",
    * VERDICT r15 item 4). Batches land in an [[graft.ml.IvfIngest]]
    * flat index whose centroids were trained on batch 0 (the
    * first-batch contract); each later batch's secondary-block weight
    * rises (Recall.clusteredEmbeddings' mixed-topic knob, 0 → 0.9), so
    * arriving vectors increasingly straddle the frozen buckets. Per
    * batch, one JSON row records recall@10 on a batch-local query
    * sample (drift hurts the LIVE EDGE first — queries for old data
    * still cluster cleanly) at (a) the nprobe tuned once on batch 0
    * and (b) a freshly re-tuned nprobe, plus the re-tuned width — the
    * measured basis for the re-index threshold stated in PLANS.
    */
  private def mainDrift(args: Array[String]): Unit = {
    import graft.ml.{IvfIngest, Recall, Similarity}
    val spark = session()
    val gate = LoadGate.await(300, tag = "drift")
    println(s"""{"load_gate":$gate}""")
    val dim = 64
    val c = 16
    val k = 10
    val target = 0.95
    val perCluster = 250 // 4,000 vectors per batch
    // the sweep runs to the full two-topic mix (w = 1.0): that is the
    // edge where arriving vectors sit EXACTLY between frozen buckets
    // and re-tuning has to buy recall with real probe width — the
    // regime that separates "re-tune" from "re-index"
    val weights = Seq(0.0, 0.2, 0.4, 0.6, 0.75, 0.9, 0.95, 1.0)
    val root = args.headOption.getOrElse("/tmp/graft-drift")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(rootPath, true)
    val ipath = root + "/index"
    var fixedNp = -1
    for ((w, i) <- weights.zipWithIndex) {
      val t0 = System.nanoTime()
      val batch = Recall.clusteredEmbeddings(spark, c, perCluster, dim,
          secondaryWeight = w)
        .select((col("vec_id") + lit(i.toLong * c * perCluster))
          .as("vec_id"), col("embedding"))
        .persist()
      batch.count()
      if (i == 0) {
        val cs = Similarity.trainCentroids(batch, "vec_id", "embedding",
          c, iters = 3)
        IvfIngest.create(spark, ipath, cs)
      }
      IvfIngest.append(batch, "vec_id", "embedding", ipath, s"b$i")
      val cen = Similarity.ivfIndexGeometry(spark, ipath).get._2
      val corpus = spark.read.parquet(ipath)
        .select(col("vec_id"), col("embedding")).persist()
      val n = corpus.count()
      // batch-local query sample, content-addressed (the tuner's own
      // convention) — the retrieval surface drift degrades first
      val sample = batch.select(col("vec_id").as("qid"),
          col("embedding").cast("array<double>").as("qvec"),
          md5(col("vec_id").cast("string")).as("__h"))
        .orderBy(col("__h")).limit(16).drop("__h").persist()
      sample.count()
      if (i == 0)
        fixedNp = Recall.tuneNprobe(corpus, "vec_id", "embedding",
          sample, "qid", "qvec", cen, k, target)._1
      val recFixed = Recall.ivfRecallCurve(corpus, "vec_id", "embedding",
        sample, "qid", "qvec", cen, k, Seq(fixedNp)).head._2
      val (npRe, recRe) = Recall.tuneNprobe(corpus, "vec_id", "embedding",
        sample, "qid", "qvec", cen, k, target)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"drift_batch":$i,"secondary_weight":$w%.2f,"n":$n,"centroids":$c,"k":$k,"target_recall":$target,"fixed_nprobe":$fixedNp,"recall_at_fixed":$recFixed%.4f,"retuned_nprobe":$npRe,"recall_at_retuned":$recRe%.4f,"sec":$dt%.3f}""")
      sample.unpersist(blocking = false)
      corpus.unpersist(blocking = false)
      batch.unpersist(blocking = false)
      CacheSweep.sweep(spark)
    }
    spark.stop()
  }

  /** Written-BM25-index growth rows: `runMain graft.ScaleProof
    * lexindex [out10 [out100]]` — the measured basis for the LexIndex
    * claim that index-served retrieval reads O(query terms) of the
    * postings while the full-scan path re-tokenizes the corpus per
    * batch. Per tier (base/x10/x100 document replicas, a FIXED
    * 64-query set): index build seconds (the one-time cost), postings
    * row count, and min-of-3 retrieval seconds for the scan path vs
    * the index path — plus a bit-equality check between the two on
    * every tier (same corpus ⇒ identical result sets, the LexIndexSpec
    * identity at scale). Honest fixture note: the replicas rotate
    * letters, so the base queries' terms match only the identity
    * replica and their postings stay constant-size across tiers — the
    * structure-preserving property. On a natural corpus a COMMON
    * query term's postings grow with the corpus; the claim the rows
    * support is read ∝ postings of the queried terms (never corpus
    * size), which holds either way.
    */
  private def mainLexIndex(args: Array[String]): Unit = {
    import graft.ml.{CorpusStats, LexIndex}
    val src = "/root/testdata/sf0.1"
    val out10 = args.headOption.getOrElse("/tmp/graft-sf1")
    val out100 = args.drop(1).headOption.getOrElse("/tmp/graft-sf10")
    val spark = session()
    val gate = LoadGate.await(300, tag = "lexindex")
    println(s"""{"load_gate":$gate}""")
    buildReplicas(spark, src, out10)
    buildReplicas100(spark, src, out100)
    val queries = Tables.table(spark, src, "documents")
      .filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        array_join(slice(graft.ml.Curation.words(col("text")), 1, 5), " ")
          .as("qtext"),
        md5(col("doc_id").cast("string")).as("__h"))
      .orderBy(col("__h")).limit(64).drop("__h").persist()
    queries.count()
    for ((tier, dir) <- Seq("base" -> src, "x10" -> out10,
        "x100" -> out100)) {
      val docs = Tables.table(spark, dir, "documents")
      val n = docs.count()
      val idx = s"/tmp/graft-lexidx-$tier"
      val ip = new org.apache.hadoop.fs.Path(idx)
      val fs = ip.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(ip, true)
      val b0 = System.nanoTime()
      LexIndex.write(docs, "doc_id", "text", idx, buckets = 64)
      val buildSec = (System.nanoTime() - b0) / 1e9
      val postings = spark.read.parquet(idx + "/postings").count()
      def timeMin(mk: () => org.apache.spark.sql.DataFrame): Double =
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          mk().write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - t0) / 1e9
          CacheSweep.sweep(spark)
          dt
        }.min
      val scanSec = timeMin(() => CorpusStats.bm25TopK(docs, "doc_id",
        "text", queries, "qid", "qtext", k = 10))
      val idxSec = timeMin(() => LexIndex.bm25ReadTopK(spark, idx,
        queries, "qid", "qtext", k = 10))
      // the identity at scale: same corpus ⇒ bit-identical result set
      val a = CorpusStats.bm25TopK(docs, "doc_id", "text", queries,
        "qid", "qtext", k = 10).orderBy("qid", "rank")
        .collect().toSeq
      val bRows = LexIndex.bm25ReadTopK(spark, idx, queries, "qid",
        "qtext", k = 10).orderBy("qid", "rank").collect().toSeq
      val identical = a == bRows
      CacheSweep.sweep(spark)
      println(f"""{"lex_tier":"$tier","n_docs":$n,"queries":64,"postings_rows":$postings,"build_sec":$buildSec%.3f,"scan_sec_min":$scanSec%.3f,"index_sec_min":$idxSec%.3f,"identical":$identical,"result_rows":${a.size}}""")
      require(identical,
        s"lexindex: index-served BM25 diverged from the scan at $tier")
    }
    // the buckets default (64), priced at the x100 tier: more buckets
    // = finer partition pruning (fewer postings read per query) but
    // more directories/files (listing + open cost, and the same
    // pruning gain saturates once each bucket holds few queried
    // terms). One row per candidate so the shipped default carries a
    // measurement instead of a shrug.
    val x100docs = Tables.table(spark, out100, "documents")
    for (bks <- Seq(8, 64, 512)) {
      val idx = s"/tmp/graft-lexidx-bsweep-$bks"
      val ip = new org.apache.hadoop.fs.Path(idx)
      val fs = ip.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(ip, true)
      val b0 = System.nanoTime()
      LexIndex.write(x100docs, "doc_id", "text", idx, buckets = bks)
      val buildSec = (System.nanoTime() - b0) / 1e9
      var files = 0L
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(idx), true)
      while (it.hasNext) {
        val nm = it.next().getPath.getName
        if (!nm.startsWith("_") && !nm.startsWith(".")) files += 1
      }
      val idxSec = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        LexIndex.bm25ReadTopK(spark, idx, queries, "qid", "qtext",
          k = 10).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        CacheSweep.sweep(spark)
        dt
      }.min
      println(f"""{"lex_buckets":$bks,"tier":"x100","data_files":$files,"build_sec":$buildSec%.3f,"index_sec_min":$idxSec%.3f}""")
    }
    queries.unpersist(blocking = false)
    spark.stop()
  }

  /** Growing-BM25-store rows: `runMain graft.ScaleProof lexingest
    * [out10]` — the measured basis for the lex_ingest claims. The
    * frozen-index decade growth is mainLexIndex's axis; the axis THIS
    * store adds is BATCH COUNT: postings arrive as N rename-committed
    * partitions, reads must stay correct (hard-required identical to
    * the frozen index AND the full scan on the same corpus) and the
    * uncompacted read-path penalty vs the fold must be priced — the
    * number `compact_every:` is sized by. Rows:
    *
    *  - per tier (sf0.1 base / x10 replicas), a 32-batch ingest:
    *    append wall total (vs the one-shot frozen build), read
    *    min-of-3 uncompacted → folded → frozen, file counts, identity;
    *  - a batch-count sweep (8 / 32 / 128) on the base tier:
    *    uncompacted read seconds + data files per batch count — the
    *    degradation curve the self-fold bounds.
    */
  private def mainLexIngest(args: Array[String]): Unit = {
    import graft.ml.{CorpusStats, LexIndex, LexIngest}
    val src = "/root/testdata/sf0.1"
    val out10 = args.headOption.getOrElse("/tmp/graft-sf1")
    val spark = session()
    val gate = LoadGate.await(300, tag = "lexingest")
    println(s"""{"load_gate":$gate}""")
    buildReplicas(spark, src, out10)
    val queries = Tables.table(spark, src, "documents")
      .filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        array_join(slice(graft.ml.Curation.words(col("text")), 1, 5), " ")
          .as("qtext"),
        md5(col("doc_id").cast("string")).as("__h"))
      .orderBy(col("__h")).limit(64).drop("__h").persist()
    queries.count()
    def timeMin(mk: () => org.apache.spark.sql.DataFrame): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        CacheSweep.sweep(spark)
        dt
      }.min
    def ingest(docs: org.apache.spark.sql.DataFrame, store: String,
               batches: Int): Double = {
      val sp = new org.apache.hadoop.fs.Path(store)
      val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(sp, true)
      val t0 = System.nanoTime()
      LexIngest.create(spark, store, buckets = 64)
      for (b <- 0 until batches)
        LexIngest.append(
          docs.filter(pmod(col("doc_id"), lit(batches)) === b),
          "doc_id", "text", store, s"b$b")
      (System.nanoTime() - t0) / 1e9
    }
    for ((tier, dir) <- Seq("base" -> src, "x10" -> out10)) {
      val docs = Tables.table(spark, dir, "documents")
      val n = docs.count()
      val store = s"/tmp/graft-lexing-$tier"
      val appendSec = ingest(docs, store, batches = 32)
      val filesRaw = LexIngest.dataFileCount(spark, store)
      val rawSec = timeMin(() => LexIndex.bm25ReadTopK(spark, store,
        queries, "qid", "qtext", k = 10))
      val rawRows = LexIndex.bm25ReadTopK(spark, store, queries,
        "qid", "qtext", k = 10).orderBy("qid", "rank").collect().toSeq
      val c0 = System.nanoTime()
      val (_, filesFolded) = LexIngest.compact(spark, store)
      val compactSec = (System.nanoTime() - c0) / 1e9
      val foldSec = timeMin(() => LexIndex.bm25ReadTopK(spark, store,
        queries, "qid", "qtext", k = 10))
      val foldRows = LexIndex.bm25ReadTopK(spark, store, queries,
        "qid", "qtext", k = 10).orderBy("qid", "rank").collect().toSeq
      // the frozen one-shot index over the same corpus: the build-cost
      // and read-cost comparator, and the identity anchor
      val idx = s"/tmp/graft-lexing-frozen-$tier"
      val ip = new org.apache.hadoop.fs.Path(idx)
      val fsI = ip.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsI.delete(ip, true)
      val b0 = System.nanoTime()
      LexIndex.write(docs, "doc_id", "text", idx, buckets = 64)
      val buildSec = (System.nanoTime() - b0) / 1e9
      val frozenSec = timeMin(() => LexIndex.bm25ReadTopK(spark, idx,
        queries, "qid", "qtext", k = 10))
      val frozenRows = LexIndex.bm25ReadTopK(spark, idx, queries,
        "qid", "qtext", k = 10).orderBy("qid", "rank").collect().toSeq
      val scanRows = CorpusStats.bm25TopK(docs, "doc_id", "text",
          queries, "qid", "qtext", k = 10)
        .orderBy("qid", "rank").collect().toSeq
      val identical = rawRows == scanRows && foldRows == scanRows &&
        frozenRows == scanRows
      CacheSweep.sweep(spark)
      println(f"""{"lexingest_tier":"$tier","n_docs":$n,"batches":32,"append_total_sec":$appendSec%.3f,"frozen_build_sec":$buildSec%.3f,"files_raw":$filesRaw,"files_folded":$filesFolded,"compact_sec":$compactSec%.3f,"read_raw_sec_min":$rawSec%.3f,"read_folded_sec_min":$foldSec%.3f,"read_frozen_sec_min":$frozenSec%.3f,"identical":$identical,"result_rows":${scanRows.size}}""")
      require(identical,
        s"lexingest: store-served BM25 diverged at $tier")
    }
    // batch-count sweep: the uncompacted degradation curve (base tier)
    val baseDocs = Tables.table(spark, src, "documents")
    for (batches <- Seq(8, 32, 128)) {
      val store = s"/tmp/graft-lexing-sweep-$batches"
      val appendSec = ingest(baseDocs, store, batches)
      val files = LexIngest.dataFileCount(spark, store)
      val rawSec = timeMin(() => LexIndex.bm25ReadTopK(spark, store,
        queries, "qid", "qtext", k = 10))
      println(f"""{"lexingest_batches":$batches,"tier":"base","data_files":$files,"append_total_sec":$appendSec%.3f,"read_raw_sec_min":$rawSec%.3f}""")
    }
    queries.unpersist(blocking = false)
    spark.stop()
  }

  /** BM25 staleness → ranking impact: `runMain graft.ScaleProof
    * lexdrift` (VERDICT r16 missing #2 — put a NUMBER on "what drift
    * percentage moves BM25 rankings measurably", so `Curate build-lex
    * --check`'s drift report has an interpretation table). A LexIndex
    * freezes at the sf0.1 documents table; the corpus then grows
    * self-similarly (a deterministic d-fraction of the base docs
    * re-enters under fresh ids, so df and n_docs scale together —
    * the steady-state growth shape that moves idf/avgdl least; a
    * topic-shifted corpus drifts faster, which is why the CLI check
    * reports avgdl drift separately). Per drift level, against the
    * 16-query fresh-scan truth over the FULL corpus:
    *
    *  - `overlap_full_pct`: stale-index top-10 vs fresh top-10 — the
    *    TOTAL staleness cost, dominated by new documents the frozen
    *    index cannot see (their share of top-10 slots ≈ the growth
    *    fraction for self-similar growth);
    *  - `overlap_olddocs_pct`: stale top-10 vs the fresh ranking
    *    restricted to pre-growth docs — the PURE df/avgdl re-ranking
    *    effect on comparable candidates, the subtle drift the
    *    correctness contract worries about.
    */
  private def mainLexDrift(): Unit = {
    import graft.ml.{CorpusStats, LexIndex}
    val spark = session()
    val gate = LoadGate.await(300, tag = "lexdrift")
    println(s"""{"load_gate":$gate}""")
    val src = "/root/testdata/sf0.1"
    val newIdBase = 10000000L
    val base = Tables.table(spark, src, "documents")
      .select(col("doc_id"), col("text")).persist()
    val baseN = base.count()
    val queries = base.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("qid"),
        array_join(slice(graft.ml.Curation.words(col("text")), 1, 5),
          " ").as("qtext"),
        md5(col("doc_id").cast("string")).as("__h"))
      .orderBy(col("__h")).limit(16).drop("__h").persist()
    queries.count()
    val idx = "/tmp/graft-lexdrift-idx"
    val ip = new org.apache.hadoop.fs.Path(idx)
    val fsIdx = ip.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsIdx.delete(ip, true)
    LexIndex.write(base, "doc_id", "text", idx, buckets = 64)
    val stale = LexIndex.bm25ReadTopK(spark, idx, queries, "qid",
        "qtext", k = 10)
      .select("qid", "rank", "doc").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    for (d <- Seq(0.10, 0.25, 0.50, 1.00)) {
      val growth = base
        .filter(pmod(xxhash64(col("doc_id")), lit(10000L)) <
          lit((d * 10000).toLong))
        .select((col("doc_id") + lit(newIdBase)).as("doc_id"),
          col("text"))
      val full = base.unionByName(growth).persist()
      val fullN = full.count()
      val st = LexIndex.staleness(full, "text", idx)
      // fresh truth at k=50 so the old-doc restriction still has ≥10
      val fresh = CorpusStats.bm25TopK(full, "doc_id", "text", queries,
          "qid", "qtext", k = 50)
        .select("qid", "rank", "doc").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
      def overlapPct(restrictOld: Boolean): Double = {
        val per = stale.toSeq.map { case (q, sTop) =>
          val f = fresh.getOrElse(q, Seq.empty)
          val fTop = (if (restrictOld) f.filter(_ < newIdBase) else f)
            .take(10)
          val denom = math.max(1, math.max(sTop.size, fTop.size))
          sTop.toSet.intersect(fTop.toSet).size.toDouble / denom
        }
        100.0 * per.sum / math.max(1, per.size)
      }
      println(f"""{"lexdrift_growth":$d%.2f,"n_base":$baseN,"n_full":$fullN,"doc_drift_pct":${st.docDriftPct}%.2f,"avgdl_drift_pct":${st.avgdlDriftPct}%.4f,"overlap_full_pct":${overlapPct(false)}%.1f,"overlap_olddocs_pct":${overlapPct(true)}%.1f}""")
      full.unpersist(blocking = false)
      CacheSweep.sweep(spark)
    }
    base.unpersist(blocking = false)
    queries.unpersist(blocking = false)
    spark.stop()
  }

  private def mainRecall(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val out = args.headOption.getOrElse("/tmp/graft-recall")
    val spark = session()
    val gate = LoadGate.await(300, tag = "recall")
    println(s"""{"load_gate":$gate}""")
    val embMax = Tables.table(spark, src, "embeddings")
      .agg(max("vec_id")).head().getLong(0) + 1
    val tiers = buildRecallTiers(spark, src, out)
    for ((tier, dir, replicas) <- tiers) {
      val n = Tables.table(spark, dir, "embeddings").count()
      // both geometries per tier: the square occupancy default (whose
      // recall decay the r15 rows document) and the recall-targeted
      // sizing (target 0.95 at the threshold cosine) that buys the
      // decay back at an explicit b/r candidate-work cost
      for (target <- Seq(None, Some(0.95))) {
        val (bands, planes) = target match {
          case Some(tr) =>
            graft.ml.Similarity.recallLshBandsPlanes(n, tr, 0.9)
          case None => graft.ml.Similarity.scaledLshBandsPlanes(n)
        }
        val tag = target.map(tr =>
          s""","geometry":"recall","target_recall":$tr""").getOrElse("")
        val t0 = System.nanoTime()
        val (recall, perC, truthPerC) =
          recallAtThreshold(spark, dir, embMax, threshold = 0.9, target)
        val dt = (System.nanoTime() - t0) / 1e9
        // the geometry's candidate-work cost, deterministic by
        // construction — the recall rows carry the price of the recall
        val cand = lshCandidatePairs(spark, dir, targetRecall = target)
        val perCs = perC.toSeq.sortBy(_._1).map { case (c, h) =>
          s""""$c":$h""" }.mkString(",")
        println(f"""{"recall_tier":"$tier","replicas":$replicas,"n":$n,"threshold":0.9,"bands":$bands,"planes_per_band":$planes$tag,"recall":$recall%.4f,"per_c_hits":{$perCs},"truth_per_c":$truthPerC,"lsh_candidate_pairs":$cand,"sec":$dt%.3f}""")
      }
    }
    spark.stop()
  }

  /** IVF recall across the three tiers: `runMain graft.ScaleProof
    * annrecall [outDir]` — the ANN sibling of [[mainRecall]]. Same
    * replica fixture, but the question is the OTHER family's scale
    * behavior: with a FIXED centroid count, does recall at a fixed
    * nprobe decay as the corpus grows (the sign-map replicas spread
    * mass into new orthants, so cluster count outgrows C — the
    * realistic drift case), and does [[graft.ml.Recall.tuneNprobe]]
    * hold a stated target by paying a measured, visible probe-width
    * cost. One JSON line per tier: the fixed-nprobe curve, the tuned
    * width, and its recall.
    */
  private def mainAnnRecall(args: Array[String]): Unit = {
    import graft.ml.{Recall, Similarity}
    val src = "/root/testdata/sf0.1"
    val out = args.headOption.getOrElse("/tmp/graft-recall")
    val spark = session()
    val gate = LoadGate.await(300, tag = "annrecall")
    println(s"""{"load_gate":$gate}""")
    val k = 10
    val c = 16
    val target = 0.95
    for ((tier, dir, replicas) <- buildRecallTiers(spark, src, out)) {
      val emb = Tables.table(spark, dir, "embeddings").persist()
      val n = emb.count()
      val t0 = System.nanoTime()
      val cs = Similarity.trainCentroids(emb, "vec_id", "embedding",
        c, iters = 3)
      // the tuner's own content-addressed sample, reproduced here so
      // the fixed-nprobe curve and the tuned row read the same queries
      val sample = emb.select(col("vec_id").as("qid"),
          col("embedding").cast("array<double>").as("qvec"),
          md5(col("vec_id").cast("string")).as("__h"))
        .orderBy(col("__h")).limit(16).drop("__h").persist()
      sample.count()
      val curve = Recall.ivfRecallCurve(emb, "vec_id", "embedding",
        sample, "qid", "qvec", cs, k, Seq(1, 2, 4, c))
      val (np, rec) = Recall.tuneNprobe(emb, "vec_id", "embedding",
        sample, "qid", "qvec", cs, k, target)
      val dt = (System.nanoTime() - t0) / 1e9
      val curveJson = curve.map { case (p, r) =>
        f""""$p":$r%.4f""" }.mkString(",")
      println(f"""{"ann_tier":"$tier","replicas":$replicas,"n":$n,"centroids":$c,"k":$k,"recall_at_nprobe":{$curveJson},"target_recall":$target,"tuned_nprobe":$np,"tuned_recall":$rec%.4f,"sec":$dt%.3f}""")
      sample.unpersist(blocking = false)
      emb.unpersist(blocking = false)
      CacheSweep.sweep(spark)
    }
    // The replica fixture is near-uniform on the sphere — IVF's worst
    // case, where holding the target honestly costs most of the probe
    // range. The clustered tiers measure the shape IVF EXISTS for
    // (mixed-topic clusters, Recall.clusteredEmbeddings' realistic
    // w=0.85 variant) at the same three sizes: the claim under test is
    // that fixed-C IVF recall at a given nprobe HOLDS as the corpus
    // grows when the cluster count is stable — growth adds rows per
    // cluster, not clusters — so the tuned width stays put across
    // decades instead of drifting toward exhaustive.
    for ((tier, mult) <- Seq(("clustered_base", 1), ("clustered_x10", 10),
        ("clustered_x100", 100))) {
      val emb = graft.ml.Recall.clusteredEmbeddings(spark, nClusters = 16,
        perCluster = 250 * mult, dim = 64, secondaryWeight = 0.85)
        .persist()
      val n = emb.count()
      val t0 = System.nanoTime()
      val cs = Similarity.trainCentroids(emb, "vec_id", "embedding",
        c, iters = 3)
      val sample = emb.select(col("vec_id").as("qid"),
          col("embedding").cast("array<double>").as("qvec"),
          md5(col("vec_id").cast("string")).as("__h"))
        .orderBy(col("__h")).limit(16).drop("__h").persist()
      sample.count()
      val curve = Recall.ivfRecallCurve(emb, "vec_id", "embedding",
        sample, "qid", "qvec", cs, k, Seq(1, 2, 4, c))
      val (np, rec) = Recall.tuneNprobe(emb, "vec_id", "embedding",
        sample, "qid", "qvec", cs, k, target)
      val dt = (System.nanoTime() - t0) / 1e9
      val curveJson = curve.map { case (p, r) =>
        f""""$p":$r%.4f""" }.mkString(",")
      println(f"""{"ann_tier":"$tier","n":$n,"centroids":$c,"k":$k,"recall_at_nprobe":{$curveJson},"target_recall":$target,"tuned_nprobe":$np,"tuned_recall":$rec%.4f,"sec":$dt%.3f}""")
      sample.unpersist(blocking = false)
      emb.unpersist(blocking = false)
      CacheSweep.sweep(spark)
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("x100")) { mainX100(args.drop(1)); return }
    if (args.headOption.contains("recall")) { mainRecall(args.drop(1)); return }
    if (args.headOption.contains("annrecall")) {
      mainAnnRecall(args.drop(1)); return
    }
    if (args.headOption.contains("fuzzy")) { mainFuzzy(); return }
    if (args.headOption.contains("lexdrift")) { mainLexDrift(); return }
    if (args.headOption.contains("lexingest")) {
      mainLexIngest(args.drop(1)); return
    }
    if (args.headOption.contains("drift")) { mainDrift(args.drop(1)); return }
    if (args.headOption.contains("lexindex")) {
      mainLexIndex(args.drop(1)); return
    }
    val src = "/root/testdata/sf0.1"
    val out = args.headOption.getOrElse("/tmp/graft-sf1")
    // optional trailing args: run only these queries (local iteration)
    val only = args.drop(1).toSet
    val picked =
      if (only.isEmpty) headline else headline.filter(q => only(q._1))
    val spark = session()
    // standalone runs carry the same quiet-window discipline as the
    // official artifact (r14 item 4) — the gate result goes to stderr,
    // not the JSON lines, so existing consumers parse unchanged
    System.err.println(s"[scale] load_gate ${LoadGate.await(300, tag = "scale")}")

    buildReplicas(spark, src, out)

    // warm-up (JIT + codegen), not timed
    picked.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      CacheSweep.sweep(spark)
    }

    for (r <- run(spark, Seq("sf0.1" -> src, "sf1" -> out), queries = picked)) {
      val name = r.query; val tier = r.tier
      val fn = picked.find(_._1 == name).get._2
      val dir = if (tier == "sf0.1") src else out
      // pair queries at sf1: split true (in-replica) pairs from chance
      // cross-replica collisions — the latter measure the THRESHOLD's
      // selectivity at 10× corpus size, not replication leakage
      val sameReplica =
        if (tier == "sf1" && Set("ml_embed_neardup", "ml_minhash_pairs")(name)) {
          val idOffset = if (name == "ml_embed_neardup")
            Tables.table(spark, src, "embeddings").agg(max("vec_id")).head().getLong(0) + 1
          else
            Tables.table(spark, src, "documents").agg(max("doc_id")).head().getLong(0) + 1
          val n = fn(spark, dir)
            .filter(floor(col("a") / idOffset) === floor(col("b") / idOffset)).count()
          CacheSweep.sweep(spark)
          s""","same_replica_rows":$n"""
        } else ""
      println(f"""{"query":"$name","tier":"$tier","rows":${r.rows},"sec_min":${r.secMin}%.3f,"sec_all":[${r.secs.map(t => f"$t%.3f").mkString(",")}],"exchanges":${r.exchanges}$sameReplica}""")
    }
    spark.stop()
  }
}
