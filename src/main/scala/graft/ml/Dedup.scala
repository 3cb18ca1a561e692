package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  * All hash primitives are md5-hex based: deterministic, identical across
  * engines (oracle-checkable), and cheap (codegen'd `md5`). At 100 TB the
  * shapes below are the standard ones: exact dedup is a hash-groupBy
  * (one shuffle on a 32-hex key); MinHash-LSH shuffles once on
  * (band_id, band_hash) — never the O(n²) pair space; SimHash buckets on
  * 16-bit chunks of the fingerprint.
  */
object Dedup {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(trim(text), """\s+""")

  /** One 32-bit half of md5 as a long ([[graft.functions.Md5HalfExpr]]):
    * same value as `conv(substring(md5(c), 1+8·half, 8), 16, 10)`, no
    * hex-string round-trip.
    */
  def md5half(c: Column, half: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(graft.functions.Md5HalfExpr(
      org.apache.spark.sql.GraftSqlBridge.expression(c), half))

  /** k-word shingles, distinct, of a text column — one native pass
    * ([[graft.functions.ShinglesExpr]]). The previous
    * `array_distinct(zip_with(slice…))` composition was all
    * CodegenFallback higher-order functions and measured ~60% of the
    * MinHash signature job; the expression replicates its semantics
    * bit-for-bit (Spark-trim, `\s+` split, n<k fallback shingle).
    */
  def shingles(text: Column, k: Int = 3): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.ShinglesExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(text), k))

  /** Exact dedup: keep the first (min orderKey) row per md5(text).
    * One shuffle on the 32-hex key; at scale use this over full-row
    * comparison — the key is 16 bytes, not the document.
    */
  def exact(df: DataFrame, textCol: String, orderKey: String): DataFrame = {
    // Explicit aliases on both join sides: `keep` derives from `keyed`, so
    // unqualified keyed("__h") === keep("__h") resolves both to the same
    // attribute (Spark warns "trivially true equals predicate") and only
    // works by plan-id disambiguation. The alias-qualified form is robust.
    val keyed = df.withColumn("__h", md5(col(textCol)))
    val keep = keyed.groupBy(col("__h"))
      .agg(min(col(orderKey)).as(orderKey + "_keep"))
    keyed.alias("k").join(keep.alias("d"),
        col("k.__h") === col("d.__h") &&
        col(s"k.$orderKey") === col(s"d.${orderKey}_keep"))
      .select(df.columns.map(c => col(s"k.$c")): _*)
  }

  /** Modulus for the Kirsch-Mitzenmacher hash family: largest prime
    * < 2^32. hash_i(s) = (h1(s) + i·h2(s)) mod P with h1/h2 = two 32-bit
    * halves of one md5 — ONE digest per shingle feeds all n permutations,
    * and i·h2 ≤ n·2^32 stays far from Long overflow (important: DuckDB
    * BIGINT traps on overflow, so the oracle needs the same safe range).
    */
  val MinhashPrime = 4294967291L

  /** Per-document MinHash signatures as columns mh0..mh{n-1}.
    *
    * The scalable plan shape: explode shingles → one md5 per shingle →
    * single hash-aggregate on the doc id computing all n mins at once.
    * Partial aggregation (map-side combine) means the shuffle carries one
    * n-long row per doc per partition, never the shingle set — this is
    * the form that survives 100 TB, unlike per-row array expressions that
    * rebuild the shingle array once per permutation.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int = 3): DataFrame = {
    val ex = df.select(col(idCol).as("id"),
      explode(shingles(col(textCol), k)).as("s"))
    val h = ex.select(col("id"),
      md5half(col("s"), 0).as("h1"),
      md5half(col("s"), 1).as("h2"))
    val aggs = (0 until n).map(i =>
      min((col("h1") + lit(i.toLong) * col("h2")) % MinhashPrime).as(s"mh$i"))
    h.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH candidate pairs: signatures banded `bands` × `rowsPerBand`;
    * docs sharing any band bucket are candidates. Output: (a, b) doc-id
    * pairs, a < b, distinct. Two shuffles total (doc-id aggregate, band
    * bucket join) — the classic LSH plan that survives 100×: bucket sizes
    * are bounded by similarity structure, not corpus size, and the
    * self-join is per-bucket.
    *
    * `maxBucketSize` caps the per-(band, key) bucket before the
    * self-join: a duplicate-heavy corpus — the NORMAL case in web-scale
    * dedup — piles identical signatures into one bucket, and an uncapped
    * self-join goes O(bucket²) on that skewed key. Oversized buckets are
    * found with one map-side-combined aggregate over the banded table
    * (the shuffle carries distinct (band, key) pairs, not rows) and the
    * result — tiny BY DEFINITION, only buckets above the cap — is
    * broadcast-anti-joined away, so both self-join branches stay the
    * narrow cached-signature → band-explode shape. (A count-over-window
    * cap instead costs a hash-partition Exchange + Sort per branch —
    * equal at small SF where buckets are tiny, but the sort grows with
    * the biggest bucket, which is exactly what the cap exists to guard
    * against.) For corpora with many EXACT duplicates,
    * run [[exact]] first and LSH only the survivors — then identical
    * docs enter LSH once and the cap only ever trims true near-dup
    * pile-ups.
    */
  /** Analytic MinHash-LSH recall at Jaccard `s` for b bands × r rows:
    * 1 − (1 − s^r)^b — the Jaccard sibling of
    * [[Similarity.lshOrOfBandsRecall]] (per-row collision for a pair
    * at Jaccard s is exactly s, so a band of r rows collides with
    * probability s^r and bands OR-combine). Unlike sign-LSH, the band
    * keyspace here is hash-sized, not 2^r — recall does NOT decay with
    * corpus growth, so sizing is purely a (threshold, recall,
    * precision) contract, never a function of n.
    */
  def jaccardBandRecall(s: Double, bands: Int, rowsPerBand: Int): Double = {
    require(s >= 0.0 && s <= 1.0, s"jaccardBandRecall: jaccard $s out of [0,1]")
    require(bands > 0 && rowsPerBand > 0, "jaccardBandRecall: bad geometry")
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)
  }

  /** (bands, rowsPerBand) sized from the dedup CONTRACT instead of
    * hand-picked: the smallest r whose expected candidate rate at the
    * noise Jaccard `noiseJaccard` (default threshold/2 — "clearly not
    * a near-dup") stays ≤ `maxNoiseRate` once b is grown to reach
    * `targetRecall` at the `threshold` Jaccard. Growing r steepens the
    * S-curve (cuts false candidates geometrically, since
    * (noise/threshold)^r → 0) but costs bands to keep recall — this
    * walks r up until the noise side of the curve is paid for. The
    * hand-picked legacy default 4×3 corresponds to (threshold 0.8,
    * recall 0.9, noise rate ≈ 0.23): usable precision at high
    * thresholds, leaky at low ones — the knob makes that trade a
    * stated contract.
    */
  def minhashBandsRows(threshold: Double, targetRecall: Double = 0.9,
                       noiseJaccard: Double = Double.NaN,
                       maxNoiseRate: Double = 0.05): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0,
      s"minhashBandsRows: threshold $threshold out of (0,1)")
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"minhashBandsRows: targetRecall $targetRecall out of (0,1)")
    val noise = if (noiseJaccard.isNaN) threshold / 2.0 else noiseJaccard
    require(noise >= 0.0 && noise < threshold,
      s"minhashBandsRows: noiseJaccard $noise must sit below threshold " +
        s"$threshold — it names the similarity that should NOT pair")
    require(maxNoiseRate > 0.0 && maxNoiseRate < 1.0,
      s"minhashBandsRows: maxNoiseRate $maxNoiseRate out of (0,1)")
    // r is bounded: the noise candidate rate b·noise^r shrinks by
    // (noise/threshold) < 1 per step once b ≈ ln(1/(1−recall))/threshold^r,
    // so a smallest r exists; 64 rows ≈ a 1024-component signature at
    // 16 bands — far past any practical contract, a loud failure if hit
    (1 to 64).iterator.map { r =>
      val b = math.max(1, math.ceil(math.log1p(-targetRecall) /
        math.log1p(-math.pow(threshold, r))).toInt)
      (b, r)
    }.find { case (b, r) =>
      jaccardBandRecall(noise, b, r) <= maxNoiseRate
    }.getOrElse(throw new IllegalArgumentException(
      s"minhashBandsRows: no geometry under 64 rows/band satisfies " +
        s"recall $targetRecall at $threshold with noise rate " +
        s"$maxNoiseRate at $noise — loosen the contract"))
  }

  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   bands: Int = 4, rowsPerBand: Int = 3, k: Int = 3,
                   maxBucketSize: Int = 4096): DataFrame = {
    val n = bands * rowsPerBand
    val sig = minhashSignatures(df, idCol, textCol, n, k)
    val bandKeys = (0 until bands).map { b =>
      concat_ws("_", (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)
    }
    // Materialize the SIGNATURE table once before the self-join: without
    // this, both join branches re-run the whole scan→shingle→md5→minhash
    // aggregate pipeline (the most expensive stage of the job, doubled),
    // and AQE tends to BroadcastExchange that entire recomputed subtree —
    // neither survives 100 TB. The persisted form is the compact
    // pre-explode signature (id + n smallints); the cheap band explode
    // runs per branch, and AQE sizes the join off the cached table.
    //
    // r14 note — why this persist STAYS while cosineNearDupPairs' was
    // removed: Spark 4 AQE wraps each cache scan in its own
    // TableCacheQueryStage, which breaks sibling-exchange reuse, so the
    // persist doubles the banded shuffle here too. Measured at the x100
    // documents tier: persist 7 stages / 320 MB vs no-persist 6 / 217 MB,
    // wall times equal within noise. The banded rows are NARROW (id +
    // short band key), so the doubled shuffle is ~100 MB where the
    // embed operator doubled a vector-wide one — and dropping the
    // persist would recompute the minhash aggregate (the dominant,
    // CPU-heavy leg) in the oversized-bucket branch. Compute is the
    // scarce resource here; shuffle is there.
    val banded = sig.persist()
      .select(col("id"), posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val oversized = CapAudit.observed(
        banded.groupBy(col("band"), col("band_key"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucketSize),
        "minhash_pairs")
      .select(col("band"), col("band_key"))
    val capped = banded.join(broadcast(oversized),
      Seq("band", "band_key"), "left_anti")
    val l = capped.alias("l")
    val r = capped.alias("r")
    // join strategy is AQE's call: the joined input is the PERSISTED
    // banded table (computed once), so a broadcast at small SF is cheap
    // and a shuffle join takes over at scale based on actual size
    l.join(r, col("l.band") === col("r.band") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
  }

  /** SimHash: 32-bit fingerprint from token md5s. For each of 32 bit
    * positions, sum +1/-1 over the distinct tokens by the bit's value in
    * the token digest; fingerprint bit = sign of the sum.
    *
    * Same scalable shape as [[minhashSignatures]]: explode distinct
    * tokens → ONE md5 per token → a single hash-aggregate computing all
    * 32 bit-sums at once (map-side combined). A per-row expression form
    * would re-split the text once per bit position — 32× the work.
    * Returns (id, sh: long).
    */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = df.select(col(idCol).as("id"),
      explode(array_distinct(tokens(col(textCol)))).as("t"))
      // first 32 digest bits as ONE long; hex char nib's nibble is bits
      // 4·(7−nib)..4·(7−nib)+3, so every per-bit test below is long
      // arithmetic — same values as the conv(substring(hex)) form, no 32
      // string ops per token
      .withColumn("h1", md5half(col("t"), 0))
    val sums = (0 until 32).map { j =>
      val pos = 4 * (7 - j / 4) + (j % 4)
      sum(when(shiftright(col("h1"), pos).bitwiseAND(lit(1L)) > 0, 1)
        .otherwise(-1)).as(s"b$j")
    }
    ex.groupBy(col("id")).agg(sums.head, sums.tail: _*)
      .select(col("id"),
        (0 until 32).map(j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a: Column, b: Column) => a + b).as("sh"))
  }

  /** SimHash near-dup candidates: equal fingerprints within the same 16-bit
    * band (2 bands of the 32-bit hash → Hamming-distance-tolerant blocking).
    * `maxBucketSize` caps skewed buckets exactly as in [[minhashPairs]]
    * (identical fingerprints — duplicate-heavy corpora — otherwise make
    * the self-join O(bucket²) on one key).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxBucketSize: Int = 4096,
                   maxHamming: Int = Int.MaxValue): DataFrame = {
    // persisted pre-explode for the same reason as [[minhashPairs]]:
    // one simhash aggregation, not two. r14 audit: the persist blocks
    // AQE sibling-exchange reuse (the cosineNearDupPairs finding), but
    // the banded rows here are four longs — the doubled shuffle is
    // trivia next to recomputing the 32-bit-sum aggregate, the minhash
    // trade exactly.
    val sig = simhashes(df, idCol, textCol).persist()
    val banded = sig.select(col("id"), col("sh"),
      explode(array(
        struct(lit(0).as("band"), (col("sh").bitwiseAND(lit(0xFFFFL))).as("key")),
        struct(lit(1).as("band"), shiftright(col("sh"), 16).bitwiseAND(lit(0xFFFFL)).as("key")))).as("b"))
      .select(col("id"), col("sh"), col("b.band"), col("b.key"))
    val oversized = CapAudit.observed(
        banded.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucketSize),
        "simhash_pairs")
      .select(col("band"), col("key"))
    val capped = banded.join(broadcast(oversized), Seq("band", "key"), "left_anti")
    val l = capped.alias("l"); val r = capped.alias("r")
    val cand = l.join(r,
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
    // Manku et al. 2007 verify: candidates whose FULL fingerprints are
    // within `maxHamming` bits (the band match only certifies 16 of the
    // 32). A narrow bit_count on the already-joined rows — no extra
    // join; the default keeps the historical candidates-only contract.
    val verified =
      if (maxHamming >= 32) cand
      else cand.filter(
        bit_count(col("l.sh").bitwiseXOR(col("r.sh"))) <= maxHamming)
    verified.select(col("l.id").as("a"), col("r.id").as("b")).distinct()
  }

  /** Banded Hamming near-dup pairs over ANY 64-bit fingerprint column
    * (an [[graft.ml.Multimodal.imageAHash]] perceptual hash, an external
    * 64-bit SimHash, a locality code): `(a, b)` with
    * `popcount(fp_a XOR fp_b) ≤ maxHamming`. The [[simhashPairs]]
    * machinery generalized to caller-supplied fingerprints — the hash is
    * split into `bands` equal slices and candidates must agree on at
    * least one slice, which by pigeonhole is EXHAUSTIVE for
    * `maxHamming < bands` (3 differing bits cannot touch all 4 bands);
    * beyond that it is the standard Manku et al. 2007 probabilistic
    * trade. `maxBucketSize` caps identical-fingerprint pile-ups exactly
    * as in [[minhashPairs]] (the O(bucket²) guard); null fingerprints
    * (undecodable images) never pair. One shuffle to band, one capped
    * self-join keyed on 16-bit slices — nothing corpus × corpus.
    */
  def hammingPairs(df: DataFrame, idCol: String, fpCol: String,
                   bands: Int = 4, maxHamming: Int = 3,
                   maxBucketSize: Int = 4096): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must divide 64 and be >= 2, got $bands")
    val width = 64 / bands
    val mask = (1L << width) - 1
    // persisted pre-explode, the simhashPairs convention — the (id, fp)
    // table is two longs per row, while recomputing it re-runs whatever
    // produced the fingerprints (for imageAHash: a full image decode
    // per consumer of the banded join). CacheSweep-released.
    val base = df.select(col(idCol).as("id"), col(fpCol).as("fp"))
      .filter(col("fp").isNotNull)
      .persist()
    val banded = base.select(col("id"), col("fp"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("fp"), b * width)
            .bitwiseAND(lit(mask)).as("key"))): _*)).as("b"))
      .select(col("id"), col("fp"), col("b.band"), col("b.key"))
    val oversized = CapAudit.observed(
        banded.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucketSize),
        "hamming_pairs")
      .select(col("band"), col("key"))
    val capped = banded.join(broadcast(oversized), Seq("band", "key"),
      "left_anti")
    val l = capped.alias("l"); val r = capped.alias("r")
    l.join(r,
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .filter(bit_count(col("l.fp").bitwiseXOR(col("r.fp"))) <= maxHamming)
      .select(col("l.id").as("a"), col("r.id").as("b")).distinct()
  }

  /** Incremental-ingestion Hamming dedup: drop `incoming` rows whose
    * 64-bit fingerprint sits within `maxHamming` of ANY reference
    * fingerprint — [[dedupAgainstExact]]'s shape over perceptual keys
    * (the against leg of the media dedup family: pairs / keep / ingest /
    * against, mirroring the text side). Same banding as
    * [[hammingPairs]] with the two sides kept apart (no self-pairs):
    * candidates share a band slice, verify at full-fingerprint
    * `bit_count`; the distinct matched-id set anti-joins incoming.
    * `maxBucketSize` caps JOINT (band, key) occupancy — a reference
    * full of one fingerprint can't make the join O(bucket²).
    * Null-fingerprint incoming rows (undecodable payloads) never match
    * and always survive.
    */
  def hammingAgainst(incoming: DataFrame, ref: DataFrame, idCol: String,
                     fpCol: String, bands: Int = 4, maxHamming: Int = 3,
                     maxBucketSize: Int = 4096): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must divide 64 and be >= 2, got $bands")
    val width = 64 / bands
    val mask = (1L << width) - 1
    def banded(df: DataFrame, side: Int): DataFrame =
      df.filter(col(fpCol).isNotNull)
        .select(col(idCol).as("id"), col(fpCol).as("fp"), lit(side).as("side"))
        .select(col("id"), col("fp"), col("side"),
          explode(array((0 until bands).map(b =>
            struct(lit(b).as("band"),
              shiftrightunsigned(col("fp"), b * width)
                .bitwiseAND(lit(mask)).as("key"))): _*)).as("b"))
        .select(col("id"), col("fp"), col("side"), col("b.band"), col("b.key"))
    val all = banded(incoming, 0).unionByName(
      banded(ref.select(col(idCol), col(fpCol)), 1)).persist()
    val oversized = CapAudit.observed(
        all.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucketSize),
        "hamming_against")
      .select(col("band"), col("key"))
    val capped = all.join(broadcast(oversized), Seq("band", "key"),
      "left_anti")
    val l = capped.filter(col("side") === 0).alias("l")
    val r = capped.filter(col("side") === 1).alias("r")
    val dirty = l.join(r,
        col("l.band") === col("r.band") && col("l.key") === col("r.key"))
      .filter(bit_count(col("l.fp").bitwiseXOR(col("r.fp"))) <= maxHamming)
      .select(col("l.id").as("__dirty")).distinct()
    incoming.join(dirty, col(idCol) === col("__dirty"), "left_anti")
  }

  /** Connected-component keep-one selection over ANY pair list: the
    * minimum id of each duplicate cluster survives (plus every
    * singleton) — [[nearDupKeep]]'s decision step factored out so any
    * pair source (SimHash bands, [[Similarity.cosineNearDupPairs]], a
    * blocked [[jaccardPairs]], an external edge table) turns into an
    * actual dedup decision with the same log-diameter
    * [[componentMins]] machinery.
    */
  def keepFromPairs(df: DataFrame, idCol: String, pairs: DataFrame,
                    maxRounds: Int = 20): DataFrame = {
    val p = pairs.select(col("a"), col("b"))
    val edges = p.union(p.select(col("b").as("a"), col("a").as("b")))
      .persist()
    val (settled, _) =
      componentMins(df.select(col(idCol).as("id")), edges, maxRounds)
    edges.unpersist(blocking = false)
    settled.filter(col("root") === col("id")).select(col("id").as(idCol))
  }

  /** The scale-correct near-dup pipeline: MinHash-LSH candidate generation
    * → exact n-gram-Jaccard verification of only the candidates. Pair
    * space is bounded by LSH bucket structure instead of any O(block²)
    * blow-up; at 100 TB this is the only shape that works. Output:
    * (a, b, sim) with sim ≥ threshold.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   bands: Int = 4, rowsPerBand: Int = 3, k: Int = 3,
                   threshold: Double = 0.5): DataFrame = {
    val cand = minhashPairs(df, idCol, textCol, bands, rowsPerBand, k)
    // NOT persisted (the r14 cosineNearDupPairs rule): shingle arrays
    // are text-wide, so caching them trades the scarce resource
    // (memory at scale) for a cheap recompute; each verify side
    // re-derives scan→shingle and AQE broadcasts the small candidate
    // list against it — measured wall-neutral at sf0.1 (r17)
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
    val withL = cand.join(sh.withColumnRenamed("id", "a")
      .withColumnRenamed("sh", "sh_a"), "a")
    val withR = withL.join(sh.withColumnRenamed("id", "b")
      .withColumnRenamed("sh", "sh_b"), "b")
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val uni = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    val sim = when(uni > 0, round(inter / uni, 6)).otherwise(lit(0.0))
    withR.select(col("a"), col("b"), sim.as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Edit-distance duplicate pairs over a SHORT string field (titles,
    * URLs, names — any normalized key where a one-typo copy must
    * collapse; for document bodies the shingle/MinHash family is the
    * right tool, edit distance on kilobyte strings measures nothing
    * useful at O(len²) cost). Returns `(a, b, dist)` with
    * `dist ≤ maxDist`, each unordered pair exactly once (`a < b`).
    *
    * Blocking is LOSSLESS either way, which the oracle gate exploits:
    * the engine blocks, the DuckDB oracle runs the full quadratic
    * join, and identical output is a proof the blocking drops nothing.
    * Two schemes:
    *
    *  - `blocking = "segment"` (DEFAULT — the scale path):
    *    [[fuzzySegmentCandidates]]' pigeonhole segment keys. Candidate
    *    volume is content-selective, measured at 1M title-like rows:
    *    ~230k candidates where length bands produce ~10¹⁰, and all
    *    planted pairs found where the band cap had silently dropped
    *    99.6% of them.
    *  - `blocking = "length"`: [[fuzzyLengthCandidates]]' length
    *    bands (edit distance ≥ length difference; bucket `len/maxDist`
    *    ± one). Cheapest emit constant (1 key/row vs ~(d+1)²(2d+1)),
    *    right for small corpora with diverse lengths; its quadratic
    *    same-length term makes it the wrong default at scale.
    *
    * The verifier is Spark's thresholded `levenshtein(l, r, maxDist)`
    * — codegen'd, Ukkonen-banded O(maxDist·len) per pair with early
    * abort, returning −1 above the threshold. Before it, a LOSSLESS
    * histogram prefilter (r17, [[graft.functions.CharHistExpr]]):
    * the candidate join rejects pairs whose packed 16×4-bit character
    * histograms differ by more than 2·maxDist bucket units — a lower
    * bound on edit distance, so no true pair is lost. The histograms
    * compute inside the join stage from the two strings the join
    * output already carries (zero shuffle bytes added; ~0.4× a
    * banded levenshtein per candidate), so the distinct's
    * string-carrying shuffle and the verify see only the ~5% of
    * candidates the bound cannot kill. This bends the candidate
    * birthday term's DOWNSTREAM cost (the one measured
    * superlinearity at 10M rows) without touching candidate
    * generation. Shuffles carry (id, field, len | 8-byte keys) —
    * field is short by contract.
    * `maxBucketSize` caps pathological key pile-ups with the
    * [[CapAudit]] exemption counters, the LSH family's convention:
    * capped = visible recall loss, never a blown-up join (and under
    * segment blocking a capped key still leaves a pair's OTHER
    * untouched segments to find it).
    */
  def fuzzyDupPairs(df: DataFrame, idCol: String, fieldCol: String,
                    maxDist: Int = 2,
                    maxBucketSize: Int = 4096,
                    blocking: String = "segment"): DataFrame = {
    require(maxDist >= 1, s"fuzzyDupPairs: maxDist must be ≥ 1 (got " +
      s"$maxDist — for exact dedup use dedupExact)")
    fuzzyCandidatePairs(df, idCol, fieldCol, maxDist, maxBucketSize,
        blocking, "fuzzy_dedup")
      .select(col("a"), col("b"),
        levenshtein(col("sa"), col("sb"), maxDist).as("dist"))
      .filter(col("dist") >= 0) // thresholded lev: −1 above maxDist
  }

  /** Persist registry for the fuzzy helpers: batch callers discard the
    * default instance (their persists live until the query's
    * CacheSweep, the minhashPairs convention), while the STREAMING
    * caller (dedup_ingest's drop set) passes its own and releases
    * every frame after the micro-batch settles — without this, each
    * helper-internal `.persist()` would leak one cache entry per
    * micro-batch for the lifetime of the stream.
    */
  private[graft] final class CacheTracker {
    val frames = scala.collection.mutable.Buffer.empty[DataFrame]
    def persist(df: DataFrame): DataFrame = {
      val p = df.persist(); frames += p; p
    }
  }

  /** Blocking dispatch for the fuzzy self-pair shape: UNVERIFIED
    * candidate pairs (a, b, sa, sb), each unordered pair once. Shared
    * by [[fuzzyDupPairs]] and the dedup_ingest in-batch junior drop.
    */
  private[graft] def fuzzyCandidatePairs(df: DataFrame, idCol: String,
                                         fieldCol: String, maxDist: Int,
                                         maxBucketSize: Int,
                                         blocking: String,
                                         capOp: String,
                                         track: CacheTracker =
                                           new CacheTracker): DataFrame =
    blocking match {
      case "length" =>
        fuzzyLengthCandidates(df, idCol, fieldCol, maxDist,
          maxBucketSize, capOp, track)
      case "segment" =>
        fuzzySegmentCandidates(df, idCol, fieldCol, maxDist,
          maxBucketSize, capOp, track)
      case other => throw new IllegalArgumentException(
        s"fuzzy dedup: unknown blocking `$other` (length | segment)")
    }

  /** Blocking dispatch for the fuzzy cross shape: DIRTY incoming ids
    * (one column `a`) with some reference string within `maxDist`
    * edits — verified. Shared by [[fuzzyAgainst]] and the
    * dedup_ingest vs-store drop. `refStrings` needs only the field
    * column (the reference carries evidence, not identity).
    */
  private[graft] def fuzzyCrossDirty(incoming: DataFrame,
                                     refStrings: DataFrame,
                                     idCol: String, fieldCol: String,
                                     refFieldCol: String, maxDist: Int,
                                     maxBucketSize: Int, blocking: String,
                                     capOp: String,
                                     track: CacheTracker =
                                       new CacheTracker): DataFrame =
    blocking match {
      case "length" =>
        fuzzyLengthCrossDirty(incoming,
          refStrings.select(col(refFieldCol).as(fieldCol)),
          idCol, fieldCol, maxDist, maxBucketSize, capOp, track)
      case "segment" =>
        val inc = track.persist(compactRows(incoming, idCol, fieldCol))
        val rf = track.persist(compactRows(
          refStrings.withColumn("__rid", lit(0L)), "__rid", refFieldCol))
        fuzzySegmentCrossCandidates(inc, rf, maxDist, maxBucketSize,
            capOp, track)
          .filter(levenshtein(col("sa"), col("sb"), maxDist) >= 0)
          .select(col("a")).distinct()
      case other => throw new IllegalArgumentException(
        s"fuzzy dedup: unknown blocking `$other` (length | segment)")
    }

  /** Candidate pairs under LENGTH-BAND blocking: (a, b, sa, sb), each
    * unordered pair exactly once (`a < b`), UNVERIFIED (the caller runs
    * the levenshtein). See [[fuzzyDupPairs]] for the losslessness
    * argument; the quadratic term is confined to same-length bands.
    */
  private[ml] def fuzzyLengthCandidates(df: DataFrame, idCol: String,
                                        fieldCol: String, maxDist: Int,
                                        maxBucketSize: Int,
                                        capOp: String = "fuzzy_dedup",
                                        track: CacheTracker =
                                          new CacheTracker): DataFrame = {
    // materialize the compact (id, s, len, bkt) projection ONCE — it
    // feeds three plan consumers (the cap count, both join sides), and
    // without the persist each re-runs the upstream scan/projection
    // (the minhashPairs signature-persist rationale; the cached rows
    // are short-field-narrow by the operator's contract)
    val rows = track.persist(df
      .select(col(idCol).as("id"), col(fieldCol).cast("string").as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))
      .withColumn("bkt", floor(col("len") / maxDist)))
    val oversized = CapAudit.observed(
      rows.groupBy(col("bkt")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucketSize), capOp)
    val capped = rows.join(broadcast(oversized.select(col("bkt"))),
      Seq("bkt"), "left_anti")
    val left = capped.select(col("bkt").as("jk"), col("id").as("a"),
      col("s").as("sa"), col("len").as("la"))
    val right = capped.select(
      explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("jk"),
      col("id").as("b"), col("s").as("sb"), col("len").as("lb"))
    left.join(right, Seq("jk"))
      .filter(col("a") < col("b") &&
        abs(col("la") - col("lb")) <= maxDist)
      .select(col("a"), col("b"), col("sa"), col("sb"))
  }

  /** PassJoin-style even-partition segment scheme (Li, Deng, Feng,
    * VLDB 2011 "PASS-JOIN: a partition-based method for similarity
    * joins"): a string of length `la` splits into `maxDist + 1`
    * segments — the first `k − la%k` of length ⌊la/k⌋, the rest one
    * longer. Both sides of the candidate join recompute (start, len)
    * from (la, slot) with THESE formulas, so the contract is a pure
    * function of the two ints. 1-indexed starts (Spark substr).
    */
  private def segLen(k: Int)(la: Column, i: Column): Column =
    (floor(la / k) + when(i >= lit(k) - la % k, 1).otherwise(0)).cast("int")
  private def segStart(k: Int)(la: Column, i: Column): Column =
    (lit(1) + floor(la / k) * i +
      greatest(i - (lit(k) - la % k), lit(0))).cast("int")

  /** Candidate pairs under PIGEONHOLE SEGMENT blocking — the
    * scale-safe alternative to length bands when many keys share a
    * length (the length-band quadratic term).
    *
    * Pigeonhole: an edit script of cost ≤ d cannot touch every one of
    * d+1 segments, so some segment of the SHORTER string survives
    * untouched and appears VERBATIM in the longer string, shifted by
    * at most d positions (insertions minus deletions before it).
    * Hence each row emits (index side) its d+1 segments keyed
    * (own length, slot, segment text), and (probe side) for every
    * candidate shorter length `la ∈ [len−d, len]` and slot, its
    * substrings of the segment's length at the ±d position window —
    * ≤ (d+1)²·(2d+1) short keys per row. A qualifying pair meets on at
    * least one (la, slot, seg) key; equal-length pairs meet in both
    * orientations and the canonicalize+distinct collapses them. The
    * join key carries segment CONTENT, so a million same-length titles
    * only collide where they actually share a segment — the length
    * band's n² term becomes data-dependent selectivity.
    *
    * Same cap discipline ([[CapAudit]] `fuzzy_dedup`, joint occupancy
    * per key) and the same losslessness gate: the DuckDB oracle runs
    * the full quadratic join.
    */
  /** The two emit sides of segment blocking over a compact
    * (id, s, len) frame. The (la, slot, seg) key is packed into ONE
    * xxhash64 long (`k`) — a hash collision only ADDS a candidate the
    * levenshtein verify then kills, so the packing stays lossless
    * while the candidate shuffle carries 8-byte keys instead of
    * segment strings. Returns (index emits, probe emits), both
    * (id, s, k).
    */
  private def segEmits(rows: DataFrame, maxDist: Int)
      : (DataFrame, DataFrame) = {
    val d = maxDist
    val k = d + 1
    val ln = segLen(k) _
    val st = segStart(k) _
    def key(la: Column, slot: Column, seg: Column): Column =
      xxhash64(la.cast("int"), slot.cast("int"), seg)
    // Emits are a CONSTANT-fanout explode over a sequence literal plus
    // plain projections — everything stays inside whole-stage codegen.
    // (The first draft nested transform/flatten/filter higher-order
    // functions; per-row nested ArrayData allocation made candidate
    // generation linear-in-rows with a ~130 µs/row constant at 1M
    // rows. This shape removed the HOFs entirely.)
    // index side: this row's own d+1 segments, keyed by its own length
    val idx = rows
      .select(col("id"), col("s"), col("len"),
        explode(sequence(lit(0), lit(d))).as("slot"))
      .select(col("id"), col("s"),
        key(col("len"), col("slot"),
          col("s").substr(st(col("len"), col("slot")),
            ln(col("len"), col("slot")))).as("k"))
    // probe side: substrings that could equal an untouched segment of
    // a shorter partner. j enumerates (Δ = len−la, slot, shift s):
    // an untouched segment shifted by s needs ≥ |s| edits before it
    // (net insertions) and ≥ |Δ−s| after, so |s| + |Δ−s| ≤ d bounds
    // the window (the PassJoin position lemma) — tighter than a flat
    // ±d and filtered BEFORE the shuffle.
    val w = 2 * d + 1
    val nE = k * k * w
    val delta = floor(col("j") / (k * w)).cast("int")
    val slot = floor((col("j") % (k * w)) / w).cast("int")
    val shift = (col("j") % w).cast("int") - d
    val prb = rows
      .select(col("id"), col("s"), col("len"),
        explode(sequence(lit(0), lit(nE - 1))).as("j"))
      .withColumn("la", col("len") - delta)
      .withColumn("sl", slot)
      .withColumn("q", st(col("la"), col("sl")) + shift)
      .filter(col("la") >= 0 &&
        shift >= -floor((lit(d) - delta) / 2).cast("int") &&
        shift <= floor((lit(d) + delta) / 2).cast("int") &&
        col("q") >= 1 &&
        col("q") + ln(col("la"), col("sl")) <= col("len") + 1)
      .select(col("id"), col("s"),
        key(col("la"), col("sl"),
          col("s").substr(col("q").cast("int"),
            ln(col("la"), col("sl")))).as("k"))
    (idx, prb)
  }

  /** Joint per-key cap over segment emits: oversized keys (a shared
    * template slot, a hot substring) are exempted wholesale and
    * counted ([[CapAudit]] `op`). Unlike the length band — where the
    * bucket is the ONLY key a pair can meet on — a pair dropped at one
    * capped slot key still meets at every OTHER untouched segment, so
    * capping here degrades recall gradually instead of zeroing it.
    */
  private def segCap(sides: Seq[DataFrame], maxBucketSize: Int,
                     op: String, track: CacheTracker): Seq[DataFrame] = {
    // persisted: tiny BY DEFINITION (only over-cap keys survive the
    // filter), consumed by every side's anti-join — without the
    // persist the emit-union aggregate re-executes per consumer
    val oversized = track.persist(CapAudit.observed(
      sides.map(_.select(col("k"))).reduce(_ union _)
        .groupBy(col("k")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucketSize), op)
      .select(col("k")))
    val cap = broadcast(oversized)
    sides.map(_.join(cap, Seq("k"), "left_anti"))
  }

  // native prefilter kernels (graft.functions.CharHistExpr): the
  // histogram predicate evaluates POST-JOIN on the candidate's two
  // strings — already carried by the join output, so the filter adds
  // ZERO shuffle bytes — and rejects impossible candidates at ~0.4×
  // the cost of the banded levenshtein, before the canonicalize/
  // distinct shuffle materializes them (VERDICT r16 next #2). The
  // first r17 draft carried a per-row signature through the emit
  // shuffle instead ("compute once, reuse per candidate"); measured
  // at the 10M tier that widened the dominant emit shuffle ~12% and
  // cost MORE than it saved — the candidates are outnumbered by the
  // emits, so per-candidate recompute on in-hand strings is the
  // cheaper side of the trade (numbers in PLANS r17).
  private def charHist(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.CharHistExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(c)))
  private def nibbleL1(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.NibbleL1Expr(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** Exact count + bounded sorted id collection in one aggregate
    * ([[graft.functions.BoundedCollectLongAgg]]) — the containment
    * inverted index's single-pass vocabulary build.
    */
  private def boundedCollectIds(c: Column, bound: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.BoundedCollectLongAgg(
        org.apache.spark.sql.GraftSqlBridge.expression(c), bound)
        .toAggregateExpression())

  /** Measurement seam (ScaleProof fuzzy): disables the histogram
    * prefilter at plan-construction time so the unfiltered candidate
    * set — and the equality of the verified result with and without
    * the filter, the losslessness check at scale — can be counted.
    * Production never sets it.
    */
  private[graft] var disableHistPrefilter: Boolean = false

  private def histPre(sa: Column, sb: Column, maxDist: Int): Column =
    if (disableHistPrefilter) lit(true)
    else nibbleL1(charHist(sa), charHist(sb)) <= lit(2 * maxDist)

  private[graft] def compactRows(df: DataFrame, idCol: String,
                                 fieldCol: String): DataFrame = df
    .select(col(idCol).as("id"), col(fieldCol).cast("string").as("s"))
    .filter(col("s").isNotNull)
    .withColumn("len", length(col("s")))

  private[ml] def fuzzySegmentCandidates(df: DataFrame, idCol: String,
                                         fieldCol: String, maxDist: Int,
                                         maxBucketSize: Int,
                                         capOp: String = "fuzzy_dedup",
                                         track: CacheTracker =
                                           new CacheTracker): DataFrame =
    fuzzySegmentCandidatesFromRows(
      track.persist(compactRows(df, idCol, fieldCol)),
      maxDist, maxBucketSize, capOp, track)

  /** [[fuzzySegmentCandidates]] over an ALREADY-compact (id, s, len)
    * frame the caller persists — the dedup_ingest drop-set path feeds
    * the SAME compact batch cache to this self-pair leg and the
    * vs-store cross leg instead of stacking three cache layers over
    * one projection (r17: each layer added its own TableCacheQueryStage
    * materialization to the serial AQE chain).
    */
  private[graft] def fuzzySegmentCandidatesFromRows(
      rows: DataFrame, maxDist: Int, maxBucketSize: Int,
      capOp: String, track: CacheTracker): DataFrame = {
    val (idx, prb) = segEmits(rows, maxDist)
    val Seq(cIdx, cPrb) =
      segCap(Seq(idx, prb), maxBucketSize, capOp, track)
    segSelfPairs(cIdx, cPrb, maxDist)
  }

  /** The self-pair candidate join over capped emit sides. The
    * histogram prefilter evaluates INSIDE the join stage on the
    * strings the join output already carries: candidates whose packed
    * histograms differ by more than 2·maxDist bucket units cannot
    * verify (the CharHistExpr bound) and die before the distinct's
    * string-carrying shuffle and the levenshtein.
    */
  private def segSelfPairs(cIdx: DataFrame, cPrb: DataFrame,
                           maxDist: Int): DataFrame =
    cIdx.select(col("k"), col("id").as("a"), col("s").as("sa"))
      .join(cPrb.select(col("k"), col("id").as("b"), col("s").as("sb")),
        Seq("k"))
      .filter(col("a") =!= col("b") &&
        histPre(col("sa"), col("sb"), maxDist))
      .select(when(col("a") < col("b"),
          struct(col("a").as("x"), col("b").as("y"),
            col("sa").as("sx"), col("sb").as("sy")))
        .otherwise(struct(col("b").as("x"), col("a").as("y"),
          col("sb").as("sx"), col("sa").as("sy"))).as("p"))
      .select(col("p.x").as("a"), col("p.y").as("b"),
        col("p.sx").as("sa"), col("p.sy").as("sb"))
      .distinct()

  /** Both candidate shapes of the dedup_ingest fuzzy drop set from ONE
    * cap aggregate (r18, VERDICT r17 next #1): the self-pair leg and
    * the vs-store cross leg previously each ran their own full
    * count-per-key pass over the SAME batch emit stream — two
    * aggregate executions where one suffices, the heaviest serial
    * chain in the bench. Here the batch emits carry a side tag through
    * a single union→count, and BOTH cap sets derive from the one
    * persisted over-cap frame:
    *
    *  - self cap = keys whose BATCH occupancy (`__bn`) breaches the
    *    cap — only batch emits meet in the self join, so store
    *    occupancy must not exempt them (accounting identical to the
    *    old batch-only aggregate);
    *  - joint cap = keys whose TOTAL occupancy (`__n` = batch+store)
    *    breaches it — the cross join's blow-up term (identical to the
    *    old four-side aggregate).
    *
    * `__bn ≤ __n`, so the self set is a subset of the joint set and
    * the persisted frame (over-cap keys only — tiny by definition)
    * carries both. Exemption counters thread through [[CapAudit]]
    * per derived set with the matching occupancy column, preserving
    * the old per-leg audit totals.
    */
  private[graft] def fuzzySegmentDropCandidates(
      batch: DataFrame, store: Option[DataFrame], maxDist: Int,
      maxBucketSize: Int, capOp: String, track: CacheTracker)
      : (DataFrame, Option[DataFrame]) = {
    val (bIdx, bPrb) = segEmits(batch, maxDist)
    store match {
      case None =>
        val Seq(cIdx, cPrb) =
          segCap(Seq(bIdx, bPrb), maxBucketSize, capOp, track)
        (segSelfPairs(cIdx, cPrb, maxDist), None)
      case Some(rf) =>
        val (rIdx, rPrb) = segEmits(rf, maxDist)
        val tagged =
          Seq(bIdx, bPrb).map(_.select(col("k"), lit(1L).as("__b"))) ++
            Seq(rIdx, rPrb).map(_.select(col("k"), lit(0L).as("__b")))
        val over = track.persist(CapAudit.observed(
          tagged.reduce(_ union _)
            .groupBy(col("k"))
            .agg(count(lit(1)).as("__n"), sum(col("__b")).as("__bn"))
            .filter(col("__n") > maxBucketSize), capOp))
        val jointCap = broadcast(over.select(col("k")))
        val selfCap = broadcast(CapAudit.observed(
          over.filter(col("__bn") > maxBucketSize), capOp, "__bn")
          .select(col("k")))
        def anti(s: DataFrame, cap: DataFrame): DataFrame =
          s.join(cap, Seq("k"), "left_anti")
        val self = segSelfPairs(
          anti(bIdx, selfCap), anti(bPrb, selfCap), maxDist)
        val cross = segCrossLegs(
          anti(bIdx, jointCap), anti(bPrb, jointCap),
          anti(rIdx, jointCap), anti(rPrb, jointCap), maxDist)
        (self, Some(cross))
    }
  }

  /** Cross-corpus segment candidates: (a, sa, sb) rows pairing `left`
    * ids with `right` STRINGS (the against/ingest shape — the right
    * side needs no ids, only evidence strings). Either side of a
    * qualifying pair can be the shorter one, so both sides emit both
    * roles and the candidate set is the union of the two oriented
    * joins. Same hashed keys, same joint cap.
    */
  private[graft] def fuzzySegmentCrossCandidates(
      left: DataFrame, right: DataFrame, maxDist: Int,
      maxBucketSize: Int, capOp: String,
      track: CacheTracker = new CacheTracker): DataFrame = {
    val (lIdx, lPrb) = segEmits(left, maxDist)
    val (rIdx, rPrb) = segEmits(right, maxDist)
    val Seq(cLIdx, cLPrb, cRIdx, cRPrb) =
      segCap(Seq(lIdx, lPrb, rIdx, rPrb), maxBucketSize, capOp, track)
    segCrossLegs(cLIdx, cLPrb, cRIdx, cRPrb, maxDist)
  }

  /** The two oriented cross-candidate joins over capped emit sides —
    * same in-join histogram prefilter as the self-pair shape.
    */
  private def segCrossLegs(cLIdx: DataFrame, cLPrb: DataFrame,
                           cRIdx: DataFrame, cRPrb: DataFrame,
                           maxDist: Int): DataFrame = {
    def leg(l: DataFrame, r: DataFrame): DataFrame =
      l.select(col("k"), col("id").as("a"), col("s").as("sa"))
        .join(r.select(col("k"), col("s").as("sb")), Seq("k"))
        .filter(histPre(col("sa"), col("sb"), maxDist))
        .select(col("a"), col("sa"), col("sb"))
    leg(cLIdx, cRPrb).union(leg(cLPrb, cRIdx)).distinct()
  }

  /** Keep-one selection under edit-distance duplication: the minimum
    * id of each fuzzy-duplicate component survives (plus every
    * singleton) — [[fuzzyDupPairs]] → [[keepFromPairs]], the family's
    * standard decision step. Returns the kept-id frame.
    */
  def fuzzyDedupKeep(df: DataFrame, idCol: String, fieldCol: String,
                     maxDist: Int = 2,
                     maxBucketSize: Int = 4096,
                     blocking: String = "segment"): DataFrame =
    keepFromPairs(df, idCol,
      fuzzyDupPairs(df, idCol, fieldCol, maxDist, maxBucketSize, blocking))

  /** Incremental-ingestion FUZZY dedup: drop `incoming` rows whose
    * short field sits within `maxDist` edits of ANY reference string —
    * [[dedupAgainstExact]]'s shape at the typo rung (the against leg of
    * the fuzzy family: pairs / keep / against / ingest, mirroring
    * near and media). Same blocking ladder as [[fuzzyDupPairs]] with
    * the two sides kept apart — `segment` (default, pigeonhole keys
    * via [[fuzzySegmentCrossCandidates]]: either side of a cross pair
    * can be the shorter one, so candidates are the union of the two
    * oriented joins) or `length` (bands: incoming keys its own bucket,
    * the reference emits {b−1, b, b+1}). Verifier: the thresholded
    * codegen `levenshtein`. The cap counts JOINT key occupancy — a
    * pile-up on either side blows up the same join — with exemptions
    * surfaced through [[CapAudit]] (`cap_fuzzy_against`). Null-field
    * incoming rows carry no evidence and always survive.
    */
  def fuzzyAgainst(incoming: DataFrame, ref: DataFrame, idCol: String,
                   fieldCol: String, maxDist: Int = 2,
                   maxBucketSize: Int = 4096,
                   blocking: String = "segment"): DataFrame = {
    require(maxDist >= 1, s"fuzzyAgainst: maxDist must be ≥ 1 (got " +
      s"$maxDist — for exact dedup use dedupAgainstExact)")
    val dirty = fuzzyCrossDirty(incoming, ref.select(col(fieldCol)),
        idCol, fieldCol, fieldCol, maxDist, maxBucketSize, blocking,
        "fuzzy_against")
      .withColumnRenamed("a", "__dirty")
    incoming.join(dirty, col(idCol) === col("__dirty"), "left_anti")
  }

  /** The length-band cross leg: dirty incoming ids (column `a`) with a
    * reference string within `maxDist` — [[fuzzyAgainst]]'s legacy
    * blocking, kept selectable for narrow corpora where the ~(d+1)²·
    * (2d+1) segment emit constant outweighs the band's quadratic term.
    */
  private def fuzzyLengthCrossDirty(incoming: DataFrame, ref: DataFrame,
                                    idCol: String, fieldCol: String,
                                    maxDist: Int, maxBucketSize: Int,
                                    capOp: String,
                                    track: CacheTracker): DataFrame = {
    def rows(df: DataFrame, keep: Seq[Column]): DataFrame = df
      .select((col(fieldCol).cast("string").as("s") +: keep): _*)
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))
      .withColumn("bkt", floor(col("len") / maxDist))
    val inc = track.persist(rows(incoming, Seq(col(idCol).as("id"))))
    val rf = track.persist(rows(ref, Seq.empty))
    val oversized = CapAudit.observed(
      inc.select(col("bkt")).union(rf.select(col("bkt")))
        .groupBy(col("bkt")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucketSize), capOp)
    val cap = broadcast(oversized.select(col("bkt")))
    val left = inc.join(cap, Seq("bkt"), "left_anti")
      .select(col("bkt").as("jk"), col("id"), col("s").as("sa"),
        col("len").as("la"))
    val right = rf.join(cap, Seq("bkt"), "left_anti")
      .select(explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1))
          .as("jk"),
        col("s").as("sb"), col("len").as("lb"))
    left.join(right, Seq("jk"))
      .filter(abs(col("la") - col("lb")) <= maxDist &&
        levenshtein(col("sa"), col("sb"), maxDist) >= 0)
      .select(col("id").as("a")).distinct()
  }

  /** Per-node component MINIMUM over an undirected edge list — the
    * label-propagation core shared by [[nearDupKeep]] (and spec'd
    * directly on synthetic graphs). `ids` must have one `id` column
    * covering every node; `edges` must be SYMMETRIC `(a, b)` rows
    * (caller unions both directions). Returns the settled `(id, root)`
    * table (lineage-truncated, scan-shaped plan) and the round count.
    *
    * Each round composes TWO monotone contractions:
    *   1. min-propagation: per node, min of its own root and its
    *      neighbors' roots — one edge join + one map-side-combined
    *      aggregate on the node id, bounded by |V|+|E|;
    *   2. pointer jump (path doubling): `root ← root(root)` — one
    *      labels self-join. Roots are always node ids drawn from the
    *      same table (mins of ids), so the inner join is total, and
    *      `root(r) ≤ r ≤` any label pointing at `r` keeps the step
    *      monotone — the fixed point (per-component min, where the min
    *      node points at itself) is unchanged.
    *
    * The jump is what makes the round count LOGARITHMIC in component
    * diameter instead of linear: propagation alone moves a label one
    * hop per round (a 10k-doc chain = 10k rounds — the round-10 scale
    * watch-list item), while hop-then-jump at least doubles every
    * label's reach per round (the pointer-doubling argument; spec'd on
    * a 1024-path converging in ≤ 2·log₂ rounds + the warm-up). Per
    * round that costs one extra |V|-sized self-join shuffle — the
    * classic large-star/small-star trade, bought with the same join
    * primitives. The first `jumpFrom − 1` rounds are HOP-ONLY (r12):
    * real near-dup graphs settle almost entirely within two
    * propagation rounds (clusters are mostly pairs and triangles), so
    * the warm-up skips the self-join where it cannot help, and long
    * chains still get the doubling from round `jumpFrom` on — worst
    * case grows by the constant warm-up length, not a factor.
    *
    * The convergence probe rides the SAME aggregate: the labels branch
    * carries its previous root as `old` (null on the propagation
    * branch, so min() recovers it — exactly one labels row per id);
    * `changed` is then a filter over the persisted result instead of a
    * second join + action recomputing the round.
    */
  /** Small-graph fast path bound (r17): when the symmetric edge list
    * fits under this many rows, [[componentMins]] collects the EDGES
    * (never the nodes) and runs an exact driver union-find instead of
    * the iterative join loop — the AQE-like adaptive decision. At
    * 2^19 rows the collected pairs are ~8 MB of longs and the
    * resulting edge-node → root map broadcasts like any dimension
    * table; the node table is labeled with ONE broadcast left join.
    * Identical output by construction (min-id components, singletons
    * self-rooted — the property spec's reference union-find IS this
    * algorithm); rounds report as 0. At scale the take short-circuits
    * past the bound and the distributed loop runs unchanged. Test
    * seam: set 0 to pin the distributed path.
    */
  private[graft] var componentSmallGraphBound: Int = 1 << 19

  private[ml] def componentMins(ids: DataFrame, edges: DataFrame,
                                maxRounds: Int,
                                jumpFrom: Int = 3): (DataFrame, Int) = {
    val bound = componentSmallGraphBound
    if (bound > 0 &&
        ids.schema("id").dataType ==
          org.apache.spark.sql.types.LongType &&
        edges.schema("a").dataType ==
          org.apache.spark.sql.types.LongType) {
      val take = edges.select(col("a").cast("long"), col("b").cast("long"))
        .limit(bound + 1).collect()
      if (take.length <= bound) {
        val parent = new java.util.HashMap[Long, java.lang.Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x
          while (parent.get(c) != c) {
            val nx = parent.get(c); parent.put(c, r); c = nx
          }
          r
        }
        take.foreach { row =>
          val a = row.getLong(0); val b = row.getLong(1)
          parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
        }
        val moved = new scala.collection.mutable.ArrayBuffer[(Long, Long)]
        parent.keySet.forEach { k =>
          val r = find(k)
          if (r != k) moved += ((k, r))
        }
        val spark = ids.sparkSession
        import spark.implicits._
        val rootMap = moved.toSeq.toDF("id", "__cm_root")
        val settled = ids.select(col("id"))
          .join(broadcast(rootMap), Seq("id"), "left")
          .select(col("id"),
            coalesce(col("__cm_root"), col("id")).as("root"))
        lastComponentRounds.set(0)
        return (settled, 0)
      }
    }
    var labels = ids.select(col("id"))
      .withColumn("root", col("id")).persist()
    val rootType = labels.schema("root").dataType
    // the materialized handles backing `labels` — unpersist targets the
    // exact cached plan (unpersist on a derived select() is a no-op)
    var backing = labels
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val prop = edges.alias("e")
        .join(labels.alias("l"), col("e.b") === col("l.id"))
        .select(col("e.a").as("id"), col("l.root").as("root"))
      val stepped = labels.select(col("id"), col("root"), col("root").as("old"))
        .union(prop.withColumn("old", lit(null).cast(rootType)))
        .groupBy(col("id"))
        .agg(min(col("root")).as("root"), min(col("old")).as("old"))
        .persist() // read once per convergence probe; twice when jumping
      // Rounds before `jumpFrom` are hop-only: real near-dup graphs are
      // dominated by tiny-diameter clusters (pairs, triangles) that
      // propagation alone settles in 2 rounds, so the warm-up skips the
      // jump self-join's extra |V|-shuffle where it buys nothing (~12%
      // of nearDupKeep at sf0.1, the r11 toll). Long chains still get
      // log-diameter treatment from round `jumpFrom` on — the warm-up
      // adds at most jumpFrom−1 rounds to the worst case. Convergence
      // stays sound in both regimes: hop-unchanged means every node's
      // root is ≤ all its neighbors' roots, which by symmetry makes
      // adjacent roots EQUAL — a component-uniform labeling whose value
      // must be the component min (roots are component ids, and the min
      // node's root is itself), with or without prior jumps.
      val jumping = round + 1 >= jumpFrom
      val next =
        if (!jumping) stepped
        else stepped.alias("x")
          .join(stepped.select(col("id").as("__jid"),
            col("root").as("__jroot")).alias("y"),
            col("x.root") === col("y.__jid"))
          .select(col("x.id").as("id"), col("__jroot").as("root"),
            col("x.old").as("old"))
          .persist()
      val changed = next.filter(col("root") =!= col("old")).limit(1).count()
      if (jumping) stepped.unpersist(blocking = false)
      backing.unpersist(blocking = false)
      if (changed != 0) {
        // truncate lineage EVERY round: a round's plan references the
        // previous round's several times (labels branch + edge join +
        // both jump sides), so un-checkpointed plans grow geometrically
        // — by round 10 the plan STRING alone (built per action for the
        // SQL event log) OOMs the driver. One localCheckpoint per round
        // reads the just-counted cache and pins a bounded scan-shaped
        // plan; with the jump the round count is logarithmic, so the
        // extra materialization pass costs O(|V| log d) total.
        labels = next.select(col("id"), col("root")).localCheckpoint()
        next.unpersist(blocking = false)
        backing = labels
      } else {
        labels = next.select(col("id"), col("root"))
        backing = next
      }
      converged = changed == 0
      round += 1
    }
    // truncate the final lineage too: without this the RETURNED plan
    // nests every round's subtree behind the persist boundaries, which
    // poisons any plan-shape accounting (the executed work reads the
    // caches, but the artifact can't tell) and re-runs the whole
    // propagation if the caller's action outlives the caches. One eager
    // localCheckpoint = one bounded id→root table, a scan-shaped plan.
    val settled = labels.localCheckpoint()
    backing.unpersist(blocking = false)
    lastComponentRounds.set(round)
    (settled, round)
  }

  /** Diagnostic: rounds the LAST [[componentMins]] run on this thread
    * took to settle — the scale harness records rounds-to-settle per
    * tier for the iterative operators (the loop runs driver-side
    * during plan construction, so the constructing thread reads it
    * right after building the query). -1 before any run.
    */
  private[graft] val lastComponentRounds: ThreadLocal[Integer] =
    ThreadLocal.withInitial(() => Integer.valueOf(-1))

  /** Connected components over a near-dup pair list → the KEEP set: the
    * minimum doc id of each duplicate cluster survives (plus every
    * singleton). This is the step that turns pair lists into an actual
    * dedup decision in a training-data pipeline.
    *
    * The component computation is [[componentMins]] — min-label
    * propagation with pointer jumping, so the round count is
    * logarithmic in cluster diameter (see its doc), never
    * materializing components.
    */
  def nearDupKeep(df: DataFrame, idCol: String, textCol: String,
                  bands: Int = 4, rowsPerBand: Int = 3, k: Int = 3,
                  threshold: Double = 0.5, maxRounds: Int = 20): DataFrame =
    settledNearDupRoots(df, idCol, textCol, bands, rowsPerBand, k,
      threshold, maxRounds)
      .filter(col("root") === col("id"))
      .select(col("id").as(idCol))

  /** The full cluster labeling behind [[nearDupKeep]]: every document
    * with its near-dup component id (the component's min doc id;
    * singletons label themselves). The audit/analysis face of the dedup
    * decision — cluster-size histograms, per-cluster spot checks, and
    * joins that need "which group did this doc belong to", not just the
    * survivor set.
    */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
                      bands: Int = 4, rowsPerBand: Int = 3, k: Int = 3,
                      threshold: Double = 0.5, maxRounds: Int = 20): DataFrame =
    settledNearDupRoots(df, idCol, textCol, bands, rowsPerBand, k,
      threshold, maxRounds)
      .select(col("id").as(idCol), col("root").as("cluster"))

  /** Leakage-safe train/validation/test split: every document splits by
    * the content-addressed hash of its NEAR-DUP CLUSTER root, not its own
    * id — so two near-duplicate documents can never land on opposite
    * sides of a train/test boundary (the classic eval-leak a plain
    * [[Curation.hashSplit]] cannot prevent: a paraphrase of a training
    * document in the held-out set inflates eval scores exactly like
    * benchmark contamination). Lee et al. 2022 ("Deduplicating Training
    * Data Makes Language Models Better") §6 measures this leak directly.
    *
    * Adds `cluster` (the component's min id — [[nearDupClusters]]'s
    * labeling) and `splitCol` to `df`. Singletons hash their own id, so
    * on a dup-free corpus this degrades to exactly `hashSplit(id)`.
    *
    * Scale: the label table from [[componentMins]] is two narrow longs
    * per doc (a bounded checkpoint scan); joining it back is one
    * id-keyed shuffle of (id, root) against the corpus — the split
    * itself is a narrow hash projection, no extra pass.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
                       trainPct: Int = 80, validPct: Int = 10,
                       bands: Int = 4, rowsPerBand: Int = 3, k: Int = 3,
                       threshold: Double = 0.5, maxRounds: Int = 20,
                       splitCol: String = "split"): DataFrame = {
    require(trainPct >= 0 && validPct >= 0 && trainPct + validPct <= 100,
      s"leakageSafeSplit: train_pct + valid_pct must be <= 100, " +
        s"got $trainPct + $validPct")
    val clusters = nearDupClusters(df, idCol, textCol, bands, rowsPerBand,
      k, threshold, maxRounds)
    df.join(clusters, Seq(idCol))
      .withColumn(splitCol,
        Curation.hashSplit(col("cluster"), trainPct, validPct))
  }

  /** Shared closure of the keep/clusters pair: LSH pairs → symmetric
    * edges → [[componentMins]], returning the settled (id, root) table
    * (a bounded checkpoint scan — see componentMins' lineage note).
    */
  private def settledNearDupRoots(df: DataFrame, idCol: String,
      textCol: String, bands: Int, rowsPerBand: Int, k: Int,
      threshold: Double, maxRounds: Int): DataFrame = {
    val eligible = df.filter(size(tokens(col(textCol))) >= k)
    val pairs = nearDupPairs(eligible, idCol, textCol, bands, rowsPerBand,
      k, threshold).select(col("a"), col("b"))
    val edges = pairs
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .persist()
    val (settled, _) =
      componentMins(df.select(col(idCol).as("id")), edges, maxRounds)
    edges.unpersist(blocking = false)
    settled
  }

  /** Incremental-ingestion exact dedup: drop `incoming` rows whose text
    * already exists in the REFERENCE corpus — the continuous-crawl
    * complement of [[exact]] (which dedups within one corpus). The
    * reference side reduces to DISTINCT 16-byte keys before the
    * left-anti join, so at 100 TB the shuffle carries md5s, never
    * reference documents; AQE broadcasts the key set when the reference
    * is small.
    */
  def dedupAgainstExact(incoming: DataFrame, ref: DataFrame,
                        textCol: String): DataFrame = {
    val refKeys = ref.select(md5(col(textCol)).as("__rh")).distinct()
    incoming.withColumn("__h", md5(col(textCol)))
      .join(refKeys, col("__h") === col("__rh"), "left_anti")
      .drop("__h")
  }

  /** Incremental-ingestion NEAR dedup: drop `incoming` rows whose
    * MinHash-LSH candidates in the REFERENCE corpus verify at ≥
    * `threshold` n-gram Jaccard. Same two-shuffle LSH shape as
    * [[minhashPairs]] but the band join is incoming×reference instead
    * of a self-join — incremental batches never pair with themselves,
    * and the reference signatures can be precomputed/persisted by the
    * caller's ingestion loop. Under-`k`-token rows carry no evidence
    * and are always kept. The bucket cap counts BOTH sides (a pile-up
    * on either blows up the same join).
    */
  def nearDupAgainst(incoming: DataFrame, ref: DataFrame, idCol: String,
                     textCol: String, bands: Int = 4, rowsPerBand: Int = 3,
                     k: Int = 3, threshold: Double = 0.5,
                     maxBucketSize: Int = 4096): DataFrame = {
    val n = bands * rowsPerBand
    // persist the COMPACT signatures (id + n smallints) and re-run the
    // cheap band explode per use — caching the exploded form would cost
    // bands× the rows with wide string keys (the minhashPairs
    // convention, see its comment)
    def banded(df: DataFrame) = {
      val sig = minhashSignatures(
        df.filter(size(tokens(col(textCol))) >= k), idCol, textCol, n, k)
        .persist()
      val bandKeys = (0 until bands).map { b =>
        concat_ws("_",
          (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)
      }
      sig.select(col("id"), posexplode(array(bandKeys: _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    }
    val inc = banded(incoming)
    val rf = banded(ref)
    val oversized = CapAudit.observed(
        inc.union(rf).groupBy(col("band"), col("band_key"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucketSize),
        "neardup_against")
      .select(col("band"), col("band_key"))
    val cappedInc = inc.join(broadcast(oversized),
      Seq("band", "band_key"), "left_anti")
    val cappedRef = rf.join(broadcast(oversized),
      Seq("band", "band_key"), "left_anti")
    val cands = cappedInc.alias("l")
      .join(cappedRef.alias("r"),
        col("l.band") === col("r.band") &&
          col("l.band_key") === col("r.band_key"))
      .select(col("l.id").as("iid"), col("r.id").as("rid"))
      .distinct()
    // shingle sets computed ONCE PER DOC on each side of the verify join
    // (inside the join they would rebuild per candidate pair)
    val incSh = incoming.select(col(idCol).as("iid"),
      shingles(col(textCol), k).as("ish"))
    val refSh = ref.select(col(idCol).as("rid"),
      shingles(col(textCol), k).as("rsh"))
    val inter = size(array_intersect(col("ish"), col("rsh"))).cast("double")
    val uni = size(array_union(col("ish"), col("rsh"))).cast("double")
    val dirty = cands.join(incSh, Seq("iid")).join(refSh, Seq("rid"))
      .filter(when(uni > 0, round(inter / uni, 6)).otherwise(lit(0.0))
        >= threshold)
      .select(col("iid").as(idCol)).distinct()
    // the persisted banded tables stay cached until the query's
    // CacheSweep (unpersisting here would drop them BEFORE the returned
    // plan executes — the minhashPairs convention)
    incoming.alias("d").join(dirty.alias("x"),
      col(s"d.$idCol") === col(s"x.$idCol"), "left_anti")
  }

  /** Exact-substring duplicate spans (the positional operator behind
    * Lee et al. 2022 "Deduplicating Training Data Makes Language
    * Models Better" §4.1 ExactSubstr — the published standard for LLM
    * pretraining dedup; [[graft.ml.CorpusStats.dupNgramStats]] is its
    * statistical approximation). Emits, per document, the maximal
    * token spans `[span_start, span_end)` (0-based, end-exclusive)
    * whose every position lies inside some substring of ≥ `k` tokens
    * that occurs at least twice in the corpus (counting repeats within
    * one document, as the paper does).
    *
    * Correctness note — why k-gram coverage IS the exact answer, not an
    * approximation: a substring of length ≥ k occurring twice implies
    * each of its k-grams occurs twice; conversely a k-gram occurring
    * twice is itself a duplicated substring of length k. So "position
    * covered by a duplicated k-gram" ⇔ "position inside a duplicated
    * substring of length ≥ k", and merging the covered intervals per
    * document reproduces the suffix-array result positionally without
    * building a suffix array.
    *
    * Scale shape (the distributed replacement for the paper's
    * single-machine suffix array): posexplode → one md5 per k-gram →
    * ONE map-side-combined count aggregate (vocabulary-sized shuffle,
    * 16-byte keys) → gram-keyed join back (never pairwise) → one
    * id-keyed aggregate. The gram stream is DELIBERATELY recomputed for
    * the two branches (count side is column-pruned to text only) rather
    * than persisted: the exploded digest table is ~k× the corpus and
    * caching it would cost more IO than the second scan-speed pass —
    * the opposite call from bm25's query-term-pruned (tiny) tf table. Interval merging is LOCAL arithmetic: with
    * positions sorted, span ends `p+k` are monotone, so island breaks
    * are adjacent-pair comparisons (`p_i > p_{i-1}+k`) — O(positions)
    * per doc via array lambdas, no per-doc quadratic fold, no window.
    * Words = [[graft.ml.Curation.words]] semantics (single-space split,
    * empties removed) so the gram table matches the rest of the corpus
    * operators.
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
               k: Int = 8): DataFrame = {
    val occ = gramOccurrences(df, idCol, textCol, k)
    val dup = occ.groupBy(col("g")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select(col("g"))
    positionsToSpans(occ.join(dup, Seq("g")).select("id", "p"), idCol, k)
  }

  /** Per-document k-gram occurrence table `(id, p, g)` with `g` already
    * digested — shuffles carry 16-byte md5s, not k-token strings. Shared
    * by [[dupSpans]] and [[CorpusStats.decontaminateSpans]].
    */
  private[ml] def gramOccurrences(df: DataFrame, idCol: String,
                                  textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(CorpusStats.ngramArray(col(textCol), k))
          .as(Seq("p", "g")))
      .withColumn("g", md5(col("g")))

  /** Merge covered gram start-positions `(id, p)` into maximal token
    * spans `[span_start, span_end)` (each gram covers `[p, p+k)`).
    * ONE id-keyed aggregate; the interval merge is LOCAL array
    * arithmetic: with positions sorted, span ends `p+k` are monotone, so
    * island breaks are adjacent-pair comparisons (`p_i > p_{i-1}+k`) —
    * O(positions) per doc, no window, no per-doc quadratic fold.
    * element_at is 1-based; lambda index is 0-based.
    */
  private[ml] def positionsToSpans(pos: DataFrame, idCol: String,
                                   k: Int): DataFrame = {
    val ps = pos.groupBy(col("id"))
      .agg(sort_array(collect_list(col("p"))).as("ps"))
    // span starts: first position, or a gap > k from the predecessor;
    // span ends: last position, or a gap > k to the successor (+k for
    // the gram width).
    val spans = ps.select(col("id"),
      expr(s"""zip_with(
        filter(ps, (p, i) -> i = 0 OR p > element_at(ps, i) + $k),
        transform(
          filter(ps, (p, i) -> i = size(ps) - 1
                               OR element_at(ps, i + 2) > p + $k),
          e -> e + $k),
        (s, e) -> struct(s AS span_start, e AS span_end))""").as("sp"))
    spans.select(col("id").as(idCol), explode(col("sp")).as("span"))
      .select(col(idCol),
        col("span.span_start").cast("long").as("span_start"),
        col("span.span_end").cast("long").as("span_end"))
  }

  /** Apply [[dupSpans]] removal: cut every token whose position falls in
    * a duplicate span (ALL occurrences go, as in the paper) and rejoin
    * with single spaces. Documents without spans pass through verbatim
    * (including their original whitespace — only edited documents are
    * re-tokenized). One id-keyed aggregate on the (small) span table +
    * one id-keyed left join; the token surgery is a narrow lambda.
    */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 8): DataFrame =
    cutSpans(df, dupSpans(df, idCol, textCol, k), idCol, textCol)

  /** Apply a `(idCol, span_start, span_end)` span table to the corpus:
    * cut every token whose position falls in a span and rejoin with
    * single spaces. Documents without spans pass through verbatim
    * (including their original whitespace — only edited documents are
    * re-tokenized). One id-keyed aggregate on the (small) span table +
    * one id-keyed left join; the token surgery is a narrow lambda.
    */
  private[ml] def cutSpans(df: DataFrame, spanTable: DataFrame,
                           idCol: String, textCol: String): DataFrame = {
    val spans = spanTable
      .groupBy(col(idCol).as("__sid"))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    // token positions must be the SAME positions the span table numbered,
    // so the word split is Curation.words (single-space, empties removed)
    // — the ngramArray convention — not a regex re-tokenization
    val indexed = transform(Curation.words(col(textCol)),
      (w, i) => struct(w.as("w"), i.as("i")))
    val keptText = array_join(
      transform(
        filter(indexed, c => !exists(col("__spans"),
          s => c("i") >= s("span_start") && c("i") < s("span_end"))),
        c => c("w")),
      " ")
    df.join(spans, col(idCol) === col("__sid"), "left")
      .withColumn(textCol,
        when(col("__spans").isNull, col(textCol)).otherwise(keptText))
      .drop("__sid", "__spans")
  }

  /** Exact n-gram Jaccard similarity between doc pairs (caller bounds the
    * pair space, e.g. via LSH candidates or a blocking key).
    */
  def jaccard(aText: Column, bText: Column, k: Int = 3): Column = {
    val sa = shingles(aText, k)
    val sb = shingles(bText, k)
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(array_union(sa, sb)).cast("double")
    when(uni > 0, round(inter / uni, 6)).otherwise(lit(0.0))
  }

  /** Blocked n-gram-Jaccard near-dup pairs: block on a cheap key, then
    * exact Jaccard within blocks ≥ threshold. The blocking keeps the join
    * linear-ish at scale.
    *
    * Shingle sets are computed ONCE PER DOC before the self-join — inside
    * the join they would be rebuilt once per candidate pair, turning an
    * O(docs) tokenization into O(pairs) (measured: minutes vs seconds at
    * sf0.1). The join then only intersects precomputed arrays.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   blockCol: Column, threshold: Double, k: Int = 3): DataFrame = {
    val base = df.select(col(idCol).as("id"), blockCol.as("blk"),
      shingles(col(textCol), k).as("sh"))
    val l = base.alias("l"); val r = base.alias("r")
    val inter = size(array_intersect(col("l.sh"), col("r.sh"))).cast("double")
    val uni = size(array_union(col("l.sh"), col("r.sh"))).cast("double")
    val sim = when(uni > 0, round(inter / uni, 6)).otherwise(lit(0.0))
    l.join(r, col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"), sim.as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Broder near-CONTAINMENT pairs: C(A,B) = |Sh(A)∩Sh(B)| / min(|Sh(A)|,
    * |Sh(B)|) ≥ `threshold` — the dedup axis Jaccard near-dup
    * structurally misses: a short document quoted whole inside a long one
    * scores J ≈ |A|/|B| (diluted by the union) but C ≈ 1. Broder 1997
    * defines the directional containment |A∩B|/|A|; the min-normalized
    * symmetric form reported here flags "one side is mostly inside the
    * other" without caring which.
    *
    * Candidates come from a shingle INVERTED INDEX with a document-
    * frequency cap, not LSH: MinHash bands certify Jaccard, so banding
    * would also miss contained pairs — while an index join finds any pair
    * sharing an eligible gram. `maxDf` bounds the fan-out: a gram held by
    * d docs emits d·(d−1)/2 pair rows, so boilerplate grams (df > maxDf)
    * are excluded from BOTH the numerator and each doc's denominator —
    * the score is containment over index-eligible grams, stated honestly
    * (the paraDedup convention of bounding join blow-up by construction;
    * at web scale the df distribution is Zipf, so the cap removes a tiny
    * head that carries no discriminative signal anyway).
    *
    * Scale: one distinct-gram explode (digest-keyed — 16-byte md5s, never
    * gram text), one vocabulary-sized df count, a capped index self-join
    * whose output is ≤ maxDf·Σdf rows, one (a,b)-keyed count. Nothing
    * corpus × corpus; every shuffle keys on digests or id pairs.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 3, threshold: Double = 0.5,
                       maxDf: Int = 64): DataFrame = {
    val grams = df
      .select(col(idCol).as("id"), explode(shingles(col(textCol), k)).as("g"))
      .select(col("id"), unhex(md5(col("g"))).as("gd"))
    // ONE vocabulary-sized aggregate replaces the previous {df-count
    // aggregate → eligibility semi-join → occurrence self-join} chain
    // (r18, VERDICT r17 next #4 — the x100 scale-killer: 126.6M
    // candidate rows through two occurrence-sized join exchanges plus
    // SMJ sorts). Per gram, the exact df and a BOUNDED posting list
    // ([[graft.functions.BoundedCollectLongAgg]] — O(maxDf) buffer by
    // construction, so hot boilerplate grams cannot OOM the collect)
    // ride one count pass; grams above maxDf drop with their truncated
    // lists (they never pair), eligible grams keep their COMPLETE
    // sorted posting list. Candidate pairs are then GENERATED IN-STAGE
    // from each list (sorted ⇒ a < b once per gram, exactly the old
    // self-join's emission) and partially aggregated before the one
    // (a,b) exchange — the only occurrence-scale shuffle left is the
    // single gd exchange feeding the aggregate. The cached frame is
    // the eligible vocabulary (≤ maxDf ids per row), far below the
    // previous occurrence-sized `occ` cache; released by
    // [[graft.CacheSweep]], the minhashPairs convention.
    val vocab = grams.groupBy(col("gd"))
      .agg(boundedCollectIds(col("id"), maxDf).as("v"))
      .filter(col("v.n") <= maxDf)
      .select(col("v.ids").as("ids"))
      .persist()
    // perDoc persisted: BOTH score joins (na, nb) consume it — without
    // the persist each side re-runs the occurrence-sized explode +
    // count; the cached frame is doc-count-sized (id, n). A measured
    // dead end (r18): regrouping (id, n) back INTO the posting lists
    // so the threshold applies right after the pair aggregate — the
    // struct-array postings made pair emission ~2× slower (per-row
    // InternalRow allocation in posexplode/slice) and the wider pair
    // rows cost more than the two removed joins (44.5–45.8 s vs
    // 35.0 s at x100).
    val perDoc = vocab.select(explode(col("ids")).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n"))
      .persist()
    // pair emission: sorted lists ⇒ a < b exactly once per shared
    // gram (the old index self-join's emission, generated in-stage).
    // The aggregate clusters by `a` ALONE: hashpartitioning(a)
    // satisfies the (a,b) grouping (same-key rows colocate under the
    // coarser key) and is exactly the distribution the first perDoc
    // join needs — groupBy(a,b) would exchange the full candidate
    // stream by (a,b) and then re-exchange the distinct pairs by `a`
    // for the join. Map-side partial aggregation on raw pair rows was
    // near-useless anyway: a pair's duplicates (one per shared gram)
    // scatter across gd partitions. Per-`a` volume is bounded by
    // n_a · maxDf, so the single-key clustering cannot concentrate
    // unboundedly (no cap-less skew).
    val shared = vocab
      .select(col("ids"), posexplode(col("ids")))
      .select(col("col").as("a"),
        explode(slice(col("ids"), col("pos") + lit(2),
          size(col("ids")) - col("pos") - lit(1))).as("b"))
      .repartition(col("a"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(perDoc.select(col("id").as("a"), col("n").as("na")), Seq("a"))
      .join(perDoc.select(col("id").as("b"), col("n").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        round(col("shared").cast("double") /
          least(col("na"), col("nb")).cast("double"), 6).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Paragraph-level dedup (the MassiveText/RefinedWeb boilerplate pass):
    * remove every paragraph whose EXACT text occurs in ≥ `minDocs`
    * DISTINCT documents, from all of them, and reassemble each document
    * from its surviving paragraphs in original order. This is the middle
    * granularity of the dedup ladder — whole-document ([[exact]]/
    * [[minhashPairs]]) misses shared boilerplate inside otherwise-unique
    * pages; token-positional ([[dupSpans]]) is finer but costlier.
    * Within-document repetition is deliberately NOT removed here (that is
    * the `repetition` quality signal's business — a doc quoting itself is
    * a quality problem, not cross-corpus boilerplate).
    *
    * Paragraphs are `delimPattern` splits (default blank lines), trimmed,
    * empties dropped. All input columns are preserved; `textCol` is
    * overwritten with the reassembled text ("" when everything was
    * boilerplate) and `n_paras`/`n_removed` audit columns are appended —
    * the same contract as [[removeDupSpans]].
    *
    * Scale: the shuffles carry 16-byte md5 paragraph digests, never
    * paragraph text — one (digest, doc) distinct + digest-keyed count
    * (paragraph-vocabulary-sized), one digest-keyed anti-join, one
    * id-keyed reassembly aggregate. Nothing pairwise, no window.
    */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
                     minDocs: Int = 2,
                     delimPattern: String = "\n{2,}"): DataFrame = {
    def parasOf(text: Column): Column =
      filter(transform(split(text, delimPattern), p => trim(p)), p => p =!= "")
    val paras = df.select(col(idCol).as("__pid"),
        posexplode(parasOf(col(textCol))).as(Seq("__pos", "__para")))
      .withColumn("__h", md5(col("__para")))
    val dup = paras.select(col("__h"), col("__pid")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= minDocs).select(col("__h"))
    val kept = paras.join(dup, Seq("__h"), "left_anti")
      .groupBy(col("__pid")).agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__para")))),
          c => c("__para")), "\n\n").as("__kept"),
        count(lit(1)).as("__n_kept"))
    df.withColumn("__np", size(parasOf(col(textCol))).cast("long"))
      .join(kept, col(idCol) === col("__pid"), "left")
      .withColumn(textCol, coalesce(col("__kept"), lit("")))
      .withColumn("n_paras", col("__np"))
      .withColumn("n_removed", col("__np") - coalesce(col("__n_kept"), lit(0L)))
      .drop("__pid", "__kept", "__n_kept", "__np")
  }
}
