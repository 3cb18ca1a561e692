package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml._
import GraftQueries.Spec

/** Training-data pipeline queries: dedup family, similarity search, text
  * analysis, multimodal plumbing — each oracle-checked against DuckDB.
  * Where the oracle needs non-trivial SQL (minhash, simhash, cosine), the
  * SQL is *generated* here from the same parameters the Spark plan uses,
  * so engine and oracle can't drift.
  */
object GraftQueriesML {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // shared SQL fragments ---------------------------------------------------

  /** DuckDB: tokens + ≥3-token filter + shingles CTE prefix over documents. */
  private val shinglesCte =
    """WITH w AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS w
                  FROM documents),
       sh AS (SELECT doc_id, source,
                list_distinct(list_transform(range(len(w)-2),
                  i -> w[i+1]||' '||w[i+2]||' '||w[i+3])) AS s
              FROM w WHERE len(w) >= 3)"""

  /** DuckDB cosine between two list expressions, bit-compatible with
    * [[Similarity.cosine]]: index-ordered double fold for dot and norms,
    * identical operation order.
    */
  private def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_aggregate(list_transform(range(len($x)), i -> CAST($x[i+1] AS DOUBLE)*CAST($y[i+1] AS DOUBLE)), 'sum')"
    s"(CASE WHEN sqrt(${dot(a, a)})*sqrt(${dot(b, b)}) > 0 THEN ${dot(a, b)}/(sqrt(${dot(a, a)})*sqrt(${dot(b, b)})) ELSE 0.0 END)"
  }

  // ======================================================================
  // Deduplication
  // ======================================================================

  private val mExact = Spec("ml_dedup_exact",
    (s, dir) => Dedup.exact(t(s, dir, "documents"), "text", "doc_id")
      .select(col("doc_id"), col("source"), col("n_chars")),
    Some("""SELECT doc_id, source, n_chars FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))"""))

  private val mFingerprint = Spec("ml_fingerprint",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    },
    Some("""SELECT doc_id,
            md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
            FROM documents"""))

  /** DuckDB minhash signature CTEs matching [[Dedup.minhashSignatures]]:
    * explode shingles, one md5 per shingle split into two 32-bit halves,
    * min((h1 + i·h2) mod P) per permutation.
    */
  private def minhashSigSql(n: Int): String = {
    val p = Dedup.MinhashPrime
    val mins = (0 until n).map(i => s"min((h1 + $i*h2) % $p) AS mh$i").mkString(", ")
    shinglesCte + s""",
       ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
       hh AS (SELECT doc_id,
                ('0x'||substr(md5(g),1,8))::BIGINT AS h1,
                ('0x'||substr(md5(g),9,8))::BIGINT AS h2 FROM ex),
       sig AS (SELECT doc_id, $mins FROM hh GROUP BY doc_id)"""
  }

  private val mMinhashSig = Spec("ml_minhash_signature",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .filter(size(Dedup.tokens(col("text"))) >= 3)
      val sig = Dedup.minhashSignatures(d, "doc_id", "text", n = 12, k = 3)
      sig.select(col("id").as("doc_id"),
        concat_ws(",", (0 until 12).map(i => col(s"mh$i")): _*).as("sig"))
    },
    Some(minhashSigSql(12) + """
         SELECT doc_id, """ + (0 until 12).map(i => s"CAST(mh$i AS VARCHAR)")
           .mkString(" || ',' || ") + """ AS sig FROM sig"""))

  private val mMinhashPairs = Spec("ml_minhash_pairs",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .filter(size(Dedup.tokens(col("text"))) >= 3)
      Dedup.minhashPairs(d, "doc_id", "text", bands = 4, rowsPerBand = 3, k = 3)
    },
    Some {
      val bandExprs = (0 until 4).map { b =>
        val key = (0 until 3).map(r => s"CAST(mh${b * 3 + r} AS VARCHAR)")
          .mkString(" || '_' || ")
        s"SELECT doc_id, $b AS band, $key AS key FROM sig"
      }.mkString(" UNION ALL ")
      // capped AS mirrors the engine's maxBucketSize=4096 window filter
      minhashSigSql(12) + s""",
         bands AS ($bandExprs),
         capped AS (SELECT doc_id, band, key FROM bands
           QUALIFY count(*) OVER (PARTITION BY band, key) <= 4096)
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM capped l JOIN capped r
           ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id"""
    })

  /** DuckDB CTE prefix computing `fps(doc_id, sh)` with the same
    * arithmetic as [[Dedup.simhashes]] (one md5 per distinct token, sign
    * per bit).
    */
  private val simhashCte: String = {
    val sums = (0 until 32).map { j =>
      val nib = j / 4; val bit = 1 << (j % 4)
      s"""sum(CASE WHEN (('0x'||substr(h,${nib + 1},1))::INT & $bit) > 0
          THEN 1 ELSE -1 END) AS b$j"""
    }.mkString(", ")
    val fp = (0 until 32).map(j =>
      s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""WITH tk AS (SELECT doc_id,
          unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS t
        FROM documents),
        hh AS (SELECT doc_id, md5(t) AS h FROM tk),
        b AS (SELECT doc_id, $sums FROM hh GROUP BY doc_id),
        fps AS (SELECT doc_id, CAST($fp AS BIGINT) AS sh FROM b)"""
  }

  private val mSimhash = Spec("ml_simhash",
    (s, dir) => Dedup.simhashes(t(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("sh")),
    Some(s"$simhashCte SELECT doc_id, sh FROM fps"))

  private val mSimhashPairs = Spec("ml_simhash_pairs",
    (s, dir) => Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("a", "b"),
    Some(s"""$simhashCte,
        banded AS (
          SELECT doc_id, 0 AS band, sh & 65535 AS key FROM fps
          UNION ALL
          SELECT doc_id, 1 AS band, (sh >> 16) & 65535 AS key FROM fps),
        capped AS (SELECT doc_id, band, key FROM banded
          QUALIFY count(*) OVER (PARTITION BY band, key) <= 4096),
        cand AS (
          SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
          FROM capped l JOIN capped r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)
        SELECT a, b FROM cand ORDER BY a, b"""))

  /** SimHash dedup DECISION (Manku et al. 2007): band-blocked
    * candidates verified at full-fingerprint Hamming ≤ 6, then the
    * generic pairs→keep component sweep ([[Dedup.keepFromPairs]]). The
    * recursive-CTE oracle proves the transitive closure, like
    * [[mNearDupKeep]].
    */
  private val mSimhashKeep = Spec("ml_simhash_keep",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.keepFromPairs(d, "doc_id",
          Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 6))
        .orderBy("doc_id")
    },
    Some(simhashCte.replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
        banded AS (
          SELECT doc_id, sh, 0 AS band, sh & 65535 AS key FROM fps
          UNION ALL
          SELECT doc_id, sh, 1 AS band, (sh >> 16) & 65535 AS key FROM fps),
        capped AS (SELECT doc_id, sh, band, key FROM banded
          QUALIFY count(*) OVER (PARTITION BY band, key) <= 4096),
        pairs AS (
          SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
          FROM capped l JOIN capped r
            ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
          WHERE bit_count(xor(l.sh, r.sh)) <= 6),
        edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
        reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
          UNION
          SELECT e.b AS id, reach.r AS r
          FROM reach JOIN edges e ON e.a = reach.id),
        roots AS (SELECT id, min(r) AS root FROM reach GROUP BY id)
        SELECT id AS doc_id FROM roots WHERE root = id ORDER BY doc_id"""))

  private val mJaccardPairs = Spec("ml_jaccard_pairs",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .filter(size(Dedup.tokens(col("text"))) >= 3)
      Dedup.nearDupPairs(d, "doc_id", "text",
        bands = 4, rowsPerBand = 3, k = 3, threshold = 0.5)
    },
    Some {
      val bandExprs = (0 until 4).map { b =>
        val key = (0 until 3).map(r => s"CAST(mh${b * 3 + r} AS VARCHAR)")
          .mkString(" || '_' || ")
        s"SELECT doc_id, $b AS band, $key AS key FROM sig"
      }.mkString(" UNION ALL ")
      val simExpr = """round(CAST(len(list_intersect(la.s, rb.s)) AS DOUBLE)
                 / len(list_distinct(la.s || rb.s)), 6)"""
      minhashSigSql(12) + s""",
         bands AS ($bandExprs),
         cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
           FROM bands l JOIN bands r
             ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)
         SELECT a, b, $simExpr AS sim
         FROM cand JOIN sh la ON la.doc_id = a JOIN sh rb ON rb.doc_id = b
         WHERE $simExpr >= 0.5"""
    })

  /** Near-containment over the df-capped shingle index (the quoted-inside
    * axis MinHash misses); the oracle replicates the cap, so numerator
    * AND denominators count only index-eligible grams.
    */
  private val mContainmentPairs = Spec("ml_containment_pairs",
    (s, dir) => Dedup.containmentPairs(t(s, dir, "documents"), "doc_id",
        "text", k = 3, threshold = 0.5, maxDf = 64)
      .orderBy("a", "b"),
    Some(shinglesCte + """,
       ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
       dfc AS (SELECT g, count(*) AS c FROM ex GROUP BY g),
       occ AS (SELECT doc_id, ex.g FROM ex JOIN dfc USING (g)
         WHERE c <= 64),
       n AS (SELECT doc_id, count(*) AS n FROM occ GROUP BY doc_id),
       p AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS shared
         FROM occ l JOIN occ r ON l.g = r.g AND l.doc_id < r.doc_id
         GROUP BY 1, 2)
       SELECT a, b, round(CAST(shared AS DOUBLE) / least(na.n, nb.n), 6)
         AS containment
       FROM p JOIN n na ON na.doc_id = a JOIN n nb ON nb.doc_id = b
       WHERE round(CAST(shared AS DOUBLE) / least(na.n, nb.n), 6) >= 0.5
       ORDER BY a, b"""))

  /** DuckDB CTE chain through `roots(id, root)` — the TRUE transitive
    * closure of the 4×3-band near-dup graph (recursive CTE), so any
    * query over it also verifies the Spark side's propagation CONVERGED.
    * Shared by the keep and clusters oracles.
    */
  private def nearDupRootsSql: String = {
    val bandExprs = (0 until 4).map { b =>
      val key = (0 until 3).map(r => s"CAST(mh${b * 3 + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString(" UNION ALL ")
    val simExpr = """round(CAST(len(list_intersect(la.s, rb.s)) AS DOUBLE)
               / len(list_distinct(la.s || rb.s)), 6)"""
    minhashSigSql(12).replaceFirst("WITH ", "WITH RECURSIVE ") + s""",
       bands AS ($bandExprs),
       cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM bands l JOIN bands r
           ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id),
       pairs AS (SELECT a, b
         FROM cand JOIN sh la ON la.doc_id = a JOIN sh rb ON rb.doc_id = b
         WHERE $simExpr >= 0.5),
       edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
       reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
         UNION
         SELECT e.b AS id, reach.r AS r
         FROM reach JOIN edges e ON e.a = reach.id),
       roots AS (SELECT id, min(r) AS root FROM reach GROUP BY id)"""
  }

  /** The fuzzy-dedup fixture: a short normalized field (24-char text
    * prefix) plus a one-edit mutated twin for every fifth doc — true
    * edit-distance duplicates exist by construction, and any
    * accidental cross-doc near-matches are computed identically by
    * both engines.
    */
  private def fuzzyFixture(d: DataFrame): DataFrame = {
    val base = d.select(col("doc_id"),
      substring(col("text"), 1, 24).as("s"))
    base.unionAll(base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(substring(col("s"), 1, 23), lit("x")).as("s")))
  }

  /** CTEs `f` (the fixture) and `p` (qualifying pairs) for the fuzzy
    * family. The oracle join is the FULL quadratic one on purpose: the
    * engine blocks on length bands, and identical output at the value
    * level is a proof the blocking is lossless (edit distance ≥ length
    * difference), not an assumption.
    */
  private def fuzzyFixtureSql: String =
    """WITH RECURSIVE f AS (
         SELECT doc_id, substr(text, 1, 24) AS s FROM documents
         UNION ALL
         SELECT doc_id + 100000, substr(substr(text, 1, 24), 1, 23) || 'x'
         FROM documents WHERE doc_id % 5 = 0)"""

  private def fuzzyPairsSql: String =
    fuzzyFixtureSql + """,
       p AS (SELECT a, b, dist FROM (
         SELECT la.doc_id AS a, rb.doc_id AS b,
           CAST(levenshtein(la.s, rb.s) AS INT) AS dist
         FROM f la JOIN f rb ON la.doc_id < rb.doc_id
           AND abs(length(la.s) - length(rb.s)) <= 2)
         WHERE dist <= 2)"""

  private val mFuzzyPairs = Spec("ml_fuzzy_pairs",
    (s, dir) => Dedup.fuzzyDupPairs(fuzzyFixture(t(s, dir, "documents")),
        "doc_id", "s", maxDist = 2, maxBucketSize = 1 << 20,
        blocking = "length")
      .orderBy("a", "b"),
    Some(fuzzyPairsSql + " SELECT a, b, dist FROM p ORDER BY a, b"))

  /** The same pair set under the DEFAULT pigeonhole segment blocking
    * (PassJoin) — one quadratic DuckDB oracle, two blocking schemes,
    * each proved lossless independently by the value-identical gate.
    */
  private val mFuzzyPairsSeg = Spec("ml_fuzzy_pairs_seg",
    (s, dir) => Dedup.fuzzyDupPairs(fuzzyFixture(t(s, dir, "documents")),
        "doc_id", "s", maxDist = 2, maxBucketSize = 1 << 20)
      .orderBy("a", "b"),
    Some(fuzzyPairsSql + " SELECT a, b, dist FROM p ORDER BY a, b"))

  /** Component-min keep over the fuzzy pairs — the recursive-CTE
    * closure convention of [[mNearDupKeep]] on the edit-distance edge
    * set.
    */
  private val mFuzzyKeep = Spec("ml_fuzzy_keep",
    (s, dir) => {
      val f = fuzzyFixture(t(s, dir, "documents"))
      Dedup.fuzzyDedupKeep(f, "doc_id", "s", maxDist = 2,
        maxBucketSize = 1 << 20).orderBy("doc_id")
    },
    Some(fuzzyPairsSql + """,
       edges AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
       reach AS (SELECT doc_id AS id, doc_id AS r FROM f
         UNION
         SELECT e.b AS id, reach.r AS r
         FROM reach JOIN edges e ON e.a = reach.id),
       roots AS (SELECT id, min(r) AS root FROM reach GROUP BY id)
       SELECT id AS doc_id FROM roots WHERE root = id ORDER BY doc_id"""))

  /** The against leg of the fuzzy family (typo-rung decontamination):
    * incoming = every third fixture row, reference = the rest. The
    * oracle anti-join is the FULL quadratic levenshtein — identical
    * kept sets prove the length-band blocking lossless on the against
    * shape too (one side keys its own bucket, the other emits ±1).
    */
  private val mFuzzyAgainst = Spec("ml_fuzzy_against",
    (s, dir) => {
      val f = fuzzyFixture(t(s, dir, "documents"))
      Dedup.fuzzyAgainst(f.filter(col("doc_id") % 3 === 0),
          f.filter(col("doc_id") % 3 =!= 0), "doc_id", "s",
          maxDist = 2, maxBucketSize = 1 << 20)
        .select(col("doc_id"), col("s")).orderBy("doc_id")
    },
    Some(fuzzyFixtureSql + """
       SELECT doc_id, s FROM f d
       WHERE doc_id % 3 = 0 AND NOT EXISTS
         (SELECT 1 FROM f r WHERE r.doc_id % 3 <> 0
          AND levenshtein(d.s, r.s) <= 2)
       ORDER BY doc_id"""))

  /** The ingest leg of the fuzzy family, through the STAGE surface (the
    * mode exists only there): the fixture lands in a growing store as
    * two batches — batch B must drop against batch A's STORED strings
    * (exact on the content key, fuzzy at ≤ max_dist edits) as well as
    * against its own seniors. The oracle replays the batch semantics
    * with full quadratic levenshtein joins: within-batch exact keep
    * (min id per key), junior-with-senior fuzzy drop, then the two
    * store legs. NOT EXISTS with an equality (never NOT IN) on the
    * store legs — the anti-join convention; the fixture itself is
    * null-free by construction (substr of a non-null text).
    */
  private val mFuzzyIngest = Spec("ml_fuzzy_ingest",
    (s, dir) => {
      val f = fuzzyFixture(t(s, dir, "documents"))
      val root = "/tmp/graft-fuzzy-ingest-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // rebuild per run — the query owns the path
      val yaml =
        s"""pipeline:
           |  - type: dedup_ingest
           |    mode: fuzzy
           |    id_field: doc_id
           |    text_field: s
           |    store: $root/store
           |    max_dist: 2
           |    max_bucket_size: 1048576
           |""".stripMargin
      def run(df: org.apache.spark.sql.DataFrame) =
        graft.pipeline.PipelineCompiler.compile(
          graft.pipeline.RuleLoader.fromYaml(yaml))(df).main
      // the store append inside the stage is an eager action, so batch
      // A's state is durable before batch B's plan reads the store
      val a = run(f.filter(col("doc_id") % 2 === 0))
      val b = run(f.filter(col("doc_id") % 2 =!= 0))
      a.unionByName(b).orderBy("doc_id")
    },
    Some(fuzzyFixtureSql + """,
       a AS (SELECT doc_id, s FROM f WHERE doc_id % 2 = 0),
       b AS (SELECT doc_id, s FROM f WHERE doc_id % 2 <> 0),
       ax AS (SELECT doc_id, s FROM a
         QUALIFY doc_id = min(doc_id) OVER (PARTITION BY s)),
       ak AS (SELECT doc_id, s FROM ax d WHERE NOT EXISTS
         (SELECT 1 FROM ax q WHERE q.doc_id < d.doc_id
          AND levenshtein(q.s, d.s) <= 2)),
       bx AS (SELECT doc_id, s FROM b
         QUALIFY doc_id = min(doc_id) OVER (PARTITION BY s)),
       bk AS (SELECT doc_id, s FROM bx d
         WHERE NOT EXISTS (SELECT 1 FROM ak r WHERE r.s = d.s)
           AND NOT EXISTS (SELECT 1 FROM bx q WHERE q.doc_id < d.doc_id
             AND levenshtein(q.s, d.s) <= 2)
           AND NOT EXISTS (SELECT 1 FROM ak r
             WHERE levenshtein(r.s, d.s) <= 2))
       SELECT doc_id, s FROM ak UNION ALL SELECT doc_id, s FROM bk
       ORDER BY doc_id"""))

  private val mNearDupKeep = Spec("ml_neardup_keep",
    (s, dir) => Dedup.nearDupKeep(t(s, dir, "documents"), "doc_id", "text",
        bands = 4, rowsPerBand = 3, k = 3, threshold = 0.5)
      .orderBy("doc_id"),
    Some(nearDupRootsSql +
      " SELECT id AS doc_id FROM roots WHERE root = id ORDER BY doc_id"))

  private val mNearDupClusters = Spec("ml_neardup_clusters",
    (s, dir) => Dedup.nearDupClusters(t(s, dir, "documents"), "doc_id",
        "text", bands = 4, rowsPerBand = 3, k = 3, threshold = 0.5)
      .orderBy("doc_id"),
    Some(nearDupRootsSql +
      " SELECT id AS doc_id, root AS cluster FROM roots ORDER BY doc_id"))

  /** Leakage-safe split: hash of the CLUSTER root decides the split, so
    * the oracle's recursive-CTE closure also verifies no near-dup pair
    * straddles a split boundary (same root ⟹ same split by construction).
    */
  private val mClusterSplit = Spec("ml_cluster_split",
    (s, dir) => Dedup.leakageSafeSplit(t(s, dir, "documents"), "doc_id",
        "text", trainPct = 80, validPct = 10,
        bands = 4, rowsPerBand = 3, k = 3, threshold = 0.5)
      .select(col("doc_id"), col("cluster"), col("split"))
      .orderBy("doc_id"),
    Some(nearDupRootsSql + """
       SELECT id AS doc_id, root AS cluster,
         CASE WHEN b < 80 THEN 'train'
              WHEN b < 90 THEN 'validation'
              ELSE 'test' END AS split
       FROM (SELECT id, root,
         CAST(concat('0x', substr(md5(CAST(root AS VARCHAR)), 1, 4))
           AS INTEGER) % 100 AS b FROM roots)
       ORDER BY doc_id"""))

  // ======================================================================
  // Similarity search over embeddings
  // ======================================================================

  private val mTopK = Spec("ml_embed_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid_src"), col("embedding").as("qvec"))
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          queries, "qid_src", "qvec", k = 5)
        .select(col("qid").as("qid"), col("rank"), col("id"), col("sim"))
    },
    Some {
      val cos = cosSql("q.embedding", "c.embedding")
      s"""WITH scored AS (
            SELECT q.vec_id AS qid, c.vec_id AS id, round($cos, 6) AS sim
            FROM embeddings q CROSS JOIN embeddings c WHERE q.vec_id < 3)
          SELECT qid, rank, id, sim FROM (
            SELECT qid, id, sim, CAST(row_number() OVER (
              PARTITION BY qid ORDER BY sim DESC, id ASC) AS INT) AS rank
            FROM scored) WHERE rank <= 5"""
    })

  /** Deterministic LSH hyperplanes: plane p, dim d → ((d*(p+3)) % 7) - 3.
    * Only 7 distinct planes exist in this family (mod-7) — fine for the
    * 4-plane bucket demo below, NOT for banded LSH; see [[lshBandPlanes]].
    */
  private def lshPlanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(p => (0 until dim).map(d => (((d * (p + 3)) % 7) - 3).toDouble))

  /** Deterministic Rademacher (±1) hyperplanes from an LCG (Knuth MMIX
    * constants): every plane distinct for any (bands × planesPerBand)
    * count, reproducible on both engines (the oracle SQL embeds the same
    * literal planes this generator hands the Spark plan).
    */
  private def lshBandPlanes(bands: Int, planesPerBand: Int,
                            dim: Int): Seq[Seq[Seq[Double]]] = {
    var s = 0x9E3779B97F4A7C15L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    Seq.tabulate(bands, planesPerBand, dim)((_, _, _) =>
      if (next() < 0) -1.0 else 1.0)
  }

  private val mLsh = Spec("ml_embed_lsh_bucket",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      emb.select(col("vec_id"),
        Similarity.lshBucket(col("embedding"), lshPlanes(4, 64)).as("bucket"))
    },
    Some {
      val planes = lshPlanes(4, 64)
      val bits = planes.map { p =>
        val lst = p.mkString("[", ",", "]")
        val dot = s"list_aggregate(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE)*($lst)[i+1]), 'sum')"
        s"(CASE WHEN $dot >= 0 THEN '1' ELSE '0' END)"
      }.mkString(" || ")
      s"SELECT vec_id, $bits AS bucket FROM embeddings"
    })

  /** Banded-LSH parameters for the near-dup gate: 8 bands × 8 planes →
    * 256 buckets per band at this corpus size; at 10⁹ vectors the same
    * code runs r≈20 (see [[Similarity.cosineNearDupPairs]] scaladoc).
    */
  private val NdBands = 8
  private val NdPlanesPerBand = 8
  private val NdCap = 4096

  /** Shared DuckDB prefix for the banded sign-LSH embedding oracles:
    * `sig` (per-band key columns), `un` (the engine's normalize-first
    * vectors), and `banded` (band union with the joint bucket cap) over
    * the `embeddings` table. The band keys come from the same plane
    * generator the Spark plans use, so engine and oracle can't drift.
    */
  private def embedBandsCte(bandPlanes: Seq[Seq[Seq[Double]]],
                            cap: Int): String = {
    def keySql(planes: Seq[Seq[Double]]): String = planes.map { p =>
      val lst = p.mkString("[", ",", "]")
      val dot = s"list_aggregate(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE)*($lst)[i+1]), 'sum')"
      s"(CASE WHEN $dot >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")
    val sigCols = bandPlanes.zipWithIndex
      .map { case (p, b) => s"${keySql(p)} AS k$b" }.mkString(",\n              ")
    val bandUnion = bandPlanes.indices
      .map(b => s"SELECT vec_id, $b AS band, k$b AS key FROM sig")
      .mkString("\n              UNION ALL ")
    val normExpr = "sqrt(list_aggregate(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE)*CAST(embedding[i+1] AS DOUBLE)), 'sum'))"
    s"""WITH sig AS (SELECT vec_id,
            $sigCols
          FROM embeddings),
        un AS (SELECT vec_id,
            CASE WHEN $normExpr > 0
              THEN list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) / $normExpr)
              ELSE list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE)) END AS u
          FROM embeddings),
        banded AS (
          SELECT * FROM (
            $bandUnion)
          QUALIFY count(*) OVER (PARTITION BY band, key) <= $cap)"""
  }

  /** Index-ordered dot of two normalized-list columns, rounded like the
    * engine's verify step.
    */
  private def unDotSql(a: String, b: String): String =
    s"""ROUND(list_aggregate(list_transform(range(64),
          i -> $a.u[i+1]*$b.u[i+1]), 'sum'), 6)"""

  private val mCosPairs = Spec("ml_embed_neardup",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      // threshold tuned to the synthetic corpus (max pairwise cosine
      // ~0.48) so the gate checks real pairs, not an empty set
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        lshBandPlanes(NdBands, NdPlanesPerBand, 64), threshold = 0.4,
        maxBucketSize = NdCap)
        .orderBy("a", "b")
    },
    Some(embedBandsCte(lshBandPlanes(NdBands, NdPlanesPerBand, 64), NdCap) + s""",
          cand AS (
            SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.key = r.key AND l.vec_id < r.vec_id),
          scored AS (
            SELECT cand.a, cand.b, ${unDotSql("ua", "ub")} AS sim
            FROM cand JOIN un ua ON ua.vec_id = cand.a
                      JOIN un ub ON ub.vec_id = cand.b)
          SELECT a, b, sim FROM scored WHERE sim >= 0.4 ORDER BY a, b"""))

  /** The recall-targeted geometry (r15) under the full oracle gate:
    * the same banded pipeline as [[mCosPairs]] but sized by
    * [[Similarity.recallLshBandsPlanes]] at a declared expected corpus
    * (4000 rows, target recall 0.9 at cosine 0.8 — the
    * `expected_corpus:`/`target_recall:` stage convention) → a
    * NON-SQUARE 17 bands × 9 planes, so this row also pins that
    * bands ≠ planes flows through banding, capping, in-join scoring
    * and the oracle identically. The engine and the generated SQL
    * resolve the geometry through the same pure function, so they
    * cannot drift.
    */
  private val mCosPairsRecall = Spec("ml_embed_neardup_recall",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        Similarity.recallLshGeometry(4000L, 64,
          targetRecall = 0.9, refCosine = 0.8),
        threshold = 0.4, maxBucketSize = NdCap)
        .orderBy("a", "b")
    },
    Some {
      val (rb, rr) = Similarity.recallLshBandsPlanes(4000L, 0.9, 0.8)
      embedBandsCte(lshBandPlanes(rb, rr, 64), NdCap) + s""",
          cand AS (
            SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.key = r.key AND l.vec_id < r.vec_id),
          scored AS (
            SELECT cand.a, cand.b, ${unDotSql("ua", "ub")} AS sim
            FROM cand JOIN un ua ON ua.vec_id = cand.a
                      JOIN un ub ON ub.vec_id = cand.b)
          SELECT a, b, sim FROM scored WHERE sim >= 0.4 ORDER BY a, b"""
    })

  /** Embedding against-a-reference dedup: incoming = `vec_id % 5 = 0`,
    * reference = the rest — [[mNearDupAgainst]]'s split convention on
    * the embeddings table.
    */
  private val mEmbedAgainst = Spec("ml_embed_neardup_against",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.cosineNearDupAgainst(
          emb.filter(col("vec_id") % 5 === 0),
          emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding",
          lshBandPlanes(NdBands, NdPlanesPerBand, 64), threshold = 0.4,
          maxBucketSize = NdCap)
        .select(col("vec_id"))
    },
    Some(embedBandsCte(lshBandPlanes(NdBands, NdPlanesPerBand, 64), NdCap) + s""",
          cands AS (
            SELECT DISTINCT l.vec_id AS iid, r.vec_id AS rid
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.key = r.key
            WHERE l.vec_id % 5 = 0 AND r.vec_id % 5 <> 0),
          dirty AS (
            SELECT DISTINCT iid FROM cands
            JOIN un ua ON ua.vec_id = cands.iid
            JOIN un ub ON ub.vec_id = cands.rid
            WHERE ${unDotSql("ua", "ub")} >= 0.4)
          SELECT vec_id FROM embeddings
          WHERE vec_id % 5 = 0 AND vec_id NOT IN (SELECT iid FROM dirty)"""))

  private val mKnnGraph = Spec("ml_knn_graph",
    (s, dir) => Similarity.knnGraph(t(s, dir, "embeddings"),
      "vec_id", "embedding",
      lshBandPlanes(NdBands, NdPlanesPerBand, 64), k = 3,
      maxBucketSize = NdCap),
    Some(embedBandsCte(lshBandPlanes(NdBands, NdPlanesPerBand, 64), NdCap) + s""",
          cand AS (
            SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.key = r.key AND l.vec_id < r.vec_id),
          scored AS (
            SELECT cand.a, cand.b, ${unDotSql("ua", "ub")} AS sim
            FROM cand JOIN un ua ON ua.vec_id = cand.a
                      JOIN un ub ON ub.vec_id = cand.b),
          edges AS (
            SELECT a AS src, b AS dst, sim FROM scored
            UNION ALL SELECT b AS src, a AS dst, sim FROM scored)
          SELECT src, CAST(rank AS INT) AS rank, dst, sim FROM (
            SELECT src, dst, sim, row_number() OVER (
              PARTITION BY src ORDER BY sim DESC, dst ASC) AS rank
            FROM edges) WHERE rank <= 3"""))

  private val mIvf = Spec("ml_embed_ivf_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      // centroids = first 8 vectors (deterministic, collected at plan time)
      val centroids = emb.filter(col("vec_id") < 8)
        .orderBy("vec_id").collect()
        .map(r => r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toSeq)
        .toSeq
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid_src"), col("embedding").as("qvec"))
      Similarity.ivfTopK(emb, "vec_id", "embedding", queries, "qid_src", "qvec",
          centroids, k = 5, nprobe = 2)
        .select(col("qid"), col("rank"), col("id"), col("sim"))
    },
    Some {
      val cosAssign = cosSql("e.embedding", "c.embedding")
      val cosProbe = cosSql("q.embedding", "c.embedding")
      val cosScore = cosSql("q.qe", "e.embedding")
      s"""WITH c AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 8),
          assign AS (
            SELECT vec_id, cid AS bucket FROM (
              SELECT e.vec_id, c.cid, row_number() OVER (
                PARTITION BY e.vec_id ORDER BY $cosAssign DESC, c.cid ASC) AS rn
              FROM embeddings e CROSS JOIN c) WHERE rn = 1),
          q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
          probe AS (SELECT qid, cid, pr FROM (
            SELECT q.vec_id AS qid, c.cid,
              row_number() OVER (PARTITION BY q.vec_id
                ORDER BY $cosProbe DESC, c.cid ASC) AS pr
            FROM embeddings q CROSS JOIN c WHERE q.vec_id < 3)
            WHERE pr <= 2),
          scored AS (
            SELECT q.qid, e.vec_id AS id, round($cosScore, 6) AS sim
            FROM q JOIN probe ON probe.qid = q.qid
            JOIN assign ON assign.bucket = probe.cid
            JOIN embeddings e ON e.vec_id = assign.vec_id)
          SELECT qid, rank, id, sim FROM (
            SELECT qid, id, sim, CAST(row_number() OVER (
              PARTITION BY qid ORDER BY sim DESC, id ASC) AS INT) AS rank
            FROM scored) WHERE rank <= 5"""
    })

  /** The full production-IVF path, oracle-checked END TO END: centroids
    * TRAINED by the deterministic k-means ([[Similarity.kmeansCentroids]]
    * — the trainable-but-SQL-replayable complement of maximin
    * [[Similarity.trainCentroids]], whose content-addressed seeding no
    * oracle reproduces), then cosine bucket assignment, nprobe probe
    * selection, and in-bucket exact scoring — the [[mIvf]] plan over a
    * trained codebook instead of the first-8-rows stand-in.
    */
  private val mIvfKmeans = Spec("ml_ivf_kmeans_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val centroids = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = 8, dim = 64, iters = 1)
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid_src"), col("embedding").as("qvec"))
      Similarity.ivfTopK(emb, "vec_id", "embedding", queries, "qid_src", "qvec",
          centroids, k = 5, nprobe = 2)
        .select(col("qid"), col("rank"), col("id"), col("sim"))
    },
    Some(ivfKmeansTopkSql))

  /** The kmeans-trained IVF top-k oracle, shared verbatim by
    * [[mIvfKmeans]] (library call) and [[mAnnPipeline]] (the same plan
    * reached through the `ann_topk` YAML stage — identical SQL is the
    * point: the stage surface must add nothing to the semantics).
    */
  private def ivfKmeansTopkSql: String = {
    val cosAssign = cosSql("e0.embedding", "t.cen")
    val cosProbe = cosSql("q0.embedding", "t.cen")
    val cosScore = cosSql("q.qe", "e.embedding")
    kmeansSql(8, 64, 1) + s""",
          assign AS (
            SELECT vec_id, c AS bucket FROM (
              SELECT e0.vec_id, t.c, row_number() OVER (
                PARTITION BY e0.vec_id ORDER BY $cosAssign DESC, t.c ASC) AS rn
              FROM embeddings e0 CROSS JOIN c1 t) WHERE rn = 1),
          q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
          probe AS (SELECT qid, c AS cid, pr FROM (
            SELECT q0.vec_id AS qid, t.c,
              row_number() OVER (PARTITION BY q0.vec_id
                ORDER BY $cosProbe DESC, t.c ASC) AS pr
            FROM embeddings q0 CROSS JOIN c1 t WHERE q0.vec_id < 3)
            WHERE pr <= 2),
          scored AS (
            SELECT q.qid, e.vec_id AS id, round($cosScore, 6) AS sim
            FROM q JOIN probe ON probe.qid = q.qid
            JOIN assign ON assign.bucket = probe.cid
            JOIN embeddings e ON e.vec_id = assign.vec_id)
          SELECT qid, rank, id, sim FROM (
            SELECT qid, id, sim, CAST(row_number() OVER (
              PARTITION BY qid ORDER BY sim DESC, id ASC) AS INT) AS rank
            FROM scored) WHERE rank <= 5"""
  }

  /** The `ann_topk` STAGE path end to end under the full oracle gate:
    * queries staged to a parquet side table (the stage's production
    * shape — at plan time here, because the oracle's query set must be
    * derivable from the registered tables: it is `embeddings WHERE
    * vec_id < 3` re-read from disk), centroids trained through
    * `trainer: kmeans` (the SQL-replayable trainer, the mIvfKmeans
    * convention), `nprobe:` explicit. Exercises the whole config
    * surface — side-table read, plan-time training, probe-pruned
    * search — against the SAME SQL as the library row.
    */
  private val mAnnPipeline = Spec("ml_ann_pipeline",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qDir = java.nio.file.Files.createTempDirectory("ann-queries")
        .toString
      emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        .coalesce(1).write.mode("overwrite").parquet(qDir)
      val yaml =
        s"""pipeline:
           |  - type: ann_topk
           |    id_field: vec_id
           |    vec_field: embedding
           |    mode: ivf
           |    trainer: kmeans
           |    centroids: 8
           |    dim: 64
           |    iters: 1
           |    nprobe: 2
           |    k: 5
           |    queries:
           |      path: $qDir
           |      qid_field: qid
           |      qvec_field: qvec
           |""".stripMargin
      graft.pipeline.PipelineCompiler.compile(
          graft.pipeline.RuleLoader.fromYaml(yaml))(emb).main
        .select(col("qid"), col("rank"), col("id"), col("sim"))
    },
    Some(ivfKmeansTopkSql))

  /** The incremental-index form of [[mAnnPipeline]] (the
    * [[mTrigramBackoffStore]] convention applied to ANN): the corpus
    * lands in an ingestable IVF index as two batches with a COMPACTION
    * between them and a post-fold replay of the folded batch —
    * exercising the r15 ledger (a batch whose `bid=` partition was
    * folded must still no-op) — and the `ann_topk index:` stage then
    * searches the store. The oracle is [[ivfKmeansTopkSql]] VERBATIM:
    * batch-wise ingestion and the fold are pure re-layouts, so
    * store-served top-k must be bit-identical to the one-shot search.
    */
  private val mAnnIngest = Spec("ml_ann_ingest",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val centroids = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = 8, dim = 64, iters = 1)
      val root = "/tmp/graft-ann-ingest-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // rebuild per run — the query owns the path
      val ipath = root + "/index"
      graft.ml.IvfIngest.create(s, ipath, centroids)
      graft.ml.IvfIngest.append(emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", ipath, "even")
      graft.ml.IvfIngest.compact(s, ipath) // folds "even" into the ledger
      graft.ml.IvfIngest.append(emb.filter(col("vec_id") % 2 =!= 0),
        "vec_id", "embedding", ipath, "odd")
      // replayed AFTER its partition was folded away: the marker's
      // ledger (not the gone directory) must make this a no-op
      graft.ml.IvfIngest.append(emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", ipath, "even")
      val qDir = root + "/queries"
      emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        .coalesce(1).write.mode("overwrite").parquet(qDir)
      val yaml =
        s"""pipeline:
           |  - type: ann_topk
           |    id_field: vec_id
           |    vec_field: embedding
           |    mode: ivf
           |    index:
           |      path: $ipath
           |    nprobe: 2
           |    k: 5
           |    queries:
           |      path: $qDir
           |      qid_field: qid
           |      qvec_field: qvec
           |""".stripMargin
      graft.pipeline.PipelineCompiler.compile(
          graft.pipeline.RuleLoader.fromYaml(yaml))(emb).main
        .select(col("qid"), col("rank"), col("id"), col("sim"))
    },
    Some(ivfKmeansTopkSql))

  // ======================================================================
  // Text analysis
  // ======================================================================

  private val mLangId = Spec("ml_lang_id",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_guess")),
    Some {
      val markers = TextAnalysis.langMarkers.toSeq.sortBy(_._1)
      val hits = markers.map { case (lang, ms) =>
        val lst = ms.map(m => s"'$m'").mkString("[", ",", "]")
        s"len(list_intersect(toks, $lst)) AS h_$lang"
      }.mkString(", ")
      // first-max-wins in (de, en, es, fr) order, 'und' when all zero
      s"""WITH tk AS (SELECT doc_id,
            regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents),
          h AS (SELECT doc_id, $hits FROM tk)
          SELECT doc_id, CASE
            WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
            WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
            WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
            WHEN h_es >= h_fr THEN 'es'
            ELSE 'fr' END AS lang_guess FROM h"""
    })

  /** Line-level language mix over constructed line structure: newline
    * every four words; every third doc gets a French marker line
    * appended, so the mixed flag genuinely fires and the majority vote
    * is exercised against minority lines.
    */
  private val mLangMix = Spec("ml_lang_mix",
    (s, dir) => {
      val lined = t(s, dir, "documents").withColumn("text",
        regexp_replace(col("text"), "((\\S+ ){4})", "$1\n"))
      val mixed = lined.withColumn("text",
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit("\nle la les et est dans")))
        .otherwise(col("text")))
      mixed.select(col("doc_id"), TextAnalysis.langMix(col("text")).as("m"))
        .select(col("doc_id"),
          col("m.n_lines").as("n_lines"),
          col("m.n_langs").as("n_langs"),
          col("m.main_lang").as("main_lang"),
          col("m.mixed").as("mixed"))
    },
    Some {
      val markers = TextAnalysis.langMarkers.toSeq.sortBy(_._1)
      val hits = markers.map { case (lang, ms) =>
        val lst = ms.map(m => s"'$m'").mkString("[", ",", "]")
        s"len(list_intersect(toks, $lst)) AS h_$lang"
      }.mkString(", ")
      val cnts = markers.map { case (lang, _) =>
        s"sum(CASE WHEN lang = '$lang' THEN 1 ELSE 0 END) AS c_$lang"
      }.mkString(", ")
      s"""WITH lined AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0
            THEN regexp_replace(text, '((\\S+ ){4})', '\\1'||chr(10), 'g')
              || chr(10) || 'le la les et est dans'
            ELSE regexp_replace(text, '((\\S+ ){4})', '\\1'||chr(10), 'g')
            END AS text FROM documents),
          ln AS (SELECT doc_id, trim(l) AS line
            FROM lined, unnest(string_split(text, chr(10))) AS u(l)
            WHERE trim(l) <> ''),
          tk AS (SELECT doc_id,
            regexp_split_to_array(lower(line), '\\s+') AS toks FROM ln),
          h AS (SELECT doc_id, $hits FROM tk),
          pl AS (SELECT doc_id, CASE
            WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
            WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
            WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
            WHEN h_es >= h_fr THEN 'es'
            ELSE 'fr' END AS lang FROM h),
          agg AS (SELECT doc_id, count(*) AS n_lines,
            count(DISTINCT CASE WHEN lang <> 'und' THEN lang END)
              AS n_langs, $cnts
            FROM pl GROUP BY doc_id)
          SELECT d.doc_id,
            CAST(coalesce(n_lines, 0) AS INT) AS n_lines,
            CAST(coalesce(n_langs, 0) AS INT) AS n_langs,
            coalesce(CASE
              WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
              WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
              WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
              WHEN c_es >= c_fr THEN 'es'
              ELSE 'fr' END, 'und') AS main_lang,
            CAST(coalesce(CAST(n_langs > 1 AS INT), 0) AS INT) AS mixed
          FROM documents d LEFT JOIN agg USING (doc_id)"""
    })

  /** DuckDB CTE chain through `q(doc_id, quality)` — the qualityScore
    * replica, shared by the score oracle and the budget-selection
    * oracle.
    */
  private def qualityCteSql: String = {
    val stopList = TextAnalysis.langMarkers.values.flatten.toSeq.distinct
      .map(m => s"'$m'").mkString("[", ",", "]")
    s"""WITH b AS (SELECT doc_id,
          CAST(length(text) AS DOUBLE) AS len,
          CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS ntok,
          CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS punct,
          CAST(len(list_intersect(regexp_split_to_array(lower(trim(text)), '\\s+'),
            $stopList)) AS DOUBLE) AS stop
          FROM documents),
        c AS (SELECT doc_id,
          least(len/500.0, 1.0) AS len_score,
          1.0 - least((CASE WHEN len > 0 THEN punct/len ELSE 0.0 END)*10.0, 1.0) AS punct_score,
          CASE WHEN ntok > 0 THEN least(stop/ntok*4.0, 1.0) ELSE 0.0 END AS stop_score,
          CASE WHEN (CASE WHEN ntok > 0 THEN (len-ntok+1)/ntok ELSE 0.0 END)
            BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END AS word_score
          FROM b),
        q AS (SELECT doc_id, round(len_score*0.3 + punct_score*0.2
          + stop_score*0.3 + word_score*0.2, 6) AS quality FROM c)"""
  }

  private val mQuality = Spec("ml_quality_score",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        ml.Dedup.tokens(lower(col("text"))).as("__wl"))
      .select(col("doc_id"),
        TextAnalysis.qualityScoreOf(col("text"), col("__wl")).as("quality")),
    Some(qualityCteSql + " SELECT doc_id, quality FROM q"))

  /** Exact quality-ranked budget cut: the oracle is the GLOBAL-sort
    * running sum the engine's banded two-phase plan must reproduce row
    * for row (keep iff strictly-better-ranked tokens < budget).
    */
  private val mQualityBudget = Spec("ml_quality_budget",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("__wl", ml.Dedup.tokens(lower(col("text"))))
        .withColumn("quality",
          TextAnalysis.qualityScoreOf(col("text"), col("__wl")))
      Curation.qualityBudgetSelect(d, "doc_id", "quality",
          size(ml.Dedup.tokens(col("text"))).cast("long"), budget = 1000L)
        .select(col("doc_id"), col("quality"), col("n_tokens"))
        .orderBy("doc_id")
    },
    Some(qualityCteSql + """,
       s AS (SELECT q.doc_id, quality,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_tokens
         FROM q JOIN documents USING (doc_id)),
       o AS (SELECT doc_id, quality, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cx
         FROM s)
       SELECT doc_id, quality, n_tokens FROM o WHERE cx < 1000
       ORDER BY doc_id"""))

  // Pretraining text cleanup: the query CONSTRUCTS messy text per row
  // (HTML wrapper, tab, entities including the &amp;lt; double-decode
  // trap, a combining-accent sequence NFC must compose, a BEL control
  // char, trailing spaces), the engine cleans it, and DuckDB predicts
  // the result through the same pipeline (nfc_normalize + replace
  // chain in the SAME order — &amp; last).
  private val mTextNormalize = Spec("ml_text_normalize",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val messy = concat(
        lit("<p class=\"x\">"), col("text"),
        lit("</p>\t&amp;lt; kept &lt;3 &quot;q&quot; e\u0301 \u0007 end  "))
      d.select(col("doc_id"),
        TextAnalysis.normalizeText(messy).as("clean"))
    },
    Some("""SELECT doc_id, trim(regexp_replace(nfc_normalize(
              replace(replace(replace(replace(replace(replace(replace(
                regexp_replace(regexp_replace(
                  '<p class="x">' || text || '</p>' || chr(9) ||
                  '&amp;lt; kept &lt;3 &quot;q&quot; e' || chr(769) ||
                  ' ' || chr(7) || ' end  ',
                  '<[^>]*>', ' ', 'g'),
                '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
              '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
              '&#39;', chr(39)), '&apos;', chr(39)), '&nbsp;', ' '),
              '&amp;', '&')),
              '\s+', ' ', 'g')) AS clean
            FROM documents"""))

  private val mTokenCount = Spec("ml_token_count",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).as("n_subwords")),
    Some("""SELECT doc_id,
            CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INT) AS n_tokens,
            CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS n_subwords
            FROM documents"""))

  // ======================================================================
  // Multimodal plumbing (stubbed decode, real Spark-side contract)
  // ======================================================================

  private val mMultimodal = Spec("ml_multimodal_decode",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "utf-8"))
      val env = Multimodal.withMediaEnvelope(d, col("payload"), "image/fake")
      val dec = Multimodal.decodeImages(env, "payload")
      dec.select(col("doc_id"),
        col("media.n_bytes").as("n_bytes"),
        col("media.content_id").as("content_id"),
        col("image_features.width").as("width"),
        col("image_features.height").as("height"),
        col("image_features.n_frames").as("n_frames"),
        round(col("image_features.mean_luma"), 6).as("mean_luma"))
    },
    Some("""SELECT doc_id,
            CAST(octet_length(encode(text)) AS INT) AS n_bytes,
            sha256(text) AS content_id,
            CAST(16 + octet_length(encode(text)) % 256 AS INT) AS width,
            CAST(16 + (octet_length(encode(text)) // 256) % 256 AS INT) AS height,
            CAST(1 AS INT) AS n_frames,
            round((octet_length(encode(text)) % 1000) / 1000.0, 6) AS mean_luma
            FROM documents"""))

  // Audio envelope round-trip: the query CONSTRUCTS a canonical PCM WAV
  // per row from deterministic parameters (expression-built bytes), the
  // REAL RIFF parser reads them back, and DuckDB predicts the fields
  // from the same parameters. The absolute byte layout is pinned
  // separately by golden bytes in MultimodalSpec — together the two
  // gates mean "the parser reads real WAV, and reads it correctly".
  // Image envelope round-trip: expression-built minimal PNG per row
  // (the wavBytes convention), REAL IHDR parser reads it back, DuckDB
  // predicts the fields from the same doc_id arithmetic.
  private val mMultimodalImage = Spec("ml_multimodal_image",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val w = (col("doc_id") % 512 + 1).cast("int")
      val h = ((col("doc_id") * 7) % 512 + 1).cast("int")
      val depth = element_at(array(lit(1), lit(2), lit(4), lit(8), lit(16)),
        (col("doc_id") % 5 + 1).cast("int"))
      val png = d.withColumn("payload", Multimodal.pngBytes(w, h, depth))
      Multimodal.decodeImages(png, "payload")
        .select(col("doc_id"),
          col("image_features.format").as("format"),
          col("image_features.width").as("width"),
          col("image_features.height").as("height"),
          col("image_features.bit_depth").as("bit_depth"),
          col("image_features.n_frames").as("n_frames"))
    },
    Some("""SELECT doc_id, 'png' AS format,
            CAST(doc_id % 512 + 1 AS INT) AS width,
            CAST((doc_id * 7) % 512 + 1 AS INT) AS height,
            CAST(([1, 2, 4, 8, 16])[CAST(doc_id % 5 + 1 AS INT)] AS INT)
              AS bit_depth,
            CAST(1 AS INT) AS n_frames
            FROM documents"""))

  /** Pixel-payload round-trip: expression-built DECODABLE PNGs (real
    * CRCs, stored-deflate scanlines, closed-form Adler-32 — see
    * [[graft.ml.Multimodal.pngPixelBytes]]) run through the real
    * `javax.imageio` decode in the kernel; the oracle predicts the
    * Rec.601 mean luma from the construction parameters alone. This is
    * the pixel FACT, not just the header — the last image-side stub is
    * gone.
    */
  private val mMultimodalPixels = Spec("ml_multimodal_pixels",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val w = (col("doc_id") % 24 + 1).cast("int")
      val h = ((col("doc_id") * 5) % 24 + 1).cast("int")
      val g = (col("doc_id") * 11 % 256).cast("int")
      val png = d.withColumn("payload", Multimodal.pngPixelBytes(w, h, g))
      Multimodal.decodeImages(png, "payload")
        .select(col("doc_id"),
          col("image_features.format").as("format"),
          col("image_features.width").as("width"),
          col("image_features.height").as("height"),
          col("image_features.mean_luma").as("mean_luma"))
    },
    Some("""SELECT doc_id, 'png' AS format,
            CAST(doc_id % 24 + 1 AS INT) AS width,
            CAST((doc_id * 5) % 24 + 1 AS INT) AS height,
            round(0.299 * (doc_id * 11 % 256)
                + 0.587 * (doc_id * 11 % 256)
                + 0.114 * (doc_id * 11 % 256), 6) AS mean_luma
            FROM documents"""))

  /** Shared DuckDB CTE chain `p(doc_id, b0, st)` → `hs(doc_id, bits)`:
    * the aHash of a 16×32 vertical-gradient PNG predicted purely from
    * the construction parameters (gray row y = (b0 + y·st) mod 256 ⇒
    * integer luma = the gray value exactly; 2-col × 4-row cells; bit
    * cy·8+cx ⇔ 64·cellSum > total; MSB-first 64-char bit string = the
    * engine's `lpad(bin(ahash), 64, '0')`).
    */
  private def aHashBitsSql(fromP: String, sfx: String = ""): String =
    fromP + s""",
       r$sfx AS (SELECT doc_id, y, (b0 + y*st) % 256 AS v
         FROM p$sfx, unnest(range(32)) AS u(y)),
       cells$sfx AS (SELECT doc_id, y // 4 AS cy, 2*sum(v) AS s
         FROM r$sfx GROUP BY doc_id, y // 4),
       tot$sfx AS (SELECT doc_id, 8*sum(s) AS total FROM cells$sfx
         GROUP BY doc_id),
       bits$sfx AS (SELECT j.doc_id, j.j,
           CASE WHEN 64*c.s > t.total THEN '1' ELSE '0' END AS ch
         FROM (SELECT doc_id, j, (63 - j) // 8 AS cy
           FROM p$sfx, unnest(range(64)) AS u(j)) j
         JOIN cells$sfx c ON c.doc_id = j.doc_id AND c.cy = j.cy
         JOIN tot$sfx t ON t.doc_id = j.doc_id),
       hs$sfx AS (SELECT doc_id, string_agg(ch, '' ORDER BY j) AS bits
         FROM bits$sfx GROUP BY doc_id)"""

  /** Full encode→decode→perceptual-hash round trip, oracle-predicted:
    * the engine BUILDS a real PNG per row (expression-side encoder),
    * decodes it with the JDK codec, and computes the exact-integer
    * aHash; DuckDB predicts the 64-bit fingerprint from the gradient
    * parameters alone.
    */
  private val mImageAHash = Spec("ml_image_ahash",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val png = d.withColumn("payload", Multimodal.pngGradientBytes(
        lit(16), lit(32), (col("doc_id") % 256).cast("int"),
        (col("doc_id") % 7 + 1).cast("int")))
      Multimodal.imageAHash(png, "payload")
        .select(col("doc_id"),
          lpad(bin(col("ahash")), 64, "0").as("ahash_bits"))
        .orderBy("doc_id")
    },
    Some(aHashBitsSql(
      """WITH p AS (SELECT doc_id, doc_id % 256 AS b0,
           doc_id % 7 + 1 AS st FROM documents)""") + """
       SELECT doc_id, bits AS ahash_bits FROM hs ORDER BY doc_id"""))

  /** Image near-dup decision surface: brightness-shifted copies of the
    * same gradient hash identically (the perceptual invariance), the
    * reversed gradient doesn't — hammingPairs over the decoded hashes,
    * oracle-checked against the predicted fingerprints (pigeonhole: at
    * maxHamming 3 < 4 bands the banded join is EXHAUSTIVE, so the
    * oracle's plain quadratic form is the same set).
    */
  private val mImageNearDup = Spec("ml_image_neardup",
    (s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 40)
      val png = d.withColumn("payload", Multimodal.pngGradientBytes(
        lit(16), lit(32), (lit(100) + col("doc_id") % 50).cast("int"),
        when(col("doc_id") % 2 === 0, lit(1)).otherwise(lit(255))
          .cast("int")))
      Dedup.hammingPairs(Multimodal.imageAHash(png, "payload"),
          "doc_id", "ahash", bands = 4, maxHamming = 3)
        .orderBy("a", "b")
    },
    Some(aHashBitsSql(
      """WITH p AS (SELECT doc_id, 100 + doc_id % 50 AS b0,
           CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 255 END AS st
         FROM documents WHERE doc_id < 40)""") + """
       SELECT l.doc_id AS a, r2.doc_id AS b
       FROM hs l JOIN hs r2 ON l.doc_id < r2.doc_id
       WHERE len(list_filter(range(64),
         i -> l.bits[i+1] <> r2.bits[i+1])) <= 3
       ORDER BY a, b"""))

  /** Real PCM SAMPLE decode, oracle-predicted: the engine builds a
    * sawtooth 8-bit mono WAV per row, reads the raw samples back
    * ([[Multimodal.parsePcm]] — exact integer sums, two divisions and
    * one IEEE sqrt at the end), and DuckDB predicts peak/mean/rms from
    * the sawtooth parameters alone.
    */
  private val mAudioPcm = Spec("ml_audio_pcm",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val wav = d.withColumn("payload", Multimodal.wavPcmBytes(
        lit(8000), (col("doc_id") % 50 + 50).cast("int"),
        (col("doc_id") % 256).cast("int"),
        (col("doc_id") % 5 + 1).cast("int")))
      Multimodal.decodePcm(wav, "payload")
        .select(col("doc_id"),
          col("pcm_features.n_vals").as("n_vals"),
          col("pcm_features.peak_abs").as("peak_abs"),
          col("pcm_features.mean_abs").as("mean_abs"),
          col("pcm_features.rms").as("rms"))
    },
    Some("""WITH p AS (SELECT doc_id, doc_id % 50 + 50 AS n,
              doc_id % 256 AS b0, doc_id % 5 + 1 AS st FROM documents),
            v AS (SELECT doc_id, abs((b0 + t*st) % 256 - 128) AS a
              FROM p, unnest(range(n)) AS u(t)),
            agg AS (SELECT doc_id, count(*) AS n_vals, max(a) AS peak_abs,
              round(sum(a)*1.0/count(*), 6) AS mean_abs,
              round(sqrt(sum(a*a)*1.0/count(*)), 6) AS rms
              FROM v GROUP BY doc_id)
            SELECT doc_id, n_vals, peak_abs, mean_abs, rms FROM p
            JOIN agg USING (doc_id)"""))

  /** Real FLAC SAMPLE decode, oracle-predicted: the engine encodes the
    * ml_audio_pcm sawtooth as a multi-frame FLAC per row (real
    * [[FlacCodec]] encoder), decodes it back through the full codec
    * path (frames, FIXED/CONSTANT subframes, Rice residuals, CRCs),
    * and the oracle predicts peak/mean/rms from the sawtooth parameters
    * alone — the SAME SQL as the WAV leg, because lossless
    * encode→decode must be the identity.
    */
  private val mAudioFlac = Spec("ml_audio_flac",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"),
          (col("doc_id") % 50 + 50).cast("int").as("__n"),
          (col("doc_id") % 256).cast("int").as("__b0"),
          (col("doc_id") % 5 + 1).cast("int").as("__st"))
      val flac = Multimodal.flacSawtoothBytes(d, "__n", "__b0", "__st",
        "payload")
      Multimodal.decodePcm(flac, "payload")
        .select(col("doc_id"),
          col("pcm_features.n_vals").as("n_vals"),
          col("pcm_features.peak_abs").as("peak_abs"),
          col("pcm_features.mean_abs").as("mean_abs"),
          col("pcm_features.rms").as("rms"))
    },
    Some("""WITH p AS (SELECT doc_id, doc_id % 50 + 50 AS n,
              doc_id % 256 AS b0, doc_id % 5 + 1 AS st FROM documents),
            v AS (SELECT doc_id, abs((b0 + t*st) % 256 - 128) AS a
              FROM p, unnest(range(n)) AS u(t)),
            agg AS (SELECT doc_id, count(*) AS n_vals, max(a) AS peak_abs,
              round(sum(a)*1.0/count(*), 6) AS mean_abs,
              round(sqrt(sum(a*a)*1.0/count(*)), 6) AS rms
              FROM v GROUP BY doc_id)
            SELECT doc_id, n_vals, peak_abs, mean_abs, rms FROM p
            JOIN agg USING (doc_id)"""))

  /** The COMPOSED multimodal curation recipe (the image counterpart of
    * ml_pretrain_recipe / ml_curation_pipeline): construct real PNG
    * payloads with deliberate perceptual-dup families → media_envelope
    * decode (real codec) → dedup_media (aHash + Hamming components) →
    * hash_split — one YAML pipeline end to end. The oracle replays the
    * ENTIRE chain: predicted fingerprints, the quadratic Hamming pairs
    * (exhaustive ≡ the banded plan at maxHamming < bands), the
    * recursive-CTE component closure, the min-id keep, the pixel fact,
    * and the split.
    */
  /** The media-recipe FIXTURE (expression-built PNG payloads) and the
    * recipe BODY, split so [[graft.Bench]] can stage the fixture to
    * parquet once per run and time decode→dedup→split from a scan —
    * production corpora arrive as stored bytes, so conflating the
    * oracle's PNG-encode (fixture construction) with the pipeline under
    * test misstated the recipe's cost (BASELINE.md r13 accounting
    * note). The oracle query composes both, unchanged.
    */
  def mediaRecipePayloads(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").filter(col("doc_id") < 60)
    // even ids: ascending gradients (any small step — monotone ⇒ one
    // shared fingerprint: the whole family collapses); odd ids: large
    // steps that WRAP mod 256 into per-step sawtooth patterns ⇒
    // several distinct perceptual identities survive
    d.withColumn("payload", Multimodal.pngGradientBytes(
      lit(16), lit(32), (lit(100) + col("doc_id") % 40).cast("int"),
      when(col("doc_id") % 2 === 0, lit(1) + col("doc_id") % 3)
        .otherwise(lit(200) + (col("doc_id") % 7) * 8)
        .cast("int")))
  }

  def mediaRecipeBody(png: DataFrame): DataFrame = {
    val yaml =
      """pipeline:
        |  - type: media_envelope
        |    bytes_field: payload
        |    kind: image
        |  - type: dedup_media
        |    id_field: doc_id
        |    bytes_field: payload
        |  - type: hash_split
        |    id_field: doc_id
        |    train_pct: 80
        |    valid_pct: 10
        |""".stripMargin
    graft.pipeline.PipelineCompiler.compile(
        graft.pipeline.RuleLoader.fromYaml(yaml))(png).main
      .select(col("doc_id"),
        col("image_features.format").as("format"),
        col("image_features.width").as("width"),
        col("image_features.height").as("height"),
        col("image_features.mean_luma").as("mean_luma"),
        col("split"))
      .orderBy("doc_id")
  }

  private val mMediaRecipe = Spec("ml_media_recipe",
    (s, dir) => mediaRecipeBody(mediaRecipePayloads(s, dir)),
    Some {
      val m = "CAST(16*sv AS DOUBLE)/512"
      aHashBitsSql(
        """WITH RECURSIVE p AS (SELECT doc_id, 100 + doc_id % 40 AS b0,
             CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 3
                  ELSE 200 + (doc_id % 7) * 8 END AS st
           FROM documents WHERE doc_id < 60)""") + s""",
         pairs AS (SELECT l.doc_id AS a, r2.doc_id AS b
           FROM hs l JOIN hs r2 ON l.doc_id < r2.doc_id
           WHERE len(list_filter(range(64),
             i -> l.bits[i+1] <> r2.bits[i+1])) <= 3),
         edges AS (SELECT a, b FROM pairs
           UNION SELECT b AS a, a AS b FROM pairs),
         reach AS (SELECT doc_id AS id, doc_id AS r FROM p
           UNION
           SELECT e.b AS id, reach.r AS r
           FROM reach JOIN edges e ON e.a = reach.id),
         roots AS (SELECT id, min(r) AS root FROM reach GROUP BY id),
         lum AS (SELECT doc_id, sum(v) AS sv FROM r GROUP BY doc_id)
         SELECT doc_id, 'png' AS format, 16 AS width, 32 AS height,
           round(0.299*($m) + 0.587*($m) + 0.114*($m), 6) AS mean_luma,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'validation'
                ELSE 'test' END AS split
         FROM (SELECT doc_id,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
               AS INTEGER) % 100 AS b
           FROM roots JOIN p ON p.doc_id = roots.id
           WHERE root = id) k
         JOIN lum USING (doc_id)
         ORDER BY doc_id"""
    })

  /** Perceptual AUDIO hash, oracle-predicted: frame-energy aHash of a
    * constructed sawtooth PCM clip — the construct→decode→hash round
    * trip for the audio column, DuckDB replaying frames, energies, and
    * the cross-multiplied threshold bit for bit.
    */
  private val mAudioAHash = Spec("ml_audio_ahash",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val wav = d.withColumn("payload", Multimodal.wavPcmBytes(
        lit(8000), (col("doc_id") % 64 + 128).cast("int"),
        (col("doc_id") % 256).cast("int"),
        (col("doc_id") % 9 + 1).cast("int")))
      Multimodal.audioAHash(wav, "payload")
        .select(col("doc_id"),
          lpad(bin(col("ahash")), 64, "0").as("ahash_bits"))
        .orderBy("doc_id")
    },
    Some("""WITH p AS (SELECT doc_id, doc_id % 64 + 128 AS n,
              doc_id % 256 AS b0, doc_id % 9 + 1 AS st FROM documents),
            v AS (SELECT doc_id, abs((b0 + t*st) % 256 - 128) AS a,
              t // (n // 64) AS f
              FROM p, unnest(range(n)) AS u(t)
              WHERE t < (n // 64) * 64),
            fr AS (SELECT doc_id, f, sum(a) AS s FROM v
              GROUP BY doc_id, f),
            tot AS (SELECT doc_id, sum(s) AS total FROM fr
              GROUP BY doc_id),
            bits AS (SELECT j.doc_id, j.j,
              CASE WHEN 64*fr.s > tot.total THEN '1' ELSE '0' END AS ch
              FROM (SELECT doc_id, j, 63 - j AS f
                FROM p, unnest(range(64)) AS u(j)) j
              JOIN fr ON fr.doc_id = j.doc_id AND fr.f = j.f
              JOIN tot ON tot.doc_id = j.doc_id)
            SELECT doc_id, string_agg(ch, '' ORDER BY j) AS ahash_bits
            FROM bits GROUP BY doc_id ORDER BY doc_id"""))

  /** The against leg of media dedup: incoming images vs a reference
    * image corpus — the reference's ascending family matches every
    * incoming ascending gradient (shared fingerprint), sawtooth
    * families survive unless the replayed Hamming match says otherwise.
    */
  private val mMediaAgainst = Spec("ml_media_against",
    (s, dir) => {
      val d = t(s, dir, "documents")
      def grad(base: Column, step: Column) =
        Multimodal.pngGradientBytes(lit(16), lit(32), base.cast("int"),
          step.cast("int"))
      val incoming = d.filter(col("doc_id") < 40)
        .withColumn("payload", grad(lit(100) + col("doc_id") % 40,
          when(col("doc_id") % 2 === 0, lit(1))
            .otherwise(lit(200) + (col("doc_id") % 7) * 8)))
      val ref = d.filter(col("doc_id") >= 100 && col("doc_id") < 105)
        .withColumn("payload", grad(lit(50) + col("doc_id") % 20, lit(2)))
      val incHashed = Multimodal.imageAHash(
        incoming.select(col("doc_id"), col("payload")), "payload", "fp")
      val refHashed = Multimodal.imageAHash(
        ref.select(col("doc_id"), col("payload")), "payload", "fp")
      Dedup.hammingAgainst(incHashed, refHashed, "doc_id", "fp",
          bands = 4, maxHamming = 3)
        .select(col("doc_id")).orderBy("doc_id")
    },
    Some(aHashBitsSql(
      """WITH p AS (SELECT doc_id, 100 + doc_id % 40 AS b0,
           CASE WHEN doc_id % 2 = 0 THEN 1
                ELSE 200 + (doc_id % 7) * 8 END AS st
         FROM documents WHERE doc_id < 40)""") +
      aHashBitsSql(
        """, p2 AS (SELECT doc_id, 50 + doc_id % 20 AS b0, 2 AS st
           FROM documents WHERE doc_id >= 100 AND doc_id < 105)""",
        "2") + """,
       m AS (SELECT DISTINCT l.doc_id FROM hs l, hs2 r2
         WHERE len(list_filter(range(64),
           k -> l.bits[k+1] <> r2.bits[k+1])) <= 3)
       SELECT doc_id FROM hs
       WHERE doc_id NOT IN (SELECT doc_id FROM m)
       ORDER BY doc_id"""))

  private val mMultimodalAudio = Spec("ml_multimodal_audio",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val rate = (lit(8000) * (col("doc_id") % 4 + 1)).cast("int")
      val ch = (col("doc_id") % 2 + 1).cast("int")
      val bits = (lit(8) * (col("doc_id") % 2 + 1)).cast("int")
      val n = (col("doc_id") % 40 + 1).cast("int")
      val wav = d.withColumn("payload",
        Multimodal.wavBytes(rate, ch, bits, n))
      Multimodal.decodeAudio(wav, "payload")
        .select(col("doc_id"),
          col("audio_features.format").as("format"),
          col("audio_features.sample_rate").as("sample_rate"),
          col("audio_features.channels").as("channels"),
          col("audio_features.bits_per_sample").as("bits_per_sample"),
          col("audio_features.n_samples").as("n_samples"),
          col("audio_features.duration_ms").as("duration_ms"))
    },
    Some("""SELECT doc_id, 'wav' AS format,
            CAST(8000 * (doc_id % 4 + 1) AS INT) AS sample_rate,
            CAST(doc_id % 2 + 1 AS INT) AS channels,
            CAST(8 * (doc_id % 2 + 1) AS INT) AS bits_per_sample,
            CAST(doc_id % 40 + 1 AS BIGINT) AS n_samples,
            CAST((doc_id % 40 + 1) * 1000 // (8000 * (doc_id % 4 + 1))
              AS BIGINT) AS duration_ms
            FROM documents"""))

  // Document envelope round-trip: expression-built PDF-shaped bytes
  // (version header + n `/Type /Page` objects + a `/Type /Pages` tree
  // node the exact-token scan must NOT count), real byte-scan parser.
  private val mMultimodalPdf = Spec("ml_multimodal_pdf",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val ver = concat(lit("1."), (col("doc_id") % 4 + 3).cast("string"))
      val pages = (col("doc_id") % 7 + 1).cast("int")
      val body = concat(
        lit("%PDF-"), ver, lit("\n1 0 obj <</Type /Pages>> endobj\n"),
        array_join(transform(sequence(lit(1), pages),
          i => concat((i + 1).cast("string"),
            lit(" 0 obj <</Type /Page>> endobj\n"))), ""))
      val pdf = d.withColumn("payload", encode(body, "utf-8"))
      Multimodal.decodeDocs(pdf, "payload")
        .select(col("doc_id"),
          col("doc_features.format").as("format"),
          col("doc_features.version").as("version"),
          col("doc_features.n_pages").as("n_pages"),
          col("doc_features.n_bytes").as("n_bytes"))
    },
    Some("""SELECT doc_id, 'pdf' AS format,
            '1.' || CAST(doc_id % 4 + 3 AS VARCHAR) AS version,
            CAST(doc_id % 7 + 1 AS INT) AS n_pages,
            CAST(octet_length(encode(
              '%PDF-1.' || CAST(doc_id % 4 + 3 AS VARCHAR)
              || chr(10) || '1 0 obj <</Type /Pages>> endobj' || chr(10)
              || list_aggr(list_transform(range(1, CAST(doc_id % 7 + 2 AS INT)),
                   i -> CAST(i + 1 AS VARCHAR)
                        || ' 0 obj <</Type /Page>> endobj' || chr(10)),
                 'string_agg', '')
            )) AS INT) AS n_bytes
            FROM documents"""))

  // Video envelope round-trip: expression-built minimal MP4 (ftyp +
  // moov/mvhd/trak/tkhd/mdia/hdlr), real ISO-BMFF box-walk parser, and
  // the frame-sampling plumbing exercised on the parsed duration.
  // DuckDB predicts every field from the same parameters; the absolute
  // box layout (and parsing of realistic files with sibling boxes the
  // builder does not emit) is pinned by golden bytes in MultimodalSpec.
  private val mMultimodalVideo = Spec("ml_multimodal_video",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val ts = (lit(1000) * (col("doc_id") % 3 + 1)).cast("int")
      val dur = (col("doc_id") % 5000 + 100).cast("int")
      val w = (lit(160) * (col("doc_id") % 8 + 2)).cast("int")
      val h = (lit(120) * (col("doc_id") % 8 + 2)).cast("int")
      val mp4 = d.withColumn("payload", Multimodal.mp4Bytes(ts, dur, w, h))
      val dec = Multimodal.decodeVideo(mp4, "payload")
      // frame-sample plumbing: 30 fps assumed, every 10th frame, max 5
      val nFrames = (col("video_features.duration_ms") * 30 / 1000)
        .cast("int")
      dec.select(col("doc_id"),
        col("video_features.format").as("format"),
        col("video_features.brand").as("brand"),
        col("video_features.timescale").as("timescale"),
        col("video_features.duration_ms").as("duration_ms"),
        col("video_features.n_tracks").as("n_tracks"),
        col("video_features.width").as("width"),
        col("video_features.height").as("height"),
        array_join(Multimodal.sampleFrameIndices(nFrames, 10, 5)
          .cast("array<string>"), ",").as("frame_sample"))
    },
    Some("""WITH p AS (SELECT doc_id,
              CAST(1000 * (doc_id % 3 + 1) AS INT) AS timescale,
              (doc_id % 5000 + 100) AS dur,
              CAST(160 * (doc_id % 8 + 2) AS INT) AS width,
              CAST(120 * (doc_id % 8 + 2) AS INT) AS height
            FROM documents),
            m AS (SELECT *, CAST(dur * 1000 // timescale AS BIGINT)
              AS duration_ms FROM p),
            f AS (SELECT *, CAST(duration_ms * 30 // 1000 AS INT) AS nf
              FROM m)
            SELECT doc_id, 'mp4' AS format, 'isom' AS brand, timescale,
              duration_ms, CAST(1 AS INT) AS n_tracks, width, height,
              list_aggr(list_transform(
                list_slice(range(0, greatest(nf - 1, 0) + 1, 10), 1, 5),
                x -> CAST(x AS VARCHAR)), 'string_agg', ',') AS frame_sample
            FROM f"""))

  // ----------------------------------------------------------------------
  // corpus curation: repetition quality signals, deterministic splits,
  // stratified sampling (ml/Curation.scala)
  // ----------------------------------------------------------------------

  private val mRepetition = Spec("ml_repetition",
    (s, dir) => {
      val d = t(s, dir, "documents")
      // the token array stages ONCE per row; the three signals read it
      // (the per-signal split was most of the query's cost, PLANS.md r6)
      d.select(col("doc_id"), Curation.words(col("text")).as("__w"))
        .select(col("doc_id"),
          round(Curation.dupWordFracOf(col("__w")), 6).as("dup_word_frac"),
          round(Curation.dupBigramFracOf(col("__w")), 6).as("dup_bigram_frac"),
          round(Curation.topWordFracOf(col("__w")), 6).as("top_word_frac"))
    },
    Some("""WITH w AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM documents)
            SELECT doc_id,
              round(CASE WHEN len(w) = 0 THEN 0
                ELSE 1.0 - 1.0*len(list_distinct(w))/len(w) END, 6)
                AS dup_word_frac,
              round(CASE WHEN len(w) < 2 THEN 0
                ELSE 1.0 - 1.0*len(list_distinct(list_transform(
                  list_zip(w[1:len(w)-1], w[2:len(w)]),
                  x -> x[1] || ' ' || x[2])))/(len(w)-1) END, 6)
                AS dup_bigram_frac,
              round(CASE WHEN len(w) = 0 THEN 0
                ELSE 1.0*list_max(list_transform(list_distinct(w),
                  u -> len(list_filter(w, x -> x = u))))/len(w) END, 6)
                AS top_word_frac
            FROM w"""))

  private val mHashSplit = Spec("ml_hash_split",
    (s, dir) => t(s, dir, "documents").select(col("doc_id"),
      Curation.hashSplit(col("doc_id"), 80, 10).as("split")),
    Some("""SELECT doc_id,
              CASE WHEN b < 80 THEN 'train'
                   WHEN b < 90 THEN 'validation'
                   ELSE 'test' END AS split
            FROM (SELECT doc_id,
              CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                AS INTEGER) % 100 AS b FROM documents)"""))

  private val mStratified = Spec("ml_stratified_sample",
    (s, dir) => Curation.stratifiedSample(
        t(s, dir, "documents"), Seq("lang"), "doc_id", 50)
      .select("doc_id", "lang"),
    Some("""SELECT doc_id, lang FROM (
              SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
              FROM documents) WHERE r <= 50"""))

  // ----------------------------------------------------------------------
  // corpus statistics: n-gram frequency, benchmark contamination, token
  // document-frequency rarity (ml/CorpusStats.scala) — round 7
  // ----------------------------------------------------------------------

  private val mNgramTopK = Spec("ml_ngram_topk",
    (s, dir) => CorpusStats.ngramTopK(t(s, dir, "documents"), "text",
      n = 2, k = 20),
    Some("""WITH w AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
              FROM documents),
            g AS (SELECT unnest(list_transform(range(len(w)-1),
                i -> w[i+1]||' '||w[i+2])) AS ngram
              FROM w WHERE len(w) >= 2)
            SELECT ngram, count(*) AS cnt FROM g GROUP BY ngram
            ORDER BY cnt DESC, ngram ASC LIMIT 20"""))

  private val mZipfFit = Spec("ml_zipf_fit",
    (s, dir) => CorpusStats.zipfFit(t(s, dir, "documents"), "text",
      topN = 100),
    Some("""WITH w AS (SELECT list_filter(string_split(text, ' '),
              x -> x <> '') AS w FROM documents),
            tok AS (SELECT unnest(w) AS t FROM w),
            tc AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
            tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
              count(*) AS n_types FROM tc),
            top AS (SELECT c, row_number() OVER (ORDER BY c DESC, t ASC)
                AS r FROM tc QUALIFY r <= 100),
            xy AS (SELECT ln(CAST(r AS DOUBLE)) AS x,
              ln(CAST(c AS DOUBLE)) AS y FROM top),
            fit AS (SELECT (avg(x*y) - avg(x)*avg(y))
                / (avg(x*x) - avg(x)*avg(x)) AS slope,
              avg(x) AS mx, avg(y) AS my FROM xy)
            SELECT n_tokens, n_types, round(slope, 6) AS zipf_slope,
              round(my - slope*mx, 6) AS zipf_intercept
            FROM tot CROSS JOIN fit"""))

  private val mContamination = Spec("ml_contamination",
    (s, dir) => {
      // benchmark = every 53rd doc (an eval set drawn from the corpus
      // distribution); corpus = the rest; same ≥3-token contract as the
      // MinHash family
      val d = t(s, dir, "documents")
        .filter(size(Dedup.tokens(col("text"))) >= 3)
      val bench = d.filter(col("doc_id") % 53 === 0)
      val corpus = d.filter(col("doc_id") % 53 =!= 0)
      CorpusStats.contamination(corpus, "doc_id", "text", bench, "text",
        k = 3, threshold = 0.05)
    },
    Some(shinglesCte + """,
         bsh AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 53 = 0),
         corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 53 <> 0),
         ex AS (SELECT doc_id, unnest(s) AS g FROM corpus),
         shared AS (SELECT ex.doc_id, count(*) AS n_shared
           FROM ex JOIN bsh USING (g) GROUP BY ex.doc_id)
         SELECT c.doc_id, CAST(len(c.s) AS BIGINT) AS n_shingles,
           coalesce(n_shared, 0) AS n_shared,
           round(coalesce(n_shared, 0)*1.0/len(c.s), 6) AS overlap_frac,
           CAST(round(coalesce(n_shared, 0)*1.0/len(c.s), 6) >= 0.05 AS INT)
             AS contaminated
         FROM corpus c LEFT JOIN shared USING (doc_id)"""))

  private val mDocFreq = Spec("ml_doc_freq",
    (s, dir) => CorpusStats.docFreqStats(t(s, dir, "documents"),
      "doc_id", "text"),
    Some("""WITH dt AS (SELECT doc_id,
              unnest(list_distinct(list_filter(string_split(text, ' '),
                x -> x <> ''))) AS t FROM documents),
            dfreq AS (SELECT t, count(*) AS df FROM dt GROUP BY t),
            stats AS (SELECT doc_id, count(*) AS n_distinct,
                min(df) AS min_df, sum(df) AS sum_df
              FROM dt JOIN dfreq USING (t) GROUP BY doc_id)
            SELECT d.doc_id, coalesce(n_distinct, 0) AS n_distinct,
              coalesce(min_df, 0) AS min_df,
              coalesce(round(CAST(sum_df AS DOUBLE)/n_distinct, 6), 0.0) AS avg_df
            FROM documents d LEFT JOIN stats USING (doc_id)"""))

  private val mPackChunks = Spec("ml_pack_chunks",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("tok"))
      Curation.packChunks(d, "doc_id", col("tok"), ctxLen = 512, buckets = 16)
    },
    // the sequential window cumsum verifies the engine's DISTRIBUTED
    // prefix sum (bucket totals + within-bucket window) integer-exactly
    Some("""WITH b AS (SELECT doc_id,
              CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS tok
              FROM documents),
            o AS (SELECT doc_id, tok,
              CAST(coalesce(sum(tok) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                AS tok_offset FROM b)
            SELECT doc_id, tok AS n_tokens, tok_offset,
              tok_offset // 512 AS first_chunk,
              (tok_offset + greatest(tok, 1) - 1) // 512 AS last_chunk,
              CASE WHEN tok = 0 THEN CAST(0 AS BIGINT)
                ELSE (tok_offset + tok - 1) // 512 - tok_offset // 512 + 1 END
                AS n_chunks
            FROM o"""))

  /** Luhn-validated card redaction: the query constructs a card line per
    * doc — valid check digit on even ids, broken on odd, separator style
    * cycling dash/space/none — so the gate proves the CHECKSUM decides
    * (a shape-only regex would redact both parities). The oracle replays
    * the candidate extraction, the Luhn fold, and the span-anchored
    * split-splice reassembly.
    */
  private val mPiiCards = Spec("ml_pii_cards",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val sep = when(col("doc_id") % 3 === 0, lit("-"))
        .when(col("doc_id") % 3 === 1, lit(" ")).otherwise(lit(""))
      val ck = when(col("doc_id") % 2 === 0, lit("1")).otherwise(lit("2"))
      val line = concat(lit("order "), col("doc_id").cast("string"),
        lit(" pay 4111"), sep, lit("1111"), sep, lit("1111"), sep,
        lit("111"), ck, lit(" thanks"))
      d.select(col("doc_id"), TextAnalysis.redactCards(line).as("clean"))
    },
    Some {
      val dg = "regexp_replace(x, '[^0-9]', '', 'g')"
      val digit = s"CAST($dg[len($dg)-i+1] AS INT)"
      s"""WITH p AS (SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN '-'
                 WHEN doc_id % 3 = 1 THEN ' ' ELSE '' END AS sep,
            CASE WHEN doc_id % 2 = 0 THEN '1' ELSE '2' END AS ck
            FROM documents),
          l AS (SELECT doc_id, 'order ' || CAST(doc_id AS VARCHAR)
            || ' pay 4111' || sep || '1111' || sep || '1111' || sep
            || '111' || ck || ' thanks' AS line FROM p),
          c AS (SELECT doc_id, line,
            regexp_split_to_array(line,
              '\\d(?:[ -]?\\d){12,18}') AS parts,
            list_transform(regexp_extract_all(line,
              '\\d(?:[ -]?\\d){12,18}'), x ->
              CASE WHEN list_aggregate(list_transform(
                  range(1, len($dg)+1),
                  i -> CASE WHEN i % 2 = 0 THEN
                         CASE WHEN 2*$digit > 9 THEN 2*$digit - 9
                              ELSE 2*$digit END
                       ELSE $digit END), 'sum') % 10 = 0
                THEN '<CARD>' ELSE x END) AS reps FROM l)
          SELECT doc_id, parts[1] || coalesce(array_to_string(
              list_transform(range(1, len(reps)+1),
                i -> reps[i] || parts[i+1]), ''), '') AS clean
          FROM c"""
    })

  private val mPiiRedact = Spec("ml_pii_redact",
    (s, dir) => {
      // the synthetic corpus carries no PII, so the query CONSTRUCTS a
      // deterministic contact line from events columns (identically in
      // both engines) and redacts it — the gate proves the redaction
      // fires, not just that clean text passes through
      val e = t(s, dir, "events")
      val contact = concat(lit("user"), col("user_id").cast("string"),
        lit("@example.com via 10.0."), (col("user_id") % 256).cast("string"),
        lit(".7 or call +49 151 "),
        (col("event_id") % 9000000 + 1000000).cast("string"),
        lit(" re "), col("event_type"))
      e.select(col("event_id"),
        TextAnalysis.redactPii(contact).as("clean"))
    },
    Some("""SELECT event_id,
            regexp_replace(regexp_replace(regexp_replace(
              'user' || CAST(user_id AS VARCHAR) || '@example.com via 10.0.'
                || CAST(user_id % 256 AS VARCHAR) || '.7 or call +49 151 '
                || CAST(event_id % 9000000 + 1000000 AS VARCHAR)
                || ' re ' || event_type,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
              '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
              '[+(]?\d[\d\s().-]{5,}\d', '<PHONE>', 'g') AS clean
            FROM events"""))

  private val mUnigramLP = Spec("ml_unigram_logprob",
    (s, dir) => CorpusStats.unigramLogProb(t(s, dir, "documents"),
      "doc_id", "text"),
    Some("""WITH tok AS (SELECT doc_id,
              unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
              FROM documents),
            cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
            n AS (SELECT sum(c) AS n FROM cnt),
            per AS (SELECT doc_id, count(*) AS n_tokens,
              round(avg(ln(c) - ln(n)), 6) AS avg_logprob
              FROM tok JOIN cnt USING (t) CROSS JOIN n GROUP BY doc_id)
            SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
              coalesce(avg_logprob, 0.0) AS avg_logprob
            FROM documents d LEFT JOIN per USING (doc_id)"""))

  private val mDupNgrams = Spec("ml_dup_ngrams",
    (s, dir) => CorpusStats.dupNgramStats(t(s, dir, "documents"),
      "doc_id", "text", n = 3),
    Some("""WITH w AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
              FROM documents),
            dg AS (SELECT doc_id, unnest(list_distinct(list_transform(
                range(len(w)-2), i -> w[i+1]||' '||w[i+2]||' '||w[i+3]))) AS g
              FROM w WHERE len(w) >= 3),
            gc AS (SELECT g, count(*) AS docs FROM dg GROUP BY g),
            per AS (SELECT doc_id, count(*) AS n_grams,
              CAST(sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
              FROM dg JOIN gc USING (g) GROUP BY doc_id)
            SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
              coalesce(n_dup, 0) AS n_dup,
              coalesce(round(n_dup*1.0/n_grams, 6), 0.0) AS dup_frac
            FROM documents d LEFT JOIN per USING (doc_id)"""))

  // Exact-substring dedup (Lee et al. 2022): positional spans + removal.
  // The oracle recomputes the covered-position islands with window
  // functions — an independent formulation of the same semantics.
  private val mDupSpans = Spec("ml_dup_spans",
    (s, dir) => Dedup.dupSpans(t(s, dir, "documents"),
      "doc_id", "text", k = 8),
    Some("""WITH w AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
              FROM documents),
            g AS (SELECT doc_id, i AS p,
                md5(array_to_string(w[i+1:i+8], ' ')) AS g
              FROM w, unnest(range(len(w)-7)) AS u(i) WHERE len(w) >= 8),
            dup AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
            occ AS (SELECT doc_id, p FROM g JOIN dup USING (g)),
            b AS (SELECT doc_id, p, CASE WHEN p >
                lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 8
                THEN 1 ELSE 0 END AS brk FROM occ),
            isl AS (SELECT doc_id, p, sum(brk)
                OVER (PARTITION BY doc_id ORDER BY p) AS island FROM b)
            SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
              CAST(max(p) + 8 AS BIGINT) AS span_end
            FROM isl GROUP BY doc_id, island"""))

  private val mDupSpansClean = Spec("ml_dup_spans_clean",
    (s, dir) => Dedup.removeDupSpans(t(s, dir, "documents"),
        "doc_id", "text", k = 8)
      .select(col("doc_id"), col("text")),
    Some("""WITH w AS (SELECT doc_id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
              FROM documents),
            g AS (SELECT doc_id, i AS p,
                md5(array_to_string(w[i+1:i+8], ' ')) AS g
              FROM w, unnest(range(len(w)-7)) AS u(i) WHERE len(w) >= 8),
            dup AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
            occ AS (SELECT doc_id, p FROM g JOIN dup USING (g)),
            cover AS (SELECT DISTINCT occ.doc_id, u.pp AS p
              FROM occ, unnest(range(occ.p, occ.p + 8)) AS u(pp)),
            toks AS (SELECT doc_id, unnest(w) AS word,
              generate_subscripts(w, 1) - 1 AS p FROM w),
            kept AS (SELECT t.doc_id, t.word, t.p FROM toks t
              LEFT JOIN cover c ON t.doc_id = c.doc_id AND t.p = c.p
              WHERE c.doc_id IS NULL),
            cleaned AS (SELECT doc_id,
              string_agg(word, ' ' ORDER BY p) AS text
              FROM kept GROUP BY doc_id)
            SELECT d.doc_id,
              CASE WHEN d.doc_id IN (SELECT DISTINCT doc_id FROM occ)
                   THEN coalesce(cl.text, '') ELSE d.text END AS text
            FROM documents d LEFT JOIN cleaned cl USING (doc_id)"""))

  // Semantic dedup (SemDeDup): cluster on the first-8 deterministic
  // centroids (the mIvf convention), drop rows with a senior in-cluster
  // neighbor at cosine ≥ 0.35. The oracle recomputes assignment and the
  // greedy min-id sweep with window functions + EXISTS.
  private val mSemanticKeep = Spec("ml_semantic_keep",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .orderBy("vec_id").collect()
        .map(r => r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toSeq)
        .toSeq
      Similarity.semanticKeep(emb, "vec_id", "embedding",
          centroids, threshold = 0.35)
        .select(col("vec_id"))
    },
    Some {
      val cosAssign = cosSql("e.embedding", "c.embedding")
      val cosPair = cosSql("x.embedding", "y.embedding")
      s"""WITH c AS (SELECT vec_id AS cid, embedding FROM embeddings
            WHERE vec_id < 8),
          assign AS (
            SELECT vec_id, cid AS bucket FROM (
              SELECT e.vec_id, c.cid, row_number() OVER (
                PARTITION BY e.vec_id ORDER BY $cosAssign DESC, c.cid ASC) AS rn
              FROM embeddings e CROSS JOIN c) WHERE rn = 1),
          ea AS (SELECT e.vec_id, e.embedding, a.bucket
            FROM embeddings e JOIN assign a USING (vec_id))
          SELECT x.vec_id FROM ea x
          WHERE NOT EXISTS (
            SELECT 1 FROM ea y
            WHERE y.bucket = x.bucket AND y.vec_id < x.vec_id
              AND round($cosPair, 6) >= 0.35)"""
    })

  private val mEmbedOutlier = Spec("ml_embed_outlier",
    (s, dir) => Similarity.centroidOutliers(t(s, dir, "embeddings"),
      "vec_id", "embedding", zThresh = 2.0),
    Some("""WITH u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
              generate_subscripts(embedding, 1) AS i FROM embeddings),
            c AS (SELECT i, avg(v) AS m FROM u GROUP BY i),
            d AS (SELECT vec_id, round(sqrt(sum((v-m)*(v-m))), 6) AS dist
              FROM u JOIN c USING (i) GROUP BY vec_id),
            st AS (SELECT avg(dist) AS mu, stddev_pop(dist) AS sd FROM d)
            SELECT vec_id, dist,
              CASE WHEN sd > 0 THEN round((dist-mu)/sd, 4)
                   ELSE 0.0 END AS z,
              CAST(CASE WHEN sd > 0 THEN round((dist-mu)/sd, 4)
                        ELSE 0.0 END > 2.0 AS INT) AS is_outlier
            FROM d CROSS JOIN st"""))

  private val mWeightedSample = Spec("ml_weighted_sample",
    (s, dir) => Curation.weightedSample(t(s, dir, "documents"),
        "doc_id", "source",
        rates = Map("src0" -> 0.2, "src1" -> 0.5, "src2" -> 0.8),
        defaultRate = 0.65)
      .select(col("doc_id"), col("source")),
    Some("""SELECT doc_id, source FROM (SELECT doc_id, source,
              CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                AS INTEGER) % 10000 AS b FROM documents)
            WHERE b < CASE source WHEN 'src0' THEN 2000 WHEN 'src1' THEN 5000
              WHEN 'src2' THEN 8000 ELSE 6500 END"""))

  /** mT5 temperature mixing: rates derive from per-stratum counts both
    * engines compute (identical formula, identical parenthesization;
    * the integer cut quantization absorbs z's sum-order ulp noise),
    * keep/drop is the content-addressed hashBucket convention.
    */
  private val mTemperature = Spec("ml_temperature_sample",
    (s, dir) => Curation.temperatureSample(t(s, dir, "documents"),
        "doc_id", "source", alpha = 0.3, fraction = 0.5)
      .select(col("doc_id"), col("source")),
    Some("""WITH cnt AS (SELECT source AS s, CAST(count(*) AS DOUBLE) AS n
              FROM documents WHERE source IS NOT NULL GROUP BY source),
            tot AS (SELECT CAST(sum(CAST(n AS BIGINT)) AS DOUBLE) AS totn,
                sum(pow(n, 0.3)) AS z FROM cnt),
            cut AS (SELECT s, CAST(round(least(1.0,
                0.5 * totn * (pow(n, 0.3) / z) / n) * 10000) AS INTEGER) AS c
              FROM cnt CROSS JOIN tot)
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                  AS INTEGER) % 10000 AS b
              FROM documents) d JOIN cut ON cut.s = d.source
            WHERE b < c"""))

  // Token-budget mixture sampling: rates derive from per-stratum token
  // totals BOTH engines compute from the data (min(1, budget/total),
  // IEEE division + the same half-up rounding to 1/10000), keep/drop is
  // the content-addressed hashBucket convention.
  private val mTokenBudget = Spec("ml_token_budget_sample",
    (s, dir) => Curation.tokenBudgetSample(t(s, dir, "documents"),
        "doc_id", "text", "source",
        budgets = Map("src0" -> 3000L, "src1" -> 6000L),
        defaultBudget = 9000L)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        round(col("mix_rate"), 6).as("mix_rate")),
    Some("""WITH t AS (SELECT doc_id, CAST(source AS VARCHAR) AS source,
              CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                AS INT) AS n_tokens
              FROM documents),
            tot AS (SELECT source, SUM(n_tokens) AS total
              FROM t GROUP BY source),
            r AS (SELECT source,
              CAST(round(least(1.0,
                (CASE source WHEN 'src0' THEN 3000 WHEN 'src1' THEN 6000
                 ELSE 9000 END) / CAST(total AS DOUBLE)) * 10000) AS INT)
                AS cut
              FROM tot)
            SELECT t.doc_id, t.source, t.n_tokens,
              round(CAST(cut AS DOUBLE) / 10000, 6) AS mix_rate
            FROM t JOIN r USING (source)
            WHERE CAST(concat('0x', substr(md5(CAST(t.doc_id AS VARCHAR)),
              1, 4)) AS INTEGER) % 10000 < cut"""))

  /** Deterministic PQ codebooks for the oracle-gated ENCODE step (small
    * exact rationals — quarters — so distances are identical across
    * engines and argmin ties are structurally impossible on real data).
    * Training itself is float-iterative → spec-gated (PqSpec), like
    * k-means.
    */
  private val pqM = 8
  private val pqK = 16
  private val pqSubdim = 8 // embeddings are 64-dim
  private def pqBook(j: Int): Seq[Seq[Double]] =
    (0 until pqK).map(c => (0 until pqSubdim).map(d =>
      ((c * 31 + d * 17 + j * 7) % 13 - 6) / 4.0))

  private val mPqEncode = Spec("ml_embed_pq_encode",
    (s, dir) => {
      val books = (0 until pqM).map(pqBook)
      // stage the codes array ONCE: building pqEncode inside each
      // getItem(j) would inline the full m×k×subdim literal tree m
      // times (CollapseProject keeps a non-cheap multi-referenced
      // alias staged)
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          Similarity.pqEncode(col("embedding"), books).as("__codes"))
        .select(col("vec_id"),
          concat_ws(",", (0 until pqM).map(j =>
            col("__codes").getItem(j)): _*).as("codes"))
    },
    Some {
      // per-distance SQL is an index-ordered LEFT FOLD (0.0 + t0) + t1 …
      // — the same operation order as the engine's aggregate(zip_with)
      // kernel, so the doubles match bitwise and argmin cannot flip
      def codeSql(j: Int): String = {
        val dists = (0 until pqK).map(c =>
          (0 until pqSubdim).foldLeft("0.0") { (acc, d) =>
            val cb = pqBook(j)(c)(d)
            val v = s"CAST(embedding[${j * pqSubdim + d + 1}] AS DOUBLE)"
            s"($acc + ($v - ($cb))*($v - ($cb)))"
          }).mkString(", ")
        s"CAST(list_position([$dists], list_min([$dists])) - 1 AS VARCHAR)"
      }
      "SELECT vec_id, " + (0 until pqM).map(codeSql)
        .mkString(" || ',' || ") + " AS codes FROM embeddings"
    })

  /** Hashed-BoW featurization + linear margin with FIXED weights — the
    * deterministic slice of the trainable classifier ([[Classifier]]):
    * every operation (md5 bucket, count, /norm with IEEE sqrt, the
    * index-ordered dot fold) is exactly rounded, so the oracle matches
    * bitwise; only the sigmoid (library `exp`) stays convergence-gated.
    * SQL is generated from the same dim/weights.
    */
  private val clfDim = 8
  private def clfW(i: Int): Double = (i * 3 % 7 - 3) / 2.0

  private val mClassifierMargin = Spec("ml_classifier_margin",
    (s, dir) => {
      val w = (0 to clfDim).map(clfW)
      // + 0.0 after rounding: IEEE −0.0 + 0.0 = +0.0, so a signed-zero
      // margin prints identically in both engines (Catalyst does NOT
      // fold double +0.0 — it isn't an identity for −0.0, which is the
      // point)
      t(s, dir, "documents").select(col("doc_id"),
        (round(Classifier.margin(col("text"), w, clfDim), 6) + lit(0.0))
          .as("margin"))
    },
    Some {
      val cnt = (0 until clfDim).map(i =>
        s"""CAST(len(list_filter(tk, t ->
            CAST(concat('0x', substr(md5(t), 1, 4)) AS INTEGER) % $clfDim
              = $i)) AS DOUBLE)""").mkString(", ")
      // norm² and the dot product as index-ordered LEFT folds, matching
      // the engine's aggregate(zip_with) evaluation order
      val nrmSq = (0 until clfDim).foldLeft("0.0")((acc, i) =>
        s"($acc + c[${i + 1}]*c[${i + 1}])")
      val dot = (0 until clfDim).foldLeft("0.0")((acc, i) =>
        s"($acc + (${clfW(i)})*f[${i + 1}])") + s" + (${clfW(clfDim)})*1.0"
      s"""WITH tok AS (SELECT doc_id,
            list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
              t -> t <> '') AS tk FROM documents),
          cc AS (SELECT doc_id, [$cnt] AS c FROM tok),
          ff AS (SELECT doc_id,
            CASE WHEN sqrt($nrmSq) > 0
              THEN list_transform(c, v -> v / sqrt($nrmSq))
              ELSE list_transform(c, v -> 0.0) END AS f
            FROM cc)
          SELECT doc_id, round(($dot), 6) + 0.0 AS margin FROM ff"""
    })

  // incremental-ingestion dedup: the "new batch vs existing corpus"
  // split every continuous-crawl pipeline runs. Incoming = every 5th
  // doc, reference = the rest — meaningful sizes on both sides.

  private val mDedupAgainst = Spec("ml_dedup_against",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.dedupAgainstExact(
          d.filter(col("doc_id") % 5 === 0),
          d.filter(col("doc_id") % 5 =!= 0), "text")
        .select(col("doc_id"), col("source"))
    },
    // NOT EXISTS, not NOT IN: a NULL text on the reference side would
    // make NOT IN three-valued-UNKNOWN for every row, while the
    // engine's left_anti join just never matches null keys
    Some("""SELECT doc_id, source FROM documents d
            WHERE doc_id % 5 = 0 AND NOT EXISTS
              (SELECT 1 FROM documents r
               WHERE r.doc_id % 5 <> 0 AND md5(r.text) = md5(d.text))"""))

  private val mNearDupAgainst = Spec("ml_neardup_against",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.nearDupAgainst(
          d.filter(col("doc_id") % 5 === 0),
          d.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text", bands = 4, rowsPerBand = 3, k = 3,
          threshold = 0.4)
        .select(col("doc_id"))
    },
    Some {
      val bandExprs = (0 until 4).map { b =>
        val key = (0 until 3).map(r => s"CAST(mh${b * 3 + r} AS VARCHAR)")
          .mkString(" || '_' || ")
        s"SELECT doc_id, $b AS band, $key AS key FROM sig"
      }.mkString(" UNION ALL ")
      minhashSigSql(12) + s""",
         bands AS ($bandExprs),
         capped AS (SELECT doc_id, band, key FROM bands
           QUALIFY count(*) OVER (PARTITION BY band, key) <= 4096),
         cands AS (SELECT DISTINCT l.doc_id AS iid, r.doc_id AS rid
           FROM capped l JOIN capped r
             ON l.band = r.band AND l.key = r.key
           WHERE l.doc_id % 5 = 0 AND r.doc_id % 5 <> 0),
         dirty AS (SELECT DISTINCT iid FROM cands
           JOIN sh i ON i.doc_id = cands.iid
           JOIN sh r ON r.doc_id = cands.rid
           WHERE round(len(list_intersect(i.s, r.s))*1.0 /
             (len(i.s) + len(r.s) - len(list_intersect(i.s, r.s))), 6)
             >= 0.4)
         SELECT doc_id FROM documents
         WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT iid FROM dirty)"""
    })

  private val mChunkSpans = Spec("ml_chunk_spans",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Curation.chunkSpans(d, "doc_id",
        TextAnalysis.tokenCount(col("text")), size = 32, overlap = 8)
    },
    Some("""WITH b AS (SELECT doc_id,
              CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
                AS n_tokens FROM documents)
            SELECT doc_id, n_tokens,
              CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1
                AS BIGINT) AS chunk_idx,
              s AS start, least(s + 32, n_tokens) AS "end"
            FROM (SELECT doc_id, n_tokens,
                unnest(range(0, greatest(n_tokens, 1), 24)) AS s
              FROM b WHERE n_tokens > 0)"""))

  private val mShuffleLayout = Spec("ml_shuffle_layout",
    (s, dir) => Curation.shuffleLayout(t(s, dir, "documents"), "doc_id", 8)
      .select(col("doc_id"), col("shard"), col("pos")),
    Some("""SELECT doc_id,
              CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                AS INTEGER) % 8 AS shard,
              CAST(row_number() OVER (
                PARTITION BY CAST(concat('0x',
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 8
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
                AS pos
            FROM documents"""))

  // ----------------------------------------------------------------------
  // tokenizer training: distributed BPE merge learning (ml/Tokenize.scala)
  // ----------------------------------------------------------------------

  private val bpeK = 6

  /** DuckDB CTE chain replaying `k` BPE rounds: v0 = word-freq table with
    * the sentinel-wrapped representation; each round counts pairs (p_i),
    * picks the argmax with the engine's tie-break (m_i), and applies the
    * merge by plain string replace (v_i) — the same left-to-right
    * non-overlapping semantics as the engine's `replace` column. Generated
    * from the same k, so engine and oracle can't drift.
    */
  private def bpeCtes(k: Int): String = {
    val v0 =
      """WITH v0 AS (SELECT w AS word, count(*) AS freq,
           '|' || array_to_string(regexp_split_to_array(w, ''), '||') || '|' AS r
         FROM (SELECT unnest(list_filter(string_split(text, ' '),
             x -> x <> '' AND NOT contains(x, '|'))) AS w FROM documents)
         GROUP BY w)"""
    val rounds = (1 to k).map { i =>
      s"""p$i AS (SELECT z[1] AS lhs, z[2] AS rhs,
            CAST(sum(freq) AS BIGINT) AS cnt
          FROM (SELECT freq, unnest(list_zip(s[1:len(s)-1], s[2:len(s)])) AS z
                FROM (SELECT freq, string_split(trim(r, '|'), '||') AS s
                      FROM v${i - 1}))
          GROUP BY lhs, rhs),
        m$i AS (SELECT lhs, rhs, cnt FROM p$i
          ORDER BY cnt DESC, lhs, rhs LIMIT 1),
        v$i AS (SELECT word, freq,
            replace(r, '|'||m$i.lhs||'||'||m$i.rhs||'|',
                       '|'||m$i.lhs||m$i.rhs||'|') AS r
          FROM v${i - 1} CROSS JOIN m$i)"""
    }
    (v0 +: rounds).mkString(",\n")
  }

  private val mBpeMerges = Spec("ml_bpe_merges",
    (s, dir) => Tokenize.bpeMergeTable(t(s, dir, "documents"), "text", bpeK),
    Some(bpeCtes(bpeK) + "\n" +
      (1 to bpeK).map(i =>
        s"SELECT $i AS rank, lhs, rhs, cnt FROM m$i")
        .mkString(" UNION ALL ")))

  private val mBpeTokens = Spec("ml_bpe_tokens",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val merges = Tokenize.trainBpeMerges(d, "text", bpeK)
      d.select(col("doc_id"),
        size(Tokenize.applyMerges(col("text"), merges))
          .cast("long").as("n_subwords"))
    },
    Some {
      // r0..rk: the merge chain applied to each word via the m_i scalar
      // subqueries; sentinel words count as one token (training excluded
      // them, applyMerges emits them whole)
      // coalesce each scalar subquery: if training exhausts before k
      // merges some m_i is EMPTY and a NULL search would NULL-propagate
      // through the whole replace chain; chr(1) cannot appear in a
      // sentinel representation, so the fallback replace is a no-op
      val chain = (1 to bpeK).foldLeft("r0") { (acc, i) =>
        s"""replace($acc,
             coalesce((SELECT '|'||lhs||'||'||rhs||'|' FROM m$i), chr(1)),
             coalesce((SELECT '|'||lhs||rhs||'|' FROM m$i), chr(1)))"""
      }
      bpeCtes(bpeK) + s""",
        tok AS (SELECT doc_id, w,
            CASE WHEN contains(w, '|') THEN NULL
              ELSE '|' || array_to_string(regexp_split_to_array(w, ''), '||') || '|'
            END AS r0
          FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
              x -> x <> '')) AS w FROM documents)),
        cnts AS (SELECT doc_id, CAST(sum(CASE WHEN r0 IS NULL THEN 1
            ELSE len(string_split(trim($chain, '|'), '||')) END) AS BIGINT)
            AS n_subwords
          FROM tok GROUP BY doc_id)
        SELECT d.doc_id, coalesce(n_subwords, 0) AS n_subwords
        FROM documents d LEFT JOIN cnts USING (doc_id)"""
    })

  /** A COMPOSED curation pipeline driven entirely from YAML — the
    * CurationStages family (SURVEY §2b as pipeline stages): quality
    * signals → filter-DSL delete of repetitious docs → exact dedup →
    * content-addressed split → per-source mixture sampling. The oracle
    * replays every stage in SQL, so the gate covers the stage WIRING
    * (config parsing, column flow, compose order), not just the
    * underlying ml/ functions the other queries pin.
    */
  private val mCurationPipeline = Spec("ml_curation_pipeline",
    (s, dir) => {
      val yaml =
        s"""pipeline:
           |  - type: quality_signals
           |    text_field: text
           |    signals: [top_word_frac, n_tokens]
           |  - type: deleter
           |    rules:
           |      - filter: "q_top_word_frac:[0.2 TO *]"
           |        deleter: {delete: true}
           |  - type: dedup_exact
           |    id_field: doc_id
           |    text_field: text
           |  - type: hash_split
           |    id_field: doc_id
           |    train_pct: 80
           |    valid_pct: 10
           |  - type: weighted_sample
           |    id_field: doc_id
           |    strata_field: source
           |    rates: {src0: 0.3, src1: 0.7}
           |    default_rate: 0.9
           |""".stripMargin
      graft.pipeline.PipelineCompiler.compile(
          graft.pipeline.RuleLoader.fromYaml(yaml))(t(s, dir, "documents"))
        .main
        .select(col("doc_id"), col("source"), col("q_top_word_frac"),
          col("q_n_tokens"), col("split"))
    },
    Some("""WITH sig AS (SELECT doc_id, source, text,
              round(CASE WHEN len(w) = 0 THEN 0
                ELSE 1.0*list_max(list_transform(list_distinct(w),
                  u -> len(list_filter(w, x -> x = u))))/len(w) END, 6)
                AS q_top_word_frac,
              CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INT)
                AS q_n_tokens
              FROM (SELECT *, list_filter(string_split(text, ' '),
                x -> x <> '') AS w FROM documents)),
            kept AS (SELECT * FROM sig WHERE q_top_word_frac < 0.2),
            dedup AS (SELECT * FROM kept WHERE doc_id IN
              (SELECT min(doc_id) FROM kept GROUP BY md5(text))),
            split AS (SELECT *, CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'validation' ELSE 'test' END AS split
              FROM (SELECT *, CAST(concat('0x',
                substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100
                AS b FROM dedup))
            SELECT doc_id, source, q_top_word_frac, q_n_tokens, split
            FROM split
            WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                AS INTEGER) % 10000 <
              CASE source WHEN 'src0' THEN 3000 WHEN 'src1' THEN 7000
                ELSE 9000 END"""))

  /** BM25 lexical retrieval: queries = every 97th document's first five
    * words (the contamination-style deterministic split), corpus = the
    * rest; top-10 per query with the rounded-score/doc-id total order.
    * The oracle recomputes the full Okapi pipeline in SQL with the same
    * literal structure so per-term scores are bit-identical.
    */
  private val mBm25 = Spec("ml_bm25_topk",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val queries = d.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          array_join(slice(Curation.words(col("text")), 1, 5), " ").as("qtext"))
      val corpus = d.filter(col("doc_id") % 97 =!= 0)
      CorpusStats.bm25TopK(corpus, "doc_id", "text",
        queries, "qid", "qtext", k = 10)
    },
    Some(bm25TopkSql))

  /** BM25 retrieval served from a WRITTEN lexical index through the
    * `bm25_topk index:` stage (r16 — the term-channel twin of
    * ml_ann_ingest's equivalence rule): the index is built at plan
    * time over the same corpus, and because df/tf/dl/n_docs/avgdl are
    * frozen from the identical aggregates the full-scan path computes
    * per batch, index-served retrieval must match [[mBm25]]'s oracle
    * VERBATIM — the write is a pure re-layout of the statistics.
    */
  private val mBm25Index = Spec("ml_bm25_index",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val root = "/tmp/graft-bm25-index-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // rebuild per run — the query owns the path
      val ipath = root + "/index"
      graft.ml.LexIndex.write(d.filter(col("doc_id") % 97 =!= 0),
        "doc_id", "text", ipath, buckets = 16)
      val qDir = root + "/queries"
      d.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          array_join(slice(Curation.words(col("text")), 1, 5), " ")
            .as("qtext"))
        .coalesce(1).write.mode("overwrite").parquet(qDir)
      val yaml =
        s"""pipeline:
           |  - type: bm25_topk
           |    k: 10
           |    index:
           |      path: $ipath
           |    queries:
           |      path: $qDir
           |      qid_field: qid
           |      qtext_field: qtext
           |""".stripMargin
      graft.pipeline.PipelineCompiler.compile(
          graft.pipeline.RuleLoader.fromYaml(yaml))(
          d.filter(col("doc_id") % 97 =!= 0)).main
    },
    Some(bm25TopkSql))

  /** BM25 retrieval served from a GROWING ingest store (r17 —
    * `lex_ingest` → `bm25_topk index:`): the corpus arrives in THREE
    * batches through the lex_ingest stage (explicit batch ids, the
    * batch-mode contract), one of them replayed to prove idempotence,
    * and the read computes n_docs/avgdl/df from exactly the committed
    * batches. Because those are the same aggregates the full-scan path
    * computes — df was a read-time count already; n_docs/avgdl sum the
    * per-batch sidecars — ingest-served retrieval must match
    * [[mBm25]]'s oracle VERBATIM (up to the avgdl summation order the
    * 6-decimal rounding erases). The structural point this row gates:
    * a store that GREW to the corpus retrieves identically to an index
    * FROZEN over it — no blind fraction, no staleness.
    */
  private val mBm25Ingest = Spec("ml_bm25_ingest",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val root = "/tmp/graft-bm25-ingest-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // rebuild per run — the query owns the path
      val ipath = root + "/store"
      val corpus = d.filter(col("doc_id") % 97 =!= 0)
      def ingestYaml(bid: String) =
        s"""pipeline:
           |  - type: lex_ingest
           |    id_field: doc_id
           |    text_field: text
           |    buckets: 16
           |    batch_id: $bid
           |    index:
           |      path: $ipath
           |""".stripMargin
      // the ingest-stage append runs at plan-compile time (the
      // ann_ingest convention) — compiling IS ingesting
      for (b <- 0 until 3) {
        val batch = corpus.filter(pmod(col("doc_id"), lit(3)) === b)
        graft.pipeline.PipelineCompiler.compile(
          graft.pipeline.RuleLoader.fromYaml(ingestYaml(s"batch-$b")))(
          batch)
      }
      // replay of a committed batch: must no-op (idempotence is part
      // of the semantics this row gates)
      graft.pipeline.PipelineCompiler.compile(
        graft.pipeline.RuleLoader.fromYaml(ingestYaml("batch-1")))(
        corpus.filter(pmod(col("doc_id"), lit(3)) === 1))
      val qDir = root + "/queries"
      d.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          array_join(slice(Curation.words(col("text")), 1, 5), " ")
            .as("qtext"))
        .coalesce(1).write.mode("overwrite").parquet(qDir)
      val yaml =
        s"""pipeline:
           |  - type: bm25_topk
           |    k: 10
           |    index:
           |      path: $ipath
           |    queries:
           |      path: $qDir
           |      qid_field: qid
           |      qtext_field: qtext
           |""".stripMargin
      graft.pipeline.PipelineCompiler.compile(
          graft.pipeline.RuleLoader.fromYaml(yaml))(corpus).main
    },
    Some(bm25TopkSql))

  /** The BM25 oracle shared VERBATIM by [[mBm25]] (full-scan library
    * call), [[mBm25Index]] (the written-index read), and
    * [[mBm25Ingest]] (the growing-store read) — identical SQL is the
    * point: neither re-layout may add anything to the semantics.
    */
  private def bm25TopkSql: String =
    """WITH q AS (SELECT doc_id AS qid,
              array_to_string(list_filter(string_split(text, ' '),
                x -> x <> '')[1:5], ' ') AS qtext
              FROM documents WHERE doc_id % 97 = 0),
            docs AS (SELECT doc_id AS id,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
              FROM documents WHERE doc_id % 97 <> 0),
            d2 AS (SELECT id, CAST(len(w) AS DOUBLE) AS dl FROM docs),
            stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
              avg(dl) AS avgdl FROM d2),
            qt AS (SELECT qid, unnest(list_distinct(list_filter(
              string_split(qtext, ' '), x -> x <> ''))) AS t FROM q),
            tok AS (SELECT id, unnest(w) AS t FROM docs),
            tf AS (SELECT id, t, count(*) AS tf FROM tok
              WHERE t IN (SELECT DISTINCT t FROM qt) GROUP BY id, t),
            dfx AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
            sc AS (SELECT qid, id, round(sum(
                ln((n_docs - df + 0.5)/(df + 0.5) + 1.0)
                  * (tf * (1.2 + 1.0))
                  / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
              FROM tf JOIN dfx USING (t) JOIN qt USING (t)
                JOIN d2 USING (id) CROSS JOIN stats
              GROUP BY qid, id)
            SELECT qid, CAST(row_number() OVER (PARTITION BY qid
                ORDER BY score DESC, id ASC) AS BIGINT) AS rank,
              id AS doc, score
            FROM sc QUALIFY rank <= 10"""

  /** Hybrid retrieval: BM25 lexical and exact-cosine channels over the
    * SAME corpus (documents ⋈ embeddings — the synthetic tables share
    * the id space 1:1), reciprocal-rank-fused. The oracle replays both
    * channels' rounded-score rankings and the RRF sum; each document
    * contributes ≤ 2 reciprocal terms, so the per-(qid, id) sum is
    * order-insensitive and `round(…, 6)` pins both engines.
    */
  private val mHybrid = Spec("ml_hybrid_topk",
    (s, dir) => {
      val d = t(s, dir, "documents").join(
        t(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
      val queries = d.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          array_join(slice(Curation.words(col("text")), 1, 5), " ")
            .as("qtext"),
          col("embedding").as("qvec"))
      val corpus = d.filter(col("doc_id") % 97 =!= 0)
      Similarity.hybridTopK(corpus, "doc_id", "text", "embedding",
        queries, "qid", "qtext", "qvec", k = 10, fetchK = 20)
    },
    Some(hybridRrfSql))

  /** The hybrid RRF oracle, shared VERBATIM by [[mHybrid]] (brute
    * semantic channel, library call) and [[mHybridIndex]] (semantic
    * channel served from a written flat IVF index probed exhaustively
    * through the `hybrid_topk index:` stage) — identical SQL is the
    * point: with the probe set covering every bucket, the index path
    * is a pure re-layout of the brute scan and must change nothing
    * (the [[ivfKmeansTopkSql]] convention).
    */
  private def hybridRrfSql: String = {
      val cos = cosSql("q.qvec", "c.embedding")
      s"""WITH j AS (SELECT d.doc_id, d.text, e.embedding
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
          q AS (SELECT doc_id AS qid,
            array_to_string(list_filter(string_split(text, ' '),
              x -> x <> '')[1:5], ' ') AS qtext, embedding AS qvec
            FROM j WHERE doc_id % 97 = 0),
          c AS (SELECT * FROM j WHERE doc_id % 97 <> 0),
          docs AS (SELECT doc_id AS id,
            list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM c),
          d2 AS (SELECT id, CAST(len(w) AS DOUBLE) AS dl FROM docs),
          stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
            avg(dl) AS avgdl FROM d2),
          qt AS (SELECT qid, unnest(list_distinct(list_filter(
            string_split(qtext, ' '), x -> x <> ''))) AS t FROM q),
          tok AS (SELECT id, unnest(w) AS t FROM docs),
          tf AS (SELECT id, t, count(*) AS tf FROM tok
            WHERE t IN (SELECT DISTINCT t FROM qt) GROUP BY id, t),
          dfx AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
          sc AS (SELECT qid, id, round(sum(
              ln((n_docs - df + 0.5)/(df + 0.5) + 1.0)
                * (tf * (1.2 + 1.0))
                / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6)
              AS score
            FROM tf JOIN dfx USING (t) JOIN qt USING (t)
              JOIN d2 USING (id) CROSS JOIN stats
            GROUP BY qid, id),
          lexr AS (SELECT qid, id, row_number() OVER (PARTITION BY qid
              ORDER BY score DESC, id ASC) AS rank
            FROM sc QUALIFY rank <= 20),
          sem AS (SELECT q.qid, c.doc_id AS id, round($cos, 6) AS sim
            FROM q CROSS JOIN c),
          semr AS (SELECT qid, id, row_number() OVER (PARTITION BY qid
              ORDER BY sim DESC, id ASC) AS rank
            FROM sem QUALIFY rank <= 20),
          fused AS (SELECT qid, id,
              round(sum(1.0/(60 + rank)), 6) AS score
            FROM (SELECT qid, id, rank FROM lexr
                  UNION ALL SELECT qid, id, rank FROM semr) u
            GROUP BY qid, id)
          SELECT qid, CAST(row_number() OVER (PARTITION BY qid
              ORDER BY score DESC, id ASC) AS BIGINT) AS rank, id, score
          FROM fused QUALIFY rank <= 10"""
  }

  /** Hybrid retrieval with the SEMANTIC channel served from a written
    * flat IVF index through the `hybrid_topk index:` stage (VERDICT
    * r15 missing #1 — retrieval at index scale must not re-scan the
    * full vector column per query batch). The index is written at
    * plan time over the corpus embeddings (kmeans centroids, the
    * SQL-replayable trainer) and probed EXHAUSTIVELY (`nprobe:` =
    * centroid count), so the probe set covers truth and the fused
    * output must be bit-identical to [[mHybrid]]'s brute-channel run —
    * the oracle is [[hybridRrfSql]] VERBATIM.
    */
  private val mHybridIndex = Spec("ml_hybrid_index",
    (s, dir) => {
      val d = t(s, dir, "documents").join(
        t(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
      val corpus = d.filter(col("doc_id") % 97 =!= 0)
      val root = "/tmp/graft-hybrid-index-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // rebuild per run — the query owns the path
      val ipath = root + "/index"
      val centroids = Similarity.kmeansCentroids(corpus, "doc_id",
        "embedding", k = 8, dim = 64, iters = 1)
      Similarity.ivfWriteIndex(corpus.select(col("doc_id"),
        col("embedding")), "doc_id", "embedding", centroids, ipath)
      val qDir = root + "/queries"
      d.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          array_join(slice(Curation.words(col("text")), 1, 5), " ")
            .as("qtext"),
          col("embedding").as("qvec"))
        .coalesce(1).write.mode("overwrite").parquet(qDir)
      val yaml =
        s"""pipeline:
           |  - type: hybrid_topk
           |    id_field: doc_id
           |    text_field: text
           |    k: 10
           |    fetch_k: 20
           |    index:
           |      path: $ipath
           |    nprobe: 8
           |    queries:
           |      path: $qDir
           |      qid_field: qid
           |      qtext_field: qtext
           |      qvec_field: qvec
           |""".stripMargin
      graft.pipeline.PipelineCompiler.compile(
          graft.pipeline.RuleLoader.fromYaml(yaml))(corpus).main
    },
    Some(hybridRrfSql))

  /** Feature covariance of the embedding corpus as (i, j, cov) rows —
    * the distributed kernel under PCA/whitening ([[Similarity.pcaTrain]]
    * consumes the same one-row moment aggregate; the eigensolve on top
    * is driver-local and spec-gated in PcaSpec, the trainCentroids
    * convention). The oracle recomputes all dim² entries by exploding
    * index pairs.
    */
  private val mCovariance = Spec("ml_embed_covariance",
    (s, dir) => Similarity.covarianceMatrix(
      t(s, dir, "embeddings"), "embedding", dim = 64),
    Some("""WITH e AS (SELECT list_transform(embedding,
              x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
            m AS (SELECT i, sum(v[i+1]) AS si
              FROM e, unnest(range(64)) AS u(i) GROUP BY i),
            o AS (SELECT i, j, sum(v[i+1]*v[j+1]) AS sp
              FROM e, unnest(range(64)) AS u(i), unnest(range(64)) AS w(j)
              GROUP BY i, j)
            SELECT o.i, o.j,
              round(sp/n - (mi.si/n)*(mj.si/n), 6) + 0.0 AS cov
            FROM o CROSS JOIN n
              JOIN m mi ON mi.i = o.i JOIN m mj ON mj.i = o.j"""))

  /** Paragraph-level boilerplate dedup: the flat synthetic corpus gets
    * blank-line breaks CONSTRUCTED every five words — identically in both
    * engines, the pii_redact convention — and [[Dedup.paragraphDedup]]
    * then genuinely splits, cross-doc-counts, removes, and reassembles
    * (257 duplicated paragraphs fire at sf0.01; the gate is not a
    * pass-through).
    */
  private val mParaDedup = Spec("ml_para_dedup",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("text",
          regexp_replace(col("text"), "((\\S+ ){5})", "$1\n\n"))
      Dedup.paragraphDedup(d, "doc_id", "text", minDocs = 2)
        .select(col("doc_id"), col("text"), col("n_paras"), col("n_removed"))
    },
    Some("""WITH t AS (SELECT doc_id,
              regexp_replace(text, '((\S+ ){5})',
                '\1' || chr(10) || chr(10), 'g') AS text
              FROM documents),
            p AS (SELECT doc_id, list_filter(list_transform(
                regexp_split_to_array(text, '\n{2,}'), x -> trim(x)),
                x -> x <> '') AS ps FROM t),
            paras AS (SELECT doc_id, i AS pos, ps[i+1] AS para
              FROM p, unnest(range(len(ps))) AS u(i)),
            dup AS (SELECT h FROM
              (SELECT DISTINCT md5(para) AS h, doc_id FROM paras)
              GROUP BY h HAVING count(*) >= 2),
            kept AS (SELECT doc_id,
                string_agg(para, chr(10) || chr(10) ORDER BY pos) AS ktext,
                count(*) AS nk
              FROM paras WHERE md5(para) NOT IN (SELECT h FROM dup)
              GROUP BY doc_id)
            SELECT t.doc_id, coalesce(ktext, '') AS text,
              CAST(len(ps) AS BIGINT) AS n_paras,
              CAST(len(ps) - coalesce(nk, 0) AS BIGINT) AS n_removed
            FROM t JOIN p USING (doc_id) LEFT JOIN kept USING (doc_id)"""))

  // ----------------------------------------------------------------------
  // round 10: Gopher rule filter, bigram-LM perplexity leg, DSIR
  // importance resampling, positional benchmark decontamination
  // ----------------------------------------------------------------------

  /** Gopher quality rules over a line-structured, deterministically
    * "decorated" corpus: the flat synthetic text gets newlines every five
    * words and, keyed on doc_id, bullet-prefixed or ellipsis-suffixed
    * lines — constructed identically in both engines (the pii_redact
    * convention) so the bullet/ellipsis/dup-line rules genuinely fire.
    */
  private val mGopher = Spec("ml_gopher_quality",
    (s, dir) => {
      val lined = t(s, dir, "documents").withColumn("text",
        regexp_replace(col("text"), "((\\S+ ){5})", "$1\n"))
      val decorated = lined.withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(lit("• "), regexp_replace(col("text"), "\n", "\n• ")))
        .when(col("doc_id") % 11 === 0,
          regexp_replace(col("text"), "\n", "...\n"))
        .otherwise(col("text")))
      TextAnalysis.gopherSignals(decorated, "text")
        .select("doc_id", "g_n_words", "g_mean_word_len", "g_symbol_ratio",
          "g_bullet_frac", "g_ellipsis_frac", "g_alpha_frac", "g_stop_hits",
          "g_dup_line_frac", "gopher_pass")
    },
    Some {
      val stopList = TextAnalysis.gopherStopwords
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH lined AS (SELECT doc_id,
            regexp_replace(text, '((\\S+ ){5})', '\\1' || chr(10), 'g') AS text
            FROM documents),
          dec AS (SELECT doc_id, CASE
              WHEN doc_id % 7 = 0
                THEN '• ' || replace(text, chr(10), chr(10) || '• ')
              WHEN doc_id % 11 = 0
                THEN replace(text, chr(10), '...' || chr(10))
              ELSE text END AS text FROM lined),
          st AS (SELECT doc_id, text,
            list_filter(regexp_split_to_array(trim(text), '\\s+'),
              x -> x <> '') AS w,
            list_filter(list_transform(string_split(text, chr(10)),
              x -> trim(x)), x -> x <> '') AS lines
            FROM dec),
          m AS (SELECT doc_id,
            CAST(len(w) AS BIGINT) AS g_n_words,
            CASE WHEN len(w) > 0 THEN round(
              CAST(length(array_to_string(w, '')) AS DOUBLE)/len(w), 6)
              ELSE 0.0 END AS g_mean_word_len,
            CASE WHEN len(w) > 0 THEN round(CAST(
              len(regexp_extract_all(text, '#'))
              + len(regexp_extract_all(text, '…'))
              + len(regexp_extract_all(text, '\\.\\.\\.'))
              AS DOUBLE)/len(w), 6) ELSE 0.0 END AS g_symbol_ratio,
            CASE WHEN len(lines) > 0 THEN round(CAST(
              len(list_filter(lines, l -> l LIKE '•%' OR l LIKE '- %'
                OR l LIKE '* %')) AS DOUBLE)/len(lines), 6)
              ELSE 0.0 END AS g_bullet_frac,
            CASE WHEN len(lines) > 0 THEN round(CAST(
              len(list_filter(lines, l -> l LIKE '%...' OR l LIKE '%…'))
              AS DOUBLE)/len(lines), 6) ELSE 0.0 END AS g_ellipsis_frac,
            CASE WHEN len(w) > 0 THEN round(CAST(
              len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
              AS DOUBLE)/len(w), 6) ELSE 0.0 END AS g_alpha_frac,
            CAST(len(list_filter($stopList::VARCHAR[],
              s -> list_contains(list_transform(w, x -> lower(x)), s)))
              AS BIGINT) AS g_stop_hits,
            CASE WHEN len(lines) > 0 THEN round(1.0 -
              CAST(len(list_distinct(lines)) AS DOUBLE)/len(lines), 6)
              ELSE 0.0 END AS g_dup_line_frac
            FROM st)
          SELECT doc_id, g_n_words, g_mean_word_len, g_symbol_ratio,
            g_bullet_frac, g_ellipsis_frac, g_alpha_frac, g_stop_hits,
            g_dup_line_frac,
            CAST(g_n_words BETWEEN 50 AND 100000
              AND g_mean_word_len BETWEEN 3.0 AND 10.0
              AND g_symbol_ratio <= 0.1
              AND g_bullet_frac <= 0.9
              AND g_ellipsis_frac <= 0.3
              AND g_alpha_frac >= 0.8
              AND g_stop_hits >= 2
              AND g_dup_line_frac <= 0.3 AS INT) AS gopher_pass
          FROM m"""
    })

  /** Within-doc line dedup over a deterministically line-structured
    * corpus with CONSTRUCTED repeats: every doc gets newlines every
    * four words, and docs with doc_id % 3 == 0 additionally repeat
    * their own first line at the end (identically in both engines) —
    * so the keep-first semantics genuinely fire.
    */
  private val mDedupLines = Spec("ml_dedup_lines",
    (s, dir) => {
      val lined = t(s, dir, "documents").withColumn("text",
        regexp_replace(col("text"), "((\\S+ ){4})", "$1\n"))
      val repeated = lined.withColumn("text",
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit("\n"),
            element_at(split(col("text"), "\n"), 1)))
        .otherwise(col("text")))
      repeated.select(col("doc_id"),
        TextAnalysis.dedupLines(col("text")).as("text"))
    },
    Some("""WITH lined AS (SELECT doc_id,
              regexp_replace(text, '((\S+ ){4})', '\1' || chr(10), 'g')
                AS text FROM documents),
            rep AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0
                THEN text || chr(10) || string_split(text, chr(10))[1]
                ELSE text END AS text FROM lined),
            sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls
              FROM rep),
            ln AS (SELECT doc_id, ls[i+1] AS line, i AS pos
              FROM sp, unnest(range(len(ls))) AS u(i)),
            keep AS (SELECT doc_id, line, pos FROM ln
              QUALIFY row_number() OVER (PARTITION BY doc_id, line
                ORDER BY pos) = 1)
            SELECT doc_id,
              string_agg(line, chr(10) ORDER BY pos) AS text
            FROM keep GROUP BY doc_id"""))

  /** C4 line filter over constructed line structure: newline every four
    * words; doc_id % 2 lines get a terminal period appended per line,
    * the rest stay bare (so the filter genuinely keeps/drops); the
    * last short line exercises the min-words leg.
    */
  private val mC4Lines = Spec("ml_c4_line_filter",
    (s, dir) => {
      val lined = t(s, dir, "documents").withColumn("text",
        regexp_replace(col("text"), "((\\S+ ){4})", "$1\n"))
      val dotted = lined.withColumn("text",
        when(col("doc_id") % 2 === 0,
          regexp_replace(col("text"), "\n", ".\n"))
        .otherwise(col("text")))
      dotted.select(col("doc_id"),
        TextAnalysis.c4FilterLines(col("text"), minWords = 3).as("text"))
    },
    Some("""WITH lined AS (SELECT doc_id,
              regexp_replace(text, '((\S+ ){4})', '\1' || chr(10), 'g')
                AS text FROM documents),
            dotted AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0
                THEN replace(text, chr(10), '.' || chr(10))
                ELSE text END AS text FROM lined),
            sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls
              FROM dotted),
            ln AS (SELECT doc_id, ls[i+1] AS line, i AS pos
              FROM sp, unnest(range(len(ls))) AS u(i)),
            keep AS (SELECT doc_id, line, pos FROM ln
              WHERE (trim(line) LIKE '%.' OR trim(line) LIKE '%!'
                  OR trim(line) LIKE '%?' OR trim(line) LIKE '%"')
                AND len(list_filter(string_split(trim(line), ' '),
                  x -> x <> '')) >= 3)
            SELECT d.doc_id, coalesce(k.text, '') AS text
            FROM documents d LEFT JOIN (SELECT doc_id,
                string_agg(line, chr(10) ORDER BY pos) AS text
              FROM keep GROUP BY doc_id) k USING (doc_id)"""))

  private val mBigramLP = Spec("ml_bigram_logprob",
    (s, dir) => CorpusStats.bigramLogProb(t(s, dir, "documents"),
      "doc_id", "text", lambda = 0.9),
    Some {
      // interpolation weights interpolated from the SAME doubles the
      // Spark plan uses (1.0 - 0.9 is not the literal 0.1)
      val l1 = 0.9; val l2 = 1.0 - 0.9
      s"""WITH w AS (SELECT doc_id,
            list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM documents),
          tok AS (SELECT doc_id, unnest(w) AS t FROM w),
          uni AS (SELECT t, count(*) AS c1 FROM tok GROUP BY t),
          n AS (SELECT CAST(sum(c1) AS DOUBLE) AS n FROM uni),
          bg AS (SELECT doc_id, unnest(list_transform(range(len(w)-1),
              i -> w[i+1]||' '||w[i+2])) AS g
            FROM w WHERE len(w) >= 2),
          bc AS (SELECT g, count(*) AS c2 FROM bg GROUP BY g),
          pr AS (SELECT g, $l1*CAST(c2 AS DOUBLE)/CAST(u1.c1 AS DOUBLE)
                + $l2*CAST(u2.c1 AS DOUBLE)/n AS p
            FROM bc JOIN uni u1 ON u1.t = string_split(g, ' ')[1]
                    JOIN uni u2 ON u2.t = string_split(g, ' ')[2]
                    CROSS JOIN n),
          per AS (SELECT doc_id, count(*) AS n_bigrams,
              round(avg(ln(p)), 6) AS avg_logprob
            FROM bg JOIN pr USING (g) GROUP BY doc_id)
          SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
            coalesce(avg_logprob, 0.0) AS avg_logprob
          FROM documents d LEFT JOIN per USING (doc_id)"""
    })

  /** Reference-trained LM scoring (the full CCNet shape): train on the
    * doc_id % 53 = 0 exemplar subset, score the rest — OOV text now
    * penalized via the add-one unigram floor.
    */
  private val mBigramXent = Spec("ml_bigram_xent",
    (s, dir) => {
      val d = t(s, dir, "documents")
      CorpusStats.bigramLogProbAgainst(
        d.filter(col("doc_id") % 53 =!= 0),
        d.filter(col("doc_id") % 53 === 0),
        "doc_id", "text", lambda = 0.9)
    },
    Some {
      val l1 = 0.9; val l2 = 1.0 - 0.9
      s"""WITH tw AS (SELECT list_filter(string_split(text, ' '),
            x -> x <> '') AS w FROM documents WHERE doc_id % 53 = 0),
          uni AS (SELECT t, count(*) AS c1 FROM
            (SELECT unnest(w) AS t FROM tw) GROUP BY t),
          st AS (SELECT CAST(sum(c1) AS DOUBLE) AS n,
            CAST(count(*) AS DOUBLE) AS v FROM uni),
          bc AS (SELECT g, count(*) AS c2 FROM
            (SELECT unnest(list_transform(range(len(w)-1),
               i -> w[i+1]||' '||w[i+2])) AS g FROM tw WHERE len(w) >= 2)
            GROUP BY g),
          cw AS (SELECT doc_id, list_filter(string_split(text, ' '),
            x -> x <> '') AS w FROM documents WHERE doc_id % 53 <> 0),
          bg AS (SELECT doc_id, unnest(list_transform(range(len(w)-1),
              i -> w[i+1]||' '||w[i+2])) AS g
            FROM cw WHERE len(w) >= 2),
          ty AS (SELECT DISTINCT g FROM bg),
          pr AS (SELECT g,
              $l1*coalesce(CAST(c2 AS DOUBLE)/CAST(u1.c1 AS DOUBLE), 0.0)
            + $l2*(CAST(coalesce(u2.c1, 0) AS DOUBLE) + 1.0)/(n + v + 1.0)
              AS p
            FROM ty LEFT JOIN bc USING (g)
              LEFT JOIN uni u1 ON u1.t = string_split(g, ' ')[1]
              LEFT JOIN uni u2 ON u2.t = string_split(g, ' ')[2]
              CROSS JOIN st),
          per AS (SELECT doc_id, count(*) AS n_bigrams,
              round(avg(ln(p)), 6) AS avg_logprob
            FROM bg JOIN pr USING (g) GROUP BY doc_id)
          SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
            coalesce(avg_logprob, 0.0) AS avg_logprob
          FROM documents d LEFT JOIN per USING (doc_id)
          WHERE d.doc_id % 53 <> 0"""
    })

  /** The incremental-statistics form of [[mBigramXent]]: the SAME
    * exemplar subset lands in a [[graft.ml.GramStore]] as TWO batches
    * (plus a replayed duplicate that must no-op), and scoring trains
    * from the store's merged counts. The oracle is ml_bigram_xent's SQL
    * VERBATIM — batch counts sum exactly to one-shot counts, so
    * store-trained scores must be bit-identical to corpus-trained ones.
    */
  private val mBigramXentStore = Spec("ml_bigram_xent_store",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val train = d.filter(col("doc_id") % 53 === 0)
      val store = "/tmp/graft-xent-store-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_") + "/grams"
      val p = new org.apache.hadoop.fs.Path(store).getParent
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // rebuild per run — the query owns the path
      graft.ml.GramStore.append(
        train.filter(col("doc_id") % 2 === 0), "text", store, "even")
      graft.ml.GramStore.append(
        train.filter(col("doc_id") % 2 =!= 0), "text", store, "odd")
      // a replayed batch must be a no-op, or the counts double
      graft.ml.GramStore.append(
        train.filter(col("doc_id") % 2 === 0), "text", store, "even")
      CorpusStats.bigramLogProbFromStore(
        d.filter(col("doc_id") % 53 =!= 0), store,
        "doc_id", "text", lambda = 0.9)
    },
    mBigramXent.oracle)

  /** Trigram stupid backoff (Brants et al. 2007), reference-trained on
    * the doc_id % 53 = 0 exemplar subset — the oracle replays all three
    * count tables and the backoff CASE; the add-one unigram floor keeps
    * fully-OOV positions finite.
    */
  private val mTrigramBackoff = Spec("ml_trigram_backoff",
    (s, dir) => {
      val d = t(s, dir, "documents")
      CorpusStats.trigramStupidBackoff(
        d.filter(col("doc_id") % 53 =!= 0),
        d.filter(col("doc_id") % 53 === 0),
        "doc_id", "text", alpha = 0.4)
    },
    Some {
      val a = 0.4
      s"""WITH tw AS (SELECT list_filter(string_split(text, ' '),
            x -> x <> '') AS w FROM documents WHERE doc_id % 53 = 0),
          uni AS (SELECT t, count(*) AS c1 FROM
            (SELECT unnest(w) AS t FROM tw) GROUP BY t),
          st AS (SELECT CAST(sum(c1) AS DOUBLE) AS n,
            CAST(count(*) AS DOUBLE) AS v FROM uni),
          bc AS (SELECT g, count(*) AS cb FROM
            (SELECT unnest(list_transform(range(len(w)-1),
               i -> w[i+1]||' '||w[i+2])) AS g FROM tw WHERE len(w) >= 2)
            GROUP BY g),
          tc AS (SELECT g, count(*) AS c3 FROM
            (SELECT unnest(list_transform(range(len(w)-2),
               i -> w[i+1]||' '||w[i+2]||' '||w[i+3])) AS g
             FROM tw WHERE len(w) >= 3)
            GROUP BY g),
          cw AS (SELECT doc_id, list_filter(string_split(text, ' '),
            x -> x <> '') AS w FROM documents WHERE doc_id % 53 <> 0),
          tg AS (SELECT doc_id, unnest(list_transform(range(len(w)-2),
              i -> w[i+1]||' '||w[i+2]||' '||w[i+3])) AS g
            FROM cw WHERE len(w) >= 3),
          sp AS (SELECT g, string_split(g, ' ')[1] AS w1,
            string_split(g, ' ')[2] AS w2, string_split(g, ' ')[3] AS w3
            FROM (SELECT DISTINCT g FROM tg)),
          pr AS (SELECT sp.g, CASE
              WHEN c3 IS NOT NULL
                THEN CAST(c3 AS DOUBLE) / CAST(cpre AS DOUBLE)
              WHEN csuf IS NOT NULL
                THEN $a*CAST(csuf AS DOUBLE) / CAST(c2 AS DOUBLE)
              ELSE $a*$a*(CAST(coalesce(c3u, 0) AS DOUBLE) + 1.0)
                / (n + v + 1.0) END AS p
            FROM sp LEFT JOIN tc ON tc.g = sp.g
              LEFT JOIN (SELECT g AS pg, cb AS cpre FROM bc)
                ON pg = w1||' '||w2
              LEFT JOIN (SELECT g AS sg, cb AS csuf FROM bc)
                ON sg = w2||' '||w3
              LEFT JOIN (SELECT t AS u2, c1 AS c2 FROM uni) ON u2 = w2
              LEFT JOIN (SELECT t AS u3, c1 AS c3u FROM uni) ON u3 = w3
              CROSS JOIN st),
          per AS (SELECT doc_id, count(*) AS n_trigrams,
              round(avg(ln(p)), 6) AS avg_logscore
            FROM tg JOIN pr USING (g) GROUP BY doc_id)
          SELECT d.doc_id, coalesce(n_trigrams, 0) AS n_trigrams,
            coalesce(avg_logscore, 0.0) AS avg_logscore
          FROM documents d LEFT JOIN per USING (doc_id)
          WHERE d.doc_id % 53 <> 0"""
    })

  /** The incremental-statistics form of [[mTrigramBackoff]] (the
    * [[mBigramXentStore]] convention, one level deeper): the exemplar
    * subset lands in an orders-3 [[graft.ml.GramStore]] as two batches
    * with a COMPACTION between them and a post-compaction replay of the
    * folded batch — exercising the r14 ledger (a batch whose partition
    * was folded must still no-op) under the oracle. The oracle is
    * ml_trigram_backoff's SQL VERBATIM: batch counts sum exactly to
    * one-shot counts through the fold, so store-trained scores must be
    * bit-identical to corpus-trained ones.
    */
  private val mTrigramBackoffStore = Spec("ml_trigram_backoff_store",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val train = d.filter(col("doc_id") % 53 === 0)
      val store = "/tmp/graft-tri-store-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_") + "/grams"
      val p = new org.apache.hadoop.fs.Path(store).getParent
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // rebuild per run — the query owns the path
      graft.ml.GramStore.append(
        train.filter(col("doc_id") % 2 === 0), "text", store, "even",
        orders = 3)
      graft.ml.GramStore.compact(s, store) // folds "even" into the ledger
      graft.ml.GramStore.append(
        train.filter(col("doc_id") % 2 =!= 0), "text", store, "odd",
        orders = 3)
      // replayed AFTER its partition was folded away: the marker's
      // ledger (not the gone directory) must make this a no-op
      graft.ml.GramStore.append(
        train.filter(col("doc_id") % 2 === 0), "text", store, "even",
        orders = 3)
      CorpusStats.trigramStupidBackoffFromStore(
        d.filter(col("doc_id") % 53 =!= 0), store,
        "doc_id", "text", alpha = 0.4)
    },
    mTrigramBackoff.oracle)

  /** DuckDB CTE prefix `fb(doc_id, b)`: the DSIR hashed uni+bigram
    * feature buckets, md5-half hashing ([[Dedup.md5half]] convention).
    */
  private def dsirFeatureSql(buckets: Int): String =
    s"""WITH w AS (SELECT doc_id,
          list_filter(string_split(text, ' '), x -> x <> '') AS w
          FROM documents),
        f AS (SELECT doc_id, unnest(list_concat(w,
            list_transform(range(len(w)-1), i -> w[i+1]||' '||w[i+2]))) AS f
          FROM w),
        fb AS (SELECT doc_id,
            ('0x'||substr(md5(f),1,8))::BIGINT % $buckets AS b FROM f)"""

  /** DuckDB CTEs from `fb` to `per(doc_id, n_feats, log_weight)` — the
    * smoothed bucket log-ratio table and the per-doc sum, mirroring
    * [[Curation.dsirWeights]] token for token (target = doc_id % 53 = 0,
    * the contamination convention for "the exemplar subset").
    */
  private def dsirWeightSql(buckets: Int, alpha: Double): String =
    s""",
        rawb AS (SELECT b, count(*) AS cr FROM fb GROUP BY b),
        tgtb AS (SELECT b, count(*) AS ct FROM fb
          WHERE doc_id % 53 = 0 GROUP BY b),
        nr AS (SELECT CAST(sum(cr) AS DOUBLE) AS n_raw FROM rawb),
        nt AS (SELECT CAST(sum(ct) AS DOUBLE) AS n_tgt FROM tgtb),
        lr AS (SELECT b,
            ln((CAST(coalesce(ct, 0) AS DOUBLE) + $alpha) /
               (n_tgt + $alpha * ${buckets.toDouble}))
          - ln((CAST(cr AS DOUBLE) + $alpha) /
               (n_raw + $alpha * ${buckets.toDouble})) AS lr
          FROM rawb LEFT JOIN tgtb USING (b)
          CROSS JOIN nr CROSS JOIN nt),
        per AS (SELECT doc_id, count(*) AS n_feats,
            round(sum(lr), 6) AS log_weight
          FROM fb JOIN lr USING (b) GROUP BY doc_id)"""

  private val mDsirWeights = Spec("ml_dsir_weights",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Curation.dsirWeights(d, d.filter(col("doc_id") % 53 === 0),
        "doc_id", "text", buckets = 1024, alpha = 1.0)
    },
    Some(dsirFeatureSql(1024) + dsirWeightSql(1024, 1.0) + """
         SELECT d.doc_id, coalesce(n_feats, 0) AS n_feats,
           coalesce(log_weight, 0.0) AS log_weight
         FROM documents d LEFT JOIN per USING (doc_id)"""))

  private val mDsirSample = Spec("ml_dsir_sample",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Curation.dsirSample(
        Curation.dsirWeights(d, d.filter(col("doc_id") % 53 === 0),
          "doc_id", "text", buckets = 1024, alpha = 1.0),
        "doc_id", k = 100)
    },
    Some(dsirFeatureSql(1024) + dsirWeightSql(1024, 1.0) + """,
         wt AS (SELECT d.doc_id, coalesce(n_feats, 0) AS n_feats,
             coalesce(log_weight, 0.0) AS log_weight
           FROM documents d LEFT JOIN per USING (doc_id))
         SELECT doc_id, n_feats, log_weight,
           round(log_weight + -ln(-ln(
             (('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT + 0.5)
             / 4294967296.0)), 6) AS score
         FROM wt ORDER BY score DESC, doc_id ASC LIMIT 100"""))

  /** Positional decontamination vs an in-corpus "benchmark" subset
    * (doc_id % 7 = 0 — wide enough that spans fire at every SF); the
    * oracle re-derives covered-position islands with window functions,
    * the mDupSpans formulation with the gram-set membership condition.
    */
  private def decontamOccSql(k: Int): String =
    s"""WITH w AS (SELECT doc_id,
          list_filter(string_split(text, ' '), x -> x <> '') AS w
          FROM documents),
        g AS (SELECT doc_id, i AS p,
            md5(array_to_string(w[i+1:i+$k], ' ')) AS g
          FROM w, unnest(range(len(w)-${k - 1})) AS u(i)
          WHERE len(w) >= $k),
        bg AS (SELECT DISTINCT g FROM g WHERE doc_id % 7 = 0),
        occ AS (SELECT doc_id, p FROM g JOIN bg USING (g)
          WHERE doc_id % 7 <> 0)"""

  private val mDecontamSpans = Spec("ml_decontam_spans",
    (s, dir) => {
      val d = t(s, dir, "documents")
      CorpusStats.decontaminateSpans(
        d.filter(col("doc_id") % 7 =!= 0), "doc_id", "text",
        d.filter(col("doc_id") % 7 === 0), "text", k = 8)
    },
    Some(decontamOccSql(8) + """,
         b AS (SELECT doc_id, p, CASE WHEN p >
             lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 8
             THEN 1 ELSE 0 END AS brk FROM occ),
         isl AS (SELECT doc_id, p, sum(brk)
             OVER (PARTITION BY doc_id ORDER BY p) AS island FROM b)
         SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
           CAST(max(p) + 8 AS BIGINT) AS span_end
         FROM isl GROUP BY doc_id, island"""))

  private val mDecontamClean = Spec("ml_decontam_clean",
    (s, dir) => {
      val d = t(s, dir, "documents")
      CorpusStats.decontaminate(
          d.filter(col("doc_id") % 7 =!= 0), "doc_id", "text",
          d.filter(col("doc_id") % 7 === 0), "text", k = 8)
        .select(col("doc_id"), col("text"))
    },
    Some(decontamOccSql(8) + """,
         cover AS (SELECT DISTINCT occ.doc_id, u.pp AS p
           FROM occ, unnest(range(occ.p, occ.p + 8)) AS u(pp)),
         toks AS (SELECT doc_id, unnest(w) AS word,
           generate_subscripts(w, 1) - 1 AS p FROM w
           WHERE doc_id % 7 <> 0),
         kept AS (SELECT t.doc_id, t.word, t.p FROM toks t
           LEFT JOIN cover c ON t.doc_id = c.doc_id AND t.p = c.p
           WHERE c.doc_id IS NULL),
         cleaned AS (SELECT doc_id,
           string_agg(word, ' ' ORDER BY p) AS text
           FROM kept GROUP BY doc_id)
         SELECT d.doc_id,
           CASE WHEN d.doc_id IN (SELECT DISTINCT doc_id FROM occ)
                THEN coalesce(cl.text, '') ELSE d.text END AS text
         FROM documents d LEFT JOIN cleaned cl USING (doc_id)
         WHERE d.doc_id % 7 <> 0"""))

  private val mSq8 = Spec("ml_embed_sq8",
    (s, dir) => Similarity.sq8Encode(t(s, dir, "embeddings"),
      "vec_id", "embedding"),
    Some("""WITH e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            s AS (SELECT vec_id, v, CASE WHEN len(v) = 0 THEN 0.0
                ELSE list_max(list_transform(v, x -> abs(x)))/127.0 END
                AS scale FROM e),
            c AS (SELECT vec_id, v, scale,
                list_transform(v, x -> CASE WHEN scale = 0 THEN 0
                  ELSE CAST(floor(x/scale + 0.5) AS INT) END) AS codes
              FROM s),
            m AS (SELECT vec_id, scale, codes,
                CASE WHEN len(v) = 0 THEN 0.0 ELSE
                  list_aggregate(list_transform(range(len(v)),
                    i -> (v[i+1] - codes[i+1]*scale)
                       * (v[i+1] - codes[i+1]*scale)), 'sum')/len(v) END
                AS mse
              FROM c)
            SELECT vec_id, round(scale, 6) AS scale,
              array_to_string(codes, ',') AS codes,
              round(mse, 6) AS mse FROM m"""))

  private val mSq8TopK = Spec("ml_embed_sq8_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid_src"), col("embedding").as("qvec"))
      Similarity.sq8TopK(emb, "vec_id", "embedding",
        queries, "qid_src", "qvec", k = 5)
    },
    Some("""WITH e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            s AS (SELECT vec_id, v, CASE WHEN len(v) = 0 THEN 0.0
                ELSE list_max(list_transform(v, x -> abs(x)))/127.0 END
                AS scale FROM e),
            c AS (SELECT vec_id, scale,
                list_transform(v, x -> CASE WHEN scale = 0 THEN 0
                  ELSE CAST(floor(x/scale + 0.5) AS INT) END) AS codes
              FROM s),
            scored AS (SELECT q.vec_id AS qid, c.vec_id AS id,
                round(c.scale * list_aggregate(list_transform(
                  range(len(c.codes)),
                  i -> c.codes[i+1]*CAST(q.embedding[i+1] AS DOUBLE)),
                  'sum'), 6) AS score
              FROM c CROSS JOIN embeddings q WHERE q.vec_id < 3)
            SELECT qid, id, score, rank FROM (
              SELECT qid, id, score, CAST(row_number() OVER (
                PARTITION BY qid ORDER BY score DESC, id ASC) AS INT) AS rank
              FROM scored) WHERE rank <= 5"""))

  private val mCorpusProfile = Spec("ml_corpus_profile",
    (s, dir) => CorpusStats.corpusProfile(t(s, dir, "documents"),
      "source", "text"),
    Some("""WITH w AS (SELECT source, text,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
              FROM documents),
            sc AS (SELECT source AS stratum, count(*) AS n_docs,
                CAST(sum(len(w)) AS BIGINT) AS n_tokens,
                CAST(min(len(w)) AS BIGINT) AS min_tokens,
                CAST(max(len(w)) AS BIGINT) AS max_tokens,
                CAST(sum(length(text)) AS BIGINT) AS chars
              FROM w GROUP BY source),
            vocab AS (SELECT stratum, count(*) AS n_vocab FROM
                (SELECT DISTINCT source AS stratum,
                   unnest(list_distinct(w)) AS t FROM w)
              GROUP BY stratum),
            texts AS (SELECT source AS stratum,
                count(DISTINCT md5(text)) AS n_texts
              FROM w GROUP BY source)
            SELECT sc.stratum, n_docs, n_tokens, min_tokens, max_tokens,
              coalesce(n_vocab, 0) AS n_vocab,
              coalesce(n_texts, 0) AS n_texts,
              round(CAST(chars AS DOUBLE)/n_docs, 6) AS avg_chars
            FROM sc LEFT JOIN vocab USING (stratum)
              LEFT JOIN texts USING (stratum)"""))

  /** The round-10 curation recipe composed end-to-end through the YAML
    * compiler: Gopher length gate → corpus-trained bigram-LM filter
    * (the LM trains on the SURVIVORS of the gate, as a staged pipeline
    * implies) → DSIR selection against the English exemplar subset →
    * content-addressed split. The oracle replays the whole chain in one
    * SQL statement with each stage's CTEs scoped to the previous
    * stage's survivors.
    *
    * The LM gate is QUANTILE form (`min_logprob_quantile: 0.1` — drop
    * the lowest-likelihood tenth), CCNet's actual architecture: an
    * absolute `min_logprob` threshold is corpus-distribution-dependent
    * and emptied the output on a 10×-replica tier whose diluted
    * vocabulary shifted every score down (round-10 scale artifact);
    * the quantile gate keeps the same FRACTION under any shift. The
    * DSIR selection is likewise `fraction:` form (relative sample
    * size), so the recipe's output scales with its input tier instead
    * of a fixed-k cap masquerading as a collapse.
    */
  private val mPretrainRecipe = Spec("ml_pretrain_recipe",
    (s, dir) => {
      val yaml =
        s"""pipeline:
           |  - type: quality_gopher
           |    text_field: text
           |  - type: deleter
           |    rules:
           |      - filter: "g_n_words:[* TO 49]"
           |        deleter: {delete: true}
           |  - type: perplexity_score
           |    id_field: doc_id
           |    text_field: text
           |    min_logprob_quantile: 0.1
           |  - type: dsir_sample
           |    id_field: doc_id
           |    text_field: text
           |    fraction: 0.6
           |    target_filter: "lang:en"
           |  - type: hash_split
           |    id_field: doc_id
           |""".stripMargin
      graft.pipeline.PipelineCompiler.compile(
          graft.pipeline.RuleLoader.fromYaml(yaml))(t(s, dir, "documents"))
        .main
        .select(col("doc_id"), col("lang"), col("source"),
          col("g_n_words"), col("lm_logprob"), col("split"))
    },
    Some {
      val l1 = 0.9; val l2 = 1.0 - 0.9
      s"""WITH g0 AS (SELECT doc_id, lang, source, text,
            list_filter(regexp_split_to_array(trim(text), '\\s+'),
              x -> x <> '') AS wt FROM documents),
          kept AS (SELECT doc_id, lang, source, text,
            CAST(len(wt) AS BIGINT) AS g_n_words
            FROM g0 WHERE len(wt) >= 50),
          w AS (SELECT doc_id, list_filter(string_split(text, ' '),
            x -> x <> '') AS w FROM kept),
          tok AS (SELECT doc_id, unnest(w) AS t FROM w),
          uni AS (SELECT t, count(*) AS c1 FROM tok GROUP BY t),
          n AS (SELECT CAST(sum(c1) AS DOUBLE) AS n FROM uni),
          bg AS (SELECT doc_id, unnest(list_transform(range(len(w)-1),
              i -> w[i+1]||' '||w[i+2])) AS g
            FROM w WHERE len(w) >= 2),
          bc AS (SELECT g, count(*) AS c2 FROM bg GROUP BY g),
          pr AS (SELECT g, $l1*CAST(c2 AS DOUBLE)/CAST(u1.c1 AS DOUBLE)
                + $l2*CAST(u2.c1 AS DOUBLE)/n AS p
            FROM bc JOIN uni u1 ON u1.t = string_split(g, ' ')[1]
                    JOIN uni u2 ON u2.t = string_split(g, ' ')[2]
                    CROSS JOIN n),
          per AS (SELECT doc_id, count(*) AS n_bigrams,
              round(avg(ln(p)), 6) AS avg_logprob
            FROM bg JOIN pr USING (g) GROUP BY doc_id),
          lm AS (SELECT k.*, coalesce(per.avg_logprob, 0.0) AS lm_logprob
            FROM kept k LEFT JOIN per USING (doc_id)),
          thr AS (SELECT percentile_disc(0.1)
              WITHIN GROUP (ORDER BY lm_logprob) AS thr FROM lm),
          lmk AS (SELECT lm.* FROM lm CROSS JOIN thr
            WHERE lm_logprob >= thr),
          fw AS (SELECT doc_id, lang,
            list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM lmk),
          f AS (SELECT doc_id, lang, unnest(list_concat(w,
              list_transform(range(len(w)-1), i -> w[i+1]||' '||w[i+2]))) AS f
            FROM fw),
          fb AS (SELECT doc_id, lang,
            ('0x'||substr(md5(f),1,8))::BIGINT % 1024 AS b FROM f),
          rawb AS (SELECT b, count(*) AS cr FROM fb GROUP BY b),
          tgtb AS (SELECT b, count(*) AS ct FROM fb
            WHERE lang = 'en' GROUP BY b),
          nr AS (SELECT CAST(sum(cr) AS DOUBLE) AS n_raw FROM rawb),
          nt AS (SELECT CAST(sum(ct) AS DOUBLE) AS n_tgt FROM tgtb),
          lr AS (SELECT b,
              ln((CAST(coalesce(ct, 0) AS DOUBLE) + 1.0) /
                 (n_tgt + 1.0 * 1024.0))
            - ln((CAST(cr AS DOUBLE) + 1.0) /
                 (n_raw + 1.0 * 1024.0)) AS lr
            FROM rawb LEFT JOIN tgtb USING (b)
            CROSS JOIN nr CROSS JOIN nt),
          per2 AS (SELECT doc_id, round(sum(lr), 6) AS log_weight
            FROM fb JOIN lr USING (b) GROUP BY doc_id),
          wt2 AS (SELECT l.*, coalesce(log_weight, 0.0) AS log_weight
            FROM lmk l LEFT JOIN per2 USING (doc_id)),
          sel AS (SELECT * FROM wt2
            QUALIFY row_number() OVER (ORDER BY round(log_weight + -ln(-ln(
              (('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT + 0.5)
              / 4294967296.0)), 6) DESC, doc_id ASC)
              <= ceil(0.6 * (SELECT count(*) FROM wt2)))
          SELECT doc_id, lang, source, g_n_words, lm_logprob,
            CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'validation'
                 ELSE 'test' END AS split
          FROM (SELECT *, CAST(concat('0x',
            substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100
            AS b FROM sel)"""
    })

  /** The quantile LM gate in isolation (the `ml_pretrain_recipe` gate,
    * minus the surrounding stages): score every document with the
    * self-trained bigram LM, drop the lowest-likelihood quarter. The
    * threshold is percentile_disc — an actual observed score, no
    * interpolation — so both engines pick the identical cut point.
    */
  /** DuckDB CTE chain through `lm(doc_id, lm_n_bigrams, lm_logprob)` —
    * the self-trained bigram LM score of every document, replaying
    * [[CorpusStats.bigramLogProb]]'s interpolation. Shared by the
    * quantile-gate and bucket-label oracles.
    */
  private def bigramLmCte: String = {
    val l1 = 0.9; val l2 = 1.0 - 0.9
    s"""WITH w AS (SELECT doc_id,
          list_filter(string_split(text, ' '), x -> x <> '') AS w
          FROM documents),
        tok AS (SELECT doc_id, unnest(w) AS t FROM w),
        uni AS (SELECT t, count(*) AS c1 FROM tok GROUP BY t),
        n AS (SELECT CAST(sum(c1) AS DOUBLE) AS n FROM uni),
        bg AS (SELECT doc_id, unnest(list_transform(range(len(w)-1),
            i -> w[i+1]||' '||w[i+2])) AS g
          FROM w WHERE len(w) >= 2),
        bc AS (SELECT g, count(*) AS c2 FROM bg GROUP BY g),
        pr AS (SELECT g, $l1*CAST(c2 AS DOUBLE)/CAST(u1.c1 AS DOUBLE)
              + $l2*CAST(u2.c1 AS DOUBLE)/n AS p
          FROM bc JOIN uni u1 ON u1.t = string_split(g, ' ')[1]
                  JOIN uni u2 ON u2.t = string_split(g, ' ')[2]
                  CROSS JOIN n),
        per AS (SELECT doc_id, count(*) AS n_bigrams,
            round(avg(ln(p)), 6) AS avg_logprob
          FROM bg JOIN pr USING (g) GROUP BY doc_id),
        lm AS (SELECT d.doc_id,
            coalesce(n_bigrams, 0) AS lm_n_bigrams,
            coalesce(avg_logprob, 0.0) AS lm_logprob
          FROM documents d LEFT JOIN per USING (doc_id))"""
  }

  private val mLmQuantile = Spec("ml_lm_quantile",
    (s, dir) => {
      val yaml =
        s"""pipeline:
           |  - type: perplexity_score
           |    id_field: doc_id
           |    text_field: text
           |    min_logprob_quantile: 0.25
           |""".stripMargin
      graft.pipeline.PipelineCompiler.compile(
          graft.pipeline.RuleLoader.fromYaml(yaml))(t(s, dir, "documents"))
        .main
        .select(col("doc_id"), col("lm_n_bigrams"), col("lm_logprob"))
    },
    Some(bigramLmCte + """,
          thr AS (SELECT percentile_disc(0.25)
              WITHIN GROUP (ORDER BY lm_logprob) AS thr FROM lm)
          SELECT lm.doc_id, lm.lm_n_bigrams, lm.lm_logprob
          FROM lm CROSS JOIN thr WHERE lm_logprob >= thr"""))

  /** CCNet head/middle/tail labeling (Wenzek et al. 2020 split the
    * corpus into perplexity BUCKETS; here bucket 2 = best third by LM
    * logprob, 0 = worst) — the labeling face of the quantile gate.
    */
  private val mLmBuckets = Spec("ml_lm_buckets",
    (s, dir) => {
      val yaml =
        s"""pipeline:
           |  - type: perplexity_score
           |    id_field: doc_id
           |    text_field: text
           |    quantile_buckets: [0.33, 0.67]
           |""".stripMargin
      graft.pipeline.PipelineCompiler.compile(
          graft.pipeline.RuleLoader.fromYaml(yaml))(t(s, dir, "documents"))
        .main
        .select(col("doc_id"), col("lm_logprob"), col("lm_bucket"))
    },
    Some(bigramLmCte + """,
          thr AS (SELECT
              percentile_disc(0.33) WITHIN GROUP (ORDER BY lm_logprob) AS t1,
              percentile_disc(0.67) WITHIN GROUP (ORDER BY lm_logprob) AS t2
            FROM lm)
          SELECT lm.doc_id, lm.lm_logprob,
            (CASE WHEN lm_logprob >= t1 THEN 1 ELSE 0 END
           + CASE WHEN lm_logprob >= t2 THEN 1 ELSE 0 END) AS lm_bucket
          FROM lm CROSS JOIN thr"""))

  // ======================================================================
  // Embedding-space clustering for curation
  // ======================================================================

  /** DuckDB CTE chain replaying [[Similarity.kmeansCentroids]]'s exact
    * trajectory: hash-partition init means, then `iters` rounds of
    * (argmin-assign → per-cluster means), every centroid coordinate
    * rounded to 6 decimals in both engines so the argmin distances
    * compute from bit-identical inputs. Ends with table `af(vec_id, c)`,
    * the final assignment.
    */
  private def kmeansSql(k: Int, dim: Int, iters: Int): String = {
    def sqDist(cenTbl: String) =
      s"""list_aggregate(list_transform(range($dim),
           i -> (e.v[i+1]-$cenTbl.cen[i+1])*(e.v[i+1]-$cenTbl.cen[i+1])), 'sum')"""
    def assign(name: String, cenTbl: String) =
      s"""$name AS (SELECT vec_id, c FROM (
            SELECT e.vec_id, $cenTbl.c, row_number() OVER (
              PARTITION BY e.vec_id
              ORDER BY ${sqDist(cenTbl)} ASC, $cenTbl.c ASC) AS rn
            FROM e CROSS JOIN $cenTbl) WHERE rn = 1)"""
    val rounds = (1 to iters).map { r =>
      s"""${assign(s"a$r", s"c${r - 1}")},
          m$r AS (SELECT a$r.c AS c, i, round(avg(e.v[i+1]), 6) AS x
            FROM a$r JOIN e USING (vec_id), unnest(range($dim)) AS u(i)
            GROUP BY a$r.c, i),
          cm$r AS (SELECT c, list(x ORDER BY i) AS cen FROM m$r GROUP BY c),
          c$r AS (SELECT c${r - 1}.c, coalesce(cm$r.cen, c${r - 1}.cen) AS cen
            FROM c${r - 1} LEFT JOIN cm$r ON cm$r.c = c${r - 1}.c)"""
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
          WHERE embedding IS NOT NULL AND len(embedding) = $dim
            AND len(list_filter(embedding, x -> x IS NULL)) = 0),
        m0 AS (SELECT CAST(vec_id % $k AS INT) AS c, i,
            round(avg(v[i+1]), 6) AS x
          FROM e, unnest(range($dim)) AS u(i) GROUP BY c, i),
        c0 AS (SELECT c, list(x ORDER BY i) AS cen FROM m0 GROUP BY c),
        $rounds,
        ${assign("af", s"c$iters")}"""
  }

  private val mKmeans = Spec("ml_kmeans_assign",
    (s, dir) => Similarity.kmeansAssign(t(s, dir, "embeddings"),
      "vec_id", "embedding", k = 8, dim = 64, iters = 2),
    Some(kmeansSql(8, 64, 2) +
      " SELECT vec_id, CAST(c AS INT) AS cluster FROM af"))

  private val mClusterPurity = Spec("ml_cluster_purity",
    (s, dir) => Similarity.clusterPurity(t(s, dir, "embeddings"),
      "vec_id", "embedding", "label", k = 8, dim = 64, iters = 1),
    Some(kmeansSql(8, 64, 1) + s""",
          hist AS (
            SELECT af.c AS cluster, e2.label, count(*) AS cnt
            FROM af JOIN embeddings e2 USING (vec_id)
            GROUP BY af.c, e2.label),
          tot AS (SELECT cluster, CAST(sum(cnt) AS BIGINT) AS n
            FROM hist GROUP BY cluster)
          SELECT cluster, n, majority_label, purity FROM (
            SELECT hist.cluster, tot.n,
              hist.label AS majority_label,
              round(CAST(cnt AS DOUBLE) / n, 6) AS purity,
              row_number() OVER (PARTITION BY hist.cluster
                ORDER BY cnt DESC, hist.label ASC) AS rn
            FROM hist JOIN tot USING (cluster)) WHERE rn = 1"""))

  private val mClusterSample = Spec("ml_cluster_sample",
    (s, dir) => Similarity.clusterSample(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8, dim = 64, iters = 1, perCluster = 5)
      .select(col("vec_id"), col("cluster")),
    Some(kmeansSql(8, 64, 1) +
      """ SELECT vec_id, cluster FROM (
            SELECT vec_id, CAST(c AS INT) AS cluster, row_number() OVER (
              PARTITION BY c
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
            FROM af) WHERE rn <= 5"""))

  // ----------------------------------------------------------------------

  val all: Seq[Spec] = Seq(
    mExact, mFingerprint, mMinhashSig, mMinhashPairs, mSimhash, mSimhashPairs,
    mSimhashKeep,
    mJaccardPairs, mContainmentPairs, mFuzzyPairs, mFuzzyPairsSeg,
    mFuzzyKeep, mFuzzyAgainst, mFuzzyIngest,
    mNearDupKeep, mNearDupClusters,
    mClusterSplit,
    mTopK, mLsh, mCosPairs, mCosPairsRecall, mIvf, mLangId, mLangMix,
    mQuality, mTokenCount,
    mTextNormalize, mMultimodal,
    mMultimodalAudio, mMultimodalPdf, mMultimodalVideo, mMultimodalImage,
    mMultimodalPixels, mImageAHash, mImageNearDup, mAudioPcm, mAudioFlac,
    mMediaRecipe,
    mAudioAHash, mMediaAgainst,
    mRepetition, mHashSplit, mStratified,
    mNgramTopK, mZipfFit, mContamination, mDocFreq, mPackChunks, mPiiRedact,
    mPiiCards,
    mUnigramLP, mDupNgrams, mDupSpans, mDupSpansClean, mBm25, mBm25Index,
    mBm25Ingest, mHybrid,
    mHybridIndex,
    mParaDedup,
    mCovariance,
    mSemanticKeep, mEmbedOutlier, mWeightedSample, mTemperature, mTokenBudget,
    mQualityBudget,
    mClassifierMargin, mDedupAgainst, mNearDupAgainst, mPqEncode,
    mChunkSpans, mShuffleLayout, mBpeMerges, mBpeTokens, mCurationPipeline,
    mGopher, mDedupLines, mC4Lines, mBigramLP, mBigramXent,
    mBigramXentStore,
    mTrigramBackoff,
    mTrigramBackoffStore,
    mDsirWeights, mDsirSample,
    mDecontamSpans,
    mDecontamClean, mPretrainRecipe, mLmQuantile, mLmBuckets, mSq8, mSq8TopK,
    mCorpusProfile, mKmeans, mClusterSample, mKnnGraph, mIvfKmeans,
    mAnnPipeline,
    mAnnIngest,
    mEmbedAgainst, mClusterPurity)
}
