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

  /** k-word shingles, distinct, of a text column. */
  def shingles(text: Column, k: Int = 3): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) >= k,
        transform(sequence(lit(0), size(t) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(t, (i + j + 1).cast("int"))): _*)))
      .otherwise(array(concat_ws(" ", t))))
  }

  /** Exact dedup: keep the first (min orderKey) row per md5(text).
    * One shuffle on the 32-hex key; at scale use this over full-row
    * comparison — the key is 16 bytes, not the document.
    */
  def exact(df: DataFrame, textCol: String, orderKey: String): DataFrame = {
    val keyed = df.withColumn("__h", md5(col(textCol)))
    val keep = keyed.groupBy(col("__h"))
      .agg(min(col(orderKey)).as(orderKey + "_keep"))
    keyed.join(keep,
        keyed("__h") === keep("__h") &&
        keyed(orderKey) === keep(orderKey + "_keep"))
      .select(df.columns.map(keyed(_)): _*)
  }

  /** MinHash signature: `n` independent min-hashes over the shingle set.
    * Hash_i(s) = md5(i || '|' || s) compared lexicographically (a min over
    * hex strings is a valid permutation min). Returns array<string>(n).
    */
  def minhashSignature(text: Column, n: Int = 12, k: Int = 3): Column = {
    val sh = shingles(text, k)
    array((0 until n).map { i =>
      array_min(transform(sh, s => md5(concat(lit(i.toString), lit("|"), s))))
    }: _*)
  }

  /** MinHash-LSH candidate pairs: signatures banded `bands` × `rowsPerBand`;
    * docs sharing any band bucket are candidates. Output: (a, b) doc-id
    * pairs, a < b, distinct. The only shuffle is the groupBy on
    * (band, band_key) — the classic LSH plan that survives 100×: bucket
    * sizes are bounded by similarity structure, not corpus size, and the
    * self-join is per-bucket.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   bands: Int = 4, rowsPerBand: Int = 3, k: Int = 3): DataFrame = {
    val n = bands * rowsPerBand
    val sig = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), n, k).as("sig"))
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        concat_ws("", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val l = banded.alias("l")
    val r = banded.alias("r")
    l.join(r, col("l.band") === col("r.band") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
  }

  /** SimHash: 32-bit fingerprint from token md5s. For each of 32 bit
    * positions, sum +1/-1 over tokens by bit value; fingerprint bit = sign.
    * Pure expressions: bit j of token t = (conv(md5hex[j/4], 16, 10) >> (j%4)) & 1.
    */
  def simhash(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val bits = (0 until 32).map { j =>
      val nib = j / 4
      val bit = j % 4
      // nibble `nib` of md5(token) as int, then bit `bit` of it
      val contrib = aggregate(toks, lit(0),
        (acc, t) => acc + when(
          (conv(substring(md5(t), nib + 1, 1), 16, 10).cast("int")
            .bitwiseAND(lit(1 << bit))) > 0, lit(1)).otherwise(lit(-1)))
      when(contrib > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a + b)
  }

  /** SimHash near-dup candidates: equal fingerprints within the same 16-bit
    * band (2 bands of the 32-bit hash → Hamming-distance-tolerant blocking).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val banded = sig.select(col("id"), col("sh"),
      explode(array(
        struct(lit(0).as("band"), (col("sh").bitwiseAND(lit(0xFFFFL))).as("key")),
        struct(lit(1).as("band"), shiftright(col("sh"), 16).bitwiseAND(lit(0xFFFFL)).as("key")))).as("b"))
      .select(col("id"), col("sh"), col("b.band"), col("b.key"))
    val l = banded.alias("l"); val r = banded.alias("r")
    l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b")).distinct()
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

  /** Blocked n-gram-Jaccard near-dup pairs: block on a cheap key (here the
    * first token + length bucket) then exact Jaccard within blocks ≥
    * threshold. The blocking keeps the join linear-ish at scale.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   blockCol: Column, threshold: Double, k: Int = 3): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"),
      blockCol.as("blk"))
    val l = base.alias("l"); val r = base.alias("r")
    l.join(r, col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        jaccard(col("l.text"), col("r.text"), k).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
