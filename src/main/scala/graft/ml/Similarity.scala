package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact; one broadcast of the query
  * set, no shuffle of the corpus — scales linearly, the right exact plan
  * at any corpus size when |queries| is small). Scale path: IVF-style
  * bucketed search — assign vectors to the nearest of C centroids at write
  * time, probe only matching buckets at query time (touches ~1/C of the
  * corpus; partition-prunable when the corpus is written partitioned by
  * bucket).
  */
object Similarity {

  /** Dot product of two equal-length double arrays (codegen'd fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Brute-force exact top-k neighbors for each query vector.
    * `queries`: (qid, qvec) — small, broadcast; `corpus`: (id, vec).
    * One narrow pass over the corpus per partition + a top-k window.
    * Ties broken by corpus id (deterministic).
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus.crossJoin(broadcast(queries))
    val qv = col(qvecCol).cast("array<double>")
    val cv = col(vecCol).cast("array<double>")
    val scored = joined.select(
      col(qidCol).as("qid"), col(idCol).as("id"),
      round(cosine(cv, qv), 6).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF bucket assignment: nearest centroid index (argmax cosine).
    * Centroids are a small broadcast array-of-arrays literal. At write
    * time: `corpus.withColumn("bucket", assignBucket(...)).write.partitionBy("bucket")`
    * → query-time partition pruning touches only probed buckets.
    */
  def assignBucket(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val sims = array(centroids.map { c =>
      val cc = array(c.map(lit): _*)
      cosine(vec.cast("array<double>"), cc)
    }: _*)
    // argmax with first-wins tie-break
    array_position(sims, array_max(sims)).cast("int") - 1
  }

  /** IVF top-k: assign each query to its `nprobe` best buckets, search only
    * corpus rows in those buckets. Exactness degrades gracefully (standard
    * IVF recall/latency trade).
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              centroids: Seq[Seq[Double]], k: Int, nprobe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = corpus.withColumn("__bucket",
      assignBucket(col(vecCol), centroids))
    // nprobe buckets per query: indices of the nprobe largest centroid sims
    val qsims = array(centroids.indices.map { i =>
      val cc = array(centroids(i).map(lit): _*)
      struct(cosine(col(qvecCol).cast("array<double>"), cc).as("sim"),
        lit(i).as("idx"))
    }: _*)
    val probed = queries.withColumn("__probe",
      transform(slice(reverse(array_sort(qsims)), 1, nprobe), s => s.getField("idx")))
    val joined = bucketed.join(broadcast(probed),
      array_contains(col("__probe"), col("__bucket")))
    val scored = joined.select(col(qidCol).as("qid"), col(idCol).as("id"),
      round(cosine(col(vecCol).cast("array<double>"),
        col(qvecCol).cast("array<double>")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket for cosine similarity: sign-bit string of
    * `planes` fixed hyperplanes (deterministic seed-free planes derived
    * from index parity patterns would be weak — caller passes planes).
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    concat(planes.map { p =>
      val pc = array(p.map(lit): _*)
      when(dot(vec.cast("array<double>"), pc) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Embedding-cosine near-duplicate pairs: random-hyperplane LSH buckets
    * bound the candidate space (only same-bucket pairs are scored), then
    * exact cosine keeps pairs ≥ `threshold` — the embedding analogue of
    * [[Dedup.nearDupPairs]]. The bucketed table is persisted once before
    * the self-join (single scan + bucket assignment; AQE sizes the join
    * off the cached table), and pair volume is bounded per bucket instead
    * of any all-pairs blow-up — the only shape that survives 100 TB.
    */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         planes: Seq[Seq[Double]],
                         threshold: Double): DataFrame = {
    val bucketed = corpus.select(
      col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"),
      lshBucket(col(vecCol), planes).as("bucket"))
      .persist()
    val l = bucketed.alias("l"); val r = bucketed.alias("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        round(cosine(col("l.v"), col("r.v")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
