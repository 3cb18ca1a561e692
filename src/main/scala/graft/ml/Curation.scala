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
}
