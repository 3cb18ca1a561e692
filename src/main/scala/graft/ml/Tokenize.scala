package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * train-a-tokenizer-from-the-corpus step of an LLM data pipeline.
  *
  * The scale shape: ONE corpus scan builds the word-frequency table
  * (vocabulary-sized — the classic BPE insight is that training never
  * needs the corpus again, only (word, freq)); each merge round is then
  * one pair-count aggregate over the vocab plus a driver-side argmax of
  * exactly ONE row (`orderBy(cnt desc, pair asc).limit(1)` plans as
  * TakeOrderedAndProject — per-partition heaps, one row to the driver).
  * Merge application is a literal string `replace` on a sentinel-wrapped
  * symbol representation — codegen'd, no UDF, no regex:
  *
  *   word "abc"  →  "|a||b||c|"
  *
  * Merging pair (a,b) = replace("|a||b|" → "|ab|"). String replace scans
  * left-to-right non-overlapping — exactly BPE's greedy merge order
  * ("aaa" + (a,a) → "aa a", not "a aa") — and because every symbol's
  * sentinels are consumed by the match, a symbol can never match inside
  * a longer symbol. The same representation runs verbatim in the DuckDB
  * oracle (plain `replace`, no regex-escaping concerns), so engine and
  * oracle apply bit-identical merge semantics.
  *
  * Words containing the sentinel character `|` are excluded from
  * training and tokenized as single symbols by [[applyMerges]] — the
  * documented contract of the sentinel representation.
  */
object Tokenize {

  /** Sentinel-wrapped symbol representation of a word: one `|` around
    * every symbol, so adjacent symbols read `a||b`.
    */
  private[ml] def wrapped(word: Column): Column =
    concat(lit("|"),
      array_join(filter(split(word, ""), c => c =!= ""), "||"), lit("|"))

  /** Symbols of a wrapped representation. */
  private[ml] def symbols(r: Column): Column =
    split(substring(r, lit(2), length(r) - 2), "\\|\\|")

  /** Word-frequency table with the initial (character-level) wrapped
    * representation: (word, freq, repr). Words = [[Curation.words]]
    * semantics; sentinel-carrying words are excluded (see object doc).
    */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Curation.words(col(textCol))).as("word"))
      .filter(!col("word").contains("|"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("repr", wrapped(col("word")))

  /** One learned merge: the pair and its weighted count when chosen. */
  final case class Merge(lhs: String, rhs: String, cnt: Long)

  /** Train `k` BPE merges over the corpus. Returns the ordered merge
    * list — driver-small by definition (k rows; real tokenizers train
    * tens of thousands of merges, each still ONE aggregate + a 1-row
    * argmax). Ties break deterministically (count desc, then pair asc)
    * so the learned tokenizer is identical across engines and runs.
    * Training stops early when no pair remains (all words fully merged).
    */
  def trainBpeMerges(df: DataFrame, textCol: String, k: Int): Seq[Merge] = {
    require(k >= 0, s"merge count must be non-negative, got $k")
    var vocab = wordFreq(df, textCol).persist()
    vocab.count() // materialize before the round loop reuses it
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    var i = 0
    while (i < k && !exhausted) {
      val s = symbols(col("repr"))
      val pair = zip_with(
        slice(s, lit(1), size(s) - 1), slice(s, lit(2), size(s) - 1),
        (a, b) => struct(a.as("lhs"), b.as("rhs")))
      val top = vocab
        .select(col("freq"), explode(pair).as("p"))
        .groupBy(col("p.lhs"), col("p.rhs")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      top.headOption match {
        case Some(r) =>
          val m = Merge(r.getString(0), r.getString(1), r.getLong(2))
          merges += m
          val next0 = vocab.withColumn("repr", replace(col("repr"),
            lit(s"|${m.lhs}||${m.rhs}|"), lit(s"|${m.lhs}${m.rhs}|")))
          // truncate lineage periodically: each round nests one replace
          // over the previous plan, and thousands of merge rounds would
          // make analysis quadratic / overflow the optimizer (the
          // nearDupKeep pattern)
          val next =
            if (merges.size % 32 == 0) next0.localCheckpoint()
            else { val p = next0.persist(); p.count(); p }
          vocab.unpersist(blocking = false)
          vocab = next
        case None => exhausted = true
      }
      i += 1
    }
    vocab.unpersist(blocking = false)
    merges.toSeq
  }

  /** The learned merges as a DataFrame (rank, lhs, rhs, cnt) — the
    * oracle-comparable artifact of [[trainBpeMerges]].
    */
  def bpeMergeTable(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val merges = trainBpeMerges(df, textCol, k)
    val rows = merges.zipWithIndex.map { case (m, i) =>
      Row(i + 1, m.lhs, m.rhs, m.cnt)
    }
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false))))
  }

  /** Apply learned merges to a text column → array of subword tokens.
    * A chain of `k` literal string replaces per word — codegen'd column
    * algebra, no UDF; at 100 TB this is scan-speed narrow work. Words
    * carrying the sentinel stay single symbols (training excluded them).
    */
  def applyMerges(text: Column, merges: Seq[Merge]): Column =
    flatten(transform(Curation.words(text), w => {
      val merged = merges.foldLeft(wrapped(w)) { (r, m) =>
        replace(r, lit(s"|${m.lhs}||${m.rhs}|"), lit(s"|${m.lhs}${m.rhs}|"))
      }
      // sentinel-carrying words never enter the replace chain: their
      // wrapped form could alias a merge pattern ("a||b" wraps to the
      // same bytes as a merged (a,b) pair)
      when(w.contains("|"), array(w))
        .otherwise(split(substring(merged, lit(2), length(merged) - 2),
          "\\|\\|"))
    }))
}
