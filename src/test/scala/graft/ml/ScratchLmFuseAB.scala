package graft.ml

import graft.{CacheSweep, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: paired A/B of the bigramLogProb fusion candidate (VERDICT
  * r17 next #5 — "fuse the LM counts pass with the per-doc occurrence
  * pass at the cost of an occurrence-sized cache; measure at x10/x100
  * BEFORE shipping").
  *
  * A = the shipped shape: ONE fused words+bigrams explode into the
  *     type-sized count aggregate (persisted), plus a SECOND bigram
  *     explode for the per-doc occurrence join.
  * B = the candidate: persist the (id, g) bigram explode ONCE
  *     (occurrence-sized cache) and derive BOTH the bigram counts and
  *     the occurrence join from it; unigram counts ride their own
  *     words explode.
  *
  * Alternating order within each rep (the ScratchFuzzyAB discipline);
  * output equality is hard-required once per tier before timing.
  * `Test/runMain graft.ml.ScratchLmFuseAB [dir] [reps]`.
  */
object ScratchLmFuseAB {

  /** Candidate B, semantics mirrored from bigramLogProb token for
    * token (same literal structure, same association).
    */
  private def fused(df: DataFrame, idCol: String, textCol: String,
                    lambda: Double = 0.9): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      explode(CorpusStats.ngramArray(col(textCol), 2)).as("g")).persist()
    val uni = df.select(explode(Curation.words(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c1"))
      .persist()
    val total = uni.agg(sum(col("c1")).cast("double").as("n"))
    val bcnt = grams.select(col("g")).groupBy(col("g"))
      .agg(count(lit(1)).as("c2"))
      .select(unhex(md5(col("g"))).as("gd"), col("c2"), col("g"))
    val big = grams.select(col("id"), unhex(md5(col("g"))).as("gd"))
    val parts = bcnt
      .withColumn("__w1", element_at(split(col("g"), " "), 1))
      .withColumn("__w2", element_at(split(col("g"), " "), 2))
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

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.table(spark, dir, "documents")

    def shipped(): DataFrame =
      CorpusStats.bigramLogProb(docs, "doc_id", "text")

    // equality gate before any timing
    val a = shipped().collect().map(_.toSeq.map(String.valueOf)).sorted
    CacheSweep.sweep(spark)
    val b = fused(docs, "doc_id", "text").collect()
      .map(_.toSeq.map(String.valueOf)).sorted
    CacheSweep.sweep(spark)
    require(a.sameElements(b), s"fused variant diverges: ${a.length}/${b.length}")
    println(s"""{"equality":"ok","rows":${a.length},"dir":"$dir"}""")

    def once(useFused: Boolean): Double = {
      val t0 = System.nanoTime()
      val df = if (useFused) fused(docs, "doc_id", "text") else shipped()
      df.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      CacheSweep.sweep(spark)
      dt
    }
    once(false); once(true) // warm-up
    val rows = (1 to reps).flatMap { r =>
      val order = if (r % 2 == 1) Seq(false, true) else Seq(true, false)
      order.map { f =>
        val dt = once(f)
        println(f"""{"ab_rep":$r,"fused":$f,"sec":$dt%.2f}""")
        (f, dt)
      }
    }
    def best(f: Boolean) = rows.filter(_._1 == f).map(_._2).min
    println(f"""{"ab_summary":"min","dir":"$dir","shipped_sec":${best(false)}%.2f,"fused_sec":${best(true)}%.2f}""")
    spark.stop()
  }
}
