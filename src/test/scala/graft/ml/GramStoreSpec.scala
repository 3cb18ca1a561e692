package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental gram-count store: batch counts must SUM exactly to
  * one-shot counts (the bit-identical-scores guarantee), appends are
  * idempotent per batch id, the orders marker refuses mixed shapes,
  * and compaction is a pure rewrite.
  */
class GramStoreSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "a cat and a dog"),
      (4L, "the cat sat"),
      (5L, "entirely novel words here")
    ).toDF("doc_id", "text")
  }

  private def freshStore(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"gram-$tag").toString
    s"$d/store"
  }

  private def countMap(store: String): Map[(Int, String), Long] =
    GramStore.counts(spark, store)
      .select("kind", "g", "c").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap

  test("two-batch append merges to the exact one-shot counts") {
    val store = freshStore("merge")
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", store, "b1")
    GramStore.append(docs.filter(col("doc_id") > 2), "text", store, "b2")
    val oneShot = CorpusStats.fusedGramCountsN(docs, "text", 2)
      .select("kind", "g", "c").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(countMap(store) == oneShot)
    assert(GramStore.orders(spark, store) == 2)
  }

  test("re-appending a batch id is a no-op (replay safety)") {
    val store = freshStore("idem")
    GramStore.append(docs, "text", store, "b1")
    val before = countMap(store)
    GramStore.append(docs, "text", store, "b1") // replay
    assert(countMap(store) == before, "replay double-counted")
    GramStore.append(docs.limit(1), "text", store, "b1") // even different data
    assert(countMap(store) == before)
    intercept[IllegalArgumentException](
      GramStore.append(docs, "text", store, ""))
    intercept[IllegalArgumentException](
      GramStore.append(docs, "text", store, "__compact"))
  }

  test("the orders marker refuses mixed shapes and raw directories") {
    val store = freshStore("orders")
    GramStore.append(docs, "text", store, "b1", orders = 2)
    val e = intercept[IllegalArgumentException] {
      GramStore.append(docs, "text", store, "b2", orders = 3)
    }
    assert(e.getMessage.contains("pinned to orders=2"), e.getMessage)
    // a trigram scorer over an orders-2 store is refused up front
    val e2 = intercept[IllegalArgumentException] {
      CorpusStats.trigramStupidBackoffFromStore(docs, store,
        "doc_id", "text")
    }
    assert(e2.getMessage.contains("orders >= 3"), e2.getMessage)
    // a raw parquet directory is not a store
    val raw = freshStore("raw")
    docs.write.parquet(raw)
    val e3 = intercept[IllegalArgumentException] {
      CorpusStats.bigramLogProbFromStore(docs, raw, "doc_id", "text")
    }
    assert(e3.getMessage.contains("_graft_grams.json"), e3.getMessage)
  }

  test("store-trained scores are row-identical to corpus-trained ones") {
    val train = docs.filter(col("doc_id") <= 3)
    val corpus = docs.filter(col("doc_id") > 3)
    val store = freshStore("score")
    GramStore.append(train.filter(col("doc_id") % 2 === 1), "text", store, "odd")
    GramStore.append(train.filter(col("doc_id") % 2 === 0), "text", store, "even")
    val direct = CorpusStats.bigramLogProbAgainst(corpus, train,
      "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq)
    graft.CacheSweep.sweep(spark)
    val fromStore = CorpusStats.bigramLogProbFromStore(corpus, store,
      "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq)
    graft.CacheSweep.sweep(spark)
    assert(direct.sameElements(fromStore))
    // trigram: same equality over an orders-3 store
    val store3 = freshStore("score3")
    GramStore.append(train, "text", store3, "all", orders = 3)
    val d3 = CorpusStats.trigramStupidBackoff(corpus, train,
      "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq)
    graft.CacheSweep.sweep(spark)
    val s3 = CorpusStats.trigramStupidBackoffFromStore(corpus, store3,
      "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq)
    graft.CacheSweep.sweep(spark)
    assert(d3.sameElements(s3))
  }

  test("compact folds per-batch rows; counts, marker, appends survive") {
    val store = freshStore("compact")
    GramStore.append(docs.filter(col("doc_id") <= 2), "text", store, "b1")
    GramStore.append(docs.filter(col("doc_id") > 2), "text", store, "b2")
    val before = countMap(store)
    // a stale parked copy from a crashed previous compaction
    docs.limit(1).select(lit(0).as("kind"), col("text").as("g"),
        lit(9L).as("c"), lit("x").as("bid"))
      .write.parquet(store + ".compact-old")
    val (rowsBefore, rowsAfter) = GramStore.compact(spark, store)
    assert(rowsAfter < rowsBefore, s"$rowsBefore -> $rowsAfter")
    assert(countMap(store) == before, "compaction changed the counts")
    assert(GramStore.orders(spark, store) == 2, "marker lost in the swap")
    assert(!new java.io.File(store + ".compact-old").exists())
    assert(!new java.io.File(store + ".compact-tmp").exists())
    // the store keeps growing after compaction
    GramStore.append(docs.filter(col("doc_id") === 5), "text", store, "b3")
    val again = countMap(store)
    assert(again(0 -> "novel") == 1L + before.getOrElse(0 -> "novel", 0L))
  }

  test("stats_ingest stage: explicit batch_id in batch mode, " +
      "pass-through rows, store feeds perplexity_score") {
    val s = spark
    val store = freshStore("stage")
    def run(yaml: String) = graft.pipeline.PipelineCompiler.compile(
      graft.pipeline.RuleLoader.fromYaml(yaml))(docs).main
    // no batch_id in batch mode: refused with the double-count rationale
    val e = intercept[IllegalArgumentException] {
      run(s"pipeline:\n  - type: stats_ingest\n    text_field: text\n" +
        s"    store: $store\n")
    }
    assert(e.getMessage.contains("batch_id"), e.getMessage)
    // with one: rows pass through unchanged, counts land
    val out = run(
      s"""pipeline:
         |  - type: stats_ingest
         |    text_field: text
         |    store: $store
         |    batch_id: run-a
         |""".stripMargin)
    assert(out.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      docs.orderBy("doc_id").collect().map(_.toSeq).toSeq)
    assert(countMap(store).nonEmpty)
    // and perplexity_score trains from it (store == its own input here,
    // so scores equal the self-exemplar bigramLogProbAgainst form)
    val scored = graft.pipeline.PipelineCompiler.compile(
      graft.pipeline.RuleLoader.fromYaml(
        s"""pipeline:
           |  - type: perplexity_score
           |    id_field: doc_id
           |    text_field: text
           |    train: {store: "$store"}
           |""".stripMargin))(docs).main
    val expect = CorpusStats.bigramLogProbAgainst(docs, docs,
      "doc_id", "text")
    assert(scored.select("doc_id", "lm_n_bigrams", "lm_logprob")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      expect.orderBy("doc_id").collect().map(_.toSeq).toSeq)
    graft.CacheSweep.sweep(spark)
    // path + store together is ambiguous: refused
    val e2 = intercept[IllegalArgumentException] {
      graft.pipeline.PipelineCompiler.compile(
        graft.pipeline.RuleLoader.fromYaml(
          s"""pipeline:
             |  - type: perplexity_score
             |    id_field: doc_id
             |    text_field: text
             |    train: {store: "$store", path: "/nope"}
             |""".stripMargin))(docs).main
    }
    assert(e2.getMessage.contains("not both"), e2.getMessage)
  }
}
