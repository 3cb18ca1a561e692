package graft

import org.apache.spark.sql.functions._

/** The batch curation driver end-to-end: YAML config over a parquet
  * corpus → split-partitioned training-data layout on disk.
  */
class CurateSpec extends SparkSpec {

  test("curate CLI run: dedup + split + shuffle layout, partitioned write") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("curate").toString
    val in = s"$tmp/in.parquet"
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (3L, "some different content about distributed engines"),
      (4L, "yet another unique document body right here")
    ).toDF("doc_id", "text").write.parquet(in)
    val cfg = s"$tmp/curation.yaml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfg),
      """pipeline:
        |  - type: dedup_exact
        |    id_field: doc_id
        |    text_field: text
        |  - type: hash_split
        |    id_field: doc_id
        |  - type: shuffle_layout
        |    id_field: doc_id
        |    shards: 2
        |""".stripMargin)
    val out = s"$tmp/out"
    Curate.run(spark, cfg, in, out,
      partitionBy = Seq("split", "shard"), format = "parquet")
    val back = spark.read.parquet(s"$out/data")
    assert(back.count() == 3) // dup dropped
    assert(back.columns.contains("pos"))
    // partition directories exist for the split values present
    val dirs = new java.io.File(s"$out/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.forall(_.startsWith("split=")))
    val ids = back.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 3L, 4L))
    // partition-by of a missing column fails loudly
    val e = intercept[IllegalArgumentException](
      Curate.run(spark, cfg, in, s"$tmp/out2",
        partitionBy = Seq("nope"), format = "parquet"))
    assert(e.getMessage.contains("nope"))
  }

  test("bucket-by: bucketed layout written, re-registrable, joins co-located") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("curateb").toString
    val in = s"$tmp/in.parquet"
    (0L until 50L).map(i => (i, s"document number $i body"))
      .toDF("doc_id", "text").write.parquet(in)
    val cfg = s"$tmp/curation.yaml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfg),
      """pipeline:
        |  - type: hash_split
        |    id_field: doc_id
        |""".stripMargin)
    Curate.run(spark, cfg, in, s"$tmp/out", partitionBy = Seq.empty,
      format = "parquet", bucketBy = Some(("doc_id", 4)))
    // marker recorded; a fresh register sees bucketed scans
    assert(sources.BucketedLayout.geometry(spark, s"$tmp/out/data")
      .contains(("doc_id", 4, Seq("doc_id"))))
    val t = sources.BucketedLayout.register(spark, s"$tmp/out/data",
      "curate_bucketed_out")
    try {
      assert(t.count() == 50L && t.columns.contains("split"))
    } finally spark.sql("DROP TABLE curate_bucketed_out")
    // bucketing composed with partition-by is refused (re-fragmentation)
    val e = intercept[IllegalArgumentException](
      Curate.run(spark, cfg, in, s"$tmp/out2", partitionBy = Seq("split"),
        format = "parquet", bucketBy = Some(("doc_id", 4))))
    assert(e.getMessage.contains("bucket"))
    // unknown bucket column fails loudly
    val e2 = intercept[IllegalArgumentException](
      Curate.run(spark, cfg, in, s"$tmp/out3", partitionBy = Seq.empty,
        format = "parquet", bucketBy = Some(("nope", 4))))
    assert(e2.getMessage.contains("nope"))
  }

  test("profile-by: before/after corpus profiles written and consistent") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("curate-prof").toString
    val in = s"$tmp/in.parquet"
    Seq(
      (1L, "web", "a b c d e"),
      (2L, "web", "a b c d e"),   // exact dup → dropped by the pipeline
      (3L, "books", "x y z")
    ).toDF("doc_id", "source", "text").write.parquet(in)
    val cfg = s"$tmp/c.yaml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfg),
      """pipeline:
        |  - type: dedup_exact
        |    id_field: doc_id
        |    text_field: text
        |""".stripMargin)
    val out = s"$tmp/out"
    Curate.run(spark, cfg, in, out, partitionBy = Nil, format = "parquet",
      profileBy = Some(("source", "text")))
    val before = spark.read.parquet(s"$out/_profile/before")
      .collect().map(r => r.getAs[String]("stratum") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_texts"))).toMap
    val after = spark.read.parquet(s"$out/_profile/after")
      .collect().map(r => r.getAs[String]("stratum") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_texts"))).toMap
    assert(before("web") === ((2L, 1L)))   // dup pressure visible before
    assert(after("web") === ((1L, 1L)))    // gone after
    assert(before("books") === after("books"))
    // a missing profile column fails loudly
    val e = intercept[IllegalArgumentException](
      Curate.run(spark, cfg, in, s"$tmp/out2", Nil, "parquet",
        profileBy = Some(("nope", "text"))))
    assert(e.getMessage.contains("nope"))
  }

  test("check-ann: occupancy + per-batch drift report; a lopsided " +
      "batch surfaces as high total-variation vs the store") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("checkann").toString
    val idx = s"$tmp/idx"
    val centroids = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    ml.IvfIngest.create(s, idx, centroids)
    // b1 balanced across both buckets (6 rows); b2 lands entirely in
    // bucket 1 (2 rows) — the distribution-shift shape the report
    // exists to surface
    ml.IvfIngest.append(
      Seq((1L, Seq(0.9, 0.1)), (2L, Seq(0.1, 0.9)),
        (3L, Seq(0.8, 0.2)), (4L, Seq(0.2, 0.8)),
        (5L, Seq(0.7, 0.3)), (6L, Seq(0.3, 0.7)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding", idx, "b1")
    ml.IvfIngest.append(
      Seq((7L, Seq(0.0, 1.0)), (8L, Seq(0.15, 0.85)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding", idx, "b2")
    val line = Curate.checkAnn(s, idx)
    assert(line.contains(""""rows":8""") &&
      line.contains(""""occupied_buckets":2""") &&
      line.contains(""""empty_buckets":0"""), line)
    // store histogram is (3, 5)/8; b1 is (3,3)/6 → tv .125; b2 is
    // (0,2)/2 → tv .375 — the lopsided batch must win the report
    assert(line.contains(""""max_tv_bid":"b2""""), line)
    assert(line.contains(""""max_batch_tv":0.37"""), line)
    // folding absorbs the batches into the settled base: no live
    // batches left, so no tv fields — occupancy only
    ml.IvfIngest.compact(s, idx)
    val folded = Curate.checkAnn(s, idx)
    assert(folded.contains(""""rows":8""") &&
      !folded.contains("max_batch_tv"), folded)
    // a classic single-write index reports occupancy without tv
    val classic = s"$tmp/classic"
    ml.Similarity.ivfWriteIndex(
      Seq((1L, Seq(0.9, 0.1)), (2L, Seq(0.1, 0.9)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", centroids, classic)
    val cLine = Curate.checkAnn(s, classic)
    assert(cLine.contains(""""rows":2""") &&
      !cLine.contains("max_batch_tv"), cLine)
    // an empty ingestable store reports rows 0; a non-index refuses
    val empty = s"$tmp/empty"
    ml.IvfIngest.create(s, empty, centroids)
    assert(Curate.checkAnn(s, empty).contains(""""rows":0"""))
    val e = intercept[IllegalArgumentException](
      Curate.checkAnn(s, s"$tmp/nope"))
    assert(e.getMessage.contains("marker"))
  }

  test("CLI flag parsing: both syntaxes accepted, mistakes fail loudly") {
    // flag errors throw before any Spark work
    val unknown = intercept[IllegalArgumentException](
      Curate.main(Array("c.yaml", "in", "out", "--fromat=json")))
    assert(unknown.getMessage.contains("--fromat"))
    val dangling = intercept[IllegalArgumentException](
      Curate.main(Array("c.yaml", "in", "out", "--partition-by")))
    assert(dangling.getMessage.contains("needs a value"))
    val badFormat = intercept[IllegalArgumentException](
      Curate.main(Array("c.yaml", "in", "out", "--format", "csv")))
    assert(badFormat.getMessage.contains("unsupported"))
  }
}
