package graft

import org.scalatest.matchers.should.Matchers

/** Dry-runner over a small corpus: per-event before/after ndiff, extra
  * channel dump with --full-output, unchanged detection (reference
  * util/rule_dry_runner.py).
  */
class DryRunSpec extends SparkSpec with Matchers {

  private def write(content: String, suffix: String): String = {
    val f = java.io.File.createTempFile("dryrun", suffix)
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    f.getAbsolutePath
  }

  private val config = write(
    """pipeline:
      |  - type: generic_adder
      |    rules:
      |      - filter: "message"
      |        generic_adder:
      |          add:
      |            added: yes!
      |  - type: pre_detector
      |    rules:
      |      - filter: 'message: "attack"'
      |        pre_detector:
      |          id: rule-1
      |          title: attack seen
      |          severity: critical
      |          mitre: []
      |          case_condition: directly
      |""".stripMargin, ".yml")

  test("jsonl input: diff shows added field; unchanged events marked") {
    val events = write(
      """{"message":"hello"}
        |{"other":"no message field"}
        |""".stripMargin, ".jsonl")
    val report = DryRun.report(spark, config, events)
    report should include("EVENT 0 — PROCESSED EVENT")
    report should include("""+   "added" : "yes!"""")
    report should include("""  "message" : "hello"""")
    report should include("EVENT 1 — UNCHANGED")
    report should include("SUMMARY: 2 events, 1 changed")
  }

  test("json-array input + --full-output dumps the pre_detector channel") {
    val events = write("""[{"message":"attack"},{"message":"benign"}]""", ".json")
    val report = DryRun.report(spark, config, events, inputType = "json",
      fullOutput = true)
    report should include("CUSTOM OUTPUT — pre_detector")
    report should include(""""title" : "attack seen"""")
    report should include("SUMMARY: 2 events, 2 changed")
  }

  test("ndiff marks removals and additions") {
    val d = DryRun.ndiff("a\nb\nc", "a\nc\nd")
    d shouldBe "  a\n- b\n  c\n+ d\n"
  }

  test("a dry run never advances ingest or statistics stores, but its " +
      "dedup verdicts still read them") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("dry-stores")
    val keyStore = s"$base/keys"
    val gramStore = s"$base/grams"
    // a real ingest run admits "known text" into the key store
    graft.pipeline.PipelineCompiler.compile(
      graft.pipeline.RuleLoader.fromYaml(
        s"pipeline:\n  - type: dedup_ingest\n    id_field: doc_id\n" +
        s"    text_field: text\n    store: $keyStore\n"))(
      Seq((1L, "known text")).toDF("doc_id", "text")).main.count()
    val keysBefore = s.read.parquet(keyStore).count()
    val cfg = write(
      s"""pipeline:
         |  - type: stats_ingest
         |    text_field: text
         |    store: $gramStore
         |    batch_id: dry
         |  - type: dedup_ingest
         |    id_field: doc_id
         |    text_field: text
         |    store: $keyStore
         |""".stripMargin, ".yml")
    val events = write(
      """{"doc_id": 7, "text": "known text"}
        |{"doc_id": 8, "text": "fresh text"}
        |""".stripMargin, ".jsonl")
    val report = DryRun.report(spark, cfg, events)
    // the stored duplicate is dropped IN THE REPORT (the store was read)
    report should include("SUMMARY: 2 events")
    // ...but neither store moved: no new keys, no gram store at all
    assert(s.read.parquet(keyStore).count() == keysBefore,
      "dry run appended to the dedup key store")
    assert(!new java.io.File(gramStore).exists(),
      "dry run created the gram store")
  }
}
