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
}
