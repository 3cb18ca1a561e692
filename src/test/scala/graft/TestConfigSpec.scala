package graft

import org.scalatest.matchers.should.Matchers

/** `logprep test config` / `test unit` equivalents: config verification
  * catches compile-time errors, embedded rule tests run (incl. the
  * clusterer signature shape).
  */
class TestConfigSpec extends SparkSpec with Matchers {

  test("valid config verifies; unknown processor and bad filter fail") {
    val (ok, err, _) = TestConfig.verify(spark,
      """pipeline:
        |  - type: generic_adder
        |    rules:
        |      - filter: "message"
        |        generic_adder:
        |          add: {a: b}
        |""".stripMargin, runUnitTests = false)
    ok shouldBe true
    err shouldBe None

    val (badType, errType, _) = TestConfig.verify(spark,
      """pipeline:
        |  - type: no_such_processor
        |    rules:
        |      - filter: "*"
        |        no_such_processor: {}
        |""".stripMargin, runUnitTests = false)
    badType shouldBe false
    errType.get should include("unknown processor")

    val (badFilter, errFilter, _) = TestConfig.verify(spark,
      """pipeline:
        |  - type: dropper
        |    rules:
        |      - filter: "a AND (b OR"
        |        dropper: {drop: [a]}
        |""".stripMargin, runUnitTests = false)
    badFilter shouldBe false
    errFilter should not be None
  }

  test("curation stage configs verify with --schema; bad configs fail with context") {
    val curation =
      """pipeline:
        |  - type: quality_signals
        |    text_field: text
        |  - type: hash_split
        |    id_field: doc_id
        |""".stripMargin
    val (ok, err, _) = TestConfig.verify(spark, curation,
      runUnitTests = false, schemaDdl = Some("doc_id BIGINT, text STRING"))
    ok shouldBe true
    err shouldBe None
    // without the schema hint the data-dependent stage reports the
    // missing column (the verifier's empty frame carries no fields)
    val (noSchema, noSchemaErr, _) =
      TestConfig.verify(spark, curation, runUnitTests = false)
    noSchema shouldBe false
    noSchemaErr.get.toLowerCase should include("text")
    // a curation stage with an invalid config fails verification
    val (bad, badErr, _) = TestConfig.verify(spark,
      """pipeline:
        |  - type: quality_signals
        |    signals: [nope]
        |""".stripMargin, runUnitTests = false,
      schemaDdl = Some("doc_id BIGINT, text STRING"))
    bad shouldBe false
    badErr.get should include("unknown signals")
  }

  test("--unit: embedded {raw, processed} tests run; failures reported") {
    val passing =
      """pipeline:
        |  - type: generic_adder
        |    rules:
        |      - filter: "message"
        |        generic_adder:
        |          add: {added: "yes"}
        |        tests:
        |          - raw: {message: "m"}
        |            processed: {message: "m", added: "yes"}
        |""".stripMargin
    val (ok, _, fails) = TestConfig.verify(spark, passing, runUnitTests = true)
    fails shouldBe empty
    ok shouldBe true

    val failing = passing.replace("""added: "yes"}""", """added: "WRONG"}""")
      .replace("""add: {added: "WRONG"}""", """add: {added: "yes"}""")
    val (ok2, _, fails2) = TestConfig.verify(spark, failing, runUnitTests = true)
    ok2 shouldBe false
    fails2 should not be empty
  }

  test("--unit: coverage quota over partially-tested rules; failure carries an ndiff") {
    // reference auto_rule_tester.py:527-556 (Rule Test Coverage) and
    // :565-586 (per-rule ndiff on failure)
    val config =
      """pipeline:
        |  - type: generic_adder
        |    rules:
        |      - filter: "message"
        |        generic_adder:
        |          add: {added: "yes"}
        |        tests:
        |          - raw: {message: "m"}
        |            processed: {message: "m", added: "yes"}
        |      - filter: "other"
        |        generic_adder:
        |          add: {more: "x"}
        |  - type: dropper
        |    rules:
        |      - filter: "noise"
        |        dropper: {drop: [noise]}
        |""".stripMargin
    val cov = TestConfig.coverage(config)
    cov.withTests.size shouldBe 1
    cov.withoutTests.size shouldBe 2
    cov.pct shouldBe (100.0 / 3) +- 0.01
    TestConfig.totalTests(config) shouldBe 1

    val failing = config.replace("""processed: {message: "m", added: "yes"}""",
      """processed: {message: "m", added: "WRONG"}""")
    val (ok, _, fails) = TestConfig.verify(spark, failing, runUnitTests = true)
    ok shouldBe false
    // the diff shows the actual line removed and the expected line added
    fails.head.detail should include("- ")
    fails.head.detail should include("+ ")
    fails.head.detail should include("WRONG")
    fails.head.detail should include("yes")
  }

  test("CLI: dangling --schema and unknown flags fail loudly") {
    // a dangling --schema used to be silently dropped (verification ran
    // against the empty frame); strict positional parsing, like Curate
    val e1 = intercept[IllegalArgumentException](
      TestConfig.main(Array("cfg.yml", "--schema")))
    e1.getMessage should include("--schema requires a DDL value")
    val e2 = intercept[IllegalArgumentException](
      TestConfig.main(Array("--bogus", "cfg.yml")))
    e2.getMessage should include("unknown flag")
  }

  test("ndiff: +/- mark differing lines, common lines unmarked") {
    val d = graft.pipeline.RuleSelfTest.ndiff("a\nb\nc", "a\nx\nc")
    d shouldBe Seq("  a", "- b", "+ x", "  c")
    graft.pipeline.RuleSelfTest.prettySorted("""{"b":1,"a":["z","y"]}""") shouldBe
      graft.pipeline.RuleSelfTest.prettySorted("""{"a":["y","z"],"b":1}""")
  }

  test("--unit: clusterer {raw, result} signature tests") {
    val config =
      """pipeline:
        |  - type: clusterer
        |    rules:
        |      - filter: "message"
        |        clusterer:
        |          source_fields: [message]
        |          pattern: "(user) \\w+"
        |          repl: "\\1 <USER>"
        |        tests:
        |          - raw: "login user alice"
        |            result: "login user <USER>"
        |""".stripMargin
    val (ok, _, fails) = TestConfig.verify(spark, config, runUnitTests = true)
    withClue(fails.mkString("; ")) { ok shouldBe true }

    val bad = config.replace("login user <USER>", "login user bob")
    val (ok2, _, fails2) = TestConfig.verify(spark, bad, runUnitTests = true)
    ok2 shouldBe false
    fails2.head.stage shouldBe "clusterer"
  }
}
