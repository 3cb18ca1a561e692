package graft.conformance

import graft.SparkSpec
import graft.pipeline._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Reference acceptance tests, ported end-to-end: the reference's own
  * full-pipeline fixtures (838 real winlogbeat events,
  * tests/testdata/input_logdata/wineventlog_raw.jsonl) run through the
  * compiled engine as ONE DataFrame and compare per-event against the
  * reference's committed golden outputs
  * (tests/testdata/acceptance/expected_result/&#42;.jsonl):
  *
  *  - labeler over 51 nested-dir rule files + jsonref schema with
  *    include_parent_labels (test_wineventlog_processing.py:37-73)
  *  - labeler + regex rule set against the extended schema (same test,
  *    second parametrize case)
  *  - pseudonymizer over 20 rule files + regex_mapping
  *    (test_wineventlog_pseudonymization.py:71-101); the golden file
  *    interleaves the pseudonym-mapping extra outputs — those are
  *    filtered like the reference test does (`"pseudonym" not in event`)
  *    and gated separately by the proc_pseudonym_mapping oracle query.
  *
  * Unlike the per-event conformance triples, this exercises the union
  * schema over a real heterogeneous corpus, rule loading from nested
  * directories, schema-driven parent-label expansion, and 60+ rules
  * compiled into one plan. Comparison uses the same canonical form as
  * ConformanceSpec (null ⇔ absent, whole doubles widen to longs).
  */
class AcceptanceSpec extends SparkSpec {

  private val testdata = "/root/reference/tests/testdata"
  private def fixturesPresent = new java.io.File(testdata).isDirectory

  import JsonFixture._

  private def readJsonl(path: String): Seq[JValue] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().map(_.trim).filter(_.nonEmpty)
      .map(JsonMethods.parse(_)).toList
    finally src.close()
  }

  /** Compile-time file references (schemas, regex mappings, whitelist
    * files) resolve against the reference checkout while `body` runs.
    */
  private def withRefBase[T](body: => T): T = {
    val prevBase = sys.props.get("graft.rule.base")
    sys.props("graft.rule.base") = "/root/reference"
    try body
    finally prevBase match {
      case Some(b) => sys.props("graft.rule.base") = b
      case None => sys.props.remove("graft.rule.base")
    }
  }

  /** Run a compiled pipeline over all events at once; output restored to
    * input order via an index column carried through the plan.
    */
  private def runPipeline(spec: PipelineSpec, events: Seq[JValue]): Seq[Any] =
    withRefBase {
      val df = dfFromJsonLines(spark, events, "__acc_idx")
      val out = PipelineCompiler.compile(spec)(df)
        .main.orderBy("__acc_idx").drop("__acc_idx")
      out.toJSON.collect().toSeq.map(r => canon(plain(JsonMethods.parse(r))))
    }

  /** Collect one side output as canonical values (empty if absent). */
  private def extraRows(spec: PipelineSpec, events: Seq[JValue],
      key: String): Seq[Any] = withRefBase {
    val df = dfFromJsonLines(spark, events, "__acc_idx")
    PipelineCompiler.compile(spec)(df).extra.get(key) match {
      case Some(ex) => ex.toJSON.collect().toSeq
        .map(r => canon(plain(JsonMethods.parse(r))))
      case None => Seq.empty
    }
  }

  private def compareAll(got: Seq[Any], want: Seq[JValue]): Unit = {
    assert(got.length == want.length,
      s"event count: got ${got.length}, expected ${want.length}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      firstDiff(g, canon(plain(w))).foreach { d =>
        fail(s"mismatch in event at line $i $d")
      }
    }
  }

  private def labelerStage(ruleDirs: Seq[String], schema: String): StageSpec = {
    val rules = ruleDirs
      .flatMap(d => RuleLoader.rulesFromDir(s"$testdata/$d", "labeler"))
      .map(r => r.copy(config = r.config ++ Map(
        "schema" -> s"$testdata/$schema",
        "include_parent_labels" -> true)))
    StageSpec("labeler", rules)
  }

  test("acceptance: wineventlog labeled correctly (no_regex)") {
    assume(fixturesPresent)
    val events = readJsonl(s"$testdata/input_logdata/wineventlog_raw.jsonl")
    val spec = PipelineSpec(Seq(labelerStage(
      Seq("acceptance/labeler/no_regex/rules"),
      "acceptance/labeler/no_regex/labeling/schema.json")))
    val got = runPipeline(spec, events)
    val want = readJsonl(
      s"$testdata/acceptance/expected_result/labeled_win_event_log.jsonl")
    compareAll(got, want)
  }

  test("acceptance: wineventlog labeled correctly (with regex rules)") {
    assume(fixturesPresent)
    val events = readJsonl(s"$testdata/input_logdata/wineventlog_raw.jsonl")
    val spec = PipelineSpec(Seq(labelerStage(
      Seq("acceptance/labeler/no_regex/rules",
        "acceptance/labeler/only_regex/rules"),
      "acceptance/labeler/only_regex/labeling/schema.json")))
    val got = runPipeline(spec, events)
    val want = readJsonl(
      s"$testdata/acceptance/expected_result/labeled_win_event_log_with_regex.jsonl")
    compareAll(got, want)
  }

  // ---- selective extractor (test_selective_extractor_full_pipeline_pass.py)

  private def selectiveSpec = PipelineSpec(Seq(
    StageSpec("dissector", RuleLoader.rulesFromDir(
      s"$testdata/acceptance/dissector/rules", "dissector")),
    StageSpec("selective_extractor", RuleLoader.rulesFromDir(
      s"$testdata/acceptance/selective_extractor/rules", "selective_extractor"))))

  test("acceptance: selective extractor routes sub-events per topic") {
    assume(fixturesPresent)
    val events = readJsonl(
      s"$testdata/input_logdata/selective_extractor_events.jsonl")
    val main = runPipeline(selectiveSpec, events)
    assert(main == Seq(Map(
      "user" -> Map("agent" -> "ok_admin", "other" -> "field"),
      "event" -> Map("action" -> "less_evil_action"))))
    assert(extraRows(selectiveSpec, events, "selective_extractor:test_topic_1")
      == Seq(Map("user" -> Map("agent" -> "ok_admin"))))
    assert(extraRows(selectiveSpec, events, "selective_extractor:test_topic_2")
      == Seq(Map("event" -> Map("action" -> "less_evil_action"))))
  }

  test("acceptance: selective extractor skips whitelist fields absent " +
      "from the event") {
    assume(fixturesPresent)
    val events = readJsonl(
      s"$testdata/input_logdata/selective_extractor_events_2.jsonl")
    val main = runPipeline(selectiveSpec, events)
    assert(main == Seq(Map(
      "user" -> Map("other" -> "field"),
      "event" -> Map("action" -> "less_evil_action"))))
    assert(extraRows(selectiveSpec, events, "selective_extractor:test_topic_1")
      .isEmpty)
    assert(extraRows(selectiveSpec, events, "selective_extractor:test_topic_2")
      == Seq(Map("event" -> Map("action" -> "less_evil_action"))))
  }

  // ---- pre-detection (test_pre_detection.py) ------------------------

  private def preDetectorStage: StageSpec = StageSpec("pre_detector",
    RuleLoader.rulesFromDir(
      s"$testdata/acceptance/pre_detector/rules", "pre_detector"))

  /** Canonical detection minus the fields the reference test excludes
    * (pre_detection_id, creation_timestamp) and the engine's event_key.
    */
  private def canonDetection(v: Any): Any = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] -
      "pre_detection_id" - "creation_timestamp" - "event_key"
    case other => other
  }

  test("acceptance: pre-detection main output passes events through " +
      "(plus pre_detection_id on matches)") {
    assume(fixturesPresent)
    val events = readJsonl(
      s"$testdata/input_logdata/kafka_raw_event_for_pre_detector.jsonl")
    val got = runPipeline(PipelineSpec(Seq(preDetectorStage)), events)
    assert(got.length == events.length)
    got.zip(events).zipWithIndex.foreach { case ((g, w), i) =>
      val gm = g.asInstanceOf[Map[String, Any]]
      firstDiff(gm - "pre_detection_id", canon(plain(w))).foreach { d =>
        fail(s"mismatch in event at line $i $d")
      }
    }
    // the fixture's Service Control Manager events must carry the link id
    assert(got.exists(_.asInstanceOf[Map[String, Any]]
      .contains("pre_detection_id")))
  }

  test("acceptance: pre-detection extra outputs match the expected " +
      "detection sub-events") {
    assume(fixturesPresent)
    def toScala(v: Any): Any = v match {
      case m: java.util.Map[_, _] => scala.collection.immutable.ListMap(
        scala.jdk.CollectionConverters.MapHasAsScala(m).asScala.toSeq
          .map { case (k, x) => k.toString -> toScala(x) }: _*)
      case l: java.util.List[_] =>
        scala.jdk.CollectionConverters.ListHasAsScala(l).asScala
          .toSeq.map(toScala)
      case other => other
    }
    val fixture = toScala(new org.yaml.snakeyaml.Yaml().load[Any](
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        s"$testdata/input_logdata/kafka_raw_event_for_pre_detector_extra_output.yml")),
        "UTF-8"))).asInstanceOf[Seq[Map[String, Any]]]
    for (cse <- fixture) {
      val event = JsonMethods.parse(cse("input_line").toString)
      val expected = cse("expected_output").asInstanceOf[Seq[Map[String, Any]]]
        .map(_("pre_detector_topic"))
      val detections = extraRows(PipelineSpec(Seq(preDetectorStage)),
        Seq(event), "pre_detector").map(canonDetection)
      for (exp <- expected) {
        val want = canonDetection(canon(exp))
        assert(detections.contains(want),
          s"expected detection not produced:${renderDiff(detections, want)}")
      }
    }
  }

  test("acceptance: pre-detection yields no extra output for a " +
      "non-matching event") {
    assume(fixturesPresent)
    val events = readJsonl(
      s"$testdata/input_logdata/kafka_raw_event_for_pre_detector.jsonl")
    assert(extraRows(PipelineSpec(Seq(preDetectorStage)),
      events.take(1), "pre_detector").isEmpty)
  }

  // ---- error output (test_error_output.py) --------------------------

  test("acceptance: missing hmac source routes the event to the error " +
      "output with its payload intact") {
    val content = java.util.UUID.randomUUID().toString
    val df = dfFromJson(spark,
      JsonMethods.parse(s"""{"something":"$content"}"""))
    val pre = Preprocessor.hmacOfField(df, "thisisasecureandrandomkey",
      "doesnotexist.never.ever", "Full_event")
    val result = PipelineCompiler.compileWithErrors(PipelineSpec(Seq.empty))(pre)
    val errs = result.extra("errors").collect()
    assert(errs.length == 1)
    assert(errs.head.getAs[String]("event").contains(content))
    assert(errs.head.getAs[String]("errors").contains("_hmac_failure"))
    assert(errs.head.getAs[String]("@timestamp").nonEmpty)
  }

  // ---- preprocessing (test_preprocessing.py) ------------------------

  test("acceptance: version-info preprocessing rides ahead of the pipeline") {
    assume(fixturesPresent)
    val events = readJsonl(
      s"$testdata/input_logdata/selective_extractor_events.jsonl")
    val got = withRefBase {
      val df = Preprocessor.versionInfo(
        dfFromJsonLines(spark, events, "__acc_idx"),
        "version_info", engineVersion = "graft-r4", configVersion = "1")
      val spec = PipelineSpec(Seq(StageSpec("dissector",
        RuleLoader.rulesFromDir(s"$testdata/acceptance/dissector/rules",
          "dissector"))))
      PipelineCompiler.compile(spec)(df).main.toJSON.collect().toSeq
        .map(r => canon(plain(JsonMethods.parse(r))))
    }
    val vi = got.head.asInstanceOf[Map[String, Any]]("version_info")
      .asInstanceOf[Map[String, Any]]
    assert(vi.get("logprep").exists(_.toString.nonEmpty),
      "no engine version info found")
    assert(vi.get("configuration").exists(_.toString.nonEmpty),
      "no config version info found")
  }

  test("acceptance: wineventlog pseudonymized correctly") {
    assume(fixturesPresent)
    val events = readJsonl(s"$testdata/input_logdata/wineventlog_raw.jsonl")
    val rules = RuleLoader
      .rulesFromDir(s"$testdata/acceptance/pseudonymizer/rules", "pseudonymizer")
      .map(r => r.copy(config = r.config ++ Map(
        "hash_salt" -> "a_secret_tasty_ingredient",
        "regex_mapping" -> s"$testdata/acceptance/pseudonymizer/regex_mapping.yml")))
    val spec = PipelineSpec(Seq(StageSpec("pseudonymizer", rules)))
    val got = runPipeline(spec, events)
    // the golden file interleaves main events and pseudonym-mapping extra
    // outputs; the reference test compares main events only
    val want = readJsonl(
      s"$testdata/acceptance/expected_result/pseudonymized_win_event_log.jsonl")
      .filter(j => (j \ "pseudonym") == JNothing)
    compareAll(got, want)
  }
}
