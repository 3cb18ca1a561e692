package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's full-configuration acceptance smoke
  * (tests/acceptance/test_full_configuration.py starts a pipeline built
  * from EVERY registered processor and asserts a clean start) — here the
  * stronger engine-shaped claim: all 31 processor types compile into ONE
  * narrow plan (zero exchanges — every processor is a projection/filter),
  * run over the 838-event wineventlog corpus in a single pass, and the
  * per-processor effects land. This is the architecture headline: the
  * reference needs a process per pipeline and an interpreter per event;
  * here the whole operator surface fuses into one WholeStageCodegen-able
  * DataFrame program.
  */
class FullPipelineSpec extends SparkSpec {

  private val testdata = "/root/reference/tests/testdata"
  private def fixturesPresent = new java.io.File(testdata).isDirectory

  private val yaml =
    """pipeline:
      |  - type: generic_adder
      |    rules:
      |      - filter: "*"
      |        generic_adder: {add: {meta.engine: graft}}
      |  - type: field_manager
      |    rules:
      |      - filter: "host.name"
      |        field_manager: {source_fields: [host.name], target_field: meta.host}
      |  - type: concatenator
      |    rules:
      |      - filter: "host.name AND log.level"
      |        concatenator:
      |          source_fields: [host.name, log.level]
      |          separator: "-"
      |          target_field: meta.hostlevel
      |  - type: calculator
      |    rules:
      |      - filter: "event.code"
      |        calculator: {calc: "${event.code} + 1", target_field: meta.codeplus}
      |  - type: timestamper
      |    rules:
      |      - filter: "event.created"
      |        timestamper:
      |          source_fields: [event.created]
      |          source_format: [ISO8601]
      |          target_field: meta.created_norm
      |  - type: datetime_extractor
      |    rules:
      |      - filter: "@timestamp"
      |        datetime_extractor:
      |          source_fields: ["@timestamp"]
      |          target_field: meta.dt
      |  - type: timestamp_differ
      |    rules:
      |      - filter: "event.created AND @timestamp"
      |        timestamp_differ:
      |          diff: "${event.created:ISO8601} - ${@timestamp:ISO8601}"
      |          target_field: meta.age
      |  - type: string_splitter
      |    rules:
      |      - filter: "host.os.kernel"
      |        string_splitter:
      |          source_fields: [host.os.kernel]
      |          delimiter: " "
      |          target_field: meta.kernel_parts
      |  - type: dissector
      |    rules:
      |      - filter: "winlog.provider_name: \"Service Control Manager\""
      |        dissector:
      |          mapping: {message: "%{meta.svc_head} %{meta.svc_rest}"}
      |  - type: grokker
      |    rules:
      |      - filter: "winlog.provider_name: \"Service Control Manager\""
      |        grokker:
      |          mapping: {message: ["%{WORD:meta.gfirst} %{GREEDYDATA:meta.grest}"]}
      |  - type: replacer
      |    rules:
      |      - filter: "winlog.provider_name: \"Service Control Manager\""
      |        replacer:
      |          mapping: {log.level: "normal%{}"}
      |  - type: decoder
      |    rules:
      |      - filter: "message"
      |        decoder:
      |          source_fields: [message]
      |          source_format: decolorize
      |          target_field: meta.msg_clean
      |  - type: clusterer
      |    rules:
      |      - filter: "winlog.provider_name: \"Service Control Manager\""
      |        clusterer:
      |          source_fields: [message]
      |          pattern: "service"
      |          repl: "<+>service</+>"
      |          output_field_name: meta.cluster
      |  - type: generic_resolver
      |    rules:
      |      - filter: "log.level"
      |        generic_resolver:
      |          field_mapping: {log.level: meta.level_class}
      |          resolve_list: {"^inf": low, "^warn": mid, ".*": other}
      |  - type: template_replacer
      |    rules:
      |      - filter: "winlog.channel"
      |        template_replacer:
      |          template: "tests/testdata/unit/template_replacer/replacer_template.yml"
      |          fields: [winlog.channel, winlog.event_id]
      |          delimiter: "-"
      |          target_field: meta.templ
      |  - type: key_checker
      |    rules:
      |      - filter: "*"
      |        key_checker:
      |          source_fields: [host.name, meta.surely_missing]
      |          target_field: meta.missing
      |  - type: deduplicator
      |    rules:
      |      - filter: "winlog.keywords"
      |        deduplicator: {fields: [winlog.keywords]}
      |  - type: labeler
      |    rules:
      |      - filter: "winlog.api: \"wineventlog\""
      |        labeler:
      |          schema: "tests/testdata/acceptance/labeler/no_regex/labeling/schema.json"
      |          include_parent_labels: true
      |          label: {reporter: [windows]}
      |  - type: list_comparison
      |    rules:
      |      - filter: "winlog.provider_name"
      |        list_comparison:
      |          source_fields: [winlog.provider_name]
      |          target_field: meta.provlist
      |          lists: {known_providers: [EventLog, VSS, volsnap]}
      |  - type: network_comparison
      |    rules:
      |      - filter: "host.ip"
      |        network_comparison:
      |          source_fields: [host.ip]
      |          target_field: meta.netcheck
      |          networks: {private10: ["10.0.0.0/8"]}
      |  - type: ip_informer
      |    rules:
      |      - filter: "host.ip"
      |        ip_informer: {source_fields: [host.ip], target_field: meta.ipinfo}
      |  - type: geoip_enricher
      |    rules:
      |      - filter: "host.ip"
      |        geoip_enricher: {source_fields: [host.ip], target_field: meta.geo}
      |  - type: domain_label_extractor
      |    rules:
      |      - filter: "agent.hostname"
      |        domain_label_extractor:
      |          source_fields: [agent.hostname]
      |          target_field: meta.domain
      |  - type: domain_resolver
      |    rules:
      |      - filter: "agent.hostname"
      |        domain_resolver: {source_fields: [agent.hostname]}
      |  - type: requester
      |    rules:
      |      - filter: "meta.no_such_field"
      |        requester:
      |          method: GET
      |          url: "http://never.invalid/x"
      |          target_field: meta.req
      |  - type: amides
      |    rules:
      |      - filter: "message"
      |        amides:
      |          source_fields: [message]
      |          weights: {service: 0.9, stopped: -0.3}
      |          decision_threshold: 0.5
      |          target_field: meta.amides
      |  - type: pseudonymizer
      |    rules:
      |      - filter: "winlog.event_data.SubjectUserName"
      |        pseudonymizer:
      |          mapping: {winlog.event_data.SubjectUserName: RE_WHOLE_FIELD}
      |          hash_salt: a_secret_tasty_ingredient
      |          regex_mapping: "tests/testdata/acceptance/pseudonymizer/regex_mapping.yml"
      |  - type: pre_detector
      |    rules:
      |      - filter: "winlog.provider_name: \"Service Control Manager\""
      |        pre_detector:
      |          id: full-pipeline-rule
      |          title: SCM activity
      |          severity: low
      |          mitre: [T0000]
      |  - type: selective_extractor
      |    rules:
      |      - filter: "winlog.api: \"wineventlog\""
      |        selective_extractor:
      |          source_fields: [host.name]
      |          outputs: [{jsonl: fp_topic}]
      |  - type: dropper
      |    rules:
      |      - filter: "agent.ephemeral_id"
      |        dropper: {drop: [agent.ephemeral_id]}
      |  - type: deleter
      |    rules:
      |      - filter: "winlog.event_id: 999999999"
      |        deleter: {delete: true}
      |""".stripMargin

  test("all 31 processor types compile into one exchange-free plan " +
      "over the wineventlog corpus") {
    assume(fixturesPresent)
    val prevBase = sys.props.get("graft.rule.base")
    sys.props("graft.rule.base") = "/root/reference"
    try {
      val df = spark.read.json(
        s"$testdata/input_logdata/wineventlog_raw.jsonl")
      val spec = RuleLoader.fromYaml(yaml)
      assert(spec.stages.map(_.processorType).distinct.size == 31)
      val result = PipelineCompiler.compile(spec)(df)
      val out = result.main.cache()
      try {
        assert(out.count() == 838)
        // every processor is a narrow transform: the single-pass plan
        // has NO Exchange (the reference runs 31 interpreter passes)
        val plan = out.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), plan.take(500))
        assert(out.filter(col("meta.engine") === "graft").count() == 838)
        assert(out.filter(col("meta.hostlevel").isNotNull).count() > 800)
        assert(out.filter(size(col("label.reporter")) > 0).count() > 500)
        assert(out.filter(col("meta.level_class") === "low").count() > 0)
        assert(out.filter(col("meta.cluster").isNotNull).count() > 0)
        assert(out.filter(col("winlog.event_data.SubjectUserName")
          .startsWith("<pseudonym:")).count() > 0)
        assert(out.filter(col("pre_detection_id").isNotNull).count() > 0)
        // side outputs flow from the same single compile
        assert(result.extra("pre_detector").count() > 0)
        assert(result.extra("selective_extractor:fp_topic").count() > 800)
      } finally out.unpersist()
    } finally {
      prevBase match {
        case Some(b) => sys.props("graft.rule.base") = b
        case None => sys.props.remove("graft.rule.base")
      }
    }
  }
}
