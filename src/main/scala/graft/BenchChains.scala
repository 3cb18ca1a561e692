package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The two headline chain queries, shared by [[Bench]] and
  * [[ScaleProof]].
  *
  * `eventsChain` is the BASELINE.md batch chain: decoder/dissector →
  * timestamper → field ops → calculator → pre_detector side output over
  * the events table — the shape of the reference's benchmark pipeline.
  * `pipelineChain` is the same chain expressed as RULES through
  * PipelineCompiler — the path real configs take, including per-rule
  * filter guards and failure-tag machinery.
  */
object BenchChains {

  def eventsChain(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("message",
        concat_ws(" ", col("event_type"), col("user_id"), col("value")))
    val dissected = operators.PatternOps.dissector(e, "message",
      "%{etype} %{uid|int} %{val|float}")
    val decoded = operators.PatternOps.decodeJson(dissected, "props", "parsed", "k BIGINT")
    val stamped = operators.TimeOps.datetimeExtractor(decoded, "ts", "dt")
    val managed = operators.Structural.fieldManager(stamped,
      Map("etype" -> "event_class"))
    val calc = operators.Calculator.calculator(managed,
      "${val} * 2 + ${parsed.k}", "calc_out")
    val labeled = operators.Lookup.genericResolver(calc, "event_class", "category",
      Seq("^pur" -> "transaction", "^sig" -> "account", "^err" -> "incident",
        ".*" -> "other"))
    // pre_detector side output unioned in (both channels materialized)
    val det = operators.Detection.preDetector(labeled, Seq(
      operators.Detection.PreDetectorRule(
        "event_type:error AND value:[150.0 TO *]",
        "rule-1", "High-value error", "high", Seq("T1499"))), col("event_id"))
    labeled.select(col("event_id").as("k1"), col("category").as("k2"))
      .unionByName(det.select(col("event_key").as("k1"), col("severity").as("k2")))
  }

  def pipelineChain(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("message",
        concat_ws(" ", col("event_type"), col("user_id"), col("value")))
      .withColumn("ts_str", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
    val spec = pipeline.RuleLoader.fromYaml(
      """pipeline:
        |  - type: dissector
        |    rules:
        |      - filter: "message"
        |        dissector:
        |          mapping:
        |            message: "%{etype} %{uid|int} %{val}"
        |  - type: grokker
        |    rules:
        |      - filter: "message"
        |        grokker:
        |          mapping:
        |            message: ["%{WORD:g_type} %{INT:g_uid:int} %{NUMBER:g_val}"]
        |  - type: timestamper
        |    rules:
        |      - filter: "ts_str"
        |        timestamper:
        |          source_fields: [ts_str]
        |          source_format: ["%Y-%m-%d %H:%M:%S"]
        |          target_field: ts_iso
        |  - type: calculator
        |    rules:
        |      - filter: "uid"
        |        calculator:
        |          calc: "${uid} * 2 + 1"
        |          target_field: calc_out
        |  - type: generic_resolver
        |    rules:
        |      - filter: "etype"
        |        generic_resolver:
        |          field_mapping:
        |            etype: category
        |          resolve_list:
        |            "^pur": transaction
        |            "^sig": account
        |            "^err": incident
        |            ".*": other
        |""".stripMargin)
    // g_uid stays in the projection so column pruning cannot drop the
    // grok stage's work from the measurement (added r8: the grokker now
    // rides the native GrokMatchExpr on this hot path)
    pipeline.PipelineCompiler.compile(spec)(e).main
      .select(col("event_id"), col("category"), col("calc_out"), col("g_uid"))
  }
}
