package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Every processor type must apply its transform ONLY to rows matching the
  * rule filter — the reference runs `processor.process(event)` solely on
  * filter-matching events (abc/processor.py:212-215), so a selective rule
  * must leave non-matching rows byte-identical. Round 1 left 13 processor
  * types unguarded (transform applied to every row); this suite pins the
  * guard for each of them.
  */
class GuardedRuleSpec extends SparkSpec {

  private def run(yaml: String, df: DataFrame): DataFrame =
    PipelineCompiler.compile(RuleLoader.fromYaml(yaml))(df).main

  private def stage(ptype: String, filter: String, cfg: String): String =
    s"""
       |pipeline:
       |  - type: $ptype
       |    rules:
       |      - filter: "$filter"
       |        $ptype:
       |$cfg
       |""".stripMargin

  private def twoRows = {
    val s = spark
    import s.implicits._
    Seq(
      ("a", "10.1.2.3 GET", "host.example.co.uk", "2024-05-01T10:00:00", "2024-05-01T09:00:00"),
      ("b", "10.9.9.9 PUT", "other.example.com", "2024-06-02T11:30:00", "2024-06-02T11:00:00")
    ).toDF("kind", "msg", "domain", "t1", "t2")
      .withColumn("ts1", to_timestamp(col("t1")))
      .withColumn("ts2", to_timestamp(col("t2")))
  }

  private def byKind(df: DataFrame, c: String): Map[String, Any] =
    df.select(col("kind"), col(c)).collect()
      .map(r => r.getString(0) -> r.get(1)).toMap

  test("grokker writes only on filter-matching rows") {
    val out = run(stage("grokker", "kind:a",
      """          mapping:
        |            msg: "%{IPV4:client} %{WORD:verb}"""".stripMargin), twoRows)
    val m = byKind(out, "client")
    assert(m("a") == "10.1.2.3")
    assert(m("b") == null) // msg parses, but the filter says no
  }

  test("grokker compiles to a native expression — no ScalaUDF in the plan") {
    // the last interpreted per-row cost in the structural/pattern
    // families (r7 verdict item 3): the match must ride GrokMatchExpr
    // inside codegen, not a udf() closure
    val out = run(stage("grokker", "kind:a",
      """          mapping:
        |            msg: "%{IPV4:client} %{WORD:verb}"""".stripMargin), twoRows)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan.take(800))
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("timestamper writes only on filter-matching rows") {
    val out = run(stage("timestamper", "kind:a",
      """          source_fields: [t1]
        |          target_field: ts_out""".stripMargin), twoRows)
    val m = byKind(out, "ts_out")
    // isoformat omits zero microseconds (reference contract)
    assert(m("a") == "2024-05-01T10:00:00Z")
    assert(m("b") == null)
  }

  test("dropper with selective filter nulls only matching rows") {
    val out = run(stage("dropper", "kind:a",
      """          drop: [msg]""".stripMargin), twoRows)
    val m = byKind(out, "msg")
    assert(m("a") == null)
    assert(m("b") == "10.9.9.9 PUT")
  }

  test("dropper with match-all filter removes the column") {
    val out = run(stage("dropper", "*",
      """          drop: [msg]""".stripMargin), twoRows)
    assert(!out.columns.contains("msg"))
  }

  test("datetime_extractor writes only on filter-matching rows") {
    val out = run(stage("datetime_extractor", "kind:a",
      """          source_fields: [ts1]
        |          target_field: dt""".stripMargin), twoRows)
    val parts = out.select(col("kind"), col("dt.year")).collect()
      .map(r => r.getString(0) -> r.get(1)).toMap
    assert(parts("a") == 2024)
    assert(parts("b") == null)
  }

  test("timestamp_differ writes only on filter-matching rows") {
    val out = run(stage("timestamp_differ", "kind:a",
      """          diff: "${t1} - ${t2}"
        |          output_format: seconds""".stripMargin), twoRows)
    val m = byKind(out, "time_diff")
    assert(m("a") == "3600.0")
    assert(m("b") == null)
  }

  test("list_comparison writes only on filter-matching rows") {
    val out = run(stage("list_comparison", "kind:b",
      """          source_fields: [kind]
        |          target_field: lc
        |          lists:
        |            known: [a, b]""".stripMargin), twoRows)
    val m = out.select(col("kind"), col("lc.in_list")).collect()
      .map(r => r.getString(0) -> r.get(1)).toMap
    assert(m("b") != null)
    assert(m("a") == null) // value IS in the list, but filter says no
  }

  test("network_comparison writes only on filter-matching rows") {
    val df = twoRows.withColumn("ip", split(col("msg"), " ").getItem(0))
    val out = run(stage("network_comparison", "kind:a",
      """          source_fields: [ip]
        |          target_field: nc
        |          networks:
        |            internal: ["10.0.0.0/8"]""".stripMargin), df)
    val m = out.select(col("kind"), col("nc.in_list")).collect()
      .map(r => r.getString(0) -> r.get(1)).toMap
    assert(m("a") != null)
    assert(m("b") == null) // 10.9.9.9 is in 10/8, but filter says no
  }

  test("ip_informer writes only on filter-matching rows") {
    val df = twoRows.withColumn("ip", split(col("msg"), " ").getItem(0))
    val out = run(stage("ip_informer", "kind:a",
      """          source_fields: [ip]
        |          target_field: info""".stripMargin), df)
    // target is a variant keyed by IP now; presence check suffices here
    val m = out.select(col("kind"), col("info").cast("string")).collect()
      .map(r => r.getString(0) -> r.get(1)).toMap
    assert(m("a") != null && m("a").toString.contains("is_private"))
    assert(m("b") == null)
  }

  test("domain_label_extractor writes only on filter-matching rows") {
    val out = run(stage("domain_label_extractor", "kind:a",
      """          source_fields: [domain]
        |          target_field: dl""".stripMargin), twoRows)
    val m = out.select(col("kind"), col("dl.registered_domain")).collect()
      .map(r => r.getString(0) -> r.get(1)).toMap
    assert(m("a") == "example.co.uk")
    assert(m("b") == null)
  }

  test("domain_resolver writes only on filter-matching rows") {
    val out = run(stage("domain_resolver", "kind:a",
      """          source_fields: [domain]
        |          target_field: rip""".stripMargin), twoRows)
    val m = byKind(out, "rip")
    assert(m("a") != null)
    assert(m("b") == null)
  }

  test("template_replacer writes only on filter-matching rows") {
    val out = run(stage("template_replacer", "kind:a",
      """          fields: [kind]
        |          target_field: repl
        |          table:
        |            a: "Alpha"
        |            b: "Beta"""".stripMargin), twoRows)
    val m = byKind(out, "repl")
    assert(m("a") == "Alpha")
    assert(m("b") == null) // table has an entry for b, but filter says no
  }

  test("clusterer writes only on filter-matching rows") {
    val out = run(stage("clusterer", "kind:a",
      """          source_fields: [msg]
        |          output_field_name: sig
        |          substitutions:
        |            "\\d+": "N"""".stripMargin), twoRows)
    val m = byKind(out, "sig")
    assert(m("a") == "N.N.N.N GET")
    assert(m("b") == null)
  }

  test("amides writes only on filter-matching rows") {
    val out = run(stage("amides", "kind:a",
      """          source_fields: [msg]
        |          target_field: score
        |          weights:
        |            GET: 2.0
        |          bias: -1.0""".stripMargin), twoRows)
    val m = out.select(col("kind"), col("score.detected")).collect()
      .map(r => r.getString(0) -> r.get(1)).toMap
    assert(m("a") != null)
    assert(m("b") == null)
  }

  test("guarded rules preserve pre-existing values on non-matching rows") {
    // reference semantics (round-3 alignment): an OCCUPIED target without
    // overwrite_target is a FieldExistsWarning — value kept on BOTH rows,
    // failure tag only on the matching one (domain_resolver
    // test_field_exits_warning); with overwrite_target the matching row
    // resolves and the non-matching row still keeps its value
    val df = twoRows.withColumn("rip", lit("keep-me"))
    val out = run(stage("domain_resolver", "kind:a",
      """          source_fields: [domain]
        |          target_field: rip""".stripMargin), df)
    val m = byKind(out, "rip")
    assert(m("a") == "keep-me")
    assert(m("b") == "keep-me")
    val tags = byKind(out, "tags")
    assert(tags("a") != null)
    assert(tags("b") == null)
    val out2 = run(stage("domain_resolver", "kind:a",
      """          source_fields: [domain]
        |          target_field: rip
        |          overwrite_target: true""".stripMargin), df)
    val m2 = byKind(out2, "rip")
    assert(m2("a") != "keep-me" && m2("a") != null)
    assert(m2("b") == "keep-me")
  }
}
