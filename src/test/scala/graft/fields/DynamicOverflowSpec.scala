package graft.fields

import graft.SparkSpec
import graft.pipeline.{PipelineCompiler, RuleLoader}
import org.scalatest.matchers.should.Matchers
import com.fasterxml.jackson.databind.ObjectMapper

/** Conformance for the variant/overflow dynamic path (SURVEY §1.5):
  * events carrying fields NO rule declares run through a compiled
  * pipeline and keep those fields byte-identically, without any of them
  * appearing in an inferred schema.
  */
class DynamicOverflowSpec extends SparkSpec with Matchers {

  private val mapper = new ObjectMapper()

  test("undeclared fields survive the pipeline; declared follow pipeline semantics") {
    val s = spark
    import s.implicits._
    val events = Seq(
      """{"message":"a=1","ts_str":"junk","extra":{"keep":"me","deep":[1,2]},"unmapped":"x"}""",
      """{"message":"b=2","nested":{"uid":7,"other":"z"},"weird.key":true}""",
      """{"extra":{"keep":"alone"}}""" // no declared fields at all
    ).toDF("value")

    val spec = RuleLoader.fromYaml(
      """pipeline:
        |  - type: dissector
        |    rules:
        |      - filter: "message"
        |        dissector:
        |          mapping:
        |            message: "%{k}=%{v|int}"
        |  - type: generic_adder
        |    rules:
        |      - filter: "*"
        |        generic_adder:
        |          add: {meta.engine: graft}
        |  - type: dropper
        |    rules:
        |      - filter: "*"
        |        dropper: {drop: [ts_str]}
        |""".stripMargin)

    val out = DynamicOps.runWithOverflow(events, "value",
      Map("message" -> "string", "ts_str" -> "string", "nested.uid" -> "long"),
      PipelineCompiler.compile(spec))
      .collect().map(_.getString(0)).map(mapper.readTree).sortBy(_.toString)

    out.length shouldBe 3
    val e1 = out.find(_.has("unmapped")).get
    // undeclared fields byte-identical
    e1.get("unmapped").asText() shouldBe "x"
    e1.get("extra").get("keep").asText() shouldBe "me"
    e1.get("extra").get("deep").toString shouldBe "[1,2]"
    // pipeline outputs present
    e1.get("k").asText() shouldBe "a"
    e1.get("v").asLong() shouldBe 1L
    e1.get("meta").get("engine").asText() shouldBe "graft"
    // declared + dropped → gone, not resurrected from the original
    e1.has("ts_str") shouldBe false

    val e2 = out.find(_.has("nested")).get
    // undeclared sibling INSIDE a declared branch survives
    e2.get("nested").get("other").asText() shouldBe "z"
    e2.get("nested").get("uid").asLong() shouldBe 7L
    e2.get("weird.key").asBoolean() shouldBe true
    e2.get("k").asText() shouldBe "b"

    val e3 = out.find(n => n.has("extra") && !n.has("unmapped") && !n.has("nested")).get
    e3.get("extra").get("keep").asText() shouldBe "alone"
    // no declared fields present → none materialize from the extraction
    e3.has("message") shouldBe false
    e3.get("meta").get("engine").asText() shouldBe "graft"
  }

  test("declaredColumns reassembles dotted paths into nested structs") {
    val s = spark
    import s.implicits._
    val df = Seq("""{"a":{"b":1,"c":"x"},"top":2}""").toDF("value")
    val cols = DynamicOps.declaredColumns(
      DynamicOps.toVariant(org.apache.spark.sql.functions.col("value")),
      Map("a.b" -> "long", "a.c" -> "string", "top" -> "long"))
    val out = df.select(cols: _*)
    out.schema.fieldNames.toSeq.sorted shouldBe Seq("a", "top")
    val row = out.head()
    row.getStruct(row.fieldIndex("a")).getLong(0) shouldBe 1L
    row.getStruct(row.fieldIndex("a")).getString(1) shouldBe "x"
    row.getLong(row.fieldIndex("top")) shouldBe 2L
  }

  test("mergeOverflow: declared paths replaced, undeclared kept, objects merged deep") {
    DynamicOps.mergeOverflow(
      """{"a":{"b":1,"z":9},"u":"keep"}""",
      """{"a":{"b":2},"new":true}""",
      """{"a":{"b":1}}""",
      Seq(List("a", "b"))) shouldBe
      """{"a":{"z":9,"b":2},"u":"keep","new":true}"""
    // pipeline saw the declared field (decl has it) and dropped it → gone
    DynamicOps.mergeOverflow(
      """{"gone":1,"u":2}""", """{"u":2}""", """{"gone":1}""",
      Seq(List("gone"))) shouldBe
      """{"u":2}"""
    // extraction NEVER saw the field (type mismatch → decl lacks it):
    // the original value survives instead of being destroyed
    DynamicOps.mergeOverflow(
      """{"gone":"not-a-long","u":2}""", """{"u":2}""", """{}""",
      Seq(List("gone"))) shouldBe
      """{"gone":"not-a-long","u":2}"""
  }

  test("type-mismatched declared field survives end-to-end; leaf/parent conflict rejected") {
    val s = spark
    import s.implicits._
    val events = Seq("""{"nested":{"uid":"not-a-long"},"keep":1}""").toDF("value")
    val spec = RuleLoader.fromYaml(
      """pipeline:
        |  - type: generic_adder
        |    rules:
        |      - filter: "*"
        |        generic_adder:
        |          add: {tagged: "y"}
        |""".stripMargin)
    val out = DynamicOps.runWithOverflow(events, "value",
      Map("nested.uid" -> "long"), PipelineCompiler.compile(spec))
      .head().getString(0)
    val node = mapper.readTree(out)
    node.get("nested").get("uid").asText() shouldBe "not-a-long"
    node.get("keep").asInt() shouldBe 1
    node.get("tagged").asText() shouldBe "y"

    val e = intercept[IllegalArgumentException](
      DynamicOps.declaredColumns(
        DynamicOps.toVariant(org.apache.spark.sql.functions.lit("{}")),
        Map("a" -> "string", "a.b" -> "long")))
    e.getMessage should include("conflicting")
  }

  test("array paths: declared coordinates extract, undeclared elements survive") {
    val s = spark
    import s.implicits._
    val events = Seq(
      """{"items":[{"name":"a","keep":1},{"name":"b"},{"name":"c"}],"u":"x"}""",
      """{"items":"scalar","u":"y"}""",
      """{"u":"z"}"""
    ).toDF("value")
    // a pipeline that READS items.0.name through the static resolver
    // (digit segment → element_at) and copies it to a new field
    val spec = RuleLoader.fromYaml(
      """pipeline:
        |  - type: field_manager
        |    rules:
        |      - filter: "items.0.name: a"
        |        field_manager:
        |          source_fields: ["items.0.name"]
        |          target_field: first_item
        |""".stripMargin)
    val out = DynamicOps.runWithOverflow(events, "value",
      Map("items.0.name" -> "string", "items.1.name" -> "string"),
      PipelineCompiler.compile(spec))
      .collect().map(_.getString(0)).map(mapper.readTree)

    val e1 = out.find(_.has("items")).get
    e1.get("first_item").asText() shouldBe "a"
    // declared coordinates round-trip; undeclared element fields and the
    // element past the declared span survive (key order at a REWRITTEN
    // coordinate follows the merge, same as object paths — Jackson node
    // equality is key-order-insensitive)
    e1.get("items") shouldBe mapper.readTree(
      """[{"name":"a","keep":1},{"name":"b"},{"name":"c"}]""")
    e1.get("u").asText() shouldBe "x"

    // items exists as a SCALAR: extraction saw nothing, scalar survives
    val e2 = out.find(n => n.has("u") && n.get("u").asText() == "y").get
    e2.get("items").asText() shouldBe "scalar"
    e2.has("first_item") shouldBe false

    // items entirely absent: nothing materializes
    val e3 = out.find(n => n.has("u") && n.get("u").asText() == "z").get
    e3.has("items") shouldBe false
  }

  test("array paths: scalar-element arrays and merge of MODIFIED coordinates") {
    // timestamper-style rewrite of a declared array coordinate
    DynamicOps.mergeOverflow(
      """{"tags":["old","two","three"],"u":1}""",
      """{"tags":["NEW","two"]}""",
      """{"tags":["old","two"]}""",
      Seq(List("tags", "0"), List("tags", "1"))) shouldBe
      """{"tags":["NEW","two","three"],"u":1}"""
    // base array SHORTER than the declared span: padding nulls in the
    // output never extend the original
    DynamicOps.mergeOverflow(
      """{"tags":["only"]}""",
      """{"tags":["only",null,null]}""",
      """{"tags":["only",null,null]}""",
      Seq(List("tags", "0"), List("tags", "1"), List("tags", "2"))) shouldBe
      """{"tags":["only"]}"""
    // array-of-objects declared against an array of SCALARS: elements
    // survive (the artifact {} elements prune against the decl snapshot)
    DynamicOps.mergeOverflow(
      """{"items":["x","y"]}""",
      """{"items":[{},{}]}""",
      """{"items":[{},{}]}""",
      Seq(List("items", "0", "name"), List("items", "1", "name"))) shouldBe
      """{"items":["x","y"]}"""
    // mixed digit/name segments under one parent are rejected
    val e = intercept[IllegalArgumentException](
      DynamicOps.declaredColumns(
        DynamicOps.toVariant(org.apache.spark.sql.functions.lit("{}")),
        Map("a.0" -> "string", "a.b" -> "long")))
    e.getMessage should include("mixed array-index")
    // index type conflicts are rejected
    val e2 = intercept[IllegalArgumentException](
      DynamicOps.declaredColumns(
        DynamicOps.toVariant(org.apache.spark.sql.functions.lit("{}")),
        Map("a.0.x" -> "string", "a.1.x" -> "long")))
    e2.getMessage should include("types")
  }

  test("declared path under a SCALAR parent: the scalar survives") {
    // extraction emits an empty struct for the declared parent (the path
    // exists — as a scalar); the merge must not clobber 5 with {}
    val s = spark
    import s.implicits._
    val events = Seq("""{"a":5,"u":"keep"}""").toDF("value")
    val spec = RuleLoader.fromYaml(
      """pipeline:
        |  - type: generic_adder
        |    rules:
        |      - filter: "*"
        |        generic_adder:
        |          add: {tagged: "y"}
        |""".stripMargin)
    val out = DynamicOps.runWithOverflow(events, "value",
      Map("a.b" -> "long"), PipelineCompiler.compile(spec))
      .head().getString(0)
    val node = mapper.readTree(out)
    node.get("a").asInt() shouldBe 5
    node.get("u").asText() shouldBe "keep"
    node.get("tagged").asText() shouldBe "y"
  }
}
