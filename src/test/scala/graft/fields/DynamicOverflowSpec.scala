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
