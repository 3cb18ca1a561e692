package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-triple conformance suite over the RULE-DRIVEN path — the
  * reference's dominant unit-test pattern (rule dict, input event,
  * expected event; see FIXTURES.md §1 and
  * tests/unit/processor/<name>/test_<name>.py). Each case: build a
  * one-stage pipeline from the rule, run the input as a 1-row DataFrame,
  * assert expected fields.
  */
class ConformanceSpec extends SparkSpec {

  private case class Triple(id: String, ptype: String, rule: RuleSpec,
                            input: String, expected: Map[String, Any])

  private val cases = Seq(
    Triple("dissector writes new fields with same separator",
      "dissector",
      RuleSpec("message", Map("mapping" -> Map("message" -> "%{f1} %{f2} %{f3} %{f4}"))),
      """{"message":"This is a message"}""",
      Map("f1" -> "This", "f2" -> "is", "f3" -> "a", "f4" -> "message")),
    Triple("dissector int conversion",
      "dissector",
      RuleSpec("m", Map("mapping" -> Map("m" -> "%{k}=%{v|int}"))),
      """{"m":"answer=42"}""",
      // |int convert writes through a variant union, rendering a JSON
      // number at the boundary
      Map("k" -> "answer", "v" -> 42L)),
    Triple("field_manager copies source to target",
      "field_manager",
      RuleSpec("source", Map("mapping" -> Map("source" -> "copied"))),
      """{"source":"stuff"}""",
      Map("copied" -> "stuff")),
    Triple("generic_adder adds literal",
      "generic_adder",
      RuleSpec("*", Map("add" -> Map("added" -> "value"))),
      """{"any":"x"}""",
      Map("added" -> "value")),
    Triple("concatenator joins with separator",
      "concatenator",
      RuleSpec("*", Map("source_fields" -> Seq("a", "b"),
        "separator" -> "-", "target_field" -> "joined")),
      """{"a":"x","b":"y"}""",
      Map("joined" -> "x-y")),
    Triple("calculator evaluates template arithmetic",
      "calculator",
      RuleSpec("n", Map("calc" -> "${n} * 3 + 1", "target_field" -> "out")),
      """{"n":7}""",
      Map("out" -> 22.0)),
    Triple("string_splitter splits on delimiter",
      "string_splitter",
      RuleSpec("csv", Map("source_fields" -> Seq("csv"), "delimiter" -> ",",
        "target_field" -> "parts")),
      """{"csv":"a,b,c"}""",
      Map.empty), // array asserted separately below
    Triple("replacer rewrites via template",
      "replacer",
      RuleSpec("tag", Map("mapping" -> Map("tag" -> "user%{masked}"))),
      """{"tag":"user123"}""",
      Map("tag" -> "usermasked")),
    Triple("generic_resolver first pattern wins",
      "generic_resolver",
      RuleSpec("kind", Map(
        "field_mapping" -> Map("kind" -> "class"),
        "resolve_list" -> Map("^err" -> "incident", ".*" -> "other"))),
      """{"kind":"error"}""",
      Map("class" -> "incident")),
    Triple("deleter drops matching event",
      "deleter",
      RuleSpec("kind:drop", Map("delete" -> true)),
      """{"kind":"drop"}""",
      Map.empty))

  for (t <- cases) {
    test(t.id) {
      val s = spark
      import s.implicits._
      val input = s.read.json(Seq(t.input).toDS)
      val out = PipelineCompiler.compile(
        PipelineSpec(Seq(StageSpec(t.ptype, Seq(t.rule)))))(input)
      if (t.ptype == "deleter") {
        assert(out.main.count() == 0)
      } else {
        val row = out.main.head()
        t.expected.foreach { case (field, want) =>
          val got = row.get(row.fieldIndex(field))
          // variant-typed cells compare on their JSON rendering
          assert(got == want || String.valueOf(got) == String.valueOf(want),
            s"field $field: got $got, want $want")
        }
      }
    }
  }

  test("string_splitter produces the split array") {
    val s = spark
    import s.implicits._
    val input = s.read.json(Seq("""{"csv":"a,b,c"}""").toDS)
    val out = PipelineCompiler.compile(PipelineSpec(Seq(StageSpec(
      "string_splitter", Seq(RuleSpec("csv", Map(
        "source_fields" -> Seq("csv"), "delimiter" -> ",",
        "target_field" -> "parts")))))))(input)
    assert(out.main.select("parts").head().getSeq[String](0) == Seq("a", "b", "c"))
  }

  test("field_manager strict mode tags FieldExistsWarning, keeps old value") {
    val s = spark
    import s.implicits._
    val input = s.read.json(Seq("""{"src":"new","occupied":"old"}""").toDS)
    val out = PipelineCompiler.compile(PipelineSpec(Seq(StageSpec(
      "field_manager", Seq(RuleSpec("src", Map(
        "mapping" -> Map("src" -> "occupied"))))))))(input)
    val row = out.main.select("occupied", "tags").head()
    assert(row.getString(0) == "old")
    assert(row.getSeq[String](1) == Seq("_field_manager_failure"))
  }

  test("field_manager merge_with_target extends lists") {
    val s = spark
    import s.implicits._
    val input = s.read.json(Seq("""{"src":"c","arr":["a","b"]}""").toDS)
    val out = PipelineCompiler.compile(PipelineSpec(Seq(StageSpec(
      "field_manager", Seq(RuleSpec("src", Map(
        "mapping" -> Map("src" -> "arr"),
        "merge_with_target" -> true)))))))(input)
    assert(out.main.select("arr").head().getSeq[String](0) == Seq("a", "b", "c"))
  }

  test("field_manager ignore_missing_fields skips absent sources") {
    val s = spark
    import s.implicits._
    val input = s.read.json(Seq("""{"present":"x"}""").toDS)
    val out = PipelineCompiler.compile(PipelineSpec(Seq(StageSpec(
      "field_manager", Seq(RuleSpec("*", Map(
        "mapping" -> Map("nosuch" -> "target"),
        "ignore_missing_fields" -> true)))))))(input)
    assert(!out.main.columns.contains("target"))
  }

  test("dissector failure tags when the mapping source is absent") {
    // dissect itself never fails to match (partition semantics take the
    // whole remainder); the failure path is a missing/non-string source
    val s = spark
    import s.implicits._
    val input = s.read.json(Seq("""{"message":"no equals sign"}""").toDS)
    val out = PipelineCompiler.compile(PipelineSpec(Seq(StageSpec(
      "dissector", Seq(RuleSpec("message", Map(
        "mapping" -> Map("nosuch" -> "%{a}=%{b}"))))))))(input)
    assert(out.main.select("tags").head().getSeq[String](0) ==
      Seq("_dissector_failure"))
  }
}
