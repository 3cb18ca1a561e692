package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** generic_resolver's file-based capture-group table
  * (resolve_from_file.path/.pattern with the named `mapping` group,
  * reference rule.py:281-300) against the reference's own mapping file.
  */
class ResolverFileSpec extends SparkSpec {

  sys.props("graft.rule.base") = "/root/reference"

  private def run(rule: Map[String, Any], json: String) = {
    val s = spark
    import s.implicits._
    val input = s.read.json(Seq(json).toDS)
    PipelineCompiler.compile(PipelineSpec(Seq(StageSpec(
      "generic_resolver", Seq(RuleSpec("to_resolve", rule))))))(input).main
  }

  private val fileRule = Map(
    "field_mapping" -> Map("to_resolve" -> "resolved"),
    "resolve_from_file" -> Map(
      "path" -> "tests/testdata/unit/generic_resolver/resolve_mapping.yml",
      "pattern" -> """\d*(?P<mapping>[a-z]+)\d*"""))

  test("resolve_from_file maps the named capture through the table") {
    val out = run(fileRule, """{"to_resolve":"12ab34"}""")
    assert(out.select("resolved").head().getString(0) == "ab_server_type")
  }

  test("resolve_from_file leaves non-matching values unresolved") {
    val out = run(fileRule, """{"to_resolve":"12xx34"}""")
    assert(out.select("resolved").head().get(0) == null)
  }

  test("ignore_case uppercases the capture for the lookup") {
    val out = run(fileRule ++ Map("ignore_case" -> true)
      // the table keys are lowercase; upper-cased lookups need an
      // upper-cased table, so this asserts the MISS path stays clean
      , """{"to_resolve":"12AB34"}""")
    assert(out.columns.contains("resolved"))
  }

  test("resolve_list falls through when the file table misses") {
    val out = run(fileRule ++ Map(
      "resolve_list" -> Map(".*xx.*" -> "fallback")),
      """{"to_resolve":"12xx34"}""")
    assert(out.select("resolved").head().getString(0) == "fallback")
  }
}
