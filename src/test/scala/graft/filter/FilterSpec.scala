package graft.filter

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Filter DSL conformance — cases modeled on the reference's
  * tests/unit/filter corpus (parse → compile → match/no-match on events).
  */
class FilterSpec extends SparkSpec {
  import FilterAst._

  // ---- parser ----------------------------------------------------------

  test("parses bare field as Exists") {
    assert(LuceneParser.parseOrThrow("message") == Exists("message"))
  }

  test("parses string equality and boolean operators") {
    val ast = LuceneParser.parseOrThrow("a:foo AND (b:1 OR NOT c:x)")
    assert(ast == And(Seq(StringEq("a", "foo"),
      Or(Seq(IntEq("b", 1), Not(StringEq("c", "x")))))))
  }

  test("parses ranges incl. exclusive + unbounded") {
    assert(LuceneParser.parseOrThrow("n:[1 TO 5]") == IntRange("n", Some(1), Some(5)))
    assert(LuceneParser.parseOrThrow("n:{1 TO 5}") ==
      IntRange("n", Some(1), Some(5), loIncl = false, hiIncl = false))
    assert(LuceneParser.parseOrThrow("n:[* TO 5.5]") ==
      FloatRange("n", None, Some(5.5)))
    assert(LuceneParser.parseOrThrow("d:[2024-01-01 TO 2024-12-31]") ==
      StringRange("d", Some("2024-01-01"), Some("2024-12-31")))
  }

  test("parses wildcard / regex / sigma modifiers") {
    assert(LuceneParser.parseOrThrow("a:fo*") == Wildcard("a", "fo*"))
    assert(LuceneParser.parseOrThrow("a:f?o") == Wildcard("a", "f?o"))
    assert(LuceneParser.parseOrThrow("a|re: ^f.o$") == Regex("a", "^f.o$"))
    assert(LuceneParser.parseOrThrow("""a:fo\*""") == StringEq("a", "fo*"))
  }

  test("parses field groups distributing the field") {
    assert(LuceneParser.parseOrThrow("a:(x OR y)") ==
      Or(Seq(StringEq("a", "x"), StringEq("a", "y"))))
  }

  test("parses star and null") {
    assert(LuceneParser.parseOrThrow("*") == Always(true))
    assert(LuceneParser.parseOrThrow("a:null") == IsNull("a"))
  }

  test("parses dotted paths and quoted phrases") {
    assert(LuceneParser.parseOrThrow("""a.b.c:"hello world"""") ==
      StringEq("a.b.c", "hello world"))
  }

  // ---- compiler + evaluation ------------------------------------------

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq(
      ("""{"msg":"alpha beta","num":5,"tags":["x","y"],"nested":{"deep":"v"},"opt":"here"}"""),
      ("""{"msg":"gamma","num":50,"tags":["z"],"nested":{"deep":"w"},"opt":null}""")
    ).toDF("j").select(from_json(col("j"),
      org.apache.spark.sql.types.StructType.fromDDL(
        "msg STRING, num INT, tags ARRAY<STRING>, nested STRUCT<deep: STRING>, opt STRING")).as("e"))
      .select("e.*")
  }

  private def matches(filter: String): Seq[String] =
    df.filter(FilterCompiler.predicate(filter, df.schema))
      .select("msg").collect().map(_.getString(0)).toSeq.sorted

  test("string equality on scalar and list membership") {
    assert(matches("msg:gamma") == Seq("gamma"))
    assert(matches("tags:x") == Seq("alpha beta")) // list membership
  }

  test("numeric equality and ranges with guards") {
    assert(matches("num:5") == Seq("alpha beta"))
    assert(matches("num:[10 TO 100]") == Seq("gamma"))
    assert(matches("num:{5 TO 50}") == Seq())
  }

  test("wildcard, regex, dotted nested access") {
    assert(matches("msg:alp*") == Seq("alpha beta"))
    assert(matches("msg:gam?a") == Seq("gamma"))
    assert(matches("msg|re: g.mma") == Seq("gamma"))
    assert(matches("nested.deep:v") == Seq("alpha beta"))
  }

  test("missing keys are false, never null (reference KeyDoesNotExistError)") {
    assert(matches("nosuch:field") == Seq())
    assert(matches("NOT nosuch:field") == Seq("alpha beta", "gamma").sorted)
    assert(matches("nosuch.nested.path:[1 TO 2]") == Seq())
  }

  test("null vs exists distinction") {
    assert(matches("opt:null") == Seq("gamma"))
    assert(matches("opt:here") == Seq("alpha beta"))
  }

  test("boolean composition null-safety") {
    assert(matches("msg:gamma AND num:50") == Seq("gamma"))
    assert(matches("msg:gamma OR tags:x") == Seq("alpha beta", "gamma").sorted)
    assert(matches("NOT (msg:gamma OR tags:x)") == Seq())
  }

  test("wildcard-to-regex translation escapes regex metachars") {
    assert(FilterCompiler.wildcardToRegex("a.b*c?") == "^\\Qa\\E\\Q.\\E\\Qb\\E.*\\Qc\\E.$")
  }

  test("regex anchoring preserves inline flags") {
    assert(FilterCompiler.anchorRegex("(?i)foo") == "(?i)^foo$")
    assert(FilterCompiler.anchorRegex("^bar$") == "^bar$")
  }
}
