package graft.pipeline

import graft.SparkSpec

class RuleSelfTestSpec extends SparkSpec {

  test("embedded rule tests pass and fail correctly at build time") {
    val rule = RuleSpec("message",
      Map("mapping" -> Map("message" -> "%{a} %{b}")), "split two")
    val spec = PipelineSpec(Seq(StageSpec("dissector", Seq(rule))))

    val ok = RuleSelfTest.run(spark, spec, Map(rule -> Seq(
      ("""{"message":"hello world"}""", """{"a":"hello","b":"world"}"""))))
    assert(ok.isEmpty)

    val bad = RuleSelfTest.run(spark, spec, Map(rule -> Seq(
      ("""{"message":"hello world"}""", """{"a":"WRONG","b":"world"}"""))))
    assert(bad.nonEmpty && bad.head.stage == "dissector")
  }

  test("dissect SQL function via SparkSessionExtensions-style registration") {
    // register on the shared session the same way GraftExtensions does
    // (extensions config only applies at session build; here we inject
    // into the live registry)
    val s = spark
    s.sessionState.functionRegistry.createOrReplaceTempFunction("dissect",
      exprs => {
        val pattern = exprs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.toString
        val tok = """%\{([^}]*)\}""".r
        val ms = tok.findAllMatchIn(pattern).toList
        val seps = ms.sliding(2).collect {
          case List(a, b) => pattern.substring(a.end, b.start)
        }.toList
        graft.functions.DissectExpr(exprs.head, seps,
          pattern.substring(0, ms.head.start), pattern.substring(ms.last.end))
      }, "scala_udf")
    val r = s.sql("SELECT dissect('a=1;b=2', '%{x}=%{y};%{z}=%{w}') AS d")
      .selectExpr("d[0]", "d[1]", "d[2]", "d[3]").head()
    assert((0 to 3).map(r.getString) == Seq("a", "1", "b", "2"))
  }

  test("graft_dot SQL function: native dot product") {
    val s = spark
    s.sessionState.functionRegistry.createOrReplaceTempFunction("graft_dot",
      exprs => graft.functions.DotProductExpr(exprs.head, exprs(1)), "scala_udf")
    val r = s.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
    val n = s.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
      .head()
    assert(n.isNullAt(0))
  }

  test("clusterer signature tests: reference tests:{raw,result} shape") {
    // the reference fixture from test_clusterer.py test_cluster
    assert(RuleSelfTest.signatureTest(
      "test (signature) test", "<+>\\1</+>",
      "test signature test", "<+>signature</+>").isEmpty)
    // substitution repeats to fixpoint
    assert(RuleSelfTest.signatureTest(
      "aa", "a", "aaaa bbb", "a bbb").isEmpty)
    val fail = RuleSelfTest.signatureTest(
      "test (signature) test", "<+>\\1</+>",
      "test signature test", "WRONG")
    assert(fail.exists(_.stage == "clusterer"))
  }
}
