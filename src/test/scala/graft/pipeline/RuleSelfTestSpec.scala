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

  test("graft_shingles / graft_md5half / graft_toprun SQL functions") {
    val s = spark
    import org.apache.spark.sql.catalyst.expressions.Literal
    def lit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e.asInstanceOf[Literal].value.toString.toInt
    s.sessionState.functionRegistry.createOrReplaceTempFunction("graft_shingles",
      exprs => graft.functions.ShinglesExpr(exprs.head, lit(exprs(1))), "scala_udf")
    s.sessionState.functionRegistry.createOrReplaceTempFunction("graft_md5half",
      exprs => graft.functions.Md5HalfExpr(exprs.head, lit(exprs(1))), "scala_udf")
    s.sessionState.functionRegistry.createOrReplaceTempFunction("graft_toprun",
      exprs => graft.functions.TopRunExpr(exprs.head), "scala_udf")

    val sh = s.sql("SELECT graft_shingles('a b c d a b c', 3) AS x").head()
      .getSeq[String](0)
    // distinct, first-occurrence order, 5 windows with one repeat
    assert(sh == Seq("a b c", "b c d", "c d a", "d a b"))
    val short = s.sql("SELECT graft_shingles('a b', 3) AS x").head()
      .getSeq[String](0)
    assert(short == Seq("a b"))
    // equal to the hex/substring/conv formulation it replaces
    val eq = s.sql(
      """SELECT graft_md5half('hello', 0) = CAST(conv(substring(md5('hello'), 1, 8), 16, 10) AS BIGINT)
         AND graft_md5half('hello', 1) = CAST(conv(substring(md5('hello'), 9, 8), 16, 10) AS BIGINT) AS ok""")
      .head().getBoolean(0)
    assert(eq)
    assert(s.sql("SELECT graft_toprun(array('b','a','b','c','b')) AS n")
      .head().getLong(0) == 3L)
    assert(s.sql("SELECT graft_toprun(array() ) AS n").head().getLong(0) == 0L)
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
