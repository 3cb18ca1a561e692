package graft.fields

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DynamicOpsSpec extends SparkSpec {

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq(
      """{"a":{"b":[10,20,30],"name":"x"},"opt":null}""",
      """{"a":{"b":[1],"name":"y"}}"""
    ).toDF("raw").withColumn("v", DynamicOps.toVariant(col("raw")))
  }

  test("dotted access with list index on variant path") {
    val rows = df.select(
      DynamicOps.getString(col("v"), "a.name").as("n"),
      DynamicOps.getLong(col("v"), "a.b.1").as("second"))
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getLong(1)))
    assert(rows.toSeq == Seq(("x", 20L), ("y", null)))
  }

  test("missing vs json-null distinction (MISSING sentinel semantics)") {
    val rows = df.select(
      DynamicOps.existsAt(col("v"), "opt").as("ex"),
      DynamicOps.isJsonNull(col("v"), "opt").as("nul"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    // row 1: opt present as JSON null → exists && isJsonNull
    // row 2: opt missing → !exists
    assert(rows.toSeq == Seq((true, true), (false, false)))
  }

  test("pipeline error channel wraps tagged events") {
    val s = spark
    import s.implicits._
    val input = s.read.json(Seq(
      """{"message":"a=1"}""", """{"message":"nomatch"}""").toDS)
    // grokker no-match → failure tag → error channel (dissect itself
    // never fails to match under partition semantics)
    val spec = graft.pipeline.PipelineSpec(Seq(graft.pipeline.StageSpec(
      "grokker", Seq(graft.pipeline.RuleSpec("message",
        Map("mapping" -> Map("message" -> "%{WORD:k}=%{INT:v}")))))))
    val out = graft.pipeline.PipelineCompiler.compileWithErrors(spec)(input)
    assert(out.main.count() == 2) // tagged events keep flowing
    val errs = out.extra("errors").collect()
    assert(errs.length == 1)
    assert(errs.head.getAs[String]("errors") == "_grokker_failure")
    assert(errs.head.getAs[String]("event").contains("nomatch"))
  }
}
