package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Rule self-tests: rules may embed `tests: [{raw: {...}, processed:
  * {...}}]` executed when the pipeline is built (reference:
  * `Rule.Config.tests`, logprep/processor/base/rule.py:169-186, run by
  * AutoRuleTester, logprep/util/auto_rule_tester/auto_rule_tester.py).
  *
  * Each test compiles a one-stage pipeline, runs the raw event through it
  * as a single-row DataFrame, and asserts the processed event's fields
  * appear in the output. Failures throw at build time — bad rules never
  * reach the cluster.
  */
object RuleSelfTest {

  final case class Failure(stage: String, description: String, detail: String)

  /** Run the embedded tests of every rule; return failures (empty = pass). */
  def run(spark: SparkSession, spec: PipelineSpec,
          testsByRule: Map[RuleSpec, Seq[(String, String)]]): Seq[Failure] = {
    spec.stages.flatMap { stage =>
      stage.rules.flatMap { rule =>
        testsByRule.getOrElse(rule, Seq.empty).flatMap { case (rawJson, processedJson) =>
          runOne(spark, stage, rule, rawJson, processedJson)
        }
      }
    }
  }

  /** clusterer rule `tests: {raw, result}` (reference AutoRuleTester →
    * SignatureEngine.apply_signature_rule, signature_phase.py:70-103):
    * the pattern→repl substitution — repeated to fixpoint like the
    * reference — must turn `raw` into `result` (tags kept).
    */
  def signatureTest(pattern: String, repl: String, raw: String,
                    result: String): Option[Failure] = {
    val javaRepl = repl.replaceAll("""\\(\d)""", "\\$$1")
    var cur = raw
    var prev: String = null
    var i = 0
    while (cur != prev && i < 10) {
      prev = cur
      cur = cur.replaceAll(pattern, javaRepl)
      i += 1
    }
    if (cur == result) None
    else Some(Failure("clusterer", s"$pattern -> $repl",
      s"expected $result, got $cur"))
  }

  private def runOne(spark: SparkSession, stage: StageSpec, rule: RuleSpec,
                     rawJson: String, processedJson: String): Option[Failure] = {
    import spark.implicits._
    try {
      val input = spark.read.json(Seq(rawJson).toDS)
      val out = PipelineCompiler.compile(
        PipelineSpec(Seq(stage.copy(rules = Seq(rule))))) (input)
      val expected = spark.read.json(Seq(processedJson).toDS)
      val expCols = expected.columns.toSeq
      val missing = expCols.filterNot(out.main.columns.contains)
      if (missing.nonEmpty)
        return Some(Failure(stage.processorType, rule.description,
          s"missing fields: ${missing.mkString(",")}"))
      val got = out.main.select(expCols.map(c => col(c).cast("string")): _*).head()
      val want = expected.select(expCols.map(c => col(c).cast("string")): _*).head()
      if (got != want)
        Some(Failure(stage.processorType, rule.description,
          s"expected $want, got $got"))
      else None
    } catch {
      case e: Exception =>
        Some(Failure(stage.processorType, rule.description, e.getMessage))
    }
  }
}
