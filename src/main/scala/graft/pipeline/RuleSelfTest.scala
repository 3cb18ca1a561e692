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

  /** Render a JSON event the way the reference diffs it
    * (auto_rule_tester.py:565-586): keys sorted, lists of scalars
    * sorted, indent 4.
    */
  private[graft] def prettySorted(json: String): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    def normalize(n: JsonNode): JsonNode = n match {
      case o: ObjectNode =>
        val out = mapper.createObjectNode()
        o.fieldNames().asScala.toSeq.sorted.foreach { n =>
          out.set[JsonNode](n, normalize(o.get(n))) }
        out
      case a: ArrayNode =>
        val out = mapper.createArrayNode()
        val kids = (0 until a.size).map(i => normalize(a.get(i)))
        val sorted =
          if (kids.forall(k => k.isValueNode)) kids.sortBy(_.asText)
          else kids
        sorted.foreach(out.add)
        out
      case other => other
    }
    mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(normalize(mapper.readTree(json)))
  }

  /** Minimal `difflib.ndiff`-style line diff: `- ` lines only in the
    * actual output, `+ ` lines only in the expected event, `  ` common
    * (the reference's `?` hint lines are rendering sugar and omitted;
    * failure detection keys on +/- exactly like
    * auto_rule_tester._check_if_different).
    */
  private[graft] def ndiff(actual: String, expected: String): Seq[String] = {
    val a = actual.split("\n", -1).toIndexedSeq
    val b = expected.split("\n", -1).toIndexedSeq
    // LCS table, then walk back emitting diff lines in order
    val lcs = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- a.indices.reverse; j <- b.indices.reverse)
      lcs(i)(j) = if (a(i) == b(j)) lcs(i + 1)(j + 1) + 1
                  else math.max(lcs(i + 1)(j), lcs(i)(j + 1))
    val out = Seq.newBuilder[String]
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { out += "  " + a(i); i += 1; j += 1 }
      else if (lcs(i + 1)(j) >= lcs(i)(j + 1)) { out += "- " + a(i); i += 1 }
      else { out += "+ " + b(j); j += 1 }
    }
    while (i < a.length) { out += "- " + a(i); i += 1 }
    while (j < b.length) { out += "+ " + b(j); j += 1 }
    out.result()
  }

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
        // per-rule diff like the reference's AutoRuleTester output:
        // the full processed event against the expected one
        Some(Failure(stage.processorType, rule.description,
          ndiff(prettySorted(out.main.toJSON.head()),
            prettySorted(processedJson)).mkString("\n")))
      else None
    } catch {
      case e: Exception =>
        Some(Failure(stage.processorType, rule.description, e.getMessage))
    }
  }
}
