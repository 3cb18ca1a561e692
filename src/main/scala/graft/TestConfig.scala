package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline._

/** Configuration verifier + rule unit-test runner (reference:
  * `logprep test config` — run_logprep.py:115-125 — and
  * `logprep test unit` — :160-174, AutoRuleTester).
  *
  * `runMain graft.TestConfig config.yml...` parses each configuration
  * and force-compiles the full pipeline (unknown processor types, bad
  * filter syntax, malformed calculator expressions, missing stage
  * config all throw at plan-build time — the same errors the reference
  * raises from `_get_configuration`). With `--unit`, every rule's
  * embedded `tests:` also run (`{raw, processed}` through a one-stage
  * pipeline; clusterer `{raw, result}` through the signature engine).
  * Exit 0 on success, 1 on any failure.
  */
object TestConfig {

  final case class Report(config: String, valid: Boolean, error: Option[String],
                          testFailures: Seq[RuleSelfTest.Failure])

  def verify(spark: SparkSession, configText: String,
             runUnitTests: Boolean,
             schemaDdl: Option[String] = None): (Boolean, Option[String], Seq[RuleSelfTest.Failure]) =
    try {
      val spec = RuleLoader.fromYaml(configText)
      // force stage compilation against an empty frame: rule filters,
      // expressions, and processor configs all materialize here.
      // Processor stages null-guard missing fields, so the empty frame
      // suffices; data-dependent stages (curation/relational) resolve
      // real columns, so `--schema "doc_id BIGINT, text STRING"` gives
      // the verifier the input shape to compile against.
      val frame = schemaDdl match {
        case Some(ddl) => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(ddl))
        case None => spark.emptyDataFrame
      }
      // config VALIDATION must not advance real ingest/statistics
      // stores (the DryRun contract)
      pipeline.CurationStages.suppressStateWrites.withValue(true) {
        PipelineCompiler.compile(spec)(frame)
      }
      val failures =
        if (runUnitTests)
          RuleSelfTest.run(spark, spec, testsFromYaml(configText)) ++
            signatureTestsFromYaml(configText)
        else Nil
      (failures.isEmpty, None, failures)
    } catch {
      case e: Exception => (false, Some(e.toString), Nil)
    }

  /** Rule-test coverage quota (reference AutoRuleTester
    * `_check_which_rule_files_miss_tests`, auto_rule_tester.py:527-556):
    * rules carrying at least one embedded test over all rules, as a
    * percentage, with the with/without file lists.
    */
  final case class Coverage(withTests: Seq[String], withoutTests: Seq[String]) {
    def pct: Double =
      if (withTests.isEmpty && withoutTests.isEmpty) 0.0
      else withTests.size.toDouble / (withTests.size + withoutTests.size) * 100.0
  }

  private[graft] def coverage(yaml: String): Coverage = {
    val (withT, withoutT) = walkRules(yaml).zipWithIndex.partition {
      case ((_, m), _) => testEntries(m).exists(t =>
        t.contains("raw") && (t.contains("processed") || t.contains("result")))
    }
    def label(e: ((String, Map[String, Any]), Int)): String = e match {
      case ((ptype, m), i) =>
        s"$ptype#${i + 1}: " + m.get("description").map(_.toString)
          .orElse(m.get("filter").map(f => s"filter '$f'")).getOrElse("rule")
    }
    Coverage(withT.map(label), withoutT.map(label))
  }

  /** Count embedded tests in a config (denominator for the result block). */
  private[graft] def totalTests(yaml: String): Int =
    walkRules(yaml).map { case (_, m) =>
      testEntries(m).count(t =>
        t.contains("raw") && (t.contains("processed") || t.contains("result")))
    }.sum

  /** Extract `{raw, processed}` rule tests (reference
    * Rule.Config.tests, rule.py:169-186) keyed by the SAME RuleSpec the
    * loader builds, so [[RuleSelfTest.run]] can match them.
    */
  private[graft] def testsFromYaml(yaml: String): Map[RuleSpec, Seq[(String, String)]] =
    walkRules(yaml).flatMap { case (ptype, m) =>
      val tests = testEntries(m).collect {
        case t if t.contains("raw") && t.contains("processed") =>
          (compactJson(t("raw")), compactJson(t("processed")))
      }
      if (tests.isEmpty) None
      else Some(RuleLoader.parseRule(ptype, m) -> tests)
    }.groupMapReduce(_._1)(_._2)(_ ++ _)

  /** Clusterer `{raw, result}` signature tests (reference AutoRuleTester
    * → SignatureEngine, signature_phase.py:70-103).
    */
  private[graft] def signatureTestsFromYaml(yaml: String): Seq[RuleSelfTest.Failure] =
    walkRules(yaml).filter(_._1 == "clusterer").flatMap { case (ptype, m) =>
      val cfg = m.getOrElse(ptype, Map.empty[String, Any])
        .asInstanceOf[Map[String, Any]]
      (cfg.get("pattern"), cfg.get("repl")) match {
        case (Some(p), Some(r)) =>
          testEntries(m).collect {
            case t if t.contains("raw") && t.contains("result") =>
              RuleSelfTest.signatureTest(p.toString, r.toString,
                t("raw").toString, t("result").toString)
          }.flatten
        case _ => Nil
      }
    }

  private def walkRules(yaml: String): Seq[(String, Map[String, Any])] = {
    val loaded = new org.yaml.snakeyaml.Yaml().load[Any](yaml)
    val spec = toScala(loaded).asInstanceOf[Map[String, Any]]
    spec.getOrElse("pipeline", Seq.empty).asInstanceOf[Seq[Any]].flatMap { st =>
      val sm = st.asInstanceOf[Map[String, Any]]
      val ptype = sm("type").toString
      Option(sm.getOrElse("rules", null)).map(_.asInstanceOf[Seq[Any]])
        .getOrElse(Seq.empty)
        .map(r => ptype -> r.asInstanceOf[Map[String, Any]])
    }
  }

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      import scala.jdk.CollectionConverters._
      scala.collection.immutable.ListMap(
        m.asScala.toSeq.map { case (k, vv) => k.toString -> toScala(vv) }: _*)
    case l: java.util.List[_] =>
      import scala.jdk.CollectionConverters._
      l.asScala.map(toScala).toSeq
    case other => other
  }

  private def testEntries(m: Map[String, Any]): Seq[Map[String, Any]] =
    m.getOrElse("tests", Seq.empty).asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])

  private def compactJson(v: Any): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def toNode(x: Any): com.fasterxml.jackson.databind.JsonNode = x match {
      case m: Map[_, _] =>
        val o = mapper.createObjectNode()
        m.foreach { case (k, v) => o.set[com.fasterxml.jackson.databind.JsonNode](
          String.valueOf(k), toNode(v)) }
        o
      case s: Seq[_] =>
        val a = mapper.createArrayNode()
        s.foreach(e => a.add(toNode(e)))
        a
      case null => mapper.nullNode()
      case b: Boolean => mapper.getNodeFactory.booleanNode(b)
      case i: Int => mapper.getNodeFactory.numberNode(i)
      case l: Long => mapper.getNodeFactory.numberNode(l)
      case d: Double => mapper.getNodeFactory.numberNode(d)
      case other => mapper.getNodeFactory.textNode(other.toString)
    }
    mapper.writeValueAsString(toNode(v))
  }

  def main(args: Array[String]): Unit = {
    // positional flag parsing (the Curate CLI's strictness): a dangling
    // `--schema` must fail loudly, not silently verify against the empty
    // frame, and only the CONSUMED value token is removed from the
    // config list (a config path string-equal to the DDL survived the
    // old equality filter's complement — i.e. was wrongly dropped)
    var runUnit = false
    var schemaDdl: Option[String] = None
    val configsB = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--unit" => runUnit = true
        case "--schema" =>
          require(i + 1 < args.length, "--schema requires a DDL value")
          schemaDdl = Some(args(i + 1))
          i += 1
        case f if f.startsWith("--") =>
          throw new IllegalArgumentException(s"unknown flag: $f")
        case path => configsB += path
      }
      i += 1
    }
    val configs = configsB.toSeq
    require(configs.nonEmpty,
      "usage: graft.TestConfig [--unit] [--schema <ddl>] <config.yml>...")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-test-config")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      var ok = true
      configs.foreach { path =>
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8")
        val (valid, err, failures) = verify(spark, text, runUnit, schemaDdl)
        if (valid) println(s"$path: the verification of the configuration was successful")
        else {
          ok = false
          err.foreach(e => println(s"$path: INVALID - $e"))
          failures.foreach(f =>
            println(s"$path: TEST FAILED [${f.stage}] ${f.description}:\n${f.detail}"))
        }
        if (runUnit && err.isEmpty) {
          // the reference's result block (auto_rule_tester.py:254-260 +
          // print_rules): per-rule coverage quota and test counters
          val cov = coverage(text)
          val total = totalTests(text)
          cov.withoutTests.foreach(r => println(s"~ RULE WITHOUT TEST: $r"))
          println(s"+ Successful Tests: ${total - failures.size}")
          println(s"- Failed Tests: ${failures.size}")
          println(f"Rule Test Coverage: ${cov.pct}%.1f")
          println(s"Total Tests: $total")
        }
      }
      if (!ok) sys.exit(1)
    } finally spark.stop()
  }
}
