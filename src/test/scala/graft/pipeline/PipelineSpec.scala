package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end pipeline: YAML config → compiled narrow-transform chain →
  * main + side-output channels (the reference's acceptance-test shape:
  * pipeline config + JSONL fixtures → golden outputs).
  */
class PipelineSpecTest extends SparkSpec {

  private val yaml =
    """
      |pipeline:
      |  - type: dissector
      |    rules:
      |      - filter: "message"
      |        dissector:
      |          mapping:
      |            message: "%{level} %{user} %{action}"
      |  - type: generic_adder
      |    rules:
      |      - filter: "*"
      |        generic_adder:
      |          add:
      |            engine: graft
      |  - type: calculator
      |    rules:
      |      - filter: "amount"
      |        calculator:
      |          calc: "${amount} * 100"
      |          target_field: amount_cents
      |  - type: pre_detector
      |    rules:
      |      - filter: "level:ERROR"
      |        pre_detector:
      |          id: rule-err
      |          title: "Error events"
      |          severity: high
      |          mitre: [T1059]
      |  - type: deleter
      |    rules:
      |      - filter: "level:DEBUG"
      |        deleter:
      |          delete: true
      |""".stripMargin

  private def input = {
    val s = spark
    import s.implicits._
    Seq(
      ("ERROR alice login", 10.5),
      ("INFO bob purchase", 2.25),
      ("DEBUG carol noise", 0.0)
    ).toDF("message", "amount")
  }

  test("yaml loads, compiles, and runs with side outputs") {
    val spec = RuleLoader.fromYaml(yaml)
    assert(spec.stages.map(_.processorType) ==
      Seq("dissector", "generic_adder", "calculator", "pre_detector", "deleter"))

    val result = PipelineCompiler.compile(spec)(input)

    val main = result.main.orderBy("message").collect()
    assert(main.length == 2) // DEBUG row deleted
    val byUser = result.main.select("user", "level", "engine", "amount_cents")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getDouble(3))).toMap
    assert(byUser("alice") == (("ERROR", "graft", 1050.0)))
    assert(byUser("bob") == (("INFO", "graft", 225.0)))

    val detections = result.extra("pre_detector").collect()
    assert(detections.length == 1)
    val d = result.extra("pre_detector")
      .select("id", "title", "severity").head()
    assert(d.getString(0) == "rule-err" && d.getString(2) == "high")
  }

  test("rule filters gate writes per event (non-matching rows untouched)") {
    val spec = RuleLoader.fromYaml(
      """
        |pipeline:
        |  - type: generic_adder
        |    rules:
        |      - filter: "amount:[5.0 TO *]"
        |        generic_adder:
        |          add:
        |            big: "yes"
        |""".stripMargin)
    val out = PipelineCompiler.compile(spec)(input).main
    val vals = out.select("message", "big").collect()
      .map(r => r.getString(0).split(" ")(1) -> r.getString(1)).toMap
    assert(vals("alice") == "yes")
    assert(vals("bob") == null)
  }

  test("streaming: same pipeline over a file stream via foreachBatch sinks") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val inDir = s"$tmp/in"; val ckpt = s"$tmp/ckpt"
    new java.io.File(inDir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$inDir/part1.txt"),
      "ERROR alice login\nINFO bob purchase\nDEBUG carol noise\n")

    // same pipeline minus the calculator (the text stream has no amount col)
    val spec0 = RuleLoader.fromYaml(yaml)
    val spec = spec0.copy(stages = spec0.stages.filterNot(_.processorType == "calculator"))

    val collectedMain = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val collectedDet = new java.util.concurrent.ConcurrentLinkedQueue[String]()

    val stream = graft.streaming.StreamRunner.fileSource(spark, inDir)
    val q = graft.streaming.StreamRunner.run(stream, spec,
      sinks = Map(
        "main" -> (df => df.select("user").collect()
          .foreach(r => collectedMain.add(r.getString(0)))),
        "pre_detector" -> (df => df.select("id").collect()
          .foreach(r => collectedDet.add(r.getString(0))))),
      checkpoint = ckpt)
    q.awaitTermination(60000)

    import scala.jdk.CollectionConverters._
    assert(collectedMain.asScala.toSet == Set("alice", "bob"))
    assert(collectedDet.asScala.toSeq == Seq("rule-err"))
  }
}
