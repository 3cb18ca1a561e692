package graft.streaming

import graft.SparkSpec
import graft.pipeline.{PipelineSpec, RuleLoader}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.matchers.should.Matchers

/** Hot config reload between micro-batches (reference
  * configuration.py:483-491 + runner.py): reload-on-change only, error
  * backoff to a quarter (min 5 s), checkpoint survival across the swap.
  */
class ConfigRefreshSpec extends SparkSpec with Matchers {

  private def spec(tag: String): PipelineSpec = RuleLoader.fromYaml(
    s"""pipeline:
       |  - type: generic_adder
       |    rules:
       |      - filter: "*"
       |        generic_adder:
       |          add:
       |            stage: $tag
       |""".stripMargin)

  test("ConfigRefresh: reload-on-change, interval gating, error backoff") {
    var now = 0L
    var current = "v1"
    var fail = false
    var loads = 0
    val refresh = new StreamRunner.ConfigRefresh(
      () => {
        loads += 1
        if (fail) throw new RuntimeException("getter down")
        spec(current)
      },
      intervalSec = 60, clock = () => now)
    val initialLoads = loads

    // inside the interval: no re-load at all
    refresh.current(); refresh.current()
    loads shouldBe initialLoads
    refresh.reloads shouldBe 0

    // past the interval but unchanged content: checked, not reloaded
    now += 61 * 1000
    refresh.current()
    loads shouldBe initialLoads + 1
    refresh.reloads shouldBe 0
    refresh.currentIntervalSec shouldBe 60

    // changed content: reload
    current = "v2"
    now += 61 * 1000
    refresh.current()
    refresh.reloads shouldBe 1

    // load failure: old pipeline kept, interval backs off 60 -> 15 -> 5
    fail = true
    now += 61 * 1000
    refresh.current()
    refresh.failures shouldBe 1
    refresh.currentIntervalSec shouldBe 15
    now += 16 * 1000
    refresh.current()
    refresh.failures shouldBe 2
    refresh.currentIntervalSec shouldBe 5
    now += 6 * 1000
    refresh.current()
    refresh.failures shouldBe 3
    refresh.currentIntervalSec shouldBe 5 // floor

    // recovery restores the configured interval
    fail = false
    now += 6 * 1000
    refresh.current()
    refresh.currentIntervalSec shouldBe 60
  }

  test("runRefreshing: mid-stream rule swap changes output; checkpoint survives") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val checkpoint = java.nio.file.Files.createTempDirectory("ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("out").toString

    val configPath = java.nio.file.Files.createTempFile("pipeline", ".yml")
    def writeConfig(tag: String): Unit = java.nio.file.Files.write(configPath,
      s"""pipeline:
         |  - type: generic_adder
         |    rules:
         |      - filter: "*"
         |        generic_adder:
         |          add:
         |            stage: $tag
         |""".stripMargin.getBytes("UTF-8"))
    writeConfig("v1")

    var now = 0L
    val refresh = new StreamRunner.ConfigRefresh(
      () => RuleLoader.fromYaml(new String(
        java.nio.file.Files.readAllBytes(configPath), "UTF-8")),
      intervalSec = 30, clock = () => now)

    val mem = MemoryStream[String]
    val stream = mem.toDF().select(org.apache.spark.sql.functions.col("value").as("message"))
    val sinks = Map[String, org.apache.spark.sql.DataFrame => Unit](
      "main" -> StreamRunner.jsonlSink(outDir))

    val q = StreamRunner.runRefreshing(stream, refresh, sinks, checkpoint,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      mem.addData("e1")
      q.processAllAvailable()

      // swap the rule file; the refresh interval hasn't elapsed yet
      writeConfig("v2")
      mem.addData("e2")
      q.processAllAvailable()

      // past the interval: next micro-batch picks up v2
      now += 31 * 1000
      mem.addData("e3")
      q.processAllAvailable()
      refresh.reloads shouldBe 1
    } finally q.stop()

    // restart from the same checkpoint: offsets carry over, new events
    // flow through the (already-reloaded) pipeline
    val q2 = StreamRunner.runRefreshing(stream, refresh, sinks, checkpoint,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      mem.addData("e4")
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.json(outDir).collect()
      .map(r => r.getAs[String]("message") -> r.getAs[String]("stage")).toMap
    rows("e1") shouldBe "v1"
    rows("e2") shouldBe "v1" // swap not yet visible: interval not elapsed
    rows("e3") shouldBe "v2"
    rows("e4") shouldBe "v2"
    rows.size shouldBe 4 // exactly-once across the restart
  }
}
