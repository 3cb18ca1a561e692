package graft.streaming

import graft.SparkSpec
import graft.pipeline.RuleLoader
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import scala.jdk.CollectionConverters._

/** The Kafka round-trip, end to end: `StreamRunner.kafkaSource` →
  * compiled pipeline → `StreamRunner.kafkaSink`, executing through the
  * REAL `format("kafka")` resolution path against the test-classpath
  * in-process broker ([[FakeKafkaProvider]] — the container has no
  * Kafka artifact, re-verified every round). What this pins beyond
  * KafkaWireSpec's option-translation checks: the options actually
  * REACH a `kafka`-named source/sink through Spark's DataSource
  * registry, offsets checkpoint and resume across query restarts,
  * `startingOffsets` applies only on first start, the sink routes to
  * its `topic` option, and the value serialization round-trips.
  *
  * ENV-GATED: if a real Kafka connector appears on the classpath
  * (two providers claiming `kafka`), these tests cancel — the library
  * code they drive is then testable against the real thing instead.
  */
class KafkaE2eSpec extends SparkSpec {

  private def kafkaProviders: Seq[String] =
    java.util.ServiceLoader
      .load(classOf[org.apache.spark.sql.sources.DataSourceRegister],
        Thread.currentThread().getContextClassLoader)
      .asScala.filter(_.shortName() == "kafka")
      .map(_.getClass.getName).toSeq

  private def assumeFakeOnly(): Unit = {
    val ps = kafkaProviders
    assume(ps == Seq("graft.streaming.FakeKafkaProvider"),
      s"kafka providers on classpath: $ps — a real connector is " +
        "present, run the round-trip against a real broker instead")
  }

  private val spec = RuleLoader.fromYaml(
    """pipeline:
      |  - type: decoder
      |    rules:
      |      - filter: "message"
      |        decoder:
      |          source_fields: [message]
      |          source_format: json
      |          target_field: event
      |  - type: generic_adder
      |    rules:
      |      - filter: "*"
      |        generic_adder: {add: {meta.engine: graft}}
      |""".stripMargin)

  test("kafka e2e: produce → pipeline → consume, offsets resume from the checkpoint") {
    assumeFakeOnly()
    FakeKafkaBroker.clear()
    val inTopic = "events-in"; val outTopic = "events-out"
    val ckpt = java.nio.file.Files.createTempDirectory("kafka-ck").toString
    val kafkaConfig = Map(
      "bootstrap.servers" -> "fake:9092",
      "group.id" -> "graft-e2e",
      "enable.auto.commit" -> "true",   // must be DROPPED by the wiring
      "auto.offset.reset" -> "earliest")

    FakeKafkaBroker.publish(inTopic, Seq(
      """{"event_type":"alert","n":1}""",
      """{"event_type":"alert","n":2}"""))

    def runOnce(): Unit = {
      val q = StreamRunner.run(
        StreamRunner.kafkaSource(spark, kafkaConfig, inTopic), spec,
        Map("main" -> StreamRunner.kafkaSink(
          Map("bootstrap.servers" -> "fake:9092"), outTopic)),
        ckpt, Trigger.AvailableNow())
      q.awaitTermination()
    }
    runOnce()
    val out1 = FakeKafkaBroker.messages(outTopic)
    assert(out1.size == 2, s"round 1 produced: $out1")
    assert(out1.forall(_.contains(""""engine":"graft"""")), out1.toString)
    assert(out1.exists(_.contains(""""n":1""")) &&
      out1.exists(_.contains(""""n":2""")), out1.toString)

    // the wire options actually reached the source/sink: prefixed
    // passthrough present, Spark-owned commit knobs absent, topic routed
    val ro = FakeKafkaBroker.lastReadOptions
    assert(ro("kafka.bootstrap.servers") == "fake:9092" &&
      ro("kafka.group.id") == "graft-e2e" &&
      ro("subscribe") == inTopic &&
      !ro.contains("kafka.enable.auto.commit"), ro.toString)
    assert(FakeKafkaBroker.lastWriteOptions("topic") == outTopic)

    // restart from the SAME checkpoint with one new message: only the
    // new offset is consumed (stored offsets win over startingOffsets)
    FakeKafkaBroker.publish(inTopic, Seq("""{"event_type":"alert","n":3}"""))
    runOnce()
    val out2 = FakeKafkaBroker.messages(outTopic)
    assert(out2.size == 3, s"restart must consume ONLY the new offset: $out2")
    assert(out2.count(_.contains(""""n":1""")) == 1,
      "restart replayed already-committed offsets")
  }

  test("kafka e2e: startingOffsets=latest skips the backlog on first start") {
    assumeFakeOnly()
    FakeKafkaBroker.clear()
    val inTopic = "latest-in"; val outTopic = "latest-out"
    FakeKafkaBroker.publish(inTopic, Seq("""{"event_type":"old","n":0}"""))
    val ckpt = java.nio.file.Files.createTempDirectory("kafka-latest").toString
    // reference config auto.offset.reset=latest → startingOffsets=latest
    val q = StreamRunner.run(
      StreamRunner.kafkaSource(spark,
        Map("bootstrap.servers" -> "fake:9092",
          "auto.offset.reset" -> "latest"), inTopic), spec,
      Map("main" -> StreamRunner.kafkaSink(
        Map("bootstrap.servers" -> "fake:9092"), outTopic)),
      ckpt, Trigger.AvailableNow())
    q.awaitTermination()
    assert(FakeKafkaBroker.messages(outTopic).isEmpty,
      "latest must skip the pre-start backlog")
  }
}
