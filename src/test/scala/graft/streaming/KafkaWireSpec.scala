package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Wire-option conformance for the Kafka connector wrappers.
  *
  * No broker (or kafka-clients jar) exists in this container, so what a
  * live round-trip would prove is split into what CAN be proven here:
  * the exact reader/writer options Spark's Kafka source/sink would
  * receive for a reference-shaped `kafka_config`
  * (connector/confluent_kafka/input.py:64-69 DEFAULTS + :238-308,
  * output.py). Offset management itself is Spark's checkpoint mechanism
  * — exercised by every foreachBatch spec — not code this library owns.
  */
class KafkaWireSpec extends AnyFunSuite with Matchers {

  // the reference's documented input example (input.py:20-28) plus its
  // injected DEFAULTS (input.py:64-69)
  private val referenceInputConfig = Map(
    "bootstrap.servers" -> "localhost:9092",
    "group.id" -> "cgroup",
    "enable.auto.commit" -> "true",
    "session.timeout.ms" -> "6000",
    "auto.offset.reset" -> "earliest",
    "enable.auto.offset.store" -> "false",
    "statistics.interval.ms" -> "30000")

  test("source options: passthrough prefixed, group knobs dropped, offsets mapped") {
    val opts = StreamRunner.kafkaSourceOptions(referenceInputConfig, "consumer")
    opts("kafka.bootstrap.servers") shouldBe "localhost:9092"
    opts("kafka.group.id") shouldBe "cgroup"
    opts("kafka.session.timeout.ms") shouldBe "6000"
    opts("kafka.statistics.interval.ms") shouldBe "30000"
    opts("subscribe") shouldBe "consumer"
    // auto.offset.reset=earliest → startingOffsets (first start only,
    // like a group's stored offsets); the commit knobs are Spark-owned
    // (checkpointed offsets) and must NOT reach the consumer
    opts("startingOffsets") shouldBe "earliest"
    opts.keys.find(_.contains("auto.offset.reset")) shouldBe None
    opts.keys.find(_.contains("enable.auto.commit")) shouldBe None
    opts.keys.find(_.contains("enable.auto.offset.store")) shouldBe None
  }

  test("source options: latest maps; absent auto.offset.reset defaults earliest") {
    StreamRunner.kafkaSourceOptions(
      Map("bootstrap.servers" -> "b:9092", "auto.offset.reset" -> "latest"),
      "t")("startingOffsets") shouldBe "latest"
    StreamRunner.kafkaSourceOptions(
      Map("bootstrap.servers" -> "b:9092"), "t")("startingOffsets") shouldBe "earliest"
  }

  test("source options: security settings pass through untouched") {
    val opts = StreamRunner.kafkaSourceOptions(Map(
      "bootstrap.servers" -> "b:9093",
      "security.protocol" -> "SSL",
      "ssl.ca.location" -> "/ca.pem",
      "ssl.certificate.location" -> "/cert.pem",
      "ssl.key.location" -> "/key.pem"), "secure")
    opts("kafka.security.protocol") shouldBe "SSL"
    opts("kafka.ssl.ca.location") shouldBe "/ca.pem"
    opts("kafka.ssl.key.location") shouldBe "/key.pem"
  }

  test("sink options: producer config prefixed, topic set") {
    val opts = StreamRunner.kafkaSinkOptions(Map(
      "bootstrap.servers" -> "b:9092",
      "compression.type" -> "snappy",
      "acks" -> "all"), "out-topic")
    opts shouldBe Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "kafka.compression.type" -> "snappy",
      "kafka.acks" -> "all",
      "topic" -> "out-topic")
  }

  test("source wrapper builds a streaming plan with the kafka provider") {
    // the wrapper must reach Spark's DataSource resolution with format
    // "kafka": on the test classpath that resolves to the in-process
    // FakeKafkaProvider (KafkaE2eSpec drives the full round-trip), and
    // the built plan is a genuine streaming source with the wrapper's
    // value-as-message projection on top
    val spark = graft.SparkSpec.session
    val df = StreamRunner.kafkaSource(spark, referenceInputConfig, "consumer")
    df.isStreaming shouldBe true
    df.columns.toSeq shouldBe Seq("message")
  }
}
