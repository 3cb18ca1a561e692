package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Load-test generator semantics vs the reference's generator package:
  * dataset loading, tag/timestamp manipulation, per-target batching,
  * seeded shuffle, cycling to the requested count, threaded send into
  * the engine's own HTTP input.
  */
class GeneratorSpec extends AnyFunSuite with Matchers {

  private def mkDataset(): String = {
    val root = java.nio.file.Files.createTempDirectory("gen").toString
    def cls(name: String, config: String, events: Seq[String]): Unit = {
      val d = new java.io.File(root, name); d.mkdirs()
      java.nio.file.Files.write(new java.io.File(d, "config.yaml").toPath,
        config.getBytes("UTF-8"))
      java.nio.file.Files.write(new java.io.File(d, "events.jsonl").toPath,
        events.mkString("\n").getBytes("UTF-8"))
    }
    cls("classA",
      """target: /jsonl
        |timestamps:
        |  - key: "@timestamp"
        |    format: "%Y-%m-%dT%H:%M:%S"
        |  - key: nested.ts
        |    format: "%H%M"
        |    time_shift: "-0130"
        |""".stripMargin,
      Seq("""{"message":"a1"}""", """{"message":"a2","tags":["x"]}"""))
    cls("classB",
      """target: /other
        |""".stripMargin,
      Seq("""{"message":"b1"}"""))
    root
  }

  private val fixedNow = java.time.LocalDateTime.of(2026, 8, 12, 10, 0, 0)

  test("strftime subset + time_shift parsing") {
    Generator.strftime("%Y-%m-%dT%H:%M:%S.%f", fixedNow) shouldBe
      "2026-08-12T10:00:00.000000"
    Generator.strftime("%y%j%%", fixedNow) shouldBe "26224%"
    Generator.parseShift("+0130") shouldBe 90
    Generator.parseShift("-0015") shouldBe -15
    intercept[IllegalArgumentException](Generator.parseShift("0130"))
  }

  test("manipulation: tag appended, timestamps replaced incl. dotted creation") {
    val ds = Generator.loadDataset(mkDataset())
    ds.map(_.target) shouldBe Seq("/jsonl", "/other")
    val evs = Generator.events(ds, Generator.Config(events = 3, tag = "lt"),
      now = () => fixedNow).toList
    evs.map(_._1) shouldBe Seq("/jsonl", "/jsonl", "/other")
    val e1 = JsonMethods.parse(evs.head._2)
    (e1 \ "tags") shouldBe JArray(List(JString("lt")))
    (e1 \ "@timestamp") shouldBe JString("2026-08-12T10:00:00")
    (e1 \ "nested" \ "ts") shouldBe JString("0830") // -0130 shift
    // existing tags list is appended to, not replaced
    (JsonMethods.parse(evs(1)._2) \ "tags") shouldBe
      JArray(List(JString("x"), JString("lt")))
  }

  test("events cycle to the requested count; seeded shuffle is deterministic") {
    val ds = Generator.loadDataset(mkDataset())
    val cfg = Generator.Config(events = 7, replaceTimestamp = false)
    Generator.events(ds, cfg).size shouldBe 7
    val a = Generator.events(ds, cfg.copy(shuffle = true, seed = Some(42))).toList
    val b = Generator.events(ds, cfg.copy(shuffle = true, seed = Some(42))).toList
    a shouldBe b
  }

  test("positionals: value-flags don't leak into positional args") {
    Generator.positionals(
      Array("--input-type", "json", "config.yml", "events.json"),
      Set("--input-type")) shouldBe Seq("config.yml", "events.json")
    Generator.positionals(
      Array("ds", "--events", "100", "http://x", "--shuffle"),
      Set("--events")) shouldBe Seq("ds", "http://x")
  }

  test("batches group per target and flush tails") {
    val evs = Iterator(("/a", "1"), ("/b", "2"), ("/a", "3"), ("/a", "4"), ("/b", "5"))
    val out = Generator.batches(evs, batchSize = 2).toList
    out should contain(("/a", Seq("1", "3")))
    out should contain(("/a", Seq("4")))
    out should contain(("/b", Seq("2", "5")))
    out.map(_._2.size).sum shouldBe 5
    intercept[IllegalArgumentException](Generator.batches(Iterator.empty, 0).toList)
  }

  /** Recording producer for the kafka target; optionally signals a full
    * buffer once to exercise the flush-and-retry path.
    */
  private final class FakeProducer(failFirst: Boolean = false)
      extends Generator.EventProducer {
    val produced = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val flushes = new java.util.concurrent.atomic.AtomicInteger()
    private val tripped = new java.util.concurrent.atomic.AtomicBoolean(!failFirst)
    def produce(topic: String, value: String): Unit = {
      if (!tripped.getAndSet(true))
        throw new Generator.BufferFull(new RuntimeException("buffer full"))
      produced.add(topic -> value); ()
    }
    def flush(): Unit = { flushes.incrementAndGet(); () }
  }

  test("kafka target: topic from target path's last segment; all events produced") {
    // reference generator/confluent_kafka/output.py store():
    // topic = target.rpartition("/"), one produce per `;`-joined item
    val ds = Generator.loadDataset(mkDataset())
    val producer = new FakeProducer()
    val (sent, _) = Generator.run(ds,
      Generator.Config(events = 5, batchSize = 2, threads = 2),
      Generator.kafkaSend(producer))
    sent shouldBe 5
    val byTopic = producer.produced.toArray
      .map(_.asInstanceOf[(String, String)]).groupBy(_._1)
    // /jsonl → "jsonl", /other → "other" (last path segment)
    byTopic.keySet shouldBe Set("jsonl", "other")
    byTopic("jsonl").length + byTopic("other").length shouldBe 5
    byTopic("jsonl").foreach { case (_, v) =>
      (JsonMethods.parse(v) \ "message").isInstanceOf[JString] shouldBe true
    }
  }

  test("kafka target: full buffer flushes and retries, not an error") {
    val ds = Generator.loadDataset(mkDataset())
    val producer = new FakeProducer(failFirst = true)
    val (sent, _) = Generator.run(ds,
      Generator.Config(events = 3, batchSize = 10),
      Generator.kafkaSend(producer))
    sent shouldBe 3
    producer.flushes.get() shouldBe 1
    producer.produced.size() shouldBe 3
  }

  test("kafka target: topicOf and --output-config parsing") {
    Generator.topicOf("/path/to/topicA") shouldBe "topicA"
    Generator.topicOf("plain") shouldBe "plain"
    Generator.parseOutputConfig(
      """{"bootstrap.servers":"b:9092","topic":"producer","linger.ms":5}""") shouldBe
      Map("bootstrap.servers" -> "b:9092", "topic" -> "producer", "linger.ms" -> "5")
    // reflective binding fails with a clear message when kafka-clients
    // is absent (it is, in this container)
    val e = intercept[IllegalStateException](
      Generator.reflectiveKafkaProducer(Map("bootstrap.servers" -> "b:9092")))
    e.getMessage should include("kafka-clients")
  }

  test("end-to-end: threaded send into the engine's HTTP input") {
    val received = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val srv = new Connectors.HttpInputServer("unused",
      sink = Some { lines =>
        import scala.jdk.CollectionConverters._
        received.addAll(lines.asJava); ()
      }).start()
    try {
      val ds = Generator.loadDataset(mkDataset())
        .filter(_.target == "/jsonl") // the server only serves /json[l]/plaintext
      val (sent, secs) = Generator.run(ds,
        Generator.Config(events = 20, batchSize = 6, threads = 4, tag = "lt"),
        Generator.httpSend(s"http://127.0.0.1:${srv.boundPort}"))
      sent shouldBe 20
      secs should be > 0.0
      received.size shouldBe 20
      received.forEach { line =>
        val j = JsonMethods.parse(line)
        (j \ "tags").values.asInstanceOf[List[_]] should contain("lt")
      }
    } finally srv.stop()
  }
}
