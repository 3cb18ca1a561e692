package graft.streaming

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Load-test event generator (reference: `logprep/generator/` —
  * batcher.py, manipulator.py, input.py, sender.py, http/output.py).
  *
  * A dataset directory holds one subdirectory per event class, each with
  * a `config.yaml` (`target:` URL path, optional `timestamps:` list of
  * `{key, format, time_shift: ±HHMM}`) and `*.jsonl` example files. The
  * generator cycles the (optionally seeded-shuffle'd) examples up to
  * `events` count, manipulates each event (append the `tag` to `tags`,
  * replace timestamp fields with now+shift rendered in the class's
  * strftime format), groups batches per target path, and sends them
  * from a thread pool.
  *
  * The output contract is pluggable like the connectors' transports:
  * production POSTs NDJSON to `targetUrl + target` (the engine's
  * http_input accepts it on /jsonl), tests capture the batches.
  */
object Generator {

  final case class TimestampSpec(key: String, format: String, timeShift: String)
  final case class EventClass(target: String, timestamps: Seq[TimestampSpec],
                              events: Seq[JObject])

  final case class Config(events: Long = 1, batchSize: Int = 500,
                          threads: Int = 1, shuffle: Boolean = false,
                          seed: Option[Long] = None,
                          replaceTimestamp: Boolean = true,
                          tag: String = "loadtest")

  /** Parse `±HHMM` into a signed minute offset (input.py:45-55). */
  private[streaming] def parseShift(s: String): Int = {
    require(s.matches("[+-]\\d{4}"), s"time_shift must be ±HHMM: $s")
    val sign = if (s.startsWith("-")) -1 else 1
    sign * (s.substring(1, 3).toInt * 60 + s.substring(3, 5).toInt)
  }

  /** Python-strftime subset renderer (the formats the reference's
    * example datasets use: %Y %y %m %d %H %M %S %f %j %%).
    */
  private[streaming] def strftime(fmt: String,
                                  t: java.time.LocalDateTime): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => sb.append(f"${t.getYear}%04d")
          case 'y' => sb.append(f"${t.getYear % 100}%02d")
          case 'm' => sb.append(f"${t.getMonthValue}%02d")
          case 'd' => sb.append(f"${t.getDayOfMonth}%02d")
          case 'H' => sb.append(f"${t.getHour}%02d")
          case 'M' => sb.append(f"${t.getMinute}%02d")
          case 'S' => sb.append(f"${t.getSecond}%02d")
          case 'f' => sb.append(f"${t.getNano / 1000}%06d")
          case 'j' => sb.append(f"${t.getDayOfYear}%03d")
          case '%' => sb.append('%')
          case other => sb.append('%').append(other)
        }
        i += 2
      } else { sb.append(fmt.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Load every event-class subdir: config.yaml + *.jsonl examples. */
  def loadDataset(dir: String): Seq[EventClass] = {
    val root = new java.io.File(dir)
    require(root.isDirectory, s"not a directory: $dir")
    root.listFiles().filter(_.isDirectory).sortBy(_.getName).toSeq.map { cd =>
      val cfgFile = Seq("config.yaml", "config.yml").map(new java.io.File(cd, _))
        .find(_.exists()).getOrElse(
          throw new IllegalArgumentException(s"${cd.getName}: no config.yaml"))
      val cfg = new org.yaml.snakeyaml.Yaml().load[Any](new String(
        java.nio.file.Files.readAllBytes(cfgFile.toPath), "UTF-8"))
        .asInstanceOf[java.util.Map[String, Any]]
      // `target` (current) or `target_path` (deprecated alias, input.py:91-100)
      val target = Option(cfg.get("target")).orElse(Option(cfg.get("target_path")))
        .map(_.toString).getOrElse(
          throw new IllegalArgumentException(s"${cd.getName}: no target"))
      val timestamps = Option(cfg.get("timestamps")).map { ts =>
        import scala.jdk.CollectionConverters._
        ts.asInstanceOf[java.util.List[java.util.Map[String, Any]]].asScala.toSeq
          .map(m => TimestampSpec(m.get("key").toString, m.get("format").toString,
            Option(m.get("time_shift")).map(_.toString).getOrElse("+0000")))
      }.getOrElse(Nil)
      val events = cd.listFiles().filter(_.getName.endsWith(".jsonl")).sortBy(_.getName)
        .flatMap { f =>
          new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
            .split("\n").map(_.trim).filter(_.nonEmpty)
            .map(l => JsonMethods.parse(l).asInstanceOf[JObject])
        }.toSeq
      EventClass(target, timestamps, events)
    }
  }

  /** Append `tag` to the event's `tags` (must be a list if present —
    * manipulator.py:38-47 raises otherwise) and replace the configured
    * timestamp fields with now+shift (manipulator.py:49-65, dotted keys
    * create intermediate objects).
    */
  private[streaming] def manipulate(event: JObject, cls: EventClass,
                                    cfg: Config,
                                    now: java.time.LocalDateTime): JObject = {
    val tagged: JObject = event \ "tags" match {
      case JNothing => JObject(event.obj :+ ("tags" -> JArray(List(JString(cfg.tag)))))
      case JArray(xs) => JObject(event.obj.map {
        case ("tags", _) => "tags" -> JArray(xs :+ JString(cfg.tag))
        case other => other
      })
      case _ => throw new IllegalArgumentException(
        s"field 'tags' exists and is not a list in $event")
    }
    if (!cfg.replaceTimestamp || cls.timestamps.isEmpty) tagged
    else cls.timestamps.foldLeft(tagged) { (acc, ts) =>
      val value = strftime(ts.format, now.plusMinutes(parseShift(ts.timeShift)))
      setDotted(acc, ts.key.split("\\.").toList, JString(value))
    }
  }

  private def setDotted(obj: JObject, path: List[String], v: JValue): JObject =
    path match {
      case last :: Nil =>
        JObject(obj.obj.filterNot(_._1 == last) :+ (last -> v))
      case head :: rest =>
        val child = obj \ head match {
          case o: JObject => o
          case _ => JObject(Nil) // non-object values are overwritten
        }
        JObject(obj.obj.filterNot(_._1 == head) :+
          (head -> setDotted(child, rest, v)))
      case Nil => obj
    }

  /** Generate `(target, renderedEventJson)` pairs: per-class manipulated
    * examples, pooled, seeded-shuffled when configured, cycled to
    * `cfg.events` (batcher.py:28-45).
    */
  def events(dataset: Seq[EventClass], cfg: Config,
             now: () => java.time.LocalDateTime =
               () => java.time.LocalDateTime.now()): Iterator[(String, String)] = {
    val pool0 = dataset.flatMap(c => c.events.map(e => (c, e)))
    require(pool0.nonEmpty, "dataset has no example events")
    val pool = if (cfg.shuffle) {
      val rng = cfg.seed.map(new scala.util.Random(_)).getOrElse(new scala.util.Random())
      rng.shuffle(pool0)
    } else pool0
    Iterator.continually(pool).flatten.take(
      if (cfg.events > Int.MaxValue) Int.MaxValue else cfg.events.toInt)
      .map { case (c, e) =>
        c.target -> JsonMethods.compact(JsonMethods.render(manipulate(e, c, cfg, now())))
      }
  }

  /** Group the event stream into per-target batches of `batchSize`
    * (batcher.py:48-90: batches flush per target path as they fill;
    * tails flush at end).
    */
  def batches(evs: Iterator[(String, String)], batchSize: Int): Iterator[(String, Seq[String])] = {
    require(batchSize >= 1, "'batch_size' must be at least one")
    new Iterator[(String, Seq[String])] {
      private val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[String]]
      private var pending: Option[(String, Seq[String])] = None
      private def advance(): Unit = {
        while (pending.isEmpty && evs.hasNext) {
          val (t, e) = evs.next()
          val buf = acc.getOrElseUpdate(t, scala.collection.mutable.ArrayBuffer.empty)
          buf += e
          if (buf.length >= batchSize) { pending = Some(t -> buf.toSeq); acc.remove(t) }
        }
        if (pending.isEmpty && acc.nonEmpty) {
          val (t, buf) = acc.head
          acc.remove(t)
          pending = Some(t -> buf.toSeq)
        }
      }
      def hasNext: Boolean = { advance(); pending.isDefined }
      def next(): (String, Seq[String]) = {
        advance()
        val out = pending.getOrElse(throw new NoSuchElementException)
        pending = None
        out
      }
    }
  }

  /** Batch sender: (target, events) → unit, pluggable like
    * [[graft.operators.Requester.transport]]. The default POSTs NDJSON
    * to `targetUrl + target` through the credentialed connector path.
    */
  def httpSend(targetUrl: String, timeoutMs: Int = 10000): (String, Seq[String]) => Unit =
    (target, evs) => {
      val url = targetUrl.stripSuffix("/") + target
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestProperty("Content-Type", "application/x-ndjson")
      graft.operators.Credentials.fromTarget(url)
        .foreach(_.headers().foreach { case (k, v) => conn.setRequestProperty(k, v) })
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write((evs.mkString("\n") + "\n").getBytes("UTF-8")) finally os.close()
      val code = conn.getResponseCode
      val is = if (code < 400) conn.getInputStream else conn.getErrorStream
      if (is != null) { try { while (is.read() >= 0) {} } finally is.close() }
      if (code >= 400) throw new java.io.IOException(s"POST $url: HTTP $code")
      conn.disconnect()
    }

  /** Minimal producer seam for the Kafka target. The real implementation
    * binds kafka-clients REFLECTIVELY ([[reflectiveKafkaProducer]]) so the
    * library carries no Kafka dependency (none ships in this container);
    * specs inject a recording fake. [[BufferFull]] maps the client's
    * buffer-exhausted signal so [[kafkaSend]] can flush-and-retry like the
    * reference (generator/confluent_kafka/output.py store_custom:
    * BufferError → flush, not an error).
    */
  trait EventProducer extends AutoCloseable {
    def produce(topic: String, value: String): Unit
    def flush(): Unit
    override def close(): Unit = ()
  }
  final class BufferFull(cause: Throwable) extends RuntimeException(cause)

  /** `org.apache.kafka.clients.producer.KafkaProducer` via reflection.
    * Fails with a clear message when kafka-clients is absent.
    * `sendTimeoutSec` > 0 bounds the final close/flush wait (the
    * reference's `--send-timeout` poll/flush knob,
    * run_logprep.py:258-264); 0 waits for full delivery.
    */
  def reflectiveKafkaProducer(kafkaConfig: Map[String, String],
                              sendTimeoutSec: Int = 0): EventProducer = {
    val cls =
      try Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
      catch { case _: ClassNotFoundException =>
        throw new IllegalStateException(
          "kafka target requires kafka-clients on the classpath")
      }
    val recordCls = Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
    val bufferExhausted =
      Class.forName("org.apache.kafka.clients.producer.BufferExhaustedException")
    val props = new java.util.Properties()
    kafkaConfig.foreach { case (k, v) => props.put(k, v) }
    props.putIfAbsent("key.serializer",
      "org.apache.kafka.common.serialization.StringSerializer")
    props.putIfAbsent("value.serializer",
      "org.apache.kafka.common.serialization.StringSerializer")
    val producer = cls.getConstructor(classOf[java.util.Properties])
      .newInstance(props)
    val send = cls.getMethod("send", recordCls)
    val flushM = cls.getMethod("flush")
    val closeM = cls.getMethod("close")
    // close(Duration) is kafka-clients >= 2.0 (KIP-266); resolve lazily
    // so a 1.x client still constructs when no timeout is requested
    lazy val closeTimedM = cls.getMethod("close", classOf[java.time.Duration])
    val recordCtor = recordCls.getConstructor(
      classOf[String], classOf[Object], classOf[Object])
    new EventProducer {
      def produce(topic: String, value: String): Unit =
        try { send.invoke(producer, recordCtor.newInstance(topic, null, value)
          .asInstanceOf[Object]); () }
        catch {
          case e: java.lang.reflect.InvocationTargetException
            if bufferExhausted.isInstance(e.getCause) =>
            throw new BufferFull(e.getCause)
        }
      def flush(): Unit = { flushM.invoke(producer); () }
      override def close(): Unit = {
        if (sendTimeoutSec > 0)
          closeTimedM.invoke(producer, java.time.Duration.ofSeconds(sendTimeoutSec.toLong))
        else closeM.invoke(producer)
        ()
      }
    }
  }

  /** Topic from a batch's target path: the segment after the last `/`
    * (reference generator output store(): `topic.rpartition("/")`).
    */
  private[streaming] def topicOf(target: String): String =
    target.substring(target.lastIndexOf('/') + 1)

  /** Kafka batch sender, the reference's `generate kafka` path
    * (generator/confluent_kafka/output.py store/store_custom): each
    * event in the batch produces individually to the topic named by the
    * target path's last segment; a full client buffer flushes and
    * retries instead of failing the run.
    */
  def kafkaSend(producer: EventProducer): (String, Seq[String]) => Unit =
    (target, evs) => {
      val topic = topicOf(target)
      evs.foreach { ev =>
        try producer.produce(topic, ev)
        catch { case _: BufferFull =>
          producer.flush()
          producer.produce(topic, ev)
        }
      }
    }

  /** Run the generator: batches drain through a fixed thread pool
    * (sender.py:40-50) with BOUNDED submission — at most 2×threads
    * batches are rendered ahead of the senders, so a slow target
    * backpressures generation instead of materializing the whole corpus
    * in the queue. A send failure stops the run (remaining queued work
    * is cancelled) and rethrows. Returns (events sent, elapsed seconds).
    */
  def run(dataset: Seq[EventClass], cfg: Config,
          send: (String, Seq[String]) => Unit): (Long, Double) = {
    val t0 = System.nanoTime()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(cfg.threads)
    val sent = new java.util.concurrent.atomic.AtomicLong()
    val inFlight = new java.util.concurrent.Semaphore(cfg.threads * 2)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    try {
      val it = batches(events(dataset, cfg), cfg.batchSize)
      while (it.hasNext && failure.get() == null) {
        val (t, evs) = it.next()
        inFlight.acquire()
        pool.submit(new Runnable {
          def run(): Unit =
            try { send(t, evs); sent.addAndGet(evs.length.toLong); () }
            catch { case e: Throwable => failure.compareAndSet(null, e); () }
            finally inFlight.release()
        })
      }
      pool.shutdown()
      pool.awaitTermination(1, java.util.concurrent.TimeUnit.DAYS)
      if (failure.get() != null) throw failure.get()
    } finally pool.shutdownNow()
    (sent.get(), (System.nanoTime() - t0) / 1e9)
  }

  /** Positional args = everything that is neither a flag nor the VALUE
    * of a value-taking flag (`--input-type json config.yml` must not
    * count `json` as a positional).
    */
  def positionals(args: Array[String],
                                     valueFlags: Set[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < args.length) {
      if (valueFlags.contains(args(i))) i += 2
      else { if (!args(i).startsWith("--")) out += args(i); i += 1 }
    }
    out.result()
  }

  /** Parse a `--output-config` value: inline JSON, or `@path` to a JSON
    * file (reference `generate kafka --output-config`,
    * run_logprep.py:253-272; values stringify like click's str type).
    */
  private[streaming] def parseOutputConfig(v: String): Map[String, String] = {
    val text =
      if (v.startsWith("@")) new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(v.substring(1))), "UTF-8")
      else v
    JsonMethods.parse(text) match {
      case JObject(fields) => fields.map {
        case (k, JString(s)) => k -> s
        case (k, other) => k -> JsonMethods.compact(JsonMethods.render(other))
      }.toMap
      case _ => throw new IllegalArgumentException(
        s"--output-config must be a JSON object: $text")
    }
  }

  /** CLI: `runMain graft.streaming.Generator <dataset_dir> <target_url>
    * [--events N] [--batch-size B] [--threads T] [--shuffle] [--seed S]
    * [--tag TAG] [--no-timestamp-replace]` — or, mirroring the
    * reference's `generate kafka`:
    * `runMain graft.streaming.Generator <dataset_dir> kafka
    * --output-config '{"bootstrap.servers":"..."}'`. Topics come from
    * each event class's target path (last segment), like the reference's
    * generator output.
    */
  def main(args: Array[String]): Unit = {
    val positional = positionals(args,
      Set("--events", "--batch-size", "--threads", "--seed", "--tag",
        "--output-config", "--send-timeout"))
    require(positional.length >= 2,
      "usage: graft.streaming.Generator <dataset_dir> <target_url|kafka> [--events N] ...")
    def opt(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    val cfg = Config(
      events = opt("--events").map(_.toLong).getOrElse(1L),
      batchSize = opt("--batch-size").map(_.toInt).getOrElse(500),
      threads = opt("--threads").map(_.toInt).getOrElse(1),
      shuffle = args.contains("--shuffle"),
      seed = opt("--seed").map(_.toLong),
      replaceTimestamp = !args.contains("--no-timestamp-replace"),
      tag = opt("--tag").getOrElse("loadtest"))
    val dataset = loadDataset(positional(0))
    val (sent, secs) =
      if (positional(1) == "kafka") {
        val kafkaCfg = parseOutputConfig(opt("--output-config").getOrElse(
          throw new IllegalArgumentException(
            "kafka target requires --output-config")))
        val sendTimeout = opt("--send-timeout").map(_.toInt).getOrElse(0)
        val producer = reflectiveKafkaProducer(kafkaCfg - "topic", sendTimeout)
        try {
          val r = run(dataset, cfg, kafkaSend(producer))
          // with a timeout, the bounded close() below does the final
          // flush — an explicit flush() here would block unbounded on a
          // hung broker, defeating the knob
          if (sendTimeout == 0) producer.flush()
          r
        } finally producer.close()
      } else run(dataset, cfg, httpSend(positional(1)))
    println(f"sent $sent events in $secs%.2f s (${sent / secs}%.0f events/s)")
  }
}
