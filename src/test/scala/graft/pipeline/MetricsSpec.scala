package graft.pipeline

import graft.SparkSpec

/** Observed pipeline metrics (the reference's processed/warning counters,
  * via Spark's zero-cost `observe`).
  */
class MetricsSpec extends SparkSpec {

  test("observe counts processed and failed events in one pass") {
    val s = spark
    import s.implicits._
    // one decodable event, one that fails base64 → failure tag
    val input = s.read.json(Seq(
      """{"message":"dGVzdA=="}""", """{"message":"not base64!!"}""").toDS)
    val spec = PipelineSpec(Seq(StageSpec("decoder", Seq(RuleSpec("message",
      Map("source_fields" -> Seq("message"), "target_field" -> "decoded",
        "source_format" -> "base64"))))))
    val out = PipelineCompiler.compile(spec)(input).main
    val metrics = Metrics.collectWith(out)(_.write.mode("overwrite")
      .format("noop").save())
    assert(metrics("events_processed") == 2L)
    assert(metrics("events_failed") == 1L)
    assert(metrics("tags_total") == 1L)
  }

  // fixture: decoder fails on 2 of 5 events, timestamper fails on 1
  private def instrumentedFixture = {
    val s = spark
    import s.implicits._
    val input = s.read.json(Seq(
      """{"message":"dGVzdA==","ts":"2024-01-01T00:00:00Z"}""",
      """{"message":"dGVzdA==","ts":"2024-01-02T00:00:00Z"}""",
      """{"message":"bad!!","ts":"2024-01-03T00:00:00Z"}""",
      """{"message":"bad!!","ts":"2024-01-04T00:00:00Z"}""",
      """{"message":"dGVzdA==","ts":"not a date"}""").toDS)
    val spec = PipelineSpec(Seq(
      StageSpec("decoder", Seq(RuleSpec("message",
        Map("source_fields" -> Seq("message"), "target_field" -> "decoded",
          "source_format" -> "base64")))),
      StageSpec("timestamper", Seq(RuleSpec("ts",
        Map("source_fields" -> Seq("ts"), "target_field" -> "@timestamp"))))))
    (input, spec)
  }

  test("compileInstrumented: exact per-stage processed/failed counts via exec listener") {
    val s = spark
    MetricsRegistry.reset()
    val el = MetricsRegistry.execListener
    s.listenerManager.register(el)
    try {
      val (input, spec) = instrumentedFixture
      val out = PipelineCompiler.compileInstrumented(spec)(input).main
      // the instrumented plan carries one observe per stage
      val planStr = out.queryExecution.analyzed.toString
      Seq(Metrics.stageObservationName(1, "decoder"),
        Metrics.stageObservationName(2, "timestamper"))
        .foreach(n => assert(planStr.contains(n), s"missing observe $n"))

      out.write.mode("overwrite").format("noop").save()
      // listener callbacks are async
      val deadline = System.currentTimeMillis() + 10000
      while (MetricsRegistry.snapshot().getOrElse(
        ("events_processed", "1_decoder"), 0L) < 5L &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)

      val snap = MetricsRegistry.snapshot()
      assert(snap(("events_processed", "1_decoder")) == 5L)
      assert(snap(("events_failed", "1_decoder")) == 2L)
      assert(snap(("events_processed", "2_timestamper")) == 5L)
      assert(snap(("events_failed", "2_timestamper")) == 1L)
    } finally {
      s.listenerManager.unregister(el)
      MetricsRegistry.reset()
    }
  }

  test("registry accumulates streaming observed metrics; exporter serves them") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    MetricsRegistry.reset()
    // foreachBatch plans run as batch queries: their observes report on
    // the exec listener, not the streaming progress
    val listener = MetricsRegistry.execListener
    s.listenerManager.register(listener)
    val exporter = new MetricsRegistry.Exporter().start()
    try {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      val stream = mem.toDF().select(
        org.apache.spark.sql.functions.col("value").as("message"))
      val spec = PipelineSpec(Seq(StageSpec("decoder", Seq(RuleSpec("message",
        Map("source_fields" -> Seq("message"), "target_field" -> "decoded",
          "source_format" -> "base64"))))))
      val compiled = PipelineCompiler.compileInstrumented(spec)
      val q = stream.writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt").toString)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          compiled(batch).main.write.mode("append").format("noop").save()
        }.start()
      try {
        mem.addData("dGVzdA==", "bad!!", "dGVzdA==")
        q.processAllAvailable()
      } finally q.stop()
      // listener callbacks are async: wait for the counters to land
      val deadline = System.currentTimeMillis() + 10000
      while (MetricsRegistry.snapshot().getOrElse(
        ("events_processed", "1_decoder"), 0L) < 3L &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)

      val snap = MetricsRegistry.snapshot()
      assert(snap(("events_processed", "1_decoder")) == 3L)
      assert(snap(("events_failed", "1_decoder")) == 1L)

      val base = s"http://127.0.0.1:${exporter.boundPort}"
      def fetch(path: String): (Int, String) = {
        val conn = new java.net.URL(base + path).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val is = if (code < 400) conn.getInputStream else conn.getErrorStream
        val body = new String(is.readAllBytes(), "UTF-8"); is.close()
        (code, body)
      }
      val (mc, metricsBody) = fetch("/metrics")
      assert(mc == 200)
      assert(metricsBody.contains(
        """graft_events_processed_total{stage="1_decoder"} 3"""))
      assert(metricsBody.contains(
        """graft_events_failed_total{stage="1_decoder"} 1"""))
      assert(metricsBody.contains("# TYPE graft_events_processed_total counter"))

      assert(fetch("/health") == ((200, "OK")))
      MetricsRegistry.setHealthCheck(() => false)
      assert(fetch("/health")._1 == 503)
    } finally {
      MetricsRegistry.setHealthCheck(() => true)
      exporter.stop()
      s.listenerManager.unregister(listener)
      MetricsRegistry.reset()
    }
  }
}
