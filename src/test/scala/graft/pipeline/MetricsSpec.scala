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
}
