package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed aggregation with watermark over a memory stream") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF.toDF("ts", "event_type", "value")
    val agg = StreamingOps.windowedAgg(df, "ts", "10 minutes", "1 hour",
      Seq("event_type"), Seq(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents")))
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    mem.addData(
      (ts("2024-01-01 10:05:00"), "a", 1.0),
      (ts("2024-01-01 10:45:00"), "a", 2.0),
      (ts("2024-01-01 11:05:00"), "b", 3.0))
    q.processAllAvailable()
    // advance watermark far enough to close the 10:00 window
    mem.addData((ts("2024-01-01 13:00:00"), "c", 0.0))
    q.processAllAvailable()
    val rows = s.sql(
      "SELECT event_type, n, cents FROM winagg ORDER BY event_type").collect()
    q.stop()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      .contains(("a", 2L, 300L)))
  }

  test("pipeline compiles ONCE per stream, not per micro-batch") {
    // PLANS.md "Chain compile cost": spec→function compilation happens at
    // stream start; foreachBatch re-applies the same function per batch
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val mem = MemoryStream[String]
    val df = mem.toDF.toDF("message")
    val spec = graft.pipeline.RuleLoader.fromYaml(
      """pipeline:
        |  - type: dissector
        |    rules:
        |      - filter: "message"
        |        dissector:
        |          mapping: {message: "%{k}=%{v}"}
        |""".stripMargin)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val seen = new java.util.concurrent.atomic.AtomicLong()
    val before = graft.pipeline.PipelineCompiler.compileInvocations
    val q = StreamRunner.run(df, spec,
      Map("main" -> ((b: org.apache.spark.sql.DataFrame) => { seen.addAndGet(b.count()); () })),
      ckpt, trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      (1 to 3).foreach { i =>
        mem.addData(s"a$i=1"); q.processAllAvailable()
      }
      assert(seen.get() == 3)
      assert(graft.pipeline.PipelineCompiler.compileInvocations - before == 1)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups within horizon") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF.toDF("ts", "k")
    val dedup = StreamingOps.dedupWithinWatermark(df, "ts", "1 hour", Seq("k"))
    val q = dedup.writeStream.format("memory").queryName("dedupw")
      .outputMode("append").start()
    mem.addData(
      (ts("2024-01-01 10:00:00"), "x"),
      (ts("2024-01-01 10:01:00"), "x"), // dup within horizon
      (ts("2024-01-01 10:02:00"), "y"))
    q.processAllAvailable()
    val n = s.sql("SELECT count(*) FROM dedupw").head().getLong(0)
    q.stop()
    assert(n == 2)
  }

  test("session windows split on gaps") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF.toDF("ts", "user")
    val sessions = StreamingOps.sessionWindows(df, "ts", "10 minutes",
      "30 minutes", Seq("user"))
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    mem.addData(
      (ts("2024-01-01 10:00:00"), "u1"),
      (ts("2024-01-01 10:10:00"), "u1"), // same session
      (ts("2024-01-01 12:00:00"), "u1")) // new session after gap
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 14:00:00"), "u1")) // advance watermark
    q.processAllAvailable()
    val n = s.sql("SELECT count(*) FROM sess").head().getLong(0)
    q.stop()
    assert(n >= 2)
  }
}
