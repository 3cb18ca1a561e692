package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The beyond-parity relational stage types (aggregate / join /
  * window_stats / dedup_events / sort_limit) driven through the YAML
  * pipeline config — the same surface that configures processors. Batch
  * semantics pin against hand-built Datasets; the streaming tests run the
  * SAME stage configs over a MemoryStream (watermarked dedup + windowed
  * aggregation), proving one pipeline definition serves both runtimes.
  */
class RelationalStagesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "error", 10.0),
      (2L, ts("2024-01-01 10:05:00"), 7L, "error", 30.0),
      (3L, ts("2024-01-01 10:07:00"), 8L, "click", 5.0),
      (4L, ts("2024-01-01 11:00:00"), 8L, "error", 20.0),
      (5L, ts("2024-01-01 11:30:00"), 9L, "click", 2.0),
      (6L, ts("2024-01-01 11:45:00"), 9L, "click", 8.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  private def run(yaml: String, df: org.apache.spark.sql.DataFrame) =
    PipelineCompiler.compile(RuleLoader.fromYaml(yaml))(df).main

  test("aggregate stage: filtered grouped aggregations from YAML") {
    val out = run(
      """pipeline:
        |  - type: aggregate
        |    filter: "event_type: error"
        |    group_by: [user_id]
        |    aggregations:
        |      n: {fn: count}
        |      total: {fn: sum, field: value}
        |      biggest: {fn: max, field: value}
        |""".stripMargin, events)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq((7L, 2L, 40.0, 30.0), (8L, 1L, 20.0, 20.0)))
  }

  test("aggregate stage: event-time window key") {
    val out = run(
      """pipeline:
        |  - type: aggregate
        |    group_by: [event_type]
        |    window: {time_field: ts, duration: "1 hour"}
        |    aggregations:
        |      n: {fn: count}
        |""".stripMargin, events)
    val rows = out.select(col("event_type"),
        col("window.start").cast("string").as("w"), col("n"))
      .orderBy("event_type", "w").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      ("click", "2024-01-01 10:00:00", 1L),
      ("click", "2024-01-01 11:00:00", 2L),
      ("error", "2024-01-01 10:00:00", 2L),
      ("error", "2024-01-01 11:00:00", 1L)))
  }

  test("join stage: broadcast equi-join against a parquet side table") {
    val dir = java.nio.file.Files.createTempDirectory("rel-join").toString
    val s = spark
    import s.implicits._
    Seq((7L, "DE"), (8L, "FR")).toDF("uid", "country")
      .write.mode("overwrite").parquet(dir)
    val out = run(
      s"""pipeline:
         |  - type: join
         |    right: {path: "$dir"}
         |    left_on: [user_id]
         |    right_on: [uid]
         |    how: left
         |    broadcast: true
         |""".stripMargin, events)
    assert(out.count() == 6)
    val countries = out.orderBy("event_id").collect().map(r =>
      Option(r.getAs[String]("country")).getOrElse("-")).toSeq
    assert(countries == Seq("DE", "DE", "FR", "FR", "-", "-"))
    // the small side must broadcast — no shuffle of the event stream
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
  }

  test("window_stats stage: per-key top-k via the keep DSL") {
    val out = run(
      """pipeline:
        |  - type: window_stats
        |    partition_by: [user_id]
        |    order_by: [{field: value, desc: true}]
        |    functions:
        |      pos: {fn: row_number}
        |    keep: "pos:[1 TO 1]"
        |""".stripMargin, events)
      .orderBy("user_id").select("user_id", "event_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((7L, 2L), (8L, 4L), (9L, 6L)))
  }

  test("window_stats stage: lag over event time") {
    val out = run(
      """pipeline:
        |  - type: window_stats
        |    partition_by: [user_id]
        |    order_by: [{field: ts}]
        |    functions:
        |      prev_value: {fn: lag, field: value}
        |""".stripMargin, events)
    val u7 = out.filter(col("user_id") === 7).orderBy("ts")
      .select("prev_value").collect().map(r =>
        if (r.isNullAt(0)) -1.0 else r.getDouble(0)).toSeq
    assert(u7 == Seq(-1.0, 10.0))
  }

  test("dedup_events stage: batch dropDuplicates on keys") {
    val out = run(
      """pipeline:
        |  - type: dedup_events
        |    keys: [user_id, event_type]
        |""".stripMargin, events)
    // distinct (user_id, event_type): (7,error) (8,click) (8,error) (9,click)
    assert(out.count() == 4)
  }

  test("sort_limit stage: deterministic global top-n") {
    val out = run(
      """pipeline:
        |  - type: sort_limit
        |    order_by: [{field: value, desc: true}, {field: event_id}]
        |    limit: 2
        |""".stripMargin, events)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L, 4L))
  }

  test("processor stages chain with relational stages in one pipeline") {
    // enrich (calculator), then aggregate the enriched field — the value
    // of having both surfaces in ONE config
    val out = run(
      """pipeline:
        |  - type: calculator
        |    rules:
        |      - filter: "*"
        |        calculator: {calc: "${value} * 2", target_field: doubled}
        |  - type: aggregate
        |    group_by: [event_type]
        |    aggregations:
        |      total2x: {fn: sum, field: doubled}
        |""".stripMargin, events)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq == Seq(("click", 30.0), ("error", 120.0)))
  }

  test("window_stats stage: running sum via a rows frame") {
    val out = run(
      """pipeline:
        |  - type: window_stats
        |    partition_by: [user_id]
        |    order_by: [{field: ts}]
        |    functions:
        |      running_total: {fn: sum, field: value, frame: [unbounded, current]}
        |""".stripMargin, events)
    val u7 = out.filter(col("user_id") === 7).orderBy("ts")
      .select("running_total").collect().map(_.getDouble(0)).toSeq
    assert(u7 == Seq(10.0, 40.0))
  }

  test("sessionize stage: gap-based sessions with aggregations") {
    val out = run(
      """pipeline:
        |  - type: sessionize
        |    keys: [user_id]
        |    time_field: ts
        |    gap: "30 minutes"
        |    aggregations:
        |      n_events: {fn: count}
        |      total: {fn: sum, field: value}
        |""".stripMargin, events)
      .orderBy("user_id", "session_start")
      .select("user_id", "n_events", "total").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // user 7: 10:00+10:05 one session; user 8: 10:07 and 11:00 split;
    // user 9: 11:30+11:45 one session (15 min gap)
    assert(out.toSeq == Seq(
      (7L, 2L, 40.0), (8L, 1L, 5.0), (8L, 1L, 20.0), (9L, 2L, 10.0)))
  }

  test("asof_join stage: latest right row at or before each event") {
    val dir = java.nio.file.Files.createTempDirectory("rel-asof").toString
    val s = spark
    import s.implicits._
    Seq(
      (7L, ts("2024-01-01 09:00:00"), 100.0),
      (7L, ts("2024-01-01 10:03:00"), 200.0),
      (8L, ts("2024-01-01 12:00:00"), 300.0) // after user 8's events
    ).toDF("uid", "otime", "price").write.mode("overwrite").parquet(dir)
    val out = run(
      s"""pipeline:
         |  - type: asof_join
         |    right: {path: "$dir"}
         |    left_on: user_id
         |    right_on: uid
         |    left_time: ts
         |    right_time: otime
         |    right_values: [price]
         |""".stripMargin, events)
      .orderBy("event_id").select("event_id", "asof_price").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1.0 else r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 100.0), (2L, 200.0), (3L, -1.0),
      (4L, -1.0), (5L, -1.0), (6L, -1.0)))
  }

  // ---- the same configs over a stream --------------------------------

  test("dedup_events stage: streaming dropDuplicatesWithinWatermark") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF.toDF("ts", "k")
    val spec = RuleLoader.fromYaml(
      """pipeline:
        |  - type: dedup_events
        |    keys: [k]
        |    watermark: {field: ts, delay: "1 hour"}
        |""".stripMargin)
    val out = PipelineCompiler.compile(spec)(df).main
    val q = out.writeStream.format("memory").queryName("rel_dedupw")
      .outputMode("append").start()
    mem.addData(
      (ts("2024-01-01 10:00:00"), "x"),
      (ts("2024-01-01 10:01:00"), "x"),
      (ts("2024-01-01 10:02:00"), "y"))
    q.processAllAvailable()
    val n = s.sql("SELECT count(*) FROM rel_dedupw").head().getLong(0)
    q.stop()
    assert(n == 2)
  }

  test("aggregate stage: streaming windowed aggregation with watermark") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF.toDF("ts", "event_type", "value")
    val spec = RuleLoader.fromYaml(
      """pipeline:
        |  - type: aggregate
        |    group_by: [event_type]
        |    window: {time_field: ts, duration: "10 minutes"}
        |    watermark: {field: ts, delay: "10 minutes"}
        |    aggregations:
        |      n: {fn: count}
        |""".stripMargin)
    val out = PipelineCompiler.compile(spec)(df).main
    val q = out.writeStream.format("memory").queryName("rel_winagg")
      .outputMode("append").start()
    mem.addData(
      (ts("2024-01-01 10:05:00"), "a", 1.0),
      (ts("2024-01-01 10:06:00"), "a", 2.0),
      (ts("2024-01-01 10:07:00"), "b", 3.0))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 12:00:00"), "c", 0.0)) // close the windows
    q.processAllAvailable()
    val rows = s.sql(
      "SELECT event_type, n FROM rel_winagg ORDER BY event_type").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    q.stop()
    assert(rows.contains(("a", 2L)) && rows.contains(("b", 1L)))
  }
}
