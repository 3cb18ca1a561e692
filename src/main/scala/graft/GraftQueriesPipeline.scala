package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQueries.Spec
import graft.pipeline.{PipelineCompiler, RuleLoader}

/** Oracle gates for the YAML pipeline-config surface of the relational
  * stage types (pipeline/RelationalStages.scala): each query builds its
  * plan ONLY through `RuleLoader.fromYaml` → `PipelineCompiler.compile`,
  * so what's verified is the config plumbing end-to-end, not the
  * underlying Dataset call (q1–q12 already gate those shapes).
  */
object GraftQueriesPipeline {

  private def run(yaml: String, df: DataFrame): DataFrame =
    PipelineCompiler.compile(RuleLoader.fromYaml(yaml))(df).main

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  private val q13 = Spec("q13_pipeline_agg",
    (s, dir) => run(
      """pipeline:
        |  - type: aggregate
        |    filter: "NOT event_type: click"
        |    group_by: [event_type]
        |    aggregations:
        |      n: {fn: count}
        |      uniq_users: {fn: count_distinct, field: user_id}
        |      maxv: {fn: max, field: value}
        |      minv: {fn: min, field: value}
        |""".stripMargin, ev(s, dir)),
    Some("""SELECT event_type, count(*) AS n,
              count(DISTINCT user_id) AS uniq_users,
              max(value) AS maxv, min(value) AS minv
            FROM events WHERE NOT event_type = 'click' GROUP BY event_type"""))

  private val q14 = Spec("q14_pipeline_join",
    (s, dir) => run(
      s"""pipeline:
         |  - type: join
         |    right: {path: "$dir/customer.parquet"}
         |    left_on: [user_id]
         |    right_on: [c_custkey]
         |    select: [c_custkey, c_mktsegment]
         |    broadcast: true
         |  - type: aggregate
         |    group_by: [c_mktsegment]
         |    aggregations:
         |      n: {fn: count}
         |      uniq_users: {fn: count_distinct, field: user_id}
         |""".stripMargin, ev(s, dir)),
    Some("""SELECT c_mktsegment, count(*) AS n,
              count(DISTINCT user_id) AS uniq_users
            FROM events e JOIN customer c ON e.user_id = c.c_custkey
            GROUP BY c_mktsegment"""))

  private val q15 = Spec("q15_pipeline_window",
    (s, dir) => run(
      """pipeline:
        |  - type: window_stats
        |    partition_by: [user_id]
        |    order_by: [{field: value, desc: true}, {field: event_id}]
        |    functions:
        |      pos: {fn: row_number}
        |    keep: "pos:[1 TO 3]"
        |""".stripMargin, ev(s, dir))
      .select("event_id", "user_id", "value", "pos"),
    Some("""SELECT event_id, user_id, value, pos FROM (
              SELECT event_id, user_id, value,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY value DESC, event_id) AS pos
              FROM events) WHERE pos <= 3"""))

  private val q16 = Spec("q16_pipeline_dedup",
    (s, dir) => run(
      """pipeline:
        |  - type: dedup_events
        |    keys: [user_id, event_type]
        |""".stripMargin, ev(s, dir))
      .select("user_id", "event_type"),
    Some("SELECT DISTINCT user_id, event_type FROM events"))

  private val q17 = Spec("q17_pipeline_sort",
    (s, dir) => run(
      """pipeline:
        |  - type: sort_limit
        |    order_by: [{field: value, desc: true}, {field: event_id}]
        |    limit: 100
        |""".stripMargin, ev(s, dir))
      .select("event_id", "value"),
    Some("""SELECT event_id, value FROM events
            ORDER BY value DESC, event_id LIMIT 100"""))

  private val q18 = Spec("q18_pipeline_sessionize",
    (s, dir) => run(
      """pipeline:
        |  - type: sessionize
        |    keys: [user_id]
        |    time_field: ts
        |    gap: "30 minutes"
        |    aggregations:
        |      n_events: {fn: count}
        |""".stripMargin, ev(s, dir))
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_start"),
        col("n_events")),
    // gap-based sessions in portable SQL: a session breaks where the gap
    // to the previous event reaches 30 min; session id = running break
    // count; session start = first event's timestamp. >= because Spark's
    // session_window end bound is exclusive — an event at exactly
    // prev_ts + gap starts a NEW session
    Some("""WITH br AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            sid AS (
              SELECT user_id, ts,
                sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS sid
              FROM br)
            SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f')
              AS session_start, count(*) AS n_events
            FROM sid GROUP BY user_id, sid"""))

  private val q19 = Spec("q19_pipeline_running",
    (s, dir) => run(
      """pipeline:
        |  - type: calculator
        |    rules:
        |      - filter: "value"
        |        calculator: {calc: "round(${value} * 100)", target_field: cents}
        |  - type: window_stats
        |    partition_by: [user_id]
        |    order_by: [{field: ts}]
        |    functions:
        |      running: {fn: sum, field: cents, frame: [unbounded, current]}
        |""".stripMargin, ev(s, dir))
      .select(col("event_id"), col("user_id"),
        col("running").cast("long").as("running_cents")),
    Some("""SELECT event_id, user_id,
              CAST(sum(CAST(round(value*100) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
            FROM events"""))

  val all: Seq[Spec] = Seq(q13, q14, q15, q16, q17, q18, q19)
}
