package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators._
import graft.ml._
import graft.fields.FieldOps
import graft.filter.FilterCompiler

/** The operator catalog backing `SparkEntry.queries` / `oracleSql`.
  *
  * One entry per operator from SURVEY.md §2 (filter DSL + all processors)
  * plus the beyond-parity scale operators (§2.4) and the training-data
  * pipeline ops. Every query is a deterministic DataFrame over the driver
  * testdata with an equivalent DuckDB SQL oracle.
  *
  * Determinism rules used throughout:
  *  - float aggregations are per-row scaled to integer units
  *    (cents / 1e-4 units) before summing — integer sums are
  *    order-independent, so Spark and DuckDB agree bit-exactly;
  *  - rankings order by rounded values with unique-key tie-breaks;
  *  - arrays are sorted before string-joining for output (Spark
  *    `array_distinct` is order-preserving, DuckDB `list_distinct` is not).
  */
object GraftQueries {

  case class Spec(name: String,
                  query: (SparkSession, String) => DataFrame,
                  oracle: Option[String])

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)
  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  // ======================================================================
  // Scale operators (Spark built-ins the reference lacks, SURVEY §2.4)
  // ======================================================================

  private val q1 = Spec("q1_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000).cast("long")).as("revenue_e4"),
        count(lit(1)).as("n_rows"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
            CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
            CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
            count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus"""))

  private val q2 = Spec("q2_join_broadcast",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      orders.join(customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name")).agg(
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"),
          count(lit(1)).as("n_orders"))
    },
    Some("""SELECT r_name, n_name,
            CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
            count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name"""))

  private val q3 = Spec("q3_topk_window",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("o_orderpriority"), col("rank"), col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("price_cents"))
    },
    Some("""SELECT o_orderpriority, rank, o_orderkey, price_cents FROM (
              SELECT o_orderpriority, o_orderkey,
                CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
                CAST(row_number() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank
              FROM orders) WHERE rank <= 3"""))

  private val q4 = Spec("q4_running_window",
    (s, dir) => {
      val e = ev(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.select(col("event_id"), col("user_id"),
        sum(round(col("value") * 100).cast("long")).over(w).as("running_cents"))
    },
    Some("""SELECT event_id, user_id,
            CAST(sum(CAST(round(value*100) AS BIGINT)) OVER (
              PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
            FROM events"""))

  private val q5 = Spec("q5_semi_join",
    (s, dir) => {
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val big = orders.filter(col("o_totalprice") > 50000)
      customer.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 50000)"""))

  private val q6 = Spec("q6_anti_join",
    (s, dir) => {
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val big = orders.filter(col("o_totalprice") > 450000)
      customer.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 450000)"""))

  // ======================================================================
  // Filter DSL (SURVEY §2.1) — Lucene strings compiled to Column predicates
  // ======================================================================

  private val fBasic = Spec("filter_lucene_range",
    (s, dir) => {
      val e = ev(s, dir)
      e.filter(FilterCompiler.predicate(
          "event_type:purchase AND value:[100.5 TO 200.0]", e.schema))
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("value_cents"))
    },
    Some("""SELECT event_id, event_type,
            CAST(round(value*100) AS BIGINT) AS value_cents
            FROM events
            WHERE event_type = 'purchase' AND value >= 100.5 AND value <= 200.0"""))

  private val fBool = Spec("filter_lucene_bool",
    (s, dir) => {
      val e = ev(s, dir)
      e.filter(FilterCompiler.predicate(
          "(event_type:purchase OR event_type:signup) AND NOT user_id:[0 TO 10]",
          e.schema))
        .select(col("event_id"), col("user_id"), col("event_type"))
    },
    Some("""SELECT event_id, user_id, event_type FROM events
            WHERE (event_type = 'purchase' OR event_type = 'signup')
              AND NOT (user_id >= 0 AND user_id <= 10)"""))

  private val fWild = Spec("filter_lucene_wildcard",
    (s, dir) => {
      val e = ev(s, dir)
      e.filter(FilterCompiler.predicate(
          "event_type:p?rch* OR event_type|re: sig.*", e.schema))
        .select(col("event_id"), col("event_type"))
    },
    Some("""SELECT event_id, event_type FROM events
            WHERE regexp_full_match(event_type, 'p.rch.*')
               OR regexp_full_match(event_type, 'sig.*')"""))

  private val fGroup = Spec("filter_lucene_group",
    (s, dir) => {
      val e = ev(s, dir)
      e.filter(FilterCompiler.predicate(
          "event_type:(error OR signup) AND value:[* TO 50.0]", e.schema))
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("value_cents"))
    },
    Some("""SELECT event_id, event_type,
            CAST(round(value*100) AS BIGINT) AS value_cents
            FROM events
            WHERE event_type IN ('error','signup') AND value <= 50.0"""))

  // ======================================================================
  // Structural processors (SURVEY §2.2 #1,4,5,6,11,13,16,17,18,28)
  // ======================================================================

  private val pFieldManager = Spec("proc_field_manager",
    (s, dir) => {
      val e = ev(s, dir).select(col("event_id"), col("event_type"), col("value"))
      val renamed = Structural.fieldManager(e,
        Map("event_type" -> "type", "value" -> "metric"), deleteSources = true)
      renamed.select(col("event_id"), col("type"),
        round(col("metric") * 100).cast("long").as("metric_cents"))
    },
    Some("""SELECT event_id, event_type AS type,
            CAST(round(value*100) AS BIGINT) AS metric_cents FROM events"""))

  private val pDropper = Spec("proc_dropper",
    (s, dir) => Structural.dropper(ev(s, dir), Seq("props", "value", "ts")),
    Some("SELECT event_id, user_id, event_type FROM events"))

  private val pDeleter = Spec("proc_deleter",
    (s, dir) => Structural.deleter(ev(s, dir), "event_type:error")
      .select(col("event_id"), col("event_type")),
    Some("SELECT event_id, event_type FROM events WHERE event_type <> 'error'"))

  private val pConcat = Spec("proc_concatenator",
    (s, dir) => Structural.concatenator(ev(s, dir),
        Seq("event_type", "user_id"), "-", "tag")
      .select(col("event_id"), col("tag")),
    Some("SELECT event_id, event_type || '-' || CAST(user_id AS VARCHAR) AS tag FROM events"))

  private val pSplit = Spec("proc_string_splitter",
    (s, dir) => {
      val e = ev(s, dir).withColumn("tag",
        concat_ws("-", col("event_type"), col("user_id"), lit("end")))
      val sp = Structural.stringSplitter(e, "tag", "-", "parts")
      sp.select(col("event_id"), size(col("parts")).as("n_parts"),
        element_at(col("parts"), 1).as("first_part"),
        element_at(col("parts"), -1).as("last_part"))
    },
    Some("""SELECT event_id, CAST(3 AS INT) AS n_parts,
            event_type AS first_part, 'end' AS last_part FROM events"""))

  private val pAdder = Spec("proc_generic_adder",
    (s, dir) => Structural.genericAdder(
        ev(s, dir).select(col("event_id")),
        Map("engine" -> "graft", "schema_version" -> 2L)),
    Some("""SELECT event_id, 'graft' AS engine,
            CAST(2 AS BIGINT) AS schema_version FROM events"""))

  private val pKeyChecker = Spec("proc_key_checker",
    (s, dir) => {
      val e = ev(s, dir).withColumn("k_val", get_json_object(col("props"), "$.k"))
        .withColumn("j_val", get_json_object(col("props"), "$.j"))
      val checked = Structural.keyChecker(e, Seq("k_val", "j_val"), "missing")
      checked.select(col("event_id"),
        coalesce(array_join(col("missing"), ","), lit("")).as("missing_keys"))
    },
    Some("""SELECT event_id,
            CASE WHEN json_extract_string(props,'$.k') IS NULL THEN
              CASE WHEN json_extract_string(props,'$.j') IS NULL THEN 'j_val,k_val' ELSE 'k_val' END
            ELSE
              CASE WHEN json_extract_string(props,'$.j') IS NULL THEN 'j_val' ELSE '' END
            END AS missing_keys FROM events"""))

  private val pDedup = Spec("proc_deduplicator",
    (s, dir) => {
      val e = ev(s, dir).withColumn("arr",
        split(concat_ws(" ", col("event_type"), col("event_type"), col("user_id")), " "))
      Structural.deduplicator(e, Seq("arr"))
        .select(col("event_id"), array_join(col("arr"), " ").as("deduped"))
    },
    Some("""SELECT event_id,
            event_type || ' ' || CAST(user_id AS VARCHAR) AS deduped FROM events"""))

  private val pLabeler = Spec("proc_labeler",
    (s, dir) => {
      val e = ev(s, dir).select(col("event_id"))
      val l1 = Structural.labeler(e, "action", Seq("ev", "ingest"))
      val l2 = Structural.labeler(l1, "action", Seq("graft", "ev"))
      l2.select(col("event_id"),
        array_join(FieldOps.getOrNull(l2.schema, "label.action"), " ").as("labels"))
    },
    Some("SELECT event_id, 'ev graft ingest' AS labels FROM events"))

  private val pSelective = Spec("proc_selective_extractor",
    (s, dir) => Structural.selectiveExtractor(ev(s, dir),
      "event_type:error", Seq("event_id", "user_id")),
    Some("SELECT event_id, user_id FROM events WHERE event_type = 'error'"))

  // ======================================================================
  // calculator (#7) — template expression → native arithmetic Column tree
  // ======================================================================

  private val pCalc = Spec("proc_calculator",
    (s, dir) => {
      val e = ev(s, dir)
      val c1 = Calculator.calculator(e, "${value} * 2 + ${user_id} ^ 2", "calc_raw")
      val c2 = Calculator.calculator(c1, "${value} > 100", "is_big")
      c2.select(col("event_id"),
        round(col("calc_raw") * 100).cast("long").as("calc_cents"),
        col("is_big").cast("int").as("is_big"))
    },
    Some("""SELECT event_id,
            CAST(round((value*2 + power(user_id,2))*100) AS BIGINT) AS calc_cents,
            CAST(CASE WHEN value > 100 THEN 1 ELSE 0 END AS INT) AS is_big
            FROM events"""))

  // ======================================================================
  // Time processors (#8,9,10)
  // ======================================================================

  private val pTimestamper = Spec("proc_timestamper",
    (s, dir) => {
      val e = ev(s, dir).withColumn("ts_str",
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      TimeOps.timestamper(e, "ts_str", Seq("yyyy-MM-dd HH:mm:ss"), "ts_iso")
        .select(col("event_id"), col("ts_iso"))
    },
    Some("""SELECT event_id,
            strftime(date_trunc('second', ts::TIMESTAMP),
              '%Y-%m-%dT%H:%M:%S') || '.000Z' AS ts_iso FROM events"""))

  private val pDtExtract = Spec("proc_datetime_extractor",
    (s, dir) => {
      val e = ev(s, dir)
      val x = TimeOps.datetimeExtractor(e, "ts", "dt")
      x.select(col("event_id"),
        col("dt.year").as("year"), col("dt.month").as("month"),
        col("dt.day").as("day"), col("dt.hour").as("hour"),
        col("dt.minute").as("minute"), col("dt.second").as("second"),
        col("dt.weekday").as("weekday"))
    },
    Some("""SELECT event_id,
            CAST(year(ts::TIMESTAMP) AS INT) AS year,
            CAST(month(ts::TIMESTAMP) AS INT) AS month,
            CAST(day(ts::TIMESTAMP) AS INT) AS day,
            CAST(hour(ts::TIMESTAMP) AS INT) AS hour,
            CAST(minute(ts::TIMESTAMP) AS INT) AS minute,
            CAST(CAST(floor(second(ts::TIMESTAMP)) AS BIGINT) AS INT) AS second,
            dayname(ts::TIMESTAMP) AS weekday FROM events"""))

  private val pTsDiffer = Spec("proc_timestamp_differ",
    (s, dir) => {
      val e = ev(s, dir).withColumn("day_start", date_trunc("day", col("ts")))
      TimeOps.timestampDiffer(e, "ts", "day_start", "since_midnight",
          unit = "s", showUnit = true)
        .select(col("event_id"), col("since_midnight"))
    },
    Some("""SELECT event_id,
            CAST((epoch_us(ts::TIMESTAMP) - epoch_us(date_trunc('day', ts::TIMESTAMP)))
              // 1000000 AS BIGINT)::VARCHAR || ' s' AS since_midnight
            FROM events"""))

  // ======================================================================
  // Pattern processors: dissector (#2), grokker (#3)
  // ======================================================================

  private val pDissector = Spec("proc_dissector",
    (s, dir) => {
      val e = ev(s, dir).withColumn("message",
        concat_ws(" ", col("event_type"), col("user_id"), col("value")))
      PatternOps.dissector(e, "message", "%{etype} %{uid|int} %{val|float}")
        .select(col("event_id"), col("etype"), col("uid"),
          round(col("val") * 100).cast("long").as("val_cents"))
    },
    Some("""SELECT event_id, event_type AS etype, user_id AS uid,
            CAST(round(value*100) AS BIGINT) AS val_cents FROM events"""))

  private val pGrokker = Spec("proc_grokker",
    (s, dir) => {
      val e = ev(s, dir).withColumn("message",
        concat(lit("ERROR code="), col("user_id"), lit(" op="), col("event_type")))
      PatternOps.grokker(e, "message",
          Seq("%{LOGLEVEL:level} code=%{INT:code} op=%{WORD:op}"))
        .select(col("event_id"), col("level"), col("code"), col("op"))
    },
    Some("""SELECT event_id, 'ERROR' AS level,
            CAST(user_id AS VARCHAR) AS code, event_type AS op FROM events"""))

  // ----------------------------------------------------------------------

  val batch1: Seq[Spec] = Seq(
    q1, q2, q3, q4, q5, q6,
    fBasic, fBool, fWild, fGroup,
    pFieldManager, pDropper, pDeleter, pConcat, pSplit, pAdder,
    pKeyChecker, pDedup, pLabeler, pSelective, pCalc,
    pTimestamper, pDtExtract, pTsDiffer, pDissector, pGrokker)

  def all: Seq[Spec] = batch1

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(sp => sp.name -> sp.query).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(sp => sp.oracle.map(o => sp.name ->
      o.replaceAll("\\s+", " ").trim)).toMap
}
