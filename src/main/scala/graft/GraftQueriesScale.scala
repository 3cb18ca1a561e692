package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import GraftQueries.Spec

/** Beyond-parity scale operators (SURVEY §2.4): the aggregation / join /
  * window / set-op surface the reference lacks, exposed as engine
  * operators and oracle-checked. These are the queries whose plans must
  * survive 100× — each one's shuffle structure is chosen for that
  * (map-side combine, broadcast dims, single-shuffle windows, merge-shape
  * as-of join).
  */
object GraftQueriesScale {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)
  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  private val q7 = Spec("q7_distinct_agg",
    (s, dir) => ev(s, dir).groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("n_users"),
      min(round(col("value") * 100).cast("long")).as("min_cents"),
      max(round(col("value") * 100).cast("long")).as("max_cents"),
      count(lit(1)).as("n_events")),
    Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
            CAST(min(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS min_cents,
            CAST(max(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS max_cents,
            count(*) AS n_events FROM events GROUP BY event_type"""))

  private val q8 = Spec("q8_set_ops",
    (s, dir) => {
      val e = ev(s, dir)
      val purchasers = e.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      val errorers = e.filter(col("event_type") === "error")
        .select(col("user_id")).distinct()
      purchasers.intersect(errorers).withColumn("relation", lit("both"))
        .unionByName(purchasers.exceptAll(errorers)
          .withColumn("relation", lit("purchase_only")))
    },
    Some("""SELECT user_id, 'both' AS relation FROM (
              SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
              INTERSECT
              SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
            UNION ALL
            SELECT user_id, 'purchase_only' AS relation FROM (
              SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
              EXCEPT
              SELECT DISTINCT user_id FROM events WHERE event_type = 'error')"""))

  private val q9 = Spec("q9_wordcount_explode",
    (s, dir) => t(s, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 10),
    Some("""SELECT token, count(*) AS n FROM (
              SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
              FROM documents) GROUP BY token HAVING count(*) >= 10"""))

  private val q10 = Spec("q10_rollup",
    (s, dir) => t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("_all")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("_all")).as("linestatus"),
        col("sum_qty"), col("n")),
    Some("""SELECT coalesce(l_returnflag, '_all') AS returnflag,
            coalesce(l_linestatus, '_all') AS linestatus,
            CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS n
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"""))

  /** Sessionization: a session break is a >30-minute gap between a user's
    * consecutive events; session id = running count of breaks. One
    * shuffle on user_id; both window passes share the partitioning.
    */
  private val q11 = Spec("q11_sessionize",
    (s, dir) => {
      val e = ev(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gap = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
      val isBreak = when(gap.isNull || gap > 30L * 60 * 1000000, 1).otherwise(0)
      e.withColumn("brk", isBreak)
        .withColumn("session_seq", sum(col("brk"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("event_id"), col("user_id"), col("session_seq"))
    },
    Some("""SELECT event_id, user_id,
            CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
            FROM (
              SELECT event_id, user_id, ts,
                CASE WHEN epoch_us(ts::TIMESTAMP)
                    - epoch_us(lag(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                  > 30*60*1000000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS brk
              FROM events)"""))

  /** As-of join: each event is matched to the user's most recent order
    * (user_id keyed to o_custkey) at-or-before the event time.
    */
  private val q12 = Spec("q12_asof_join",
    (s, dir) => {
      val e = ev(s, dir)
      val orders = t(s, dir, "orders")
        .withColumn("o_ts", col("o_orderdate").cast("timestamp"))
      // as-of requires a unique (key, time) on the right for determinism:
      // keep the max orderkey among same-day orders of a customer
      val w = Window.partitionBy(col("o_custkey"), col("o_ts"))
        .orderBy(col("o_orderkey").desc)
      val dedup = orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      val joined = operators.AsOfJoin.asofJoin(
        e, dedup, "user_id", "o_custkey", "ts", "o_ts",
        rightVals = Seq("o_orderkey", "o_totalprice"))
      joined.select(col("event_id"), col("user_id"),
        col("asof_o_orderkey").as("last_orderkey"),
        round(col("asof_o_totalprice") * 100).cast("long").as("last_order_cents"))
    },
    Some("""SELECT event_id, user_id, o.o_orderkey AS last_orderkey,
            CAST(round(o.o_totalprice*100) AS BIGINT) AS last_order_cents
            FROM events ASOF LEFT JOIN (
              SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate FROM (
                SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
                  row_number() OVER (PARTITION BY o_custkey, o_orderdate
                    ORDER BY o_orderkey DESC) AS rn FROM orders)
              WHERE rn = 1) o
            ON user_id = o.o_custkey AND ts::TIMESTAMP >= o.o_orderdate"""))

  val all: Seq[Spec] = Seq(q7, q8, q9, q10, q11, q12)
}
