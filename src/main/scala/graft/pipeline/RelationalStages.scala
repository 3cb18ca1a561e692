package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.fields.FieldOps
import graft.filter.FilterCompiler

/** Beyond-parity pipeline stages: the cross-event capability the reference
  * lacks outright (SURVEY §2.4 — no joins, no aggregations, no window
  * functions, no event-time windows, no cross-event dedup), exposed as
  * first-class stage types in the same YAML pipeline config that drives
  * the processors. Everything lowers to plain `Dataset` operations so
  * Catalyst plans them like hand-written queries:
  *
  *  - `aggregate`    → `groupBy().agg()` (hash aggregate, map-side partial
  *    combine); optional event-time `window:` and `watermark:` make the
  *    same stage a streaming windowed aggregation
  *  - `join`         → equi-join against a side table read from any Spark
  *    source; `broadcast: true` pins the small-dim plan (no shuffle of
  *    the event stream), otherwise AQE decides
  *  - `window_stats` → analytic functions over `Window.partitionBy`;
  *    the optional `keep:` post-filter uses the engine's own filter DSL
  *    (top-k per key = `rank:[1 TO k]`, one shuffle, WindowGroupLimit
  *    pushes the limit below the sort at execution)
  *  - `dedup_events` → `dropDuplicates` on key fields; with `watermark:`
  *    on a streaming input it becomes `dropDuplicatesWithinWatermark`
  *    (bounded state — the 100 TB-stream-safe shape)
  *  - `sort_limit`   → global `orderBy().limit()` (batch only; Spark
  *    plans it as TakeOrderedAndProject, no full sort materialization)
  *
  * Stage configs ride on the stage map itself (RuleLoader.fromYaml folds
  * them into one synthetic match-all rule); the rule `filter` doubles as
  * a pre-filter in the full Lucene DSL.
  */
object RelationalStages {

  val stageTypes: Set[String] =
    Set("aggregate", "join", "window_stats", "dedup_events", "sort_limit",
      "sessionize", "asof_join")

  def compile(ptype: String, rule: RuleSpec, df: DataFrame): DataFrame = {
    val c = rule.config
    val pre =
      if (rule.filter == "*") df
      else df.filter(coalesce(
        FilterCompiler.predicate(rule.filter, df.schema), lit(false)))
    ptype match {
      case "aggregate" => aggregate(pre, c)
      case "join" => join(pre, c)
      case "window_stats" => windowStats(pre, c)
      case "dedup_events" => dedupEvents(pre, c)
      case "sort_limit" => sortLimit(pre, c)
      case "sessionize" => sessionize(pre, c)
      case "asof_join" => asofJoin(pre, c)
      case other => throw new IllegalArgumentException(s"not relational: $other")
    }
  }

  // ---- helpers -------------------------------------------------------

  private def colOf(df: DataFrame, field: String): Column =
    FieldOps.getOrNull(df.schema, field)

  /** Output name for a (possibly dotted) source field. */
  private def nameOf(field: String): String = field.replace('.', '_')

  private def seqOf(c: Map[String, Any], k: String): Seq[String] =
    c.getOrElse(k, Seq.empty[Any]).asInstanceOf[Seq[Any]].map(_.toString)

  private def mapOf(c: Map[String, Any], k: String): Map[String, Any] =
    c.getOrElse(k, Map.empty[String, Any]).asInstanceOf[Map[String, Any]]

  private def subMap(v: Any): Map[String, Any] =
    v.asInstanceOf[Map[String, Any]]

  /** `watermark: {field, delay}` — casts the field to timestamp in place
    * (event-time columns often arrive as strings) and declares lateness.
    */
  private def withWatermark(df: DataFrame, c: Map[String, Any]): DataFrame =
    c.get("watermark").map(subMap) match {
      case Some(w) =>
        val f = w("field").toString
        df.withColumn(f, col(f).cast("timestamp"))
          .withWatermark(f, w("delay").toString)
      case None => df
    }

  // ---- aggregate -----------------------------------------------------

  private def aggFn(df: DataFrame, spec: Map[String, Any]): Column = {
    val fn = spec.getOrElse("fn", "count").toString
    def field = colOf(df, spec("field").toString)
    fn match {
      case "count" =>
        spec.get("field").map(f => count(colOf(df, f.toString)))
          .getOrElse(count(lit(1)))
      case "count_distinct" => count_distinct(field)
      case "approx_count_distinct" => approx_count_distinct(field)
      case "sum" => sum(field)
      case "avg" | "mean" => avg(field)
      case "min" => min(field)
      case "max" => max(field)
      case "first" => first(field, ignoreNulls = true)
      case "last" => last(field, ignoreNulls = true)
      case "stddev" => stddev(field)
      case "variance" => variance(field)
      case "collect_set" => array_sort(collect_set(field))
      case "collect_list" => collect_list(field)
      case other => throw new IllegalArgumentException(s"unknown agg fn: $other")
    }
  }

  private def aggregate(df: DataFrame, c: Map[String, Any]): DataFrame = {
    val source = withWatermark(df, c)
    val keys = seqOf(c, "group_by")
      .map(f => colOf(source, f).as(nameOf(f)))
    // event-time window: {time_field, duration, slide?} → a `window`
    // struct key (start/end), streaming- and batch-identical semantics.
    // When the time field carries the watermark, reference the column
    // as-is: wrapping it (even a no-op cast) would drop the event-time
    // metadata and fail streaming append mode.
    val wmField = c.get("watermark").map(subMap).map(_("field").toString)
    val windowKey = c.get("window").map(subMap).map { w =>
      val f = w("time_field").toString
      val t =
        if (wmField.contains(f)) col(f)
        else colOf(source, f).cast("timestamp")
      val dur = w("duration").toString
      w.get("slide").map(s => window(t, dur, s.toString))
        .getOrElse(window(t, dur))
    }
    val aggs = mapOf(c, "aggregations").toSeq.map { case (target, spec) =>
      aggFn(source, subMap(spec)).as(target)
    }
    require(aggs.nonEmpty, "aggregate stage needs `aggregations`")
    source.groupBy(keys ++ windowKey: _*).agg(aggs.head, aggs.tail: _*)
  }

  // ---- join ----------------------------------------------------------

  private def join(df: DataFrame, c: Map[String, Any]): DataFrame = {
    val right0 = c.get("right").map(subMap) match {
      case Some(r) =>
        val format = r.getOrElse("format", "parquet").toString
        df.sparkSession.read.format(format).load(r("path").toString)
      case None => throw new IllegalArgumentException("join stage needs `right`")
    }
    val pruned = {
      val sel = seqOf(c, "select")
      if (sel.nonEmpty) right0.select(sel.map(col): _*) else right0
    }
    val keys = seqOf(c, "on")
    val leftKeys = seqOf(c, "left_on")
    val rightKeys = seqOf(c, "right_on")
    val how = c.getOrElse("how", "inner").toString
    val right =
      if (c.get("broadcast").exists(_.toString == "true")) broadcast(pruned)
      else pruned
    if (keys.nonEmpty) df.join(right, keys, how)
    else {
      require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
        "join stage needs `on` or matching `left_on`/`right_on`")
      val cond = leftKeys.zip(rightKeys)
        .map { case (l, r) => colOf(df, l) === right.col(r) }
        .reduce(_ && _)
      df.join(right, cond, how)
    }
  }

  // ---- window_stats --------------------------------------------------

  private def orderCols(df: DataFrame, c: Map[String, Any]): Seq[Column] =
    c.getOrElse("order_by", Seq.empty[Any]).asInstanceOf[Seq[Any]].map { o =>
      val m = subMap(o)
      val cc = colOf(df, m("field").toString)
      if (m.get("desc").exists(_.toString == "true")) cc.desc else cc.asc
    }

  /** `frame: [start, end]` — a rows-between frame for running/sliding
    * aggregations; entries are ints or `unbounded`/`current`.
    */
  private def frameBound(v: Any, unboundedIsStart: Boolean): Long = v match {
    case "unbounded" =>
      if (unboundedIsStart) Window.unboundedPreceding else Window.unboundedFollowing
    case "current" => Window.currentRow
    case other => other.toString.toLong
  }

  private def windowStats(df: DataFrame, c: Map[String, Any]): DataFrame = {
    val part = seqOf(c, "partition_by").map(colOf(df, _))
    val order = orderCols(df, c)
    val base = Window.partitionBy(part: _*)
    val ordered = if (order.nonEmpty) base.orderBy(order: _*) else base
    val out = mapOf(c, "functions").toSeq.foldLeft(df) {
      case (d, (target, fnSpecAny)) =>
        val m = subMap(fnSpecAny)
        val fn = m.getOrElse("fn", "row_number").toString
        val spec = m.get("frame").map(_.asInstanceOf[Seq[Any]]) match {
          case Some(Seq(s, e)) => ordered.rowsBetween(
            frameBound(s, unboundedIsStart = true),
            frameBound(e, unboundedIsStart = false))
          case _ => ordered
        }
        def field = colOf(df, m("field").toString)
        def offset = m.get("offset").map(_.toString.toInt).getOrElse(1)
        val expr = fn match {
          case "row_number" => row_number()
          case "rank" => rank()
          case "dense_rank" => dense_rank()
          case "lag" => lag(field, offset)
          case "lead" => lead(field, offset)
          case "sum" => sum(field)
          case "avg" | "mean" => avg(field)
          case "min" => min(field)
          case "max" => max(field)
          case "count" => count(field)
          case "first" => first(field, ignoreNulls = true)
          case "last" => last(field, ignoreNulls = true)
          case other =>
            throw new IllegalArgumentException(s"unknown window fn: $other")
        }
        d.withColumn(target, expr.over(spec))
    }
    // `keep:` — post-filter over the stage's output in the engine's own
    // filter DSL; `rank:[1 TO k]` turns the stage into per-key top-k,
    // which the physical plan runs as WindowGroupLimit below the sort
    c.get("keep").map(_.toString) match {
      case Some(keep) => out.filter(coalesce(
        FilterCompiler.predicate(keep, out.schema), lit(false)))
      case None => out
    }
  }

  // ---- dedup_events --------------------------------------------------

  private def dedupEvents(df: DataFrame, c: Map[String, Any]): DataFrame = {
    val keys = seqOf(c, "keys")
    require(keys.nonEmpty, "dedup_events stage needs `keys`")
    val source = withWatermark(df, c)
    if (source.isStreaming && c.contains("watermark"))
      source.dropDuplicatesWithinWatermark(keys)
    else source.dropDuplicates(keys)
  }

  // ---- sessionize ----------------------------------------------------

  /** Gap-based sessions per key: `session_window` group key + configured
    * aggregations (batch and — with `watermark:` — streaming, where Spark
    * merges session state incrementally; state is bounded by the
    * watermark horizon). The session struct's `start`/`end` surface as
    * `session_start`/`session_end` columns.
    */
  private def sessionize(df: DataFrame, c: Map[String, Any]): DataFrame = {
    val source = withWatermark(df, c)
    val f = c("time_field").toString
    val wmField = c.get("watermark").map(subMap).map(_("field").toString)
    val t = if (wmField.contains(f)) col(f) else colOf(source, f).cast("timestamp")
    val keys = seqOf(c, "keys").map(k => colOf(source, k).as(nameOf(k)))
    val aggs = mapOf(c, "aggregations").toSeq.map { case (target, spec) =>
      aggFn(source, subMap(spec)).as(target)
    }
    require(aggs.nonEmpty, "sessionize stage needs `aggregations`")
    source
      .groupBy(session_window(t, c.getOrElse("gap", "30 minutes").toString)
        +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
  }

  // ---- asof_join -----------------------------------------------------

  /** As-of join against a side table: for each event, the latest right
    * row with `right_time` ≤ `left_time` on the matching key. Lowers to
    * the engine's union-merge window shape (operators/AsOfJoin.scala) —
    * one shuffle on the key, WindowGroupLimit-friendly, never a
    * per-row range probe.
    */
  private def asofJoin(df: DataFrame, c: Map[String, Any]): DataFrame = {
    val r = subMap(c.getOrElse("right",
      throw new IllegalArgumentException("asof_join stage needs `right`")))
    val format = r.getOrElse("format", "parquet").toString
    val right = df.sparkSession.read.format(format).load(r("path").toString)
    graft.operators.AsOfJoin.asofJoin(df, right,
      c("left_on").toString, c("right_on").toString,
      c("left_time").toString, c("right_time").toString,
      seqOf(c, "right_values"))
  }

  // ---- sort_limit ----------------------------------------------------

  private def sortLimit(df: DataFrame, c: Map[String, Any]): DataFrame = {
    require(!df.isStreaming, "sort_limit is a batch stage")
    val ordered = df.orderBy(orderCols(df, c): _*)
    c.get("limit").map(_.toString.toInt) match {
      case Some(n) => ordered.limit(n)
      case None => ordered
    }
  }
}
