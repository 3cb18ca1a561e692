package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipeline metrics via Spark's native `Dataset.observe` — the
  * Spark-idiomatic stand-in for the reference's per-processor Prometheus
  * counters (`Processor.Metrics` / `Pipeline.metrics`,
  * logprep/metrics/metrics.py): aggregates ride the existing job
  * (zero extra passes, streaming-compatible — observed metrics surface
  * per micro-batch via `StreamingQueryListener`/`QueryExecutionListener`).
  *
  * Observed per batch:
  *  - `events_processed`  — rows through the pipeline
  *  - `events_failed`     — rows carrying failure tags
  *  - `tags_total`        — total tag count (≈ number of warnings)
  */
object Metrics {

  val ObservationName = "graft_pipeline"

  def observed(df: DataFrame): DataFrame = {
    val tags: Column =
      if (df.columns.contains("tags"))
        coalesce(col("tags").cast("array<string>"), array().cast("array<string>"))
      else array().cast("array<string>")
    df.observe(ObservationName,
      count(lit(1)).as("events_processed"),
      count(when(size(tags) > 0, 1)).as("events_failed"),
      coalesce(sum(size(tags)), lit(0L)).as("tags_total"))
  }

  /** Batch-mode convenience: run `action` on the observed frame and
    * return the metrics row as a map.
    */
  def collectWith(df: DataFrame)(action: DataFrame => Unit): Map[String, Long] = {
    val observation = new org.apache.spark.sql.Observation(ObservationName)
    val tags: Column =
      if (df.columns.contains("tags"))
        coalesce(col("tags").cast("array<string>"), array().cast("array<string>"))
      else array().cast("array<string>")
    val observedDf = df.observe(observation,
      count(lit(1)).as("events_processed"),
      count(when(size(tags) > 0, 1)).as("events_failed"),
      coalesce(sum(size(tags)), lit(0L)).as("tags_total"))
    action(observedDf)
    observation.get.map { case (k, v) => k -> v.toString.toLong }
  }

  /** Per-stage observation name: `graft_stage_<i>_<type>`. */
  def stageObservationName(index: Int, processorType: String): String =
    s"graft_stage_${index}_$processorType"

  /** Per-stage counters riding the SAME job as the main observation
    * (Spark allows many named observes in one plan — still zero extra
    * passes): events through the stage plus events the stage failed,
    * attributed by the processor's default `_<type>_failure` tag
    * (RuleExec tag convention; custom `tag_on_failure` values are
    * counted in the pipeline-level `events_failed`/`tags_total` but
    * can't be attributed to a stage). For pipelines with repeated
    * stages of one type, a later stage's count includes its
    * predecessors' failures of the same type — the per-type semantics
    * the reference gets from one Metrics child per processor NAME,
    * which we don't require in the spec.
    */
  def observeStage(df: DataFrame, index: Int, processorType: String): DataFrame = {
    val tags: Column =
      if (df.columns.contains("tags"))
        coalesce(col("tags").cast("array<string>"), array().cast("array<string>"))
      else array().cast("array<string>")
    df.observe(stageObservationName(index, processorType),
      count(lit(1)).as("events_processed"),
      count(when(array_contains(tags, s"_${processorType}_failure"), 1))
        .as("events_failed"))
  }
}

/** Process-wide metrics registry + Prometheus-text/health HTTP endpoint
  * (reference: metrics/metrics.py CounterMetric/GaugeMetric,
  * exporter.py PrometheusExporter `/metrics` + `/health`).
  *
  * Counters accumulate from `Dataset.observe` results: streaming
  * micro-batches feed them through [[MetricsRegistry.listener]]
  * (a `StreamingQueryListener` on `observedMetrics`), batch runs through
  * [[MetricsRegistry.record]]. Names are exported with the reference's
  * `logprep_`-style prefix swapped for `graft_` and a `_total` suffix,
  * labeled by stage.
  */
object MetricsRegistry {

  private val counters =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.util.concurrent.atomic.LongAdder]()

  @volatile private var healthy: () => Boolean = () => true

  /** Install the health probe (the reference's healthcheck functions). */
  def setHealthCheck(f: () => Boolean): Unit = healthy = f

  def add(metric: String, stage: String, delta: Long): Unit =
    counters.computeIfAbsent((metric, stage),
      _ => new java.util.concurrent.atomic.LongAdder()).add(delta)

  /** Fold one observation row (`observe` output) into the counters.
    * `graft_stage_<i>_<type>` observations label by stage; the
    * pipeline-level observation labels `stage="pipeline"`.
    */
  def record(observationName: String, values: Map[String, Long]): Unit = {
    val stage = observationName match {
      case s if s.startsWith("graft_stage_") => s.stripPrefix("graft_stage_")
      case _ => "pipeline"
    }
    values.foreach { case (metric, v) => add(metric, stage, v) }
  }

  /** Counter state, merged with the accumulator-backed bucket-cap
    * exemption audit ([[graft.ml.CapAudit]] — `stage="cap_<op>"`), so
    * the one snapshot (and the Prometheus text built from it) carries
    * both observation-fed and accumulator-fed counters.
    */
  def snapshot(): Map[(String, String), Long] = {
    import scala.jdk.CollectionConverters._
    counters.asScala.map { case (k, v) => k -> v.sum() }.toMap ++
      graft.ml.CapAudit.snapshot()
  }

  def reset(): Unit = {
    counters.clear()
    graft.ml.CapAudit.reset()
  }

  private def recordRow(name: String, row: org.apache.spark.sql.Row): Unit = {
    val values = row.schema.fieldNames.flatMap { f =>
      row.getAs[Any](f) match {
        case n: Number => Some(f -> n.longValue())
        case _ => None
      }
    }.toMap
    record(name, values)
  }

  /** Streaming bridge for observes in the streaming plan itself
    * (pre-`foreachBatch`): attach with `spark.streams.addListener(...)`.
    */
  def listener: org.apache.spark.sql.streaming.StreamingQueryListener =
    new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        e.progress.observedMetrics.asScala.foreach { case (name, row) =>
          recordRow(name, row)
        }
      }
    }

  /** Batch bridge: StreamRunner routes sinks inside `foreachBatch`,
    * whose plan executes as a BATCH query — its observed metrics report
    * through `QueryExecutionListener`, NOT the streaming progress.
    * Attach with `spark.listenerManager.register(...)`; covers plain
    * batch runs too.
    */
  def execListener: org.apache.spark.sql.util.QueryExecutionListener =
    new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) => recordRow(name, row) }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }

  /** Prometheus text exposition of the current counters. */
  def prometheusText(): String = {
    val snap = snapshot().toSeq.sortBy { case ((m, s), _) => (m, s) }
    val byMetric = snap.groupBy { case ((m, _), _) => m }.toSeq.sortBy(_._1)
    byMetric.map { case (metric, entries) =>
      val full = s"graft_${metric}_total"
      s"# TYPE $full counter\n" + entries.map { case ((_, stage), v) =>
        s"""$full{stage="$stage"} $v"""
      }.mkString("\n")
    }.mkString("", "\n", "\n")
  }

  /** `/metrics` (Prometheus text) + `/health` endpoint, reusing the
    * JDK server the http_input connector already runs on
    * (exporter.py:30-44 serves the same two routes).
    */
  final class Exporter(port: Int = 0, bindAddress: String = "127.0.0.1") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    private val server = HttpServer.create(
      new java.net.InetSocketAddress(bindAddress, port), 0)
    private def respond(ex: HttpExchange, code: Int, body: String,
                        contentType: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", contentType)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/metrics", (ex: HttpExchange) =>
      respond(ex, 200, prometheusText(), "text/plain; version=0.0.4"))
    server.createContext("/health", (ex: HttpExchange) =>
      if (healthy()) respond(ex, 200, "OK", "text/plain")
      else respond(ex, 503, "FAIL", "text/plain"))
    def boundPort: Int = server.getAddress.getPort
    def start(): Exporter = { server.start(); this }
    def stop(): Unit = server.stop(0)
  }
}
