package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.{PipelineCompiler, PipelineSpec}

/** Streaming runtime: the same compiled pipeline runs over
  * `readStream` sources; side-output channels are routed inside a single
  * `foreachBatch` so one micro-batch pass feeds every sink (the
  * reference's extra-data routing, logprep/framework/pipeline.py:320-325,
  * without re-reading the source per sink).
  *
  * Delivery: Structured Streaming checkpointing gives exactly-once to
  * idempotent sinks — strictly stronger than the reference's Kafka
  * at-least-once (connector/confluent_kafka/input.py:493-510).
  *
  * Connector mapping (reference registry logprep/registry.py:62-76):
  *  - confluentkafka_input/output → `format("kafka")` read/writeStream
  *  - file_input (tail)           → `readStream.text(dir)`
  *  - json/jsonl input            → `spark.read.json` (batch)
  *  - jsonl/console/s3 output     → foreachBatch writers below
  *  - http_input                  → a push source is out of scope for this
  *    container; the contract is any readStream DataFrame
  */
object StreamRunner {

  /** Attempt-identity token of the micro-batch currently compiling,
    * for stages whose side effects must be keyed by it
    * (CurationStages.dedupIngest). Structured Streaming replays a
    * failed batch under the same batch id WITHIN one checkpoint, and a
    * bare batch id is reused by every OTHER checkpoint's stream too —
    * so the token scopes the id by a checkpoint-path digest:
    * stable across restarts/replays of one checkpointed query, unique
    * across queries. None outside a streaming batch.
    */
  val currentBatchToken = new scala.util.DynamicVariable[Option[String]](None)

  private def batchToken(checkpoint: String, bid: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    s"ck$d-b$bid"
  }

  /** Translate a reference `confluentkafka_input` `kafka_config` + topic
    * (connector/confluent_kafka/input.py:64-69 DEFAULTS, :238-308) into
    * Spark Kafka source options:
    *
    *  - `auto.offset.reset` earliest/latest → `startingOffsets`; like a
    *    consumer group's stored offsets, it only applies on FIRST start —
    *    afterwards the checkpoint's offsets win.
    *  - the group-commit knobs (`enable.auto.commit`,
    *    `enable.auto.offset.store`) are dropped: Spark owns offsets in
    *    the checkpoint (exactly-once with idempotent sinks — strictly
    *    stronger than the reference's store-after-batch at-least-once,
    *    input.py:493-510), and the Kafka source rejects these options.
    *  - everything else (bootstrap.servers, group.id, security.protocol,
    *    ssl.*, sasl.*, …) passes through with Spark's `kafka.` prefix.
    *
    * Pure so specs can assert the exact wire options without a broker.
    */
  def kafkaSourceOptions(kafkaConfig: Map[String, String],
                         topic: String): Map[String, String] = {
    val startingOffsets = kafkaConfig.get("auto.offset.reset") match {
      case Some("latest") => "latest"
      case _ => "earliest" // the reference's DEFAULTS value
    }
    val sparkOwned = Set("enable.auto.commit", "enable.auto.offset.store",
      "auto.offset.reset")
    (kafkaConfig -- sparkOwned).map { case (k, v) => s"kafka.$k" -> v } ++
      Map("subscribe" -> topic, "startingOffsets" -> startingOffsets)
  }

  /** Kafka source (structured streaming). `value` is the raw event. */
  def kafkaSource(spark: SparkSession, kafkaConfig: Map[String, String],
                  topic: String): DataFrame =
    spark.readStream.format("kafka")
      .options(kafkaSourceOptions(kafkaConfig, topic))
      .load()
      .select(col("value").cast("string").as("message"))

  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    kafkaSource(spark, Map("bootstrap.servers" -> bootstrap), topic)

  /** File-tail source over a directory of text logs. */
  def fileSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir).select(col("value").as("message"))

  /** Run a compiled pipeline over a streaming DataFrame, routing the main
    * channel and every side-output channel to its sink, one micro-batch
    * pass per trigger. `sinks` maps channel name ("main", "pre_detector",
    * ...) to a batch-DataFrame writer.
    */
  def run(stream: DataFrame, spec: PipelineSpec,
          sinks: Map[String, DataFrame => Unit],
          checkpoint: String,
          trigger: Trigger = Trigger.AvailableNow(),
          instrumented: Boolean = false): StreamingQuery = {
    // instrumented = per-stage observe counters feeding MetricsRegistry
    // through its QueryExecutionListener bridge
    val compiled =
      if (instrumented) PipelineCompiler.compileInstrumented(spec)
      else PipelineCompiler.compile(spec)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        // error channel attaches for BOTH compile paths (no-op when the
        // instrumented compile already carries it) — an "errors" sink
        // must never be silently dead because the metrics flag is off.
        // The attempt token is exposed to stages with replay-sensitive
        // side effects (dedup_ingest keys its store appends by it: a
        // replayed attempt of the SAME batch must re-admit its own
        // rows, not find them "already seen" and lose them)
        val result = StreamRunner.currentBatchToken
          .withValue(Some(batchToken(checkpoint, bid))) {
            PipelineCompiler.withErrorChannel(compiled(batch))
          }
        // per-micro-batch counters via observe — foreachBatch plans run
        // as batch queries, so these surface on the
        // QueryExecutionListener (MetricsRegistry.execListener), the
        // reference's Prometheus counters
        sinks.get("main").foreach(_(graft.pipeline.Metrics.observed(result.main)))
        result.extra.foreach { case (name, df) =>
          sinks.get(name).foreach(_(df))
        }
      }
      .start()
  }

  /** Hot config reload (reference configuration.py
    * `config_refresh_interval` :483-491 + runner.py reload): between
    * micro-batches the runner re-reads the config source; when the
    * content changed, the pipeline recompiles and the NEXT micro-batch
    * runs the new plan. The `foreachBatch` closure identity is stable so
    * the checkpoint is untouched — only the compiled function swaps.
    * A load/compile failure keeps the old pipeline and backs the
    * interval off to a quarter (min 5 s, the reference's
    * MIN_CONFIG_REFRESH_INTERVAL); the next successful check restores
    * the configured interval. A successful reload also clears the getter
    * caches (the reference's `refresh_getters()`), so http(s)/file
    * comparison lists re-fetch under the new config.
    */
  final class ConfigRefresh(load: () => PipelineSpec,
                            intervalSec: Int,
                            clock: () => Long = () => System.currentTimeMillis(),
                            instrumented: Boolean = false) {
    import ConfigRefresh.MinIntervalSec
    private def compileSpec(s: PipelineSpec): DataFrame => graft.pipeline.PipelineResult =
      if (instrumented) PipelineCompiler.compileInstrumented(s)
      else PipelineCompiler.compile(s)
    private val configured = math.max(intervalSec, MinIntervalSec)
    @volatile private var spec: PipelineSpec = load()
    @volatile private var compiled: DataFrame => graft.pipeline.PipelineResult =
      compileSpec(spec)
    @volatile private var intervalNowSec: Int = configured
    @volatile private var nextCheckMs: Long = clock() + configured * 1000L
    @volatile private var reloadCount: Long = 0
    @volatile private var failureCount: Long = 0

    def reloads: Long = reloadCount
    def failures: Long = failureCount
    def currentIntervalSec: Int = intervalNowSec

    /** The pipeline for this micro-batch, refreshing first when due. */
    def current(): DataFrame => graft.pipeline.PipelineResult = {
      maybeRefresh(); compiled
    }

    private def maybeRefresh(): Unit = synchronized {
      if (clock() < nextCheckMs) return
      try {
        val fresh = load()
        // reload only on change (the reference compares configurations
        // and skips identical ones, configuration.py:827-843)
        if (fresh != spec) {
          compiled = compileSpec(fresh)
          spec = fresh
          reloadCount += 1
          // refresh_getters(): lists AND credentials re-fetch under the
          // new config (stale tokens / cached-None targets would
          // otherwise survive the reload)
          graft.operators.ListSources.clearCache()
          graft.operators.Credentials.clearCache()
        }
        intervalNowSec = configured
      } catch {
        case scala.util.control.NonFatal(_) =>
          failureCount += 1
          intervalNowSec = math.max(intervalNowSec / 4, MinIntervalSec)
      }
      nextCheckMs = clock() + intervalNowSec * 1000L
    }
  }

  object ConfigRefresh {
    /** reference defaults.py MIN_CONFIG_REFRESH_INTERVAL */
    val MinIntervalSec = 5
  }

  /** [[run]] with hot config reload: the spec re-loads every
    * `refresh.currentIntervalSec` seconds between micro-batches.
    */
  def runRefreshing(stream: DataFrame, refresh: ConfigRefresh,
                    sinks: Map[String, DataFrame => Unit],
                    checkpoint: String,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        // same attempt-token discipline as [[run]] — the hot-reload
        // path is a production path, and dedup_ingest under it must be
        // exactly as replay-safe (review r10 wave 2, finding 1)
        val result = StreamRunner.currentBatchToken
          .withValue(Some(batchToken(checkpoint, bid))) {
            PipelineCompiler.withErrorChannel(refresh.current()(batch))
          }
        sinks.get("main").foreach(_(graft.pipeline.Metrics.observed(result.main)))
        result.extra.foreach { case (name, df) =>
          sinks.get(name).foreach(_(df))
        }
      }
      .start()

  /** JSONL append sink (reference jsonl_output). */
  def jsonlSink(path: String): DataFrame => Unit =
    df => df.write.mode("append").json(path)

  /** Console sink (reference console_output). */
  def consoleSink(n: Int = 20): DataFrame => Unit =
    df => df.show(n, truncate = false)

  /** Reference `confluentkafka_output` `kafka_config` + topic →
    * Spark Kafka sink options (producer config passes through with the
    * `kafka.` prefix; `flush_timeout`/`send_timeout` are reference
    * poll-loop knobs with no Spark equivalent — the sink's save() is
    * synchronous per batch). Pure for broker-less wire specs.
    */
  def kafkaSinkOptions(kafkaConfig: Map[String, String],
                       topic: String): Map[String, String] =
    kafkaConfig.map { case (k, v) => s"kafka.$k" -> v } + ("topic" -> topic)

  /** Kafka sink (reference confluentkafka_output). Mode is explicit
    * Append — producing IS appending, and the default ErrorIfExists
    * plans create-table-as-select on v2 providers instead of a write.
    */
  def kafkaSink(kafkaConfig: Map[String, String], topic: String): DataFrame => Unit =
    df => df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.format("kafka").mode("append")
      .options(kafkaSinkOptions(kafkaConfig, topic))
      .save()

  def kafkaSink(bootstrap: String, topic: String): DataFrame => Unit =
    kafkaSink(Map("bootstrap.servers" -> bootstrap), topic)

  /** Partitioned file sink — the columnar-analytics layout (partition
    * columns become the key prefix). Use an `s3a://` path on a real
    * cluster. For byte-level reference fidelity see [[jsonBatchSink]].
    */
  def partitionedParquetSink(path: String, partitionBy: Seq[String]): DataFrame => Unit =
    df => df.write.mode("append").partitionBy(partitionBy: _*).parquet(path)

  /** Expand the reference's `%{<strftime>}` date patterns in a key prefix
    * (s3/output.py:264-271 `_add_dates`): each `%{...}` body is a
    * strftime format evaluated at write time.
    */
  private[streaming] def addDates(prefix: String, now: java.time.ZonedDateTime): String =
    """%\{([^}]*)\}""".r.replaceAllIn(prefix, m => {
      val fmt = m.group(1)
      val sb = new StringBuilder
      var i = 0
      while (i < fmt.length) {
        if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
          val out = fmt.charAt(i + 1) match {
            case 'Y' => f"${now.getYear}%04d"
            case 'y' => f"${now.getYear % 100}%02d"
            case 'm' => f"${now.getMonthValue}%02d"
            case 'd' => f"${now.getDayOfMonth}%02d"
            case 'H' => f"${now.getHour}%02d"
            case 'M' => f"${now.getMinute}%02d"
            case 'S' => f"${now.getSecond}%02d"
            case 'j' => f"${now.getDayOfYear}%03d"
            case '%' => "%"
            case other => "%" + other
          }
          sb.append(out); i += 2
        } else { sb.append(fmt.charAt(i)); i += 1 }
      }
      java.util.regex.Matcher.quoteReplacement(sb.toString)
    })

  /** Reference-fidelity s3_output: each event routes to the prefix named
    * by its `prefix_field` (default_prefix when absent), prefixes expand
    * `%{strftime}` date patterns, and every (partition, prefix) batch is
    * ONE JSON-array object under
    * `{base}/{basePrefix}/{prefix}/{epochSeconds}-{uuid}` —
    * the reference's key layout and body encoding (s3/output.py:229-307:
    * `_add_to_backlog`, `_write_backlog`, `_write_document_batch`).
    * Executors write their partitions independently through the Hadoop
    * filesystem API (`file:/` here, `s3a://` on a real cluster) — no
    * driver collect, batching bounded by `backlogSize` like the
    * reference's message_backlog_size.
    */
  def jsonBatchSink(basePath: String, prefixField: String,
                    defaultPrefix: String, basePrefix: String = "",
                    backlogSize: Int = 500): DataFrame => Unit = { df =>
    val prefixCol = coalesce(
      graft.fields.FieldOps.getOrNull(df.schema, prefixField).cast("string"),
      lit(defaultPrefix))
    val doc = to_json(struct(df.columns.map(col): _*))
    val base = basePrefix match {
      case "" => basePath.stripSuffix("/")
      case bp => basePath.stripSuffix("/") + "/" + bp
    }
    df.select(prefixCol.as("p"), doc.as("d"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        def flush(prefix: String, docs: scala.collection.Seq[String]): Unit = {
          val now = java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC)
          val key = s"$base/${addDates(prefix, now)}/" +
            s"${System.currentTimeMillis() / 1000}-${java.util.UUID.randomUUID()}"
          val path = new org.apache.hadoop.fs.Path(key)
          val fs = path.getFileSystem(conf)
          val out = fs.create(path, true)
          try out.write(docs.mkString("[", ",", "]").getBytes("UTF-8"))
          finally out.close()
        }
        val backlog = scala.collection.mutable.Map
          .empty[String, scala.collection.mutable.ArrayBuffer[String]]
        var n = 0
        rows.foreach { r =>
          backlog.getOrElseUpdate(r.getString(0),
            scala.collection.mutable.ArrayBuffer.empty) += r.getString(1)
          n += 1
          if (n >= backlogSize) {
            backlog.foreach { case (p, ds) => flush(p, ds) }
            backlog.clear(); n = 0
          }
        }
        backlog.foreach { case (p, ds) => flush(p, ds) }
      }
  }
}
