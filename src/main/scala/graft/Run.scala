package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.{MetricsRegistry, RuleLoader}
import graft.streaming.StreamRunner

/** `logprep run config.yml` equivalent — the long-running service entry
  * the deployment artifact execs (reference: run_logprep.py `run` +
  * runner.py; chart inputs mirrored from charts/logprep/values.yaml:
  * config file, metrics port, health endpoint).
  *
  * One YAML config drives everything:
  * {{{
  * input:
  *   my_in:
  *     type: file_input            # | http_input | confluentkafka_input
  *     path: /var/log/app          # file_input: directory to tail
  * output:
  *   my_out:
  *     type: jsonl_output          # | console_output | parquet_output
  *                                 # | confluentkafka_output
  *     path: /data/out             # file-backed sinks
  *     channel: main               # main | errors | <side output name>
  * pipeline:
  *   - type: dissector
  *     rules: [...]
  * metrics:
  *   enabled: true
  *   port: 8000                    # /metrics (Prometheus) + /health
  * config_refresh_interval: 60     # hot reload, reference semantics
  * checkpoint: /data/checkpoint
  * trigger: processing=1 second    # | available_now (drain and exit)
  * }}}
  *
  * The health endpoint reports 200 only while the streaming query is
  * active — the chart's readiness/liveness probes point at it.
  */
object Run {

  private def asMap(v: Any): Map[String, Any] =
    Option(v).map(_.asInstanceOf[Map[String, Any]]).getOrElse(Map.empty)

  private[graft] def source(spark: SparkSession,
                            cfg: Map[String, Any]): DataFrame =
    cfg.getOrElse("type", "file_input").toString match {
      case "file_input" =>
        StreamRunner.fileSource(spark, cfg("path").toString)
      case "http_input" =>
        var r = spark.readStream.format("graft-http")
          .option("port", cfg.getOrElse("port", "9000").toString)
        cfg.get("credentials").foreach(c => r = r.option("credentials", c.toString))
        cfg.get("collect_meta").foreach(m => r = r.option("collect_meta", m.toString))
        r.load()
      case "confluentkafka_input" =>
        val kc = asMap(cfg.getOrElse("kafka_config", Map.empty))
          .map { case (k, v) => k -> v.toString }
        StreamRunner.kafkaSource(spark, kc, cfg("topic").toString)
      case other =>
        throw new IllegalArgumentException(s"unknown input type: $other")
    }

  private[graft] def sink(cfg: Map[String, Any]): DataFrame => Unit =
    cfg.getOrElse("type", "jsonl_output").toString match {
      case "jsonl_output" => StreamRunner.jsonlSink(cfg("path").toString)
      case "console_output" =>
        StreamRunner.consoleSink(cfg.getOrElse("n", 20).toString.toInt)
      case "parquet_output" =>
        val parts = cfg.get("partition_by")
          .map(_.toString.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
          .getOrElse(Seq.empty)
        StreamRunner.partitionedParquetSink(cfg("path").toString, parts)
      case "confluentkafka_output" =>
        val kc = asMap(cfg.getOrElse("kafka_config", Map.empty))
          .map { case (k, v) => k -> v.toString }
        StreamRunner.kafkaSink(kc, cfg("topic").toString)
      case other =>
        throw new IllegalArgumentException(s"unknown output type: $other")
    }

  private[graft] def trigger(s: String): Trigger = s.trim match {
    case "available_now" => Trigger.AvailableNow()
    case t if t.startsWith("processing=") =>
      Trigger.ProcessingTime(t.stripPrefix("processing="))
    case other =>
      throw new IllegalArgumentException(s"unknown trigger: $other")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: graft.Run <config.yml>")
    val cfgPath = args(0)
    def loadRoot(): Map[String, Any] = {
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(cfgPath)), "UTF-8")
      RuleLoader.toScalaPublic(
        new org.yaml.snakeyaml.Yaml().load[Any](text))
        .asInstanceOf[Map[String, Any]]
    }
    val root = loadRoot()

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-run")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // metrics + health endpoint (chart's exporter port)
    val metricsCfg = asMap(root.getOrElse("metrics", Map.empty))
    val exporter =
      if (metricsCfg.getOrElse("enabled", true).toString == "false") None
      else Some(new MetricsRegistry.Exporter(
        port = metricsCfg.getOrElse("port", 8000).toString.toInt,
        bindAddress = metricsCfg.getOrElse("bind", "0.0.0.0").toString).start())
    spark.streams.addListener(MetricsRegistry.listener)
    spark.listenerManager.register(MetricsRegistry.execListener)

    // EVERYTHING after the exporter starts — including config
    // validation — runs inside try/finally: the exporter's dispatcher
    // thread is non-daemon (it would keep the JVM alive) and the
    // default health probe is healthy, so any failure before
    // setHealthCheck would otherwise serve /health 200 forever while
    // processing nothing — a permanently wedged pod
    try {
      val inputCfg = root.get("input").map(asMap).flatMap(_.values.headOption)
        .map(asMap).getOrElse(
          throw new IllegalArgumentException("config needs an input section"))
      val outputs = asMap(root.getOrElse("output", Map.empty)).values
        .map(asMap).toSeq
      require(outputs.nonEmpty, "config needs at least one output")
      val sinks: Map[String, DataFrame => Unit] = outputs.map { o =>
        o.getOrElse("channel", "main").toString -> sink(o)
      }.toMap

      val checkpoint = root.getOrElse("checkpoint",
        s"/tmp/graft-run-checkpoint").toString
      val trig = trigger(root.getOrElse("trigger", "processing=1 second").toString)
      val refreshSec = root.getOrElse("config_refresh_interval", 0).toString.toInt

      val stream = source(spark, inputCfg)
      val query =
        if (refreshSec > 0) {
          val refresh = new StreamRunner.ConfigRefresh(
            () => RuleLoader.fromYaml(new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(cfgPath)), "UTF-8")),
            refreshSec, instrumented = true)
          StreamRunner.runRefreshing(stream, refresh, sinks, checkpoint, trig)
        } else {
          val spec = RuleLoader.fromYaml(new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(cfgPath)), "UTF-8"))
          StreamRunner.run(stream, spec, sinks, checkpoint, trig,
            instrumented = true)
        }
      // readiness/liveness: healthy iff the query is alive (the
      // reference's health check functions aggregate component health)
      MetricsRegistry.setHealthCheck(() => query.isActive)

      query.awaitTermination()
    } finally {
      // AvailableNow drains and terminates; a startup failure lands here
      // too: report unhealthy and release the exporter thread so the JVM
      // can exit and the orchestrator restarts the pod deliberately
      MetricsRegistry.setHealthCheck(() => false)
      exporter.foreach(_.stop())
      spark.stop()
    }
  }
}
