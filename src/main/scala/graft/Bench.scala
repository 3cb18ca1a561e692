package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main — one JSON line on stdout:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":"..."}
  *
  * `events_chain` is the BASELINE.md batch chain: decoder/dissector →
  * timestamper → field ops → calculator → pre_detector side output over
  * the events table — the shape of the reference's benchmark pipeline
  * (labeler, dissector, dropper, pre_detector, …). Every query executes
  * via a `noop` write so projections aren't collapsed by count-only
  * optimization.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def eventsChain(s: SparkSession, dir: String): DataFrame = {
      val e = Tables.events(s, dir)
        .withColumn("message",
          concat_ws(" ", col("event_type"), col("user_id"), col("value")))
      val dissected = operators.PatternOps.dissector(e, "message",
        "%{etype} %{uid|int} %{val|float}")
      val decoded = operators.PatternOps.decodeJson(dissected, "props", "parsed", "k BIGINT")
      val stamped = operators.TimeOps.datetimeExtractor(decoded, "ts", "dt")
      val managed = operators.Structural.fieldManager(stamped,
        Map("etype" -> "event_class"))
      val calc = operators.Calculator.calculator(managed,
        "${val} * 2 + ${parsed.k}", "calc_out")
      val labeled = operators.Lookup.genericResolver(calc, "event_class", "category",
        Seq("^pur" -> "transaction", "^sig" -> "account", "^err" -> "incident",
          ".*" -> "other"))
      // pre_detector side output unioned in (both channels materialized)
      val det = operators.Detection.preDetector(labeled, Seq(
        operators.Detection.PreDetectorRule(
          "event_type:error AND value:[150.0 TO *]",
          "rule-1", "High-value error", "high", Seq("T1499"))), col("event_id"))
      labeled.select(col("event_id").as("k1"), col("category").as("k2"))
        .unionByName(det.select(col("event_key").as("k1"), col("severity").as("k2")))
    }

    // the same chain expressed as RULES through PipelineCompiler — the
    // path real configs take, including per-rule filter guards and
    // failure-tag machinery
    def pipelineChain(s: SparkSession, dir: String): DataFrame = {
      val e = Tables.events(s, dir)
        .withColumn("message",
          concat_ws(" ", col("event_type"), col("user_id"), col("value")))
        .withColumn("ts_str", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      val spec = pipeline.RuleLoader.fromYaml(
        """pipeline:
          |  - type: dissector
          |    rules:
          |      - filter: "message"
          |        dissector:
          |          mapping:
          |            message: "%{etype} %{uid|int} %{val}"
          |  - type: timestamper
          |    rules:
          |      - filter: "ts_str"
          |        timestamper:
          |          source_fields: [ts_str]
          |          source_format: ["%Y-%m-%d %H:%M:%S"]
          |          target_field: ts_iso
          |  - type: calculator
          |    rules:
          |      - filter: "uid"
          |        calculator:
          |          calc: "${uid} * 2 + 1"
          |          target_field: calc_out
          |  - type: generic_resolver
          |    rules:
          |      - filter: "etype"
          |        generic_resolver:
          |          field_mapping:
          |            etype: category
          |          resolve_list:
          |            "^pur": transaction
          |            "^sig": account
          |            "^err": incident
          |            ".*": other
          |""".stripMargin)
      pipeline.PipelineCompiler.compile(spec)(e).main
        .select(col("event_id"), col("category"), col("calc_out"))
    }

    val headline: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "events_chain" -> ((s, d) => eventsChain(s, d)),
      "pipeline_chain" -> ((s, d) => pipelineChain(s, d)),
      "q1_agg" -> GraftQueries.queries("q1_agg"),
      "q2_join_broadcast" -> GraftQueries.queries("q2_join_broadcast"),
      "q3_topk_window" -> GraftQueries.queries("q3_topk_window"),
      "q4_running_window" -> GraftQueries.queries("q4_running_window"),
      "ml_dedup_exact" -> GraftQueries.queries("ml_dedup_exact"),
      "ml_minhash_pairs" -> GraftQueries.queries("ml_minhash_pairs"),
      "ml_simhash" -> GraftQueries.queries("ml_simhash"),
      "ml_embed_topk" -> GraftQueries.queries("ml_embed_topk"),
      "ml_embed_neardup" -> GraftQueries.queries("ml_embed_neardup"),
      "ml_quality_score" -> GraftQueries.queries("ml_quality_score"),
      // round-4 surfaces: the YAML relational stages and curation ops
      "q14_pipeline_join" -> GraftQueries.queries("q14_pipeline_join"),
      "ml_repetition" -> GraftQueries.queries("ml_repetition"))

    // JVM/codegen warm-up on the smallest tier, not timed
    headline.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      CacheSweep.sweep(spark)
    }

    def timeOnce(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // release LSH signature caches so run N+1 recomputes honestly and
      // nothing accumulates in the block manager across queries
      CacheSweep.sweep(spark)
      dt
    }

    // median of N timed runs per query: a single contended run (round-2
    // driver artifact: 2.5× noise) can no longer corrupt the round signal.
    // Sub-second queries get 5 runs instead of 3, and min is reported
    // alongside median — min≈median proves the box was quiet, while a
    // large median/min gap flags contention rather than a code regression.
    val results = headline.map { case (name, fn) =>
      val first = Seq.fill(3)(timeOnce(name, fn))
      val all = (if (first.sorted.apply(1) < 1.0) first ++ Seq.fill(2)(timeOnce(name, fn))
                 else first).sorted
      (name, all(all.size / 2), all.head)
    }
    val qs = results.map { case (k, med, _) => "\"" + k + f"""\":$med%.3f""" }
      .mkString("{", ",", "}")
    val qmins = results.map { case (k, _, mn) => "\"" + k + f"""\":$mn%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalMin = results.map(_._3).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"queries_min":$qmins,"total_min":$totalMin%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
