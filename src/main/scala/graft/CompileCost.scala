package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-side compile-cost profile for compiled-rule pipelines.
  *
  * The chain queries' plans carry 100+ expressions; this main measures
  * where the driver time goes as the stage count grows:
  *
  *   specCompile = YAML parse + rule/filter compilation (once per stream;
  *                 StreamRunner holds the resulting function across
  *                 micro-batches)
  *   planBuild   = applying the compiled function to a DataFrame (Column
  *                 construction; per micro-batch in foreachBatch)
  *   analyze     = analyzer + optimizer + physical planning (per action)
  *   exec        = one noop write at sf0.01 (for scale reference)
  *
  * Output: one JSON line per stage count. Numbers land in PLANS.md
  * ("Chain compile cost").
  */
object CompileCost {
  // target prefix: nested ("meta.") by default; flat with -Dgraft.cc.flat
  private def pfx: String =
    if (sys.props.get("graft.cc.flat").isDefined) "" else "meta."

  private def stageYaml(i: Int): String = (i % 4) match {
    case 0 =>
      s"""  - type: calculator
         |    rules:
         |      - filter: "value"
         |        calculator: {calc: "$${value} * ${i + 1} + 1", target_field: ${pfx}calc_$i}
         |""".stripMargin
    case 1 =>
      s"""  - type: field_manager
         |    rules:
         |      - filter: "event_type"
         |        field_manager: {source_fields: [event_type], target_field: ${pfx}copy_$i}
         |""".stripMargin
    case 2 =>
      s"""  - type: generic_resolver
         |    rules:
         |      - filter: "event_type"
         |        generic_resolver:
         |          field_mapping: {event_type: ${pfx}cat_$i}
         |          resolve_list: {"^pur": transaction, "^sig": account, ".*": other}
         |""".stripMargin
    case 3 =>
      s"""  - type: concatenator
         |    rules:
         |      - filter: "event_type AND user_id"
         |        concatenator:
         |          source_fields: [event_type, user_id]
         |          separator: "-"
         |          target_field: ${pfx}cc_$i
         |""".stripMargin
  }

  def yamlFor(k: Int): String =
    "pipeline:\n" + (0 until k).map(stageYaml).mkString

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Tables.events(spark, sfDir)

    def t[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = body
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // warm-up: JIT the whole path once so k=1 isn't charged for it
    {
      val spec = pipeline.RuleLoader.fromYaml(yamlFor(4))
      pipeline.PipelineCompiler.compile(spec)(df).main
        .write.mode("overwrite").format("noop").save()
    }

    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4, 8, 16, 31, 62)
    ks.foreach { k =>
      val yaml = yamlFor(k)
      // median of 3 for the driver-side components (they jitter with GC)
      val runs = (1 to 3).map { _ =>
        val (tSpec, compiled) = t(pipeline.PipelineCompiler.compile(
          pipeline.RuleLoader.fromYaml(yaml)))
        val (tBuild, result) = t(compiled(df))
        val (tAnalyze, _) = t(result.main.queryExecution.executedPlan)
        (tSpec, tBuild, tAnalyze, result)
      }
      def med(f: ((Double, Double, Double, graft.pipeline.PipelineResult)) => Double) =
        runs.map(f).sorted.apply(1)
      val (tExec, _) = t(runs.last._4.main
        .write.mode("overwrite").format("noop").save())
      println(f"""{"stages":$k,"spec_compile_s":${med(_._1)}%.4f,"plan_build_s":${med(_._2)}%.4f,"analyze_s":${med(_._3)}%.4f,"exec_s":$tExec%.4f}""")
    }
    spark.stop()
  }
}
