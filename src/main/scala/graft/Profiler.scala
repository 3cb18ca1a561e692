package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline._

/** Pipeline profiler — the engine-native equivalent of the reference's
  * `util/pipeline_profiler.py` (a cProfile wrapper around
  * `Pipeline.run`, framework/pipeline.py:240). cProfile's cumtime view
  * maps here to per-stage CUMULATIVE wall time: prefix pipelines
  * (stages 1..k) execute over the sample, so stage k's own cost is the
  * delta between consecutive prefixes. Per-stage processed/failed
  * counters ride the instrumented compile. Like the reference, a
  * machine-readable dump lands under `.profile/`.
  *
  * CLI: `runMain graft.Profiler <config.yml> <input.{jsonl,parquet}>
  * [--rows N]` — prints a cumtime-sorted table and writes
  * `.profile/output_<timestamp>.json`.
  */
object Profiler {

  final case class StageProfile(index: Int, processorType: String,
                                deltaSec: Double, cumSec: Double,
                                processed: Long, failed: Long)

  def profile(spark: SparkSession, configText: String,
              input: DataFrame): Seq[StageProfile] = {
    val spec = RuleLoader.fromYaml(configText)
    def runOnce(s: PipelineSpec): Double = {
      val t0 = System.nanoTime()
      PipelineCompiler.compile(s)(input).main
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up on the full pipeline so JIT/codegen don't land on stage 1
    runOnce(spec)

    // cumulative prefix timings: each prefix is a DIFFERENT plan with its
    // own generated code, so warm it once untimed, then min of 2 to shed
    // scheduler noise
    val measured = (1 to spec.stages.length).map { k =>
      val prefix = PipelineSpec(spec.stages.take(k))
      runOnce(prefix)
      math.min(runOnce(prefix), runOnce(prefix))
    }
    // prefix k strictly contains prefix k-1's work, so cumulative time is
    // monotone in the SEMANTICS — but the samples are independent
    // wall-clock measurements, and residual noise can invert a pair,
    // which would render as a negative stage delta. Enforce the semantic
    // monotonicity (running max); an inversion shows as delta 0 on the
    // stage that measured under its predecessor.
    val cums = measured.scanLeft(0.0)(math.max).tail

    // per-stage counters from ONE instrumented pass
    MetricsRegistry.reset()
    val el = MetricsRegistry.execListener
    spark.listenerManager.register(el)
    try {
      PipelineCompiler.compileInstrumented(spec)(input).main
        .write.mode("overwrite").format("noop").save()
      // QueryExecutionListener delivery is async
      Thread.sleep(1000)
    } finally spark.listenerManager.unregister(el)
    val snap = MetricsRegistry.snapshot()

    spec.stages.zipWithIndex.map { case (stage, i) =>
      val key = s"${i + 1}_${stage.processorType}"
      StageProfile(i + 1, stage.processorType,
        deltaSec = cums(i) - (if (i == 0) 0.0 else cums(i - 1)),
        cumSec = cums(i),
        processed = snap.getOrElse(("events_processed", key), 0L),
        failed = snap.getOrElse(("events_failed", key), 0L))
    }
  }

  def render(profiles: Seq[StageProfile]): String = {
    val header = f"${"stage"}%-5s ${"type"}%-24s ${"delta_s"}%10s ${"cum_s"}%10s ${"processed"}%10s ${"failed"}%8s"
    val rows = profiles.sortBy(-_.cumSec).map { p =>
      f"${p.index}%-5d ${p.processorType}%-24s ${p.deltaSec}%10.3f ${p.cumSec}%10.3f ${p.processed}%10d ${p.failed}%8d"
    }
    (header +: rows).mkString("\n")
  }

  /** `.profile/output_<stamp>.json`, mirroring the reference's dump dir. */
  def dump(profiles: Seq[StageProfile], dir: String = ".profile"): String = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val stamp = new java.text.SimpleDateFormat("yyyy-MM-dd_HH-mm-ss")
      .format(new java.util.Date())
    val path = s"$dir/output_$stamp.json"
    val json = profiles.map { p =>
      f"""{"stage":${p.index},"type":"${p.processorType}","delta_s":${p.deltaSec}%.4f,"cum_s":${p.cumSec}%.4f,"processed":${p.processed},"failed":${p.failed}}"""
    }.mkString("[", ",", "]")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      json.getBytes("UTF-8"))
    path
  }

  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
      .filterNot(a => args.indexOf(a) > 0 && args(args.indexOf(a) - 1) == "--rows")
    require(positional.length >= 2,
      "usage: graft.Profiler <config.yml> <input.{jsonl,parquet}> [--rows N]")
    val rows = args.sliding(2).collectFirst { case Array("--rows", v) => v.toInt }
    val spark = Tables.configure(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val configText = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(positional(0))), "UTF-8")
      val raw =
        if (positional(1).endsWith(".parquet")) spark.read.parquet(positional(1))
        else spark.read.json(positional(1))
      val input = rows.map(raw.limit).getOrElse(raw)
      val profiles = profile(spark, configText, input)
      println(render(profiles))
      println(s"dumped: ${dump(profiles)}")
    } finally spark.stop()
  }
}
