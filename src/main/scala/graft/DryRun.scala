package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Rule dry-runner (reference: util/rule_dry_runner.py:1-167,
  * `logprep test dry-run $CONFIG $EVENTS`): runs the pipeline over a
  * JSON(L) event file with no sinks attached and prints, per event, an
  * ndiff of the pretty-printed before/after documents plus every
  * side-output (pre_detector detections, pseudonym mappings, ...) when
  * `--full-output` is given.
  *
  * Usage: `runMain graft.DryRun <config.yml> <events.json[l]>
  * [--input-type json|jsonl] [--full-output]`
  *
  * The corpus is collected to the driver by design — a dry run is a
  * debugging tool over a handful of events, the reference reads the
  * whole file into memory the same way.
  */
object DryRun {

  def main(args: Array[String]): Unit = {
    val positional = graft.streaming.Generator.positionals(args, Set("--input-type"))
    require(positional.length >= 2,
      "usage: graft.DryRun <config.yml> <events.json[l]> [--input-type json|jsonl] [--full-output]")
    val fullOutput = args.contains("--full-output")
    val inputType = args.sliding(2).collectFirst {
      case Array("--input-type", t) => t
    }.getOrElse("jsonl")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-dry-run")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try print(report(spark, positional(0), positional(1), inputType, fullOutput))
    finally spark.stop()
  }

  /** Build the full dry-run report (printed by [[main]], returned for
    * tests).
    */
  def report(spark: SparkSession, configPath: String, eventsPath: String,
             inputType: String = "jsonl", fullOutput: Boolean = false): String = {
    val configText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(configPath)), "UTF-8")
    val spec = pipeline.RuleLoader.fromYaml(configText)

    // the reference accepts a plain JSON doc, a JSON array, or JSONL
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(eventsPath)), "UTF-8").trim
    val jsonLines: Seq[String] = inputType match {
      case "json" => JsonMethods.parse(raw) match {
        case JArray(items) => items.map(i => JsonMethods.compact(JsonMethods.render(i)))
        case obj => Seq(JsonMethods.compact(JsonMethods.render(obj)))
      }
      case _ => raw.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    }

    import spark.implicits._
    val input = spark.read.json(jsonLines.toDS)
      .withColumn("__dry_id", monotonically_increasing_id())

    // a DRY run must never advance a real ingest/statistics store —
    // state-mutating stages compute their outputs but write nothing
    val (result, before, after) =
      pipeline.CurationStages.suppressStateWrites.withValue(true) {
        val r = pipeline.PipelineCompiler.compile(spec)(input)
        (r, collectJson(input), collectJson(r.main))
      }

    val sb = new StringBuilder
    var changed = 0
    // __dry_id is non-contiguous across partitions but ascending in
    // file order — sorted ids ARE the original event order
    before.keys.toSeq.sorted.zipWithIndex.foreach { case (id, i) =>
      val b = before(id)
      val a = after.getOrElse(id, "{}")
      if (a == b) {
        sb.append(title(s"EVENT $i — UNCHANGED")).append('\n')
      } else {
        changed += 1
        sb.append(title(s"EVENT $i — PROCESSED EVENT")).append('\n')
        sb.append(ndiff(pretty(b), pretty(a))).append('\n')
      }
    }
    if (fullOutput) result.extra.foreach { case (channel, df) =>
      sb.append(title(s"CUSTOM OUTPUT — $channel")).append('\n')
      df.select(to_json(struct(df.columns.map(col): _*))).collect()
        .foreach(r => sb.append(pretty(r.getString(0))).append('\n'))
    }
    sb.append(title(s"SUMMARY: ${jsonLines.size} events, $changed changed"))
      .append('\n')
    sb.toString
  }

  private def title(s: String): String = s"── $s " + "─" * math.max(4, 60 - s.length)

  /** `__dry_id` → compact JSON of all other (non-internal) columns. */
  private def collectJson(df: DataFrame): Map[Long, String] = {
    val cols = df.columns.filterNot(c => c == "__dry_id" || c.startsWith("__"))
    df.select(col("__dry_id"),
      to_json(struct(cols.map(col).toIndexedSeq: _*)).as("j"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  /** Pretty JSON with sorted keys, so diffs are stable field-by-field. */
  private[graft] def pretty(compactJson: String): String = {
    def sort(v: JValue): JValue = v match {
      case JObject(fs) => JObject(fs.sortBy(_._1).map { case (k, x) => k -> sort(x) })
      case JArray(xs) => JArray(xs.map(sort))
      case other => other
    }
    JsonMethods.pretty(JsonMethods.render(sort(JsonMethods.parse(compactJson))))
  }

  /** Line diff in difflib.ndiff style: `  ` keep, `- ` removed,
    * `+ ` added (LCS over lines — dry-run events are small).
    */
  private[graft] def ndiff(a: String, b: String): String = {
    val xs = a.split("\n"); val ys = b.split("\n")
    val lcs = Array.ofDim[Int](xs.length + 1, ys.length + 1)
    for (i <- xs.indices.reverse; j <- ys.indices.reverse)
      lcs(i)(j) =
        if (xs(i) == ys(j)) lcs(i + 1)(j + 1) + 1
        else math.max(lcs(i + 1)(j), lcs(i)(j + 1))
    val out = new StringBuilder
    var i = 0; var j = 0
    while (i < xs.length && j < ys.length) {
      if (xs(i) == ys(j)) { out.append("  ").append(xs(i)).append('\n'); i += 1; j += 1 }
      else if (lcs(i + 1)(j) >= lcs(i)(j + 1)) { out.append("- ").append(xs(i)).append('\n'); i += 1 }
      else { out.append("+ ").append(ys(j)).append('\n'); j += 1 }
    }
    while (i < xs.length) { out.append("- ").append(xs(i)).append('\n'); i += 1 }
    while (j < ys.length) { out.append("+ ").append(ys(j)).append('\n'); j += 1 }
    out.toString
  }
}
