package graft

import org.apache.spark.sql.streaming.Trigger

/** graft.Run service-config wiring: source/sink/trigger construction
  * from the YAML sections (the full service loop is driven end-to-end by
  * tools/smoke_deploy.sh from the PACKAGED jar — this pins the parsing
  * contract that script relies on).
  */
class RunSpec extends SparkSpec {

  test("trigger strings: available_now and processing intervals") {
    assert(Run.trigger("available_now") == Trigger.AvailableNow())
    assert(Run.trigger("processing=1 second") == Trigger.ProcessingTime("1 second"))
    intercept[IllegalArgumentException](Run.trigger("continuous=1 s"))
  }

  test("unknown input/output types fail loudly") {
    val e = intercept[IllegalArgumentException](
      Run.source(spark, Map("type" -> "carrier_pigeon")))
    assert(e.getMessage.contains("carrier_pigeon"))
    val e2 = intercept[IllegalArgumentException](
      Run.sink(Map("type" -> "carrier_pigeon")))
    assert(e2.getMessage.contains("carrier_pigeon"))
  }

  test("file_input source streams; jsonl sink writes") {
    val dir = java.nio.file.Files.createTempDirectory("run-src").toFile
    val out = java.nio.file.Files.createTempDirectory("run-out").toFile
    java.nio.file.Files.writeString(
      new java.io.File(dir, "a.log").toPath, "INFO hello\n")
    val src = Run.source(spark, Map("type" -> "file_input",
      "path" -> dir.getAbsolutePath))
    assert(src.isStreaming)
    assert(src.columns.toSeq == Seq("message"))
    val sinkFn = Run.sink(Map("type" -> "jsonl_output",
      "path" -> out.getAbsolutePath, "channel" -> "main"))
    sinkFn(spark.read.text(dir.getAbsolutePath).toDF("message"))
    val rows = spark.read.json(out.getAbsolutePath).count()
    assert(rows == 1)
  }
}
