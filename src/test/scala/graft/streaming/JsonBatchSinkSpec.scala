package graft.streaming

import graft.SparkSpec

/** s3_output fidelity: date-templated key prefixes + JSON-array batch
  * bodies on a local filesystem (the same Hadoop FS API serves s3a:// on
  * a real cluster).
  */
class JsonBatchSinkSpec extends SparkSpec {

  test("addDates expands %{strftime} patterns") {
    val now = java.time.ZonedDateTime.of(2026, 8, 12, 9, 5, 7, 0,
      java.time.ZoneOffset.UTC)
    assert(StreamRunner.addDates("base/%{%Y/%m/%d}/x", now) == "base/2026/08/12/x")
    assert(StreamRunner.addDates("p-%{%y:%m:%d}", now) == "p-26:08:12")
    assert(StreamRunner.addDates("no-pattern", now) == "no-pattern")
  }

  test("jsonBatchSink writes {prefix}/{year}/{month}/{day}/ JSON-array batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("s3sink").toString
    val df = Seq(
      ("e1", "alpha/%{%Y/%m/%d}"),
      ("e2", "alpha/%{%Y/%m/%d}"),
      ("e3", null.asInstanceOf[String])).toDF("id", "output_prefix")
    StreamRunner.jsonBatchSink(s"file:$dir", "output_prefix",
      defaultPrefix = "default", basePrefix = "logs")(df)
    val now = java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC)
    val datedDir = new java.io.File(
      f"$dir/logs/alpha/${now.getYear}%04d/${now.getMonthValue}%02d/${now.getDayOfMonth}%02d")
    assert(datedDir.isDirectory, s"expected dated prefix dir $datedDir")
    // Hadoop's local FS writes .crc sidecars — only the data objects count
    val batchFiles = datedDir.listFiles().filter(!_.getName.startsWith("."))
    assert(batchFiles.nonEmpty)
    val bodies = batchFiles.map(f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    // every body is a JSON array; together they carry e1 and e2
    bodies.foreach(b => assert(b.startsWith("[") && b.endsWith("]")))
    val all = bodies.mkString
    assert(all.contains("\"e1\"") && all.contains("\"e2\""))
    // missing prefix field → default prefix
    val defaultDir = new java.io.File(s"$dir/logs/default")
    assert(defaultDir.isDirectory)
    assert(defaultDir.listFiles().filter(!_.getName.startsWith(".")).exists(f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .contains("\"e3\"")))
  }
}
