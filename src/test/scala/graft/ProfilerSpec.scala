package graft

import org.scalatest.matchers.should.Matchers

/** Per-stage profiler (engine-native pipeline_profiler.py equivalent):
  * prefix-delta timings, per-stage counters, cumtime-sorted rendering,
  * and the `.profile/` dump.
  */
class ProfilerSpec extends SparkSpec with Matchers {

  private val config =
    """pipeline:
      |  - type: dissector
      |    rules:
      |      - filter: "message"
      |        dissector:
      |          mapping: {message: "%{k}=%{v|int}"}
      |  - type: calculator
      |    rules:
      |      - filter: "v"
      |        calculator: {calc: "${v} * 2", target_field: doubled}
      |  - type: timestamper
      |    rules:
      |      - filter: "ts_str"
      |        timestamper:
      |          source_fields: [ts_str]
      |          source_format: ["%Y-%m-%d %H:%M:%S"]
      |          target_field: ts_iso
      |""".stripMargin

  test("per-stage deltas, counters, render, dump") {
    val s = spark
    import s.implicits._
    val input = (1 to 200).map { i =>
      val ts = if (i % 4 == 0) "junk" else "2024-01-01 10:00:00"
      (s"a=$i", ts)
    }.toDF("message", "ts_str")

    val profiles = Profiler.profile(s, config, input)
    profiles.map(_.processorType) shouldBe
      Seq("dissector", "calculator", "timestamper")
    // cumulative is monotone; each stage saw every row
    profiles.map(_.cumSec) shouldBe sorted
    profiles.foreach(_.processed shouldBe 200L)
    // every 4th timestamp unparseable → timestamper failures
    profiles.find(_.processorType == "timestamper").get.failed shouldBe 50L
    profiles.find(_.processorType == "dissector").get.failed shouldBe 0L

    val table = Profiler.render(profiles)
    table should include("dissector")
    table should include("cum_s")

    val dir = java.nio.file.Files.createTempDirectory("graft-prof").toString
    val path = Profiler.dump(profiles, dir)
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    json should include(""""type":"calculator"""")
    json should include(""""processed":200""")
  }
}
