package graft.operators

import java.time.Instant

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.{PipelineCompiler, RuleLoader}

/** pre_detector IP-alert gate, conformance-ported from the reference's
  * tests/unit/processor/pre_detector/test_ip_alerter.py against its own
  * alert_ips.yml fixture shape (IPs + one /8 network, mixed expiries).
  */
class IpAlerterSpec extends SparkSpec {

  // the reference fixture (alert_ips.yml), verbatim shape
  private val fixtureYaml =
    """12.12.12.12: 2027-08-31T16:47+00:00  # A comment
      |13.12.12.12: 2007-08-31T16:47+00:00
      |13.12.12.13:
      |27.0.0.1: 2077-08-31T16:47+00:00
      |127.0.0.1: 2077-08-31T16:47+00:00
      |127.0.0.0/8: 2077-08-31T16:47+00:00
      |""".stripMargin

  private val loadTime = Instant.parse("2026-08-12T00:00:00Z")

  private def listFromYaml(yaml: String, at: Instant = loadTime): IpAlerter.AlertList = {
    val f = java.nio.file.Files.createTempFile("alert_ips", ".yml")
    java.nio.file.Files.write(f, yaml.getBytes("UTF-8"))
    try IpAlerter.load(Seq(f.toString), at)
    finally java.nio.file.Files.delete(f)
  }

  private val list = listFromYaml(fixtureYaml)

  private def hit(ip: String, l: IpAlerter.AlertList = list,
                  asOf: Instant = loadTime): Boolean = {
    val s = spark
    import s.implicits._
    Seq(ip).toDF("ip").select(IpAlerter.ipHit(col("ip"), l, asOf).as("h"))
      .head().getBoolean(0)
  }

  test("load drops entries already expired and splits singles from networks") {
    // 13.12.12.12 expired 2007 → dropped at load
    assert(list.singles.map(_.key).toSet ===
      Set("12.12.12.12", "13.12.12.13", "27.0.0.1", "127.0.0.1"))
    assert(list.networks.map(_.key) === Seq("127.0.0.0/8"))
    assert(list.singles.find(_.key == "13.12.12.13").get.expiry.isEmpty)
  }

  test("multiple files merge with dict-update semantics") {
    val l1 = """13.12.12.12: 2007-08-31T16:47+00:00
               |12.12.12.12: 2027-08-31T16:47+00:00
               |13.12.12.13:
               |127.0.0.1: 2077-08-31T16:47+00:00
               |""".stripMargin
    val l2 = """13.12.12.12: 2007-08-31T16:47+00:00
               |27.0.0.1: 2077-08-31T16:47+00:00
               |127.0.0.0/8: 2077-08-31T16:47+00:00
               |""".stripMargin
    val f1 = java.nio.file.Files.createTempFile("alert1", ".yml")
    val f2 = java.nio.file.Files.createTempFile("alert2", ".yml")
    java.nio.file.Files.write(f1, l1.getBytes("UTF-8"))
    java.nio.file.Files.write(f2, l2.getBytes("UTF-8"))
    val merged = IpAlerter.load(Seq(f1.toString, f2.toString), loadTime)
    assert(merged.singles.map(_.key).toSet ===
      Set("12.12.12.12", "13.12.12.13", "27.0.0.1", "127.0.0.1"))
    assert(merged.networks.map(_.key) === Seq("127.0.0.0/8"))
  }

  test("a list YAML document is rejected (mapping required)") {
    intercept[IllegalArgumentException] {
      IpAlerter.fromYamlText("- 1.2.3.4\n- 5.6.7.8\n")
    }
  }

  test("single IP matches (unexpired)") { assert(hit("12.12.12.12")) }
  test("single IP that is also in a network matches") { assert(hit("127.0.0.1")) }
  test("single IP without time limit matches") { assert(hit("13.12.12.13")) }
  test("network member matches") { assert(hit("127.0.123.1")) }
  test("unlisted single fails") { assert(!hit("227.0.0.1")) }
  test("IP outside the network fails") { assert(!hit("128.0.0.1")) }
  test("non-IP garbage fails") { assert(!hit("not-an-ip")) }
  test("a CIDR string as the event value fails (reference ValueError path)") {
    assert(!hit("222.222.222.0/24"))
  }

  test("single expired AFTER load blocks — no fallthrough to covering network") {
    // reference test_time_single_and_network_exceeded_fails via map
    // mutation: 127.0.0.1 single expires between load and match; the /8
    // network is still live but the single's verdict is final
    val later = Instant.parse("2078-01-01T00:00:00Z")
    val yaml = """127.0.0.1: 2077-08-31T16:47+00:00
                 |127.0.0.0/8: 2099-08-31T16:47+00:00
                 |""".stripMargin
    val l = listFromYaml(yaml)
    assert(!hit("127.0.0.1", l, later))
    assert(hit("127.0.1.1", l, later)) // network itself still live
  }

  test("single expired AT load falls through to covering network") {
    // expired entries are dropped from the map entirely at load
    // (_filter_non_expired_alert_ips), so the network answers
    val yaml = """127.0.0.1: 2007-08-31T16:47+00:00
                 |127.0.0.0/8: 2077-08-31T16:47+00:00
                 |""".stripMargin
    val l = listFromYaml(yaml)
    assert(hit("127.0.0.1", l))
  }

  test("network expired at match time fails") {
    val later = Instant.parse("2078-01-01T00:00:00Z")
    assert(!hit("127.0.1.1", list, later))
  }

  test("IPv6 single and network match") {
    val yaml = """2001:db8::1: 2077-08-31T16:47+00:00
                 |2001:db8:1::/48:
                 |""".stripMargin
    val l = listFromYaml(yaml)
    assert(hit("2001:db8::1", l))
    assert(hit("2001:db8:1::42", l))
    assert(!hit("2001:db9::1", l))
  }

  test("anyFieldHit: scalar fields, array fields, missing fields") {
    val s = spark
    import s.implicits._
    val asOf = loadTime
    def gate(json: String): Boolean = {
      val df = s.read.json(Seq(json).toDS)
      df.select(coalesce(IpAlerter.anyFieldHit(df.schema,
        Seq("ip_field", "ip_field_2"), list, asOf), lit(false)).as("h"))
        .head().getBoolean(0)
    }
    assert(gate("""{"ip_field":"12.12.12.12"}"""))               // scalar hit
    assert(!gate("""{"other":"x"}"""))                           // missing fields
    assert(!gate("""{"ip_field":[]}"""))                         // empty list
    assert(gate("""{"ip_field":["127.0.0.1"]}"""))               // exact in list
    assert(gate("""{"ip_field":["127.0.123.1"]}"""))             // network in list
    assert(!gate("""{"ip_field":["111.111.111.111"]}"""))        // no match
    assert(!gate("""{"ip_field":["13.12.12.12"]}"""))            // expired at load
    assert(gate("""{"ip_field":["127.0.123.1","111.111.111.111"]}""")) // first
    assert(gate("""{"ip_field":["111.111.111.111","127.0.123.1"]}""")) // last
    assert(gate("""{"ip_field":["111.111.111.111","127.0.123.1","13.12.12.12"]}"""))
    assert(gate("""{"ip_field":["127.0.123.1"],"ip_field_2":["111.111.111.111"]}"""))
    assert(gate("""{"ip_field":["111.111.111.111"],"ip_field_2":["127.0.123.1"]}"""))
  }

  test("pipeline end-to-end: ip_fields rule detects only alerted IPs") {
    val s = spark
    import s.implicits._
    val f = java.nio.file.Files.createTempFile("alert_e2e", ".yml")
    java.nio.file.Files.write(f, fixtureYaml.getBytes("UTF-8"))
    val spec = RuleLoader.fromYaml(
      s"""pipeline:
         |  - type: pre_detector
         |    alert_ip_list_path: ${f.toString}
         |    rules:
         |      - filter: "message"
         |        pre_detector:
         |          id: ip-rule
         |          title: alerted ip seen
         |          severity: high
         |          mitre: []
         |        ip_fields: [client_ip]
         |      - filter: "message: admin"
         |        pre_detector:
         |          id: plain-rule
         |          title: no ip gate
         |          severity: low
         |          mitre: []
         |""".stripMargin)
    val input = s.read.json(Seq(
      """{"message":"login ok","client_ip":"12.12.12.12"}""",
      """{"message":"login ok","client_ip":"9.9.9.9"}""",
      """{"message":"admin","client_ip":"9.9.9.9"}""").toDS)
    val res = PipelineCompiler.compile(spec)(input)
    val det = res.extra("pre_detector")
      .select("id", "title").collect().map(r => (r.getString(0), r.getString(1)))
    // ip-rule fires only for the alerted IP; plain-rule (no ip_fields)
    // fires on its filter regardless of IPs
    assert(det.toSet === Set(("ip-rule", "alerted ip seen"),
      ("plain-rule", "no ip gate")))
    // the gated-off event gets NO pre_detection_id link
    val linked = res.main.select(col("client_ip"),
      col("pre_detection_id").isNotNull.as("has_id")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(linked("12.12.12.12"))
    assert(!linked.getOrElse("9.9.9.9", true) ||
      det.exists(_._1 == "plain-rule")) // admin event is linked via plain-rule
    val adminLinked = res.main.filter(col("message") === "admin")
      .select(col("pre_detection_id").isNotNull).head().getBoolean(0)
    assert(adminLinked)
    val unalerted = res.main.filter(col("message") === "login ok" &&
      col("client_ip") === "9.9.9.9")
      .select(col("pre_detection_id").isNotNull).head().getBoolean(0)
    assert(!unalerted)
    java.nio.file.Files.delete(f)
  }
}
