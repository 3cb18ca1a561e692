package graft.pipeline

import graft.SparkSpec
import graft.operators.{AmidesModel, DomainResolver, GeoIp, Lookup}
import org.apache.spark.sql.functions._

/** e2e coverage for the pluggable external-enrichment stages: the
  * compiled domain_resolver through enrichPartitionedOpt (injected
  * resolver + per-task LRU), geoip through an mmdb-style provider, and
  * the amides models_path artifact.
  */
class ExternalEnrichSpec extends SparkSpec {

  import java.util.concurrent.atomic.AtomicInteger

  private def pipeline(yaml: String) =
    PipelineCompiler.compile(RuleLoader.fromYaml(yaml))

  test("domain_resolver: injected resolver runs in the mapPartitions path " +
       "and the per-task LRU caches repeats") {
    val calls = ExternalEnrichSpec.resolverCalls
    calls.set(0)
    val saved = DomainResolver.resolve
    try {
      DomainResolver.resolve = { d =>
        ExternalEnrichSpec.resolverCalls.incrementAndGet()
        Some(s"9.9.9.$d".take(12))
      }
      import spark.implicits._
      val df = Seq(
        ("a", "https://www.example.com/x"),
        ("b", "https://www.example.com/y"), // same hostname → cache hit
        ("c", "other.org")).toDF("id", "url").repartition(1)
      val out = pipeline(
        """pipeline:
          |  - type: domain_resolver
          |    rules:
          |      - filter: "url"
          |        domain_resolver:
          |          source_fields: [url]
          |""".stripMargin)(df).main
        .select("id", "resolved_ip").orderBy("id").collect()
      assert(out.length == 3)
      assert(out(0).getString(1) == out(1).getString(1)) // same host, same IP
      assert(out(2).getString(1) != null)
      // 3 rows, 2 distinct hostnames, one partition → exactly 2 resolves
      assert(calls.get() == 2, s"LRU should dedup repeats, got ${calls.get()}")
    } finally DomainResolver.resolve = saved
  }

  test("domain_resolver: default fake matches the oracle fake arithmetic") {
    assert(DomainResolver.fakeResolve("host1.example.com").get
      .matches("""10\.\d{1,3}\.\d{1,3}\.\d{1,3}"""))
  }

  test("geoip_enricher: provider-backed pipeline writes the GeoJSON shape") {
    val saved = GeoIp.provider
    try {
      GeoIp.provider = {
        case "8.8.8.8" => Some(GeoIp.GeoRecord(
          accuracyRadius = Some(10L), longitude = Some(1.5),
          latitude = Some(2.5), country = Some("Testland")))
        case _ => None
      }
      import spark.implicits._
      val df = Seq(("e1", "8.8.8.8"), ("e2", "127.0.0.9")).toDF("id", "ip")
      val out = pipeline(
        """pipeline:
          |  - type: geoip_enricher
          |    rules:
          |      - filter: "ip"
          |        geoip_enricher:
          |          source_fields: [ip]
          |""".stripMargin)(df).main
      val rows = out.orderBy("id").toJSON.collect()
      assert(rows(0).contains(""""type":"Feature""""))
      assert(rows(0).contains(""""coordinates":[1.5,2.5]"""))
      assert(rows(0).contains(""""country":"Testland""""))
      assert(!rows(1).contains("Feature")) // not found → no write
    } finally GeoIp.provider = saved
  }

  test("amides: models_path artifact drives the compiled rule") {
    val dir = java.nio.file.Files.createTempDirectory("amides")
    val artifact = dir.resolve("model.zip").toString
    AmidesModel.write(artifact, AmidesModel.Model(
      weights = Map("evil" -> 3.0), bias = -1.0, threshold = Some(0.5)))
    val loaded = AmidesModel.load(artifact)
    assert(loaded.weights == Map("evil" -> 3.0))
    assert(loaded.bias == -1.0)
    assert(loaded.threshold.contains(0.5))
    import spark.implicits._
    val df = Seq(("d1", "run evil now"), ("d2", "benign text")).toDF("id", "cmd")
    val out = pipeline(
      s"""pipeline:
         |  - type: amides
         |    rules:
         |      - filter: "cmd"
         |        amides:
         |          source_fields: [cmd]
         |          target_field: ml
         |          models_path: "$artifact"
         |""".stripMargin)(df).main
      .select(col("id"), col("ml.detected")).orderBy("id").collect()
    assert(out(0).getBoolean(1))      // sigmoid(3-1) > 0.5
    assert(!out(1).getBoolean(1))     // sigmoid(-1) < 0.5
  }

  test("hasKnownTld: PSL-backed validity") {
    assert(Lookup.hasKnownTld("google.de"))
    assert(Lookup.hasKnownTld("a.co.uk"))
    assert(!Lookup.hasKnownTld("google.thisisnotavalidtld"))
    assert(!Lookup.hasKnownTld(" "))
    assert(!Lookup.hasKnownTld("nodots"))
  }
}

object ExternalEnrichSpec {
  val resolverCalls = new java.util.concurrent.atomic.AtomicInteger(0)
}
