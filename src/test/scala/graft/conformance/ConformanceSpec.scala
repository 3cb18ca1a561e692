package graft.conformance

import graft.SparkSpec
import graft.pipeline._
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Reference-conformance sweep: golden (rule, input, expected) triples
  * extracted verbatim from the reference's table-driven processor tests
  * (tests/unit/processor/&#42;/test_&#42;.py, harness base.py:33; extraction:
  * tools/extract_conformance.py) into src/test/resources/conformance/&#42;.json,
  * each run through [[PipelineCompiler]] on a one-row DataFrame built from
  * the input event.
  *
  * Comparison is on the JSON value level with the two static-schema
  * compromises documented in COVERAGE.md:
  *  - null ⇔ absent (Spark's toJSON drops nulls; the reference's MISSING
  *    sentinel becomes null in a static schema) — nulls are stripped from
  *    both sides before comparing;
  *  - whole-valued doubles compare equal to longs (Spark JSON inference
  *    reads every int as LongType; int/float distinctions survive the
  *    DuckDB-oracle gate, not this one).
  *
  * Cases the engine intentionally does not replicate are listed in
  * conformance/waivers.json with a reason; every other failure is a bug.
  */
class ConformanceSpec extends SparkSpec {

  // file-based rule artifacts (generic_adder add_from_file, resolver
  // tables…) are referenced by repo-relative paths in the fixtures
  sys.props("graft.rule.base") = "/root/reference"

  // cases install per-case mocks into the pluggable globals — restore the
  // container defaults so suite ORDER can't leak a mock into other specs
  override def afterAll(): Unit = {
    graft.operators.DomainResolver.resolve =
      graft.operators.DomainResolver.fakeResolve
    graft.operators.GeoIp.provider = _ => None
    graft.operators.Requester.transport = graft.operators.Requester.realTransport
    graft.operators.ListSources.fetch = graft.operators.ListSources.defaultFetch
    super.afterAll()
  }

  private def resource(name: String): Option[String] = {
    val in = getClass.getResourceAsStream(s"/conformance/$name")
    Option(in).map { s =>
      try scala.io.Source.fromInputStream(s, "UTF-8").mkString finally s.close()
    }
  }

  // json4s → Scala, canonical compare form, and diff rendering live in
  // JsonFixture (shared with the acceptance suite)
  import JsonFixture.{plain, canon, show, renderDiff}

  private val waivers: Map[String, String] =
    resource("waivers.json").map { txt =>
      plain(JsonMethods.parse(txt)).asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.toString }
    }.getOrElse(Map.empty)

  private val processors = Seq(
    "calculator", "concatenator", "decoder", "deduplicator", "dissector",
    "field_manager", "generic_adder", "grokker", "ip_informer", "key_checker",
    "list_comparison", "network_comparison", "pre_detector", "pseudonymizer",
    "replacer", "requester", "string_splitter", "timestamp_differ",
    "timestamper",
    // method-style suites (tools/extract_conformance.py shape D)
    "labeler", "clusterer", "template_replacer", "selective_extractor",
    "datetime_extractor", "dropper", "deleter", "generic_resolver",
    "domain_label_extractor", "domain_resolver", "geoip_enricher", "amides")

  private val seen = scala.collection.mutable.Map.empty[String, Int]

  for (proc <- processors; txt <- resource(s"$proc.json")) {
    val cases = JsonMethods.parse(txt).asInstanceOf[JArray].arr
    for (caseJson <- cases) {
      val c = caseJson.asInstanceOf[JObject]
      val base = (c \ "name").asInstanceOf[JString].s
      // reference ids occasionally repeat; suffix repeats for uniqueness
      val n = seen.updateWith(s"$proc/$base")(x => Some(x.getOrElse(0) + 1)).get
      val name = if (n == 1) base else s"$base ($n)"
      val isFailure = (c \ "error") != JNothing
      val key = s"$proc/$name"
      val testName = s"conformance: $key"
      waivers.get(key) match {
        case Some(reason) =>
          ignore(testName + s" [waived: $reason]") {}
        case None if isFailure =>
          // failure cases assert warning tags; covered selectively — the
          // engine tags rather than throws, matching expected-event state
          test(testName) { runCase(proc, c) }
        case None =>
          test(testName) { runCase(proc, c) }
      }
    }
  }

  private def dfFromJson(input: JValue): DataFrame =
    JsonFixture.dfFromJson(spark, input)

  private def runCase(proc: String, c: JObject): Unit = {
    // HTTP comparison lists: the reference mocks every GET with a fixed
    // body in its parametrized suites (test_list_comparison.py:546-552,
    // test_network_comparison.py:486-492), and a 500 for failure cases —
    // mirror that through the pluggable ListSources fetcher
    graft.operators.ListSources.clearCache()
    val isFailureCase = (c \ "error") != JNothing
    graft.operators.ListSources.fetch = { uri =>
      if (uri.startsWith("http")) {
        if (isFailureCase) None
        else proc match {
          case "list_comparison" => Some("# a comment\nFranz\nAlpha\nBeta\n")
          case "network_comparison" => Some("# a comment\n127.0.0.1\n127.0.0.0/24\n")
          case _ => None
        }
      } else graft.operators.ListSources.defaultFetch(uri)
    }
    // requester: the reference suite mocks requests per case (the 4th
    // tuple slot) — mirror through the pluggable transport
    if (proc == "requester") {
      val mock = (c \ "extra") match {
        case o: JObject => plain(o).asInstanceOf[Map[String, Any]]
        case _ => Map.empty[String, Any]
      }
      graft.operators.Requester.transport = { (method, url, _) =>
        val mockUrl = mock.get("url").map(_.toString).getOrElse("")
        val matches = mock.get("method").map(_.toString).contains(method) &&
          (url == mockUrl || url == mockUrl.stripSuffix("/") ||
            url.stripSuffix("/") == mockUrl)
        if (!matches) None
        else {
          val status = mock.get("status").map(_.toString.toInt).getOrElse(200)
          val body = mock.get("json")
            .map(j => JsonMethods.compact(JsonMethods.render(c \ "extra" \ "json")))
            .orElse(mock.get("body").map(_.toString)).getOrElse("")
          Some(graft.operators.Requester.Response(status, body))
        }
      }
    }
    // pre_detector cases pin the detection-timestamp normalization (raw
    // string in, normalized ISO out) — drive it through the TimeOps path
    if (proc == "pre_detector") {
      val cfg = plain(c \ "rule").asInstanceOf[Map[String, Any]]
        .getOrElse(proc, Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
      val fmt = cfg.get("source_format").map(_.toString).getOrElse("ISO8601")
      val raw = (c \ "input").asInstanceOf[JString].s
      val want = (c \ "expected").asInstanceOf[JString].s
      val got = spark.range(1).select(
        graft.operators.TimeOps.isoformatIn(
          graft.operators.TimeOps.parseWithFormat(lit(raw), fmt, "UTC"),
          "UTC").as("ts")).head().getString(0)
      assert(got == want, s"\n  got:      $got\n  expected: $want")
      return
    }
    val ruleMap0 = plain(c \ "rule").asInstanceOf[Map[String, Any]]
    // pseudonymizer: the reference suite supplies processor-level config
    // (hash_salt, regex_mapping) via its test CONFIG, with a per-case
    // regex_mapping override in the 5th tuple slot — inject equivalently
    val ruleMap =
      if (proc != "pseudonymizer") ruleMap0
      else {
        val overridePath = (c \ "error") match {
          case JString(s) if s.endsWith(".yml") => Some(s)
          case _ => (c \ "extra") match {
            case JString(s) if s.endsWith(".yml") => Some(s)
            case _ => None
          }
        }
        val cfg = ruleMap0.getOrElse(proc, Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]] ++
          Map(
            "hash_salt" -> "a_secret_tasty_ingredient",
            "regex_mapping" -> overridePath.getOrElse(
              "tests/testdata/unit/pseudonymizer/regex_mapping.yml"))
        ruleMap0 + (proc -> cfg)
      }
    val inputJson = JsonMethods.compact(JsonMethods.render(c \ "input"))
    val expected = canon(plain(c \ "expected"))

    val extraMap: Map[String, Any] = (c \ "extra") match {
      case o: JObject => plain(o).asInstanceOf[Map[String, Any]]
      case _ => Map.empty
    }
    // domain_resolver: the reference mocks socket.gethostbyname per case
    // (constant answer or no mock at all → real DNS would NXDOMAIN). The
    // PSL TLD check stands in for "would real DNS know this name" on the
    // unmocked negative cases (" ", "google.thisisnotavalidtld").
    if (proc == "domain_resolver") {
      val dns = extraMap.get("dns").map(_.toString)
      graft.operators.DomainResolver.resolve =
        d => dns.filter(_ => graft.operators.Lookup.hasKnownTld(d))
    }
    // geoip_enricher: the suite's ReaderMock answer table
    // (test_geoip_enricher.py:22-84)
    if (proc == "geoip_enricher") {
      import graft.operators.GeoIp
      import GeoIp.GeoRecord
      GeoIp.provider = {
        case "8.8.8.8" => Some(GeoRecord(Some(1337L), Some(1.1), Some(2.2),
          Some("Europe/Berlin"), Some("MyContinent"), Some("MCT"),
          Some("MyCountry"), Some("MCR"), Some("MyCity"), Some("2342"),
          Some("MySubdivision")))
        case "13.21.21.37" => Some(GeoRecord(accuracyRadius = Some(1337L),
          longitude = Some(1.1), latitude = Some(2.2)))
        case "55.55.55.51" => Some(GeoRecord(accuracyRadius = Some(1337L)))
        case "55.55.55.52" => Some(GeoRecord(accuracyRadius = Some(1337L),
          latitude = Some(1.1)))
        case "55.55.55.53" => Some(GeoRecord(accuracyRadius = Some(1337L),
          longitude = Some(2.2)))
        case _ => None
      }
    }

    // per-rule rewrites for method-style suites: labeler parent-label
    // expansion from a fixture schema (rule.add_parent_labels_from_schema,
    // labeler/rule.py:71-81); template_replacer processor-level config
    // (template file + pattern) folded into the rule config
    def rewriteRule(rm: Map[String, Any]): Map[String, Any] = proc match {
      case "labeler" =>
        extraMap.get("schema") match {
          case Some(schema: Map[_, _]) =>
            val sm = schema.asInstanceOf[Map[String, Any]]
            def parentsOf(tree: Map[String, Any], label: String): Seq[String] = {
              def walk(t: Map[String, Any], anc: List[String]): Option[List[String]] = {
                for ((k, v) <- t if k != "description" && k != "category") v match {
                  case sub: Map[_, _] =>
                    val subm = sub.asInstanceOf[Map[String, Any]]
                    val hasDesc = subm.contains("description")
                    if (k == label && hasDesc) return Some(anc)
                    walk(subm, if (hasDesc) anc :+ k else anc) match {
                      case Some(r) => return Some(r)
                      case None => ()
                    }
                  case _ => ()
                }
                None
              }
              walk(tree, Nil).getOrElse(Nil)
            }
            val cfg = rm.getOrElse(proc, Map.empty[String, Any])
              .asInstanceOf[Map[String, Any]]
            val label = cfg.getOrElse("label", Map.empty[String, Any])
              .asInstanceOf[Map[String, Any]].map { case (cat, vals) =>
                val vs = vals.asInstanceOf[Seq[Any]].map(_.toString)
                val catTree = sm.getOrElse(cat, Map.empty[String, Any])
                  .asInstanceOf[Map[String, Any]]
                cat -> (vs ++ vs.flatMap(parentsOf(catTree, _))).distinct
              }
            rm + (proc -> (cfg + ("label" -> label)))
          case _ => rm
        }
      case "template_replacer" =>
        extraMap.get("config") match {
          case Some(cfg: Map[_, _]) =>
            val cm = cfg.asInstanceOf[Map[String, Any]]
            val pattern = cm.getOrElse("pattern", Map.empty[String, Any])
              .asInstanceOf[Map[String, Any]]
            val tr = rm.getOrElse(proc, Map.empty[String, Any])
              .asInstanceOf[Map[String, Any]] ++ Map(
                "template" -> cm.getOrElse("template", ""),
                "fields" -> pattern.getOrElse("fields", Seq.empty[Any]),
                "delimiter" -> pattern.getOrElse("delimiter", "-"),
                "target_field" -> pattern.getOrElse("target_field", "replaced"))
            rm + (proc -> tr)
          case _ => rm
        }
      case "domain_label_extractor" | "clusterer" =>
        // processor-level options carried per case (tagging_field_name,
        // output_field_name) fold into the rule config
        extraMap.get("config") match {
          case Some(cfg: Map[_, _]) =>
            val cm = cfg.asInstanceOf[Map[String, Any]]
              .filter { case (key, _) =>
                key == "tagging_field_name" || key == "output_field_name" }
            if (cm.isEmpty) rm
            else rm + (proc -> (rm.getOrElse(proc, Map.empty[String, Any])
              .asInstanceOf[Map[String, Any]] ++ cm))
          case _ => rm
        }
      case _ => rm
    }

    // tmp_path-written lookup tables (resolve_from_file fixtures): write
    // extra.file_content to a real temp file and point the rule at it
    val tmpFile: Option[String] = extraMap.get("file_content").map { fc =>
      def js(v: Any): String = v match {
        case null => "null"
        case s: String => "\"" + s.flatMap {
          case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
          case ch if ch < ' ' => f"\\u${ch.toInt}%04x"; case ch => ch.toString
        } + "\""
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
          .map { case (k2, x) => js(k2) + ":" + js(x) }.mkString("{", ",", "}")
        case l: Seq[_] => l.map(js).mkString("[", ",", "]")
        case other => other.toString
      }
      val p = java.nio.file.Files.createTempDirectory("conf-ext")
        .resolve("table.json")
      java.nio.file.Files.writeString(p, js(fc))
      p.toString
    }
    def substTmp(v: Any): Any = v match {
      case s: String if s.startsWith("__TMP__") => tmpFile.getOrElse(s)
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        .map { case (k2, x) => k2 -> substTmp(x) }
      case l: Seq[_] => l.map(substTmp)
      case other => other
    }

    // method-style cases can carry the full default-rules set of the
    // reference CONFIG rules dir; a stage applies them in file order
    val ruleMaps: Seq[Map[String, Any]] = ((c \ "rules") match {
      case JArray(rs) =>
        rs.map(r => rewriteRule(plain(r).asInstanceOf[Map[String, Any]]))
      case _ => Seq(rewriteRule(ruleMap))
    }).map(rm => substTmp(rm).asInstanceOf[Map[String, Any]])

    // Schema built directly from the JSON value rather than read.json
    // inference: an explicit null key becomes a NullType column (key
    // present, value null — the engine's Exists treats NullType as
    // present), and empty arrays keep a concrete element type.
    val df = dfFromJson(c \ "input")
    val rules = ruleMaps.map(RuleLoader.parseRule(proc, _))
    val spec = PipelineSpec(Seq(StageSpec(proc, rules)))
    val out: DataFrame = PipelineCompiler.compile(spec)(df).main
    val rows = out.toJSON.collect()
    val gotEvent0 =
      if (rows.isEmpty) Map.empty[String, Any] // event deleted
      else canon(plain(JsonMethods.parse(rows.head)))
    // `_dynamic` carries data-dependent field names (dissect ?/& indirect
    // captures); the JSON boundary hoists its entries to top-level paths
    val gotEvent = gotEvent0 match {
      case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        mm.get("_dynamic") match {
          case Some(dyn: Map[_, _]) =>
            dyn.asInstanceOf[Map[String, Any]].foldLeft(mm - "_dynamic") {
              case (acc, (path, v)) =>
                def setPath(cur: Map[String, Any], segs: List[String]): Map[String, Any] =
                  segs match {
                    case s :: Nil => cur + (s -> v)
                    case s :: rest =>
                      val child = cur.get(s) match {
                        case Some(cm: Map[_, _]) => cm.asInstanceOf[Map[String, Any]]
                        case _ => Map.empty[String, Any]
                      }
                      cur + (s -> setPath(child, rest))
                    case Nil => cur
                  }
                setPath(acc, graft.filter.FilterCompiler.splitPath(path))
            }
          case _ => mm - "_dynamic"
        }
      case other => other
    }
    // path-level asserts from method-style suites (document["a"]["b"],
    // .get chains, `in`/`not in`, `is (not) None`)
    def navigate(root: Any, segs: Seq[Any]): Any =
      segs.foldLeft(root) {
        case (m: Map[_, _], s: String) =>
          m.asInstanceOf[Map[String, Any]].getOrElse(s, null)
        case (l: Seq[_], i: Long) => l.lift(i.toInt).orNull
        case (l: Seq[_], i: Int) => l.lift(i).orNull
        case _ => null
      }
    val expectedPaths = (c \ "expected_paths") match {
      case JArray(ps) => ps.map(p => plain(p).asInstanceOf[Map[String, Any]])
      case _ => Nil
    }
    for (p <- expectedPaths) {
      val segs = p("path").asInstanceOf[Seq[Any]]
      val gotV = navigate(gotEvent, segs)
      val where = segs.mkString(".")
      if (p.get("absent").contains(true))
        assert(gotV == null || gotV == Map.empty,
          s"\n  path $where should be absent, got: ${show(gotV)}")
      else if (p.get("present").contains(true))
        assert(gotV != null && gotV != Map.empty,
          s"\n  path $where should be present")
      else if (p.contains("set")) { // order-insensitive list compare
        val want = canon(p("set")).asInstanceOf[Seq[Any]].toSet
        val gotSet = canon(gotV) match {
          case s: Seq[_] => s.toSet
          case other => Set(other)
        }
        assert(gotSet == want,
          s"\n  path $where (as set):${renderDiff(gotSet, want)}")
      } else {
        val want = canon(p.getOrElse("value", null))
        assert(canon(gotV) == want,
          s"\n  path $where:${renderDiff(canon(gotV), want)}")
      }
    }

    // keys the reference test popped off before its full compare
    val gotForFull = (c \ "ignore") match {
      case JArray(ks) => gotEvent match {
        case m: Map[_, _] =>
          ks.foldLeft(m.asInstanceOf[Map[String, Any]]) {
            case (acc, JString(key)) => acc - key
            case (acc, _) => acc
          }
        case other => other
      }
      case _ => gotEvent
    }

    if ((c \ "expected") == JNothing) return // paths-only case

    // some reference suites assert only the target field's value (e.g.
    // string_splitter): a non-object `expected` compares against the
    // target_field extraction from the output event
    val got = expected match {
      case _: Map[_, _] => gotForFull
      case _ =>
        val cfg = ruleMaps.head.getOrElse(proc, Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]]
        val target = cfg.get("target_field").map(_.toString)
          .orElse(cfg.get("source_fields")
            .map(_.asInstanceOf[Seq[Any]].head.toString))
          .getOrElse("result")
        graft.filter.FilterCompiler.splitPath(target)
          .foldLeft(gotEvent: Any) {
            case (m: Map[_, _], seg) =>
              m.asInstanceOf[Map[String, Any]].getOrElse(seg, null)
            case (_, _) => null
          }
    }
    assert(got == expected, renderDiff(got, expected))
  }
}
