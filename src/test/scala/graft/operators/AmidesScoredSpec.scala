package graft.operators

import graft.SparkSpec
import org.scalatest.matchers.should.Matchers
import org.json4s._
import org.json4s.jackson.JsonMethods

/** amides scored-path conformance: the exported TF-IDF + collapsed-SVC +
  * MinMaxScaler artifact must reproduce the recorded fixture scores
  * exactly (tools/amides_export.py computes them with the reference's
  * math from the reference's own model.zip, sign-pinned against
  * tests/unit/processor/amides/test_amides.py threshold assertions:
  * malicious >= 0.32, benign < 0.32).
  */
class AmidesScoredSpec extends SparkSpec with Matchers {

  private def res(name: String): String =
    getClass.getResource(s"/amides/$name").getPath

  private lazy val model = AmidesScored.load(res("scored_model.json"))

  private lazy val fixtures: Seq[(String, String, Double, Seq[(String, Double)])] = {
    val j = JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(res("scored_fixtures.json"))), "UTF-8"))
    val JArray(items) = j: @unchecked
    items.map { f =>
      val JString(cmd) = (f \ "cmdline"): @unchecked
      val JString(norm) = (f \ "normalized"): @unchecked
      val JDouble(conf) = (f \ "confidence"): @unchecked
      val JArray(attrs) = (f \ "attributions"): @unchecked
      val as = attrs.map { a =>
        val JString(r) = (a \ "rule"): @unchecked
        val JDouble(c) = (a \ "confidence"): @unchecked
        r -> c
      }
      (cmd, norm, conf, as)
    }
  }

  test("artifact shape: misuse vocab + 132 rule models") {
    model.misuse.tokens.size shouldBe 859
    model.rules.size shouldBe 132
  }

  test("normalize matches the reference normalizer on every fixture") {
    fixtures.foreach { case (cmd, norm, _, _) =>
      AmidesScored.normalize(cmd).mkString(",") shouldBe norm
    }
  }

  test("misuse confidence matches every recorded fixture score exactly") {
    fixtures.foreach { case (cmd, _, conf, _) =>
      val got = AmidesScored.detect(model.misuse, AmidesScored.normalize(cmd))
      assert(got == conf, s"cmdline '$cmd': got $got, fixture $conf")
    }
  }

  test("rule attributions match the fixtures (names, scores, order)") {
    fixtures.foreach { case (cmd, _, _, attrs) =>
      val toks = AmidesScored.normalize(cmd)
      val got = model.rules.map { case (n, m) =>
        AmidesScored.Attribution(n, AmidesScored.detect(m, toks))
      }.sortBy(-_.confidence).take(10)
      got.map(a => a.rule -> a.confidence) shouldBe attrs
    }
  }

  test("reference suite pin: malicious >= 0.32 > benign (decision_threshold)") {
    val mal = AmidesScored.detect(model.misuse,
      AmidesScored.normalize("cmd.exe /c taskkill.exe /im cmd.exe"))
    val ben = AmidesScored.detect(model.misuse,
      AmidesScored.normalize("C:\\Windows\\system32\\svchost.exe -k DcomLaunch"))
    mal should be >= 0.32
    ben should be < 0.32
  }

  test("pipeline stage: scored artifact yields {confidence, attributions}") {
    val s = spark
    import s.implicits._
    val input = s.read.json(Seq(
      """{"process":{"command_line":"cmd.exe /c taskkill.exe /im cmd.exe"}}""",
      """{"process":{"command_line":"C:\\Windows\\system32\\svchost.exe -k DcomLaunch"}}""",
      """{"other":1}""").toDS)
    val spec = graft.pipeline.PipelineSpec(Seq(graft.pipeline.StageSpec("amides",
      Seq(graft.pipeline.RuleSpec("process.command_line",
        Map("source_fields" -> Seq("process.command_line"),
          "models_path" -> res("scored_model.json"),
          "decision_threshold" -> 0.32,
          "num_rule_attributions" -> 10))))))
    val out = graft.pipeline.PipelineCompiler.compile(spec)(input)
      .main.select(org.apache.spark.sql.functions.col("process.command_line"),
        org.apache.spark.sql.functions.col("amides"))
      .collect()

    val byCmd = out.filter(!_.isNullAt(0)).map(r =>
      r.getString(0) -> r.getStruct(1)).toMap
    val mal = byCmd("cmd.exe /c taskkill.exe /im cmd.exe")
    mal.getAs[Double]("confidence") shouldBe fixtures.head._3
    mal.getAs[Seq[org.apache.spark.sql.Row]]("attributions") should have size 10
    val ben = byCmd("C:\\Windows\\system32\\svchost.exe -k DcomLaunch")
    ben.getAs[Double]("confidence") should be < 0.32
    ben.getAs[Seq[org.apache.spark.sql.Row]]("attributions") shouldBe null
  }

  test("executor-local cache: duplicate cmdlines hit, results identical") {
    val s = spark
    import s.implicits._
    AmidesScored.clearCache()
    val cmd = "cmd.exe /c taskkill.exe /im cmd.exe"
    val input = s.read.json(Seq.fill(50)(s"""{"cl":${JsonMethods.compact(
      JsonMethods.render(JString(cmd)))}}""").toDS)
    val out = AmidesScored(input, "cl", "amides", model, threshold = 0.32)
      .select(org.apache.spark.sql.functions.col("amides.confidence")).collect()
    out.map(_.getDouble(0)).distinct shouldBe Array(fixtures.head._3)
    // one distinct normalized cmdline → exactly one cache entry
    AmidesScored.cacheSize shouldBe 1
    AmidesScored.clearCache()
  }
}
