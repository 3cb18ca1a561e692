package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** http(s):// rule getters through the pluggable transport
  * (reference GetterFactory.from_string, util/getter.py:56-98).
  */
class RuleGetterSpec extends AnyFunSuite {

  test("rulesFromUri loads YAML rules over the http getter") {
    val old = graft.operators.ListSources.fetch
    try {
      graft.operators.ListSources.fetch = {
        case u if u == "https://rules.example/calc.yml" => Some(
          """filter: "a"
            |calculator:
            |  calc: "${a} + 1"
            |  target_field: out
            |---
            |filter: "b"
            |calculator:
            |  calc: "${b} * 2"
            |  target_field: out2
            |""".stripMargin)
        case u => graft.operators.ListSources.defaultFetch(u)
      }
      val rules = RuleLoader.rulesFromUri("https://rules.example/calc.yml", "calculator")
      assert(rules.map(_.filter) == Seq("a", "b"))
      assert(rules.head.config("calc") == "${a} + 1")
    } finally graft.operators.ListSources.fetch = old
  }

  test("rulesFromUri falls back to files and directories") {
    val dir = java.nio.file.Files.createTempDirectory("rules").toFile
    val f = new java.io.File(dir, "r1.json")
    java.nio.file.Files.write(f.toPath,
      """[{"filter": "x", "dropper": {"drop": ["x"]}}]""".getBytes("UTF-8"))
    assert(RuleLoader.rulesFromUri(dir.getPath, "dropper").size == 1)
    assert(RuleLoader.rulesFromUri("file://" + f.getPath, "dropper").size == 1)
  }

  test("unreachable http getter raises") {
    intercept[java.io.IOException] {
      RuleLoader.rulesFromUri("https://unreachable.example/r.yml", "dropper")
    }
  }
}
