package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The pretraining cleanup pass: each hazard it claims to handle gets a
  * direct case — tag strip, control chars, entity order (the
  * `&amp;lt;` double-decode trap), NFC composition through the native
  * kernel, whitespace collapse — plus idempotence (cleaning clean text
  * changes nothing) and the narrow-plan/no-UDF gate.
  */
class TextNormalizeSpec extends SparkSpec {

  private def clean(s: String): String = {
    val sp = spark
    import sp.implicits._
    Seq(s).toDF("t")
      .select(TextAnalysis.normalizeText(col("t")).as("c"))
      .collect().head.getString(0)
  }

  test("strips tags, collapses whitespace, trims") {
    assert(clean("<p class=\"big\">hello <b>world</b></p>") == "hello world")
    assert(clean("  a \t\n  b  ") == "a b")
  }

  test("control characters drop; tab and newline survive as spaces") {
    assert(clean("a\u0007b\u0000c") == "abc")
    assert(clean("a\tb\nc") == "a b c")
  }

  test("entity decode order: &amp; last, so &amp;lt; stays literal") {
    assert(clean("x &lt;3 &gt; &quot;q&quot; &#39;a&#39; &nbsp; y")
      == "x <3 > \"q\" 'a' y")
    assert(clean("&amp;lt;") == "&lt;",
      "&amp;lt; is the LITERAL text '&lt;' — decoding &amp; first would double-decode")
    assert(clean("&amp;&amp;") == "&&")
  }

  test("NFC composes combining sequences via the native kernel") {
    assert(clean("e\u0301") == "\u00e9")
    // already-normalized fast path returns the input unchanged
    assert(clean("caf\u00e9") == "caf\u00e9")
    val direct = {
      val sp = spark
      import sp.implicits._
      Seq("A\u030a").toDF("t")
        .select(TextAnalysis.unicodeNormalize(col("t"), "NFC").as("c"))
        .collect().head.getString(0)
    }
    assert(direct == "\u00c5")
  }

  test("idempotent on clean text; null passes through") {
    val sp = spark
    import sp.implicits._
    val once = clean("plain clean text, nothing to do.")
    assert(once == "plain clean text, nothing to do.")
    assert(clean(once) == once)
    val n = Seq((1, Option.empty[String])).toDF("i", "t")
      .select(TextAnalysis.normalizeText(col("t")).as("c"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("plan is narrow and UDF-free") {
    val sp = spark
    import sp.implicits._
    val plan = Seq("x").toDF("t")
      .select(TextAnalysis.normalizeText(col("t")).as("c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"), plan)
  }

  test("dedupLines keeps the first occurrence of each line, in order") {
    val s = spark
    import s.implicits._
    val out = Seq(
      "a\nb\na\nc\nb",   // repeats dropped, order kept
      "only one line",
      "x\nx\nx",
      ""
    ).toDF("text")
      .select(TextAnalysis.dedupLines(org.apache.spark.sql.functions.col("text")))
      .collect().map(_.getString(0))
    assert(out(0) == "a\nb\nc")
    assert(out(1) == "only one line")
    assert(out(2) == "x")
    assert(out(3) == "")
  }

  test("c4FilterLines keeps terminal-punctuation lines with enough words") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val out = Seq(
      "A real sentence here.\nnav menu\nAnother good one!\nShort.\nIs this kept?\nquoted line \"",
      "no terminal punctuation at all",
      ""
    ).toDF("text")
      .select(TextAnalysis.c4FilterLines(col("text"), minWords = 3))
      .collect().map(_.getString(0))
    // "nav menu" (no punct), "Short." (< 3 words) dropped; the rest kept
    assert(out(0) ==
      "A real sentence here.\nAnother good one!\nIs this kept?\nquoted line \"")
    assert(out(1) == "")
    assert(out(2) == "")
  }

  test("redactCards is span-anchored: a valid card's digits inside a " +
      "longer Luhn-invalid run are NOT touched") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    def redact(t: String): String = Seq(t).toDF("t")
      .select(TextAnalysis.redactCards(col("t")).as("c"))
      .collect().head.getString(0)
    // standalone valid card redacts; bad check digit survives
    assert(redact("pay 4111111111111111 now") == "pay <CARD> now")
    assert(redact("ref 4111111111111112 now") == "ref 4111111111111112 now")
    // the serial 994111111111111111177 CONTAINS the valid card's digit
    // run but is itself one longer Luhn-invalid candidate — a global
    // substring replace would splice <CARD> into the serial's middle
    assert(redact("card 4111111111111111 serial 994111111111111111177")
      == "card <CARD> serial 994111111111111111177")
    // separator-style runs splice at the exact match spans too
    assert(redact("a 4111 1111 1111 1111 b 4111-1111-1111-1111 c")
      == "a <CARD> b <CARD> c")
    // no candidates at all: text unchanged; null stays null
    assert(redact("no digits here") == "no digits here")
    val n = Seq[(Long, Option[String])]((1L, None)).toDF("id", "t")
      .select(TextAnalysis.redactCards(col("t")).as("c")).collect().head
    assert(n.isNullAt(0))
  }
}
