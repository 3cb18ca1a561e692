package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Gopher rule-based quality signals (Rae et al. 2021 §A1.1): each rule
  * exercised by a document constructed to fail exactly that rule, plus a
  * passing document and exact-arithmetic checks on the metric columns.
  */
class GopherQualitySpec extends SparkSpec {

  // 60 words, all alphabetic, mean length in band, stopwords present,
  // three distinct lines, no bullets/ellipses/symbols — passes all rules
  private val goodText = {
    val line = "the quick brown fox jumps over that lazy dog and " +
      "cats have fun with friends near rivers while birds sing softly"
    (0 until 3).map(i => line + s" extra$i").mkString("\n")
  }

  private def signals(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    TextAnalysis.gopherSignals(rows.toDF("doc_id", "text"), "text")
  }

  private def one(text: String): Row =
    signals(Seq((1L, text))).collect().head

  test("passing document satisfies every rule") {
    val r = one(goodText)
    assert(r.getAs[Long]("g_n_words") === 66L)
    assert(r.getAs[Long]("g_stop_hits") >= 2L)
    assert(r.getAs[Double]("g_bullet_frac") === 0.0)
    assert(r.getAs[Double]("g_ellipsis_frac") === 0.0)
    assert(r.getAs[Double]("g_symbol_ratio") === 0.0)
    assert(r.getAs[Double]("g_alpha_frac") > 0.8)
    assert(r.getAs[Double]("g_dup_line_frac") === 0.0)
    assert(r.getAs[Int]("gopher_pass") === 1)
  }

  test("short document fails the word-count bound") {
    val r = one("the cat and dog have fun with it")
    assert(r.getAs[Long]("g_n_words") === 8L)
    assert(r.getAs[Int]("gopher_pass") === 0)
  }

  test("symbol-heavy document fails the symbol-to-word ratio") {
    // one '#' per word → ratio 1.0 > 0.1
    val r = one(goodText.replace(" ", " # "))
    assert(r.getAs[Double]("g_symbol_ratio") > 0.1)
    assert(r.getAs[Int]("gopher_pass") === 0)
  }

  test("bulleted document fails the bullet-line fraction") {
    val r = one(goodText.split("\n").map("• " + _).mkString("\n"))
    assert(r.getAs[Double]("g_bullet_frac") === 1.0)
    assert(r.getAs[Int]("gopher_pass") === 0)
  }

  test("ellipsis-terminated lines fail the ellipsis fraction") {
    val r = one(goodText.split("\n").map(_ + " ...").mkString("\n"))
    assert(r.getAs[Double]("g_ellipsis_frac") === 1.0)
    assert(r.getAs[Int]("gopher_pass") === 0)
  }

  test("numeric document fails the alphabetic-word fraction") {
    val nums = (0 until 60).map(_.toString).mkString(" ")
    val r = one(nums)
    assert(r.getAs[Double]("g_alpha_frac") === 0.0)
    assert(r.getAs[Int]("gopher_pass") === 0)
  }

  test("stopword-free document fails the required-stopword rule") {
    val text = (0 until 60).map(i => s"word$i").mkString(" ")
    val r = one(text)
    assert(r.getAs[Long]("g_stop_hits") === 0L)
    assert(r.getAs[Int]("gopher_pass") === 0)
  }

  test("repeated lines fail the duplicate-line fraction") {
    val line = goodText.split("\n").head
    val r = one(Seq(line, line, line, line).mkString("\n"))
    // 4 lines, 1 distinct → 1 - 1/4 = 0.75
    assert(r.getAs[Double]("g_dup_line_frac") === 0.75)
    assert(r.getAs[Int]("gopher_pass") === 0)
  }

  test("metric arithmetic: mean word length and exact fractions") {
    // 8 whitespace words (the bullet dash "-" is itself a word) of
    // lengths 2,3,1,4,5,5,4,4 → mean 3.5; one of three non-empty lines
    // bulleted; the empty line is dropped
    val r = one("ab abc\n\n- abcd abcde\nplain tail line")
    assert(r.getAs[Double]("g_mean_word_len") ===
      math.rint(((2 + 3 + 1 + 4 + 5 + 5 + 4 + 4) / 8.0) * 1e6) / 1e6)
    assert(r.getAs[Double]("g_bullet_frac") ===
      math.rint((1.0 / 3.0) * 1e6) / 1e6)
  }

  test("empty and whitespace-only documents produce zeroed signals") {
    for (t <- Seq("", "   ", "\n\n")) {
      val r = one(t)
      assert(r.getAs[Long]("g_n_words") === 0L)
      assert(r.getAs[Double]("g_mean_word_len") === 0.0)
      assert(r.getAs[Double]("g_dup_line_frac") === 0.0)
      assert(r.getAs[Int]("gopher_pass") === 0)
    }
  }

  test("signals are a narrow plan: zero exchanges") {
    val plan = signals(Seq((1L, goodText))).queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e }
    assert(exchanges.isEmpty)
  }
}
