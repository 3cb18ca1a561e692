package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Line-level language mix: the per-paragraph language-ID hygiene check
  * (a bilingual page must flag `mixed`, and the majority vote must not
  * be swayed by unidentified lines).
  */
class LangMixSpec extends SparkSpec {

  private def mix(text: String) = {
    val s = spark
    import s.implicits._
    Seq(Tuple1(text)).toDF("text")
      .select(TextAnalysis.langMix(col("text")).as("m"))
      .select("m.n_lines", "m.n_langs", "m.main_lang", "m.mixed")
      .head()
  }

  test("bilingual page flags mixed; majority wins; und lines don't vote") {
    val r = mix("the cat and the dog is that a thing\n" +
      "the other line of the text\n" +
      "le chat est dans la maison\n" +
      "zzz qqq www") // no markers → und
    assert(r.getInt(0) == 4)
    assert(r.getInt(1) == 2)          // en + fr; und not a language
    assert(r.getString(2) == "en")    // 2 en lines vs 1 fr
    assert(r.getInt(3) == 1)
    // monolingual: not mixed
    val en = mix("the cat and the dog\nis that a thing of the sort")
    assert(en.getInt(1) == 1 && en.getString(2) == "en" && en.getInt(3) == 0)
    // all-und: main_lang und, nothing mixed
    val und = mix("zzz qqq\nwww rrr")
    assert(und.getInt(1) == 0 && und.getString(2) == "und" &&
      und.getInt(3) == 0)
    // empty text: zero lines
    val e = mix("")
    assert(e.getInt(0) == 0 && e.getString(2) == "und")
    // tie: one en line, one fr line → alphabetical-first wins (the
    // langId tie-break order), still mixed
    val tie = mix("the cat and of to\nle la les et est")
    assert(tie.getString(2) == "en" && tie.getInt(3) == 1)
  }
}
