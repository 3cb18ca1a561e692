package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed BPE merge training against hand-computed merges, greedy
  * left-to-right application semantics, sentinel handling, and the
  * tokenizer round-trip (concatenating a word's subwords restores it).
  */
class TokenizeSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    // weighted pair counts, round 1: (l,o) appears in low×3, lower×2,
    // lowest×1 → 6; (e,r) in lower×2, newer×1 → 3; etc.
    Seq(
      (1L, "low low low lower lower lowest"),
      (2L, "new newer widest")
    ).toDF("doc_id", "text")
  }

  test("trainBpeMerges learns the hand-computed merge sequence") {
    val merges = Tokenize.trainBpeMerges(corpus, "text", 3)
    // round 1: lo(6); round 2: low(6); round 3: we(2+1=3 from lowest,
    // widest... ) — recompute: after low merged: lower = low,e,r ×2;
    // lowest = low,e,s,t; pairs: (low,e)=3, (e,r)=3, (n,e)=2, (e,w)=2,
    // (w,i)=1,(i,d)=1,(d,e)=1,(e,s)=2,(s,t)=2 — tie (low,e) vs (e,r)=3:
    // lexicographic lhs asc → "e" < "low" → (e,r) wins
    assert(merges.map(m => (m.lhs, m.rhs, m.cnt)) ==
      Seq(("l", "o", 6L), ("lo", "w", 6L), ("e", "r", 3L)))
  }

  test("driver-local and distributed rounds learn IDENTICAL merges") {
    val s = spark
    import s.implicits._
    // varied corpus incl. ties and repeated substrings; force the
    // distributed path with localThreshold = -1 and compare verbatim
    val df = Seq(
      (1L, "abab abab abc bcd cde abab"),
      (2L, "xyz xyzw wxyz zyx zyx"),
      (3L, "mississippi mississauga missing mission"),
      (4L, "aaa aaaa aa a baaab")
    ).toDF("doc_id", "text")
    val local = Tokenize.trainBpeMerges(df, "text", 12)
    val dist = Tokenize.trainBpeMerges(df, "text", 12, localThreshold = -1L)
    assert(local == dist)
  }

  test("1000 driver-local merge rounds complete in seconds") {
    val s = spark
    import s.implicits._
    // ~1500 distinct 8-char words → thousands of distinct pairs: 1000
    // merge rounds exist. The point of the local path: the distributed
    // loop pays one scheduled Spark job per round (a 32k-merge train
    // would be hours of fixed overhead); local rounds are microseconds.
    val md = java.security.MessageDigest.getInstance("MD5")
    val words = (0 until 1500).map { i =>
      md.digest(s"word$i".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
    }
    val df = Seq(words.mkString(" ")).toDF("text")
    val t0 = System.nanoTime()
    val merges = Tokenize.trainBpeMerges(df, "text", 1000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.size == 1000, s"only ${merges.size} merges learned")
    assert(secs < 30.0, f"local training took $secs%.1f s")
  }

  test("greedy left-to-right merge: aaa + (a,a) gives [aa, a]") {
    val s = spark
    import s.implicits._
    val toks = Seq("aaa aaaa").toDF("text")
      .select(Tokenize.applyMerges(col("text"),
        Seq(Tokenize.Merge("a", "a", 0L))).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("aa", "a", "aa", "aa"))
  }

  test("applyMerges round-trips: concatenated subwords restore each word") {
    val merges = Tokenize.trainBpeMerges(corpus, "text", 4)
    val s = spark
    import s.implicits._
    val rows = corpus.select(col("text"),
        Tokenize.applyMerges(col("text"), merges).as("toks"))
      .collect()
    rows.foreach { r =>
      val words = r.getString(0).split(" ").filter(_.nonEmpty)
      assert(r.getSeq[String](1).mkString == words.mkString)
    }
  }

  test("sentinel words are excluded from training and kept whole") {
    val s = spark
    import s.implicits._
    val df = Seq("ab ab a|b").toDF("text")
    val merges = Tokenize.trainBpeMerges(df, "text", 1)
    assert(merges == Seq(Tokenize.Merge("a", "b", 2L)))
    val toks = df.select(Tokenize.applyMerges(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("ab", "ab", "a|b"))
  }

  test("early stop: fully-merged vocabulary ends training") {
    val s = spark
    import s.implicits._
    val df = Seq("aa aa bb").toDF("text")
    val merges = Tokenize.trainBpeMerges(df, "text", 10)
    // round 1 merges (a,a); round 2 merges (b,b); then no pairs remain
    assert(merges.map(m => (m.lhs, m.rhs)) == Seq(("a", "a"), ("b", "b")))
  }

  test("merge table is the ordered driver-side artifact") {
    val tbl = Tokenize.bpeMergeTable(corpus, "text", 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(tbl.toSeq == Seq((1, "l", "o", 6L), (2, "lo", "w", 6L),
      (3, "e", "r", 3L)))
  }
}
