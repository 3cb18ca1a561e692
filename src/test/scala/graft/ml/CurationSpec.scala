package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "a b a b c"),       // 2 dup words of 5; bigrams: ab ba ab bc → 1 dup of 4
      (2L, "x x x x"),         // max repetition
      (3L, "unique words only here"),
      (4L, "")                 // empty: all signals 0
    ).toDF("doc_id", "text")
  }

  test("repetition signals match hand-computed fractions") {
    val out = docs.select(col("doc_id"),
        round(Curation.dupWordFrac(col("text")), 6).as("w"),
        round(Curation.dupBigramFrac(col("text")), 6).as("b"),
        round(Curation.topWordFrac(col("text")), 6).as("t"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out(0) == ((1L, 0.4, 0.25, 0.4)))
    assert(out(1) == ((2L, 0.75, 0.666667, 1.0)))
    assert(out(2) == ((3L, 0.0, 0.0, 0.25)))
    assert(out(3) == ((4L, 0.0, 0.0, 0.0)))
  }

  test("hash split is deterministic and respects percentages roughly") {
    val s = spark
    import s.implicits._
    val ids = (0L until 1000L).toDF("id")
    val split = ids.select(Curation.hashSplit(col("id"), 80, 10).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split.keySet == Set("train", "validation", "test"))
    assert(split("train") > 700 && split("train") < 900)
    assert(split("validation") > 50 && split("validation") < 160)
    // rerun → identical assignment (content-addressed, no RNG)
    val again = ids.select(Curation.hashSplit(col("id"), 80, 10).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == split)
  }

  test("stratified sample keeps at most k per stratum, deterministically") {
    val s = spark
    import s.implicits._
    val df = (0L until 300L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "g")
    val sampled = Curation.stratifiedSample(df, Seq("g"), "id", 20)
    val counts = sampled.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 20L, "b" -> 20L))
    val ids1 = sampled.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Curation.stratifiedSample(df, Seq("g"), "id", 20)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("temperature sampling up-samples the tail stratum at alpha < 1") {
    val s = spark
    import s.implicits._
    // head stratum 900 rows, tail 100: proportional keeps them 9:1;
    // alpha = 0.3 pushes the mixture toward the tail
    val df = (0L until 1000L).map(i => (i, if (i < 900) "head" else "tail"))
      .toDF("id", "g")
    val kept = Curation.temperatureSample(df, "id", "g",
        alpha = 0.3, fraction = 0.5)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected shares: p_head = 900^.3/(900^.3+100^.3) ≈ 0.66 → rate
    // 0.5*1000*0.66/900 ≈ 0.37; p_tail ≈ 0.34 → rate ≈ 1.0 (capped).
    // The tail keeps (almost) everything, the head roughly a third.
    assert(kept("tail") > 90, s"tail should be up-sampled: $kept")
    assert(kept("head") < 450 && kept("head") > 250,
      s"head rate should be ~0.37: $kept")
    // deterministic across runs
    val again = Curation.temperatureSample(df, "id", "g", 0.3, 0.5)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
    // alpha = 1 is proportional: every stratum keeps ~fraction
    val prop = Curation.temperatureSample(df, "id", "g", 1.0, 0.5)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(prop("head") - 450) < 60 &&
      math.abs(prop("tail") - 50) < 25, s"alpha=1 should be proportional: $prop")
    // null strata drop
    val withNull = df.union(Seq((2000L, null.asInstanceOf[String])).toDF("id", "g"))
    assert(!Curation.temperatureSample(withNull, "id", "g", 0.3, 0.5)
      .collect().map(_.getLong(0)).contains(2000L))
  }

  test("qualityBudgetSelect: exact ranked prefix cut, crossing row kept") {
    val s = spark
    import s.implicits._
    // (id, score, n_tokens): ranked by score desc → ids 5, 4, 3, 2, 1
    val df = Seq(
      (1L, 0.10, 100L), (2L, 0.30, 40L), (3L, 0.50, 25L),
      (4L, 0.70, 30L), (5L, 0.90, 20L)
    ).toDF("id", "score", "nt")
    def keep(budget: Long) =
      Curation.qualityBudgetSelect(df, "id", "score", col("nt"), budget)
        .collect().map(_.getLong(0)).toSet
    // budget 60: 5 (cum-before 0) + 4 (20) + 3 (50 < 60, CROSSES and is
    // kept) — 2 would start at 75 ≥ 60
    assert(keep(60L) == Set(5L, 4L, 3L))
    // exact fit: 50 keeps 5+4 and the crossing 3 (cum-before 50 = 50 →
    // NOT < 50, dropped)
    assert(keep(50L) == Set(5L, 4L))
    assert(keep(0L) == Set.empty[Long])
    assert(keep(1L) == Set(5L))          // first row always completes
    assert(keep(10000L) == Set(1L, 2L, 3L, 4L, 5L))
    // ties: equal scores order by id asc; with few buckets ties share a
    // band so the cut equals the global-sort semantics
    val tied = Seq((1L, 0.5, 10L), (2L, 0.5, 10L), (3L, 0.5, 10L))
      .toDF("id", "score", "nt")
    val k = Curation.qualityBudgetSelect(tied, "id", "score", col("nt"),
        budget = 15L, buckets = 4)
      .collect().map(_.getLong(0)).toSet
    assert(k == Set(1L, 2L)) // 1 fits, 2 crosses, 3 starts at 20 ≥ 15
    // n_tokens appended, input columns preserved
    val cols = Curation.qualityBudgetSelect(df, "id", "score", col("nt"), 60L)
      .columns.toSeq
    assert(cols == Seq("id", "score", "nt", "n_tokens"))
    intercept[IllegalArgumentException](
      Curation.qualityBudgetSelect(df, "id", "score", col("nt"), -1L))
    // NULL scores are unrankable: they drop BEFORE banding and must not
    // collide with band 0's token total (the null-unboxes-to-0 trap) —
    // a top-score row next to a huge null-score row still survives
    val withNull = Seq(
      (1L, Some(0.95), 20L),                       // best real row
      (2L, None: Option[Double], 1000000L),        // unrankable
      (3L, Some(0.10), 40L)
    ).toDF("id", "score", "nt")
    val kn = Curation.qualityBudgetSelect(withNull, "id", "score",
      col("nt"), budget = 20L).collect().map(_.getLong(0)).toSet
    assert(kn == Set(1L))
  }
}
