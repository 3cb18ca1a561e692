package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Corpus-curation stage types driven through the YAML pipeline config —
  * the graft.ml operator families as declarative stages. Batch semantics pin
  * against hand-built corpora; the narrow stages (quality_signals,
  * pii_redact, hash_split, weighted_sample) additionally run over a
  * MemoryStream, and the batch-only stages must REFUSE a streaming input
  * at compile time rather than mis-compute.
  */
class CurationStagesSpec extends SparkSpec {

  private def docs: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web"),
      (2L, "the quick brown fox jumps over the lazy dog", "web"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat today", "books"), // near-dup of 1
      (4L, "completely different content about spark engines", "web"),
      (5L, "spam spam spam spam spam spam spam spam", "web"),
      (6L, "mail me at a.b@example.org from 10.1.2.3", "web"),
      (7L, "xy", "books") // under the shingle size: always kept by near-dup
    ).toDF("doc_id", "text", "source")
  }

  private def run(yaml: String, df: DataFrame): DataFrame =
    PipelineCompiler.compile(RuleLoader.fromYaml(yaml))(df).main

  test("quality_signals stage: adds the signal columns in one projection") {
    val out = run(
      """pipeline:
        |  - type: quality_signals
        |    text_field: text
        |""".stripMargin, docs)
    assert(out.columns.toSeq == Seq("doc_id", "text", "source", "q_lang",
      "q_quality", "q_n_tokens", "q_dup_word_frac", "q_dup_bigram_frac",
      "q_top_word_frac", "q_fingerprint"))
    val r5 = out.filter(col("doc_id") === 5L).head()
    assert(r5.getAs[Double]("q_dup_word_frac") === 0.875)
    assert(r5.getAs[Double]("q_top_word_frac") === 1.0)
    val r1 = out.filter(col("doc_id") === 1L).head()
    assert(r1.getAs[String]("q_lang") == "en")
    assert(r1.getAs[Int]("q_n_tokens") == 9)
    // match the library functions bit-for-bit
    val direct = graft.ml.TextAnalysis.qualityScore(col("text"))
    val exp = docs.filter(col("doc_id") === 1L).select(direct).head().getDouble(0)
    assert(r1.getAs[Double]("q_quality") == exp)
  }

  test("quality_signals stage: signal subset + prefix; unknown signal throws") {
    val out = run(
      """pipeline:
        |  - type: quality_signals
        |    text_field: text
        |    prefix: "sig_"
        |    signals: [lang, n_tokens]
        |""".stripMargin, docs)
    assert(out.columns.toSeq ==
      Seq("doc_id", "text", "source", "sig_lang", "sig_n_tokens"))
    val e = intercept[IllegalArgumentException] {
      run(
        """pipeline:
          |  - type: quality_signals
          |    signals: [nope]
          |""".stripMargin, docs)
    }
    assert(e.getMessage.contains("unknown signals nope"))
  }

  test("quality_signals + deleter: the filter DSL reads the signals") {
    val out = run(
      """pipeline:
        |  - type: quality_signals
        |    text_field: text
        |    signals: [dup_word_frac]
        |  - type: deleter
        |    rules:
        |      - filter: "q_dup_word_frac:[0.5 TO *]"
        |        deleter: {delete: true}
        |""".stripMargin, docs)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 6L, 7L))
  }

  test("pii_redact stage: in-place redaction of listed fields") {
    val out = run(
      """pipeline:
        |  - type: pii_redact
        |    fields: [text]
        |""".stripMargin, docs)
    val r6 = out.filter(col("doc_id") === 6L).head().getAs[String]("text")
    assert(r6 == "mail me at <EMAIL> from <IP>")
    // untouched rows stay byte-identical
    val r1 = out.filter(col("doc_id") === 1L).head().getAs[String]("text")
    assert(r1 == "the quick brown fox jumps over the lazy dog")
  }

  test("hash_split stage: deterministic split column; bad pcts throw") {
    val out = run(
      """pipeline:
        |  - type: hash_split
        |    id_field: doc_id
        |    train_pct: 80
        |    valid_pct: 10
        |""".stripMargin, docs)
    val direct = docs.select(col("doc_id"),
      graft.ml.Curation.hashSplit(col("doc_id"), 80, 10).as("split"))
    assert(out.select("doc_id", "split").except(direct).isEmpty)
    val e = intercept[IllegalArgumentException] {
      run(
        """pipeline:
          |  - type: hash_split
          |    id_field: doc_id
          |    train_pct: 95
          |    valid_pct: 10
          |""".stripMargin, docs)
    }
    assert(e.getMessage.contains("<= 100"))
  }

  test("leakage_safe_split stage: near-dups share a split; batch-only; clash guard") {
    val out = run(
      """pipeline:
        |  - type: leakage_safe_split
        |    id_field: doc_id
        |    text_field: text
        |    train_pct: 80
        |    valid_pct: 10
        |""".stripMargin, docs)
    val rows = out.select("doc_id", "cluster", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 7)
    val byId = rows.map(r => r._1 -> r).toMap
    // docs 1 and 3 are near-dups → same cluster, hence same split; the
    // exact dup 2 rides along
    assert(byId(1L)._2 == byId(3L)._2 && byId(1L)._2 == byId(2L)._2)
    assert(byId(1L)._3 == byId(3L)._3 && byId(1L)._3 == byId(2L)._3)
    // singletons split by their own id = plain hashSplit
    val direct = docs.select(col("doc_id"),
      graft.ml.Curation.hashSplit(col("doc_id"), 80, 10).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Seq(4L, 5L, 6L, 7L).foreach(id => assert(byId(id)._3 == direct(id)))
    // an existing `split`/`cluster` column fails loudly instead of
    // silently overwriting
    val clash = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: leakage_safe_split\n    id_field: doc_id\n" +
        "    text_field: text\n", docs.withColumn("cluster", lit(0L)))
    }
    assert(clash.getMessage.contains("overwrite"))
    // whole-corpus semantics → refuses a streaming input at compile time
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF().toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      PipelineCompiler.compile(RuleLoader.fromYaml(
        """pipeline:
          |  - type: leakage_safe_split
          |    id_field: doc_id
          |    text_field: text
          |""".stripMargin))(streamDf).main
    }
    assert(e.getMessage.contains("streaming"))
  }

  test("quality_signals: opt-in lang_mix signal; default schema unchanged") {
    val dflt = run(
      "pipeline:\n  - type: quality_signals\n    text_field: text\n", docs)
    assert(!dflt.columns.exists(_.contains("lang_mix")))
    val out = run(
      """pipeline:
        |  - type: quality_signals
        |    text_field: text
        |    signals: [lang, lang_mix]
        |""".stripMargin,
      docs.withColumn("text",
        concat(col("text"), lit("\nle la les et est dans"))))
    assert(out.columns.contains("q_lang_mix"))
    val m = out.filter(col("doc_id") === 1L)
      .select("q_lang_mix.n_langs", "q_lang_mix.mixed").head()
    assert(m.getInt(0) == 2 && m.getInt(1) == 1)
  }

  test("pii_redact cards option: Luhn decides, phones still redact after") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "pay 4111 1111 1111 1111 or call +49 151 23456789"),
      (2L, "invoice 4111 1111 1111 1112 listed")  // bad check digit
    ).toDF("doc_id", "text")
    val out = run(
      """pipeline:
        |  - type: pii_redact
        |    fields: [text]
        |    cards: true
        |""".stripMargin, d)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "pay <CARD> or call <PHONE>", out(1L))
    // invalid checksum: NOT a card — the phone pass then matches the
    // digit run (shape-wise it IS phone-like; that's the documented
    // order), so the audit trail is <PHONE>, never <CARD>
    assert(out(2L) == "invoice <PHONE> listed", out(2L))
    // without the option the default output is unchanged (no card pass)
    val dflt = run(
      "pipeline:\n  - type: pii_redact\n    fields: [text]\n", d)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!dflt(1L).contains("<CARD>"))
  }

  test("dedup_media media_kind audio: gain-shifted clips collapse") {
    val s = spark
    import s.implicits._
    def pcm(vals: Array[Short]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + vals.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + vals.length * 2)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(vals.length * 2)
      vals.foreach(bb.putShort)
      bb.array()
    }
    val clip = Array.tabulate(128)(t => if (t < 64) 0 else 1000)
      .map(_.toShort)
    val remaster = clip.map(v => (v * 2).toShort)   // gain ×2: same hash
    val other = Array.tabulate(128)(t => if (t < 64) 1000 else 0)
      .map(_.toShort)
    val media = Seq((1L, pcm(clip)), (2L, pcm(remaster)),
      (3L, pcm(other)), (4L, "noise".getBytes))
      .toDF("doc_id", "payload")
    val out = run(
      """pipeline:
        |  - type: dedup_media
        |    id_field: doc_id
        |    bytes_field: payload
        |    media_kind: audio
        |""".stripMargin, media)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 4L))
    val e = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: dedup_media\n    id_field: doc_id\n" +
        "    bytes_field: payload\n    media_kind: nope\n", media)
    }
    assert(e.getMessage.contains("media_kind"))
    // a clip and its lossless FLAC encoding carry the SAME perceptual
    // fingerprint (FlacCodec path) — cross-FORMAT dedup collapses them
    val clipInts = clip.map(_.toInt)
    val mixed = Seq(
      (1L, pcm(clip)),
      (2L, graft.ml.FlacCodec.encode(clipInts, 8000, 1, 16)),
      (3L, pcm(other))
    ).toDF("doc_id", "payload")
    val kept = run(
      """pipeline:
        |  - type: dedup_media
        |    id_field: doc_id
        |    bytes_field: payload
        |    media_kind: audio
        |""".stripMargin, mixed)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L),
      s"WAV and its FLAC encoding must dedup cross-format, kept $kept")
  }

  test("dedup_against mode media: incoming images drop on reference match") {
    val s = spark
    import s.implicits._
    def png(grid: Array[Array[Int]]): Array[Byte] = {
      val h = grid.length; val w = grid(0).length
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = grid(y)(x); img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val half = png(Array.tabulate(16, 16)((_, x) => if (x < 8) 0 else 200))
    val shifted = png(Array.tabulate(16, 16)((_, x) => if (x < 8) 25 else 225))
    val flipped = png(Array.tabulate(16, 16)((y, _) => if (y < 8) 0 else 200))
    val junk = "not an image".getBytes
    val refDir = java.nio.file.Files.createTempDirectory("media-ref")
      .toString + "/ref.parquet"
    // reference holds the ORIGINAL; incoming offers a brightness-shifted
    // copy (must drop), a different picture and junk (must survive)
    Seq(Tuple1(half)).toDF("payload").write.parquet(refDir)
    val incoming = Seq((1L, shifted), (2L, flipped), (3L, junk))
      .toDF("doc_id", "payload")
    val out = run(
      s"""pipeline:
         |  - type: dedup_against
         |    mode: media
         |    id_field: doc_id
         |    bytes_field: payload
         |    reference: {path: "$refDir", bytes_field: payload}
         |""".stripMargin, incoming)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L))
    assert(out.columns.toSeq == incoming.columns.toSeq)
  }

  test("dedup_against mode media media_kind audio: re-masters of " +
      "reference clips drop") {
    val s = spark
    import s.implicits._
    def wav(vals: Array[Int]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + vals.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + vals.length * 2)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(vals.length * 2)
      vals.foreach(v => bb.putShort(v.toShort))
      bb.array()
    }
    val clip = Array.tabulate(128)(t => if (t < 64) 0 else 1000)
    val other = Array.tabulate(128)(t => if (t < 64) 1000 else 0)
    val refDir = java.nio.file.Files.createTempDirectory("media-aref")
      .toString + "/ref.parquet"
    // reference holds the clip AS FLAC; incoming offers a gain-doubled
    // WAV re-master (cross-format perceptual match — must drop), a
    // different clip and junk (must survive)
    Seq(Tuple1(graft.ml.FlacCodec.encode(clip, 8000, 1, 16)))
      .toDF("payload").write.parquet(refDir)
    val incoming = Seq((1L, wav(clip.map(_ * 2))), (2L, wav(other)),
      (3L, "junk".getBytes)).toDF("doc_id", "payload")
    val out = run(
      s"""pipeline:
         |  - type: dedup_against
         |    mode: media
         |    media_kind: audio
         |    id_field: doc_id
         |    bytes_field: payload
         |    reference: {path: "$refDir", bytes_field: payload}
         |""".stripMargin, incoming)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L))
  }

  test("quality_budget_select stage: ranked cut on an upstream score") {
    val out = run(
      """pipeline:
        |  - type: quality_signals
        |    text_field: text
        |    signals: [quality]
        |  - type: quality_budget_select
        |    id_field: doc_id
        |    score_field: q_quality
        |    budget: 20
        |""".stripMargin, docs)
    assert(out.columns.contains("n_tokens"))
    // replicate: global sort by (q_quality desc, doc_id), keep while
    // strictly-better tokens < 20
    val scored = run(
      """pipeline:
        |  - type: quality_signals
        |    text_field: text
        |    signals: [quality, n_tokens]
        |""".stripMargin, docs)
      .select("doc_id", "q_quality", "q_n_tokens")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2).toLong))
      .sortBy(r => (-r._2, r._1))
    var cum = 0L
    val expect = scored.takeWhile { r =>
      val ok = cum < 20L; cum += r._3; ok
    }.map(_._1).toSet
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == expect)
    // a missing score column points at the upstream stages
    val e = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: quality_budget_select\n" +
        "    id_field: doc_id\n    score_field: nope\n    budget: 5\n", docs)
    }
    assert(e.getMessage.contains("upstream"))
    // budget is required
    val e2 = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: quality_signals\n    text_field: text\n" +
        "    signals: [quality]\n  - type: quality_budget_select\n" +
        "    id_field: doc_id\n    score_field: q_quality\n", docs)
    }
    assert(e2.getMessage.contains("budget"))
  }

  test("dedup_media stage: perceptual image dedup keeps one per component") {
    val s = spark
    import s.implicits._
    def png(grid: Array[Array[Int]]): Array[Byte] = {
      val h = grid.length; val w = grid(0).length
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = grid(y)(x); img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val half = png(Array.tabulate(16, 16)((_, x) => if (x < 8) 0 else 200))
    val shifted = png(Array.tabulate(16, 16)((_, x) => if (x < 8) 30 else 230))
    val flipped = png(Array.tabulate(16, 16)((y, _) => if (y < 8) 0 else 200))
    val junk = "not an image at all".getBytes
    val media = Seq((1L, half), (2L, shifted), (3L, flipped), (4L, junk))
      .toDF("doc_id", "payload")
    val out = run(
      """pipeline:
        |  - type: dedup_media
        |    id_field: doc_id
        |    bytes_field: payload
        |""".stripMargin, media)
    // 1 and 2 hash identically (brightness invariance) → min id 1 kept;
    // 3 is a different picture; 4 is undecodable (null hash, survives)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 4L))
    assert(out.columns.toSeq == media.columns.toSeq) // no leaked columns
    // missing bytes column fails loudly; batch-only on streams
    val e = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: dedup_media\n    id_field: doc_id\n" +
        "    bytes_field: nope\n", media)
    }
    assert(e.getMessage.contains("nope"))
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    val streamDf = mem.toDF().toDF("doc_id", "payload")
    val e2 = intercept[IllegalArgumentException] {
      PipelineCompiler.compile(RuleLoader.fromYaml(
        "pipeline:\n  - type: dedup_media\n    id_field: doc_id\n"))(
        streamDf).main
    }
    assert(e2.getMessage.contains("streaming"))
  }

  test("weighted_sample stage: per-stratum content-addressed rates") {
    val out = run(
      """pipeline:
        |  - type: weighted_sample
        |    id_field: doc_id
        |    strata_field: source
        |    rates: {web: 0.5, books: 1.0}
        |    default_rate: 0.0
        |""".stripMargin, docs)
    val direct = graft.ml.Curation.weightedSample(docs, "doc_id", "source",
      Map("web" -> 0.5, "books" -> 1.0), defaultRate = 0.0)
    assert(out.except(direct).isEmpty && direct.except(out).isEmpty)
    // books stratum at rate 1.0 survives entirely
    assert(out.filter(col("source") === "books").count() == 2)
  }

  test("stratified_sample stage: at most k rows per stratum") {
    val out = run(
      """pipeline:
        |  - type: stratified_sample
        |    id_field: doc_id
        |    strata: [source]
        |    k: 2
        |""".stripMargin, docs)
    val perStratum = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum("web") == 2 && perStratum("books") == 2)
    // deterministic across runs
    val again = run(
      """pipeline:
        |  - type: stratified_sample
        |    id_field: doc_id
        |    strata: [source]
        |    k: 2
        |""".stripMargin, docs)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("dedup_exact stage: keeps the min-id representative per text") {
    val out = run(
      """pipeline:
        |  - type: dedup_exact
        |    id_field: doc_id
        |    text_field: text
        |""".stripMargin, docs)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 3L, 4L, 5L, 6L, 7L)) // doc 2 (dup of 1) dropped
    assert(out.columns.toSeq == docs.columns.toSeq) // schema preserved
  }

  test("dedup_near stage: drops the near-dup cluster, keeps short docs") {
    val out = run(
      """pipeline:
        |  - type: dedup_near
        |    id_field: doc_id
        |    text_field: text
        |    threshold: 0.4
        |""".stripMargin, docs)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // {1,2,3} is one near-dup cluster → keep 1; 7 is under the shingle
    // size and must survive
    assert(ids == Seq(1L, 4L, 5L, 6L, 7L))
    assert(out.columns.toSeq == docs.columns.toSeq)
  }

  test("dedup_fuzzy stage: one-typo copies collapse to the min id, " +
      "schema preserved, streaming refused") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "gamma filter", "en", "src0"),
      (2L, "gamma filter", "en", "src0"),   // exact copy: dist 0
      (3L, "gamma fitler", "en", "src1"),   // transposed typo: dist 2
      (4L, "delta join",   "en", "src0"),
      (5L, "an entirely different title", "en", "src2"))
      .toDF("doc_id", "text", "lang", "source")
    val out = run(
      """pipeline:
        |  - type: dedup_fuzzy
        |    id_field: doc_id
        |    text_field: text
        |    max_dist: 2
        |""".stripMargin, rows)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 4L, 5L))
    assert(out.columns.toSeq == rows.columns.toSeq)
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val e = intercept[IllegalArgumentException] {
      run(
        """pipeline:
          |  - type: dedup_fuzzy
          |    id_field: doc_id
          |    text_field: text
          |""".stripMargin, mem.toDF().toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("dedup_fuzzy"))
  }

  test("dedup_near stage: target_recall sizes (bands, rows_per_band) " +
      "from the S-curve contract; explicit knobs still win (r15)") {
    import graft.ml.Dedup
    // the sizing the stage resolves: threshold 0.8, target 0.9 → (8, 6)
    assert(Dedup.minhashBandsRows(0.8, 0.9) == ((8, 6)))
    def keepIds(yaml: String) =
      run(yaml, docs).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val staged = keepIds(
      """pipeline:
        |  - type: dedup_near
        |    id_field: doc_id
        |    text_field: text
        |    threshold: 0.8
        |    target_recall: 0.9
        |""".stripMargin)
    // must equal the library run at the sized geometry
    val lib = Dedup.nearDupKeep(docs, "doc_id", "text",
        bands = 8, rowsPerBand = 6, k = 3, threshold = 0.8)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(staged == lib, s"stage $staged != library $lib")
    // explicit bands/rows beat the knob
    val explicit = keepIds(
      """pipeline:
        |  - type: dedup_near
        |    id_field: doc_id
        |    text_field: text
        |    threshold: 0.8
        |    target_recall: 0.9
        |    bands: 4
        |    rows_per_band: 3
        |""".stripMargin)
    val libLegacy = Dedup.nearDupKeep(docs, "doc_id", "text",
        bands = 4, rowsPerBand = 3, k = 3, threshold = 0.8)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(explicit == libLegacy, s"explicit $explicit != library $libLegacy")
  }

  test("contamination_filter stage: drops docs overlapping the benchmark") {
    val dir = java.nio.file.Files.createTempDirectory("cur-bench").toString
    val s = spark
    import s.implicits._
    Seq(("the quick brown fox jumps over the lazy dog", "x"))
      .toDF("text", "meta").write.mode("overwrite").parquet(dir)
    val out = run(
      s"""pipeline:
         |  - type: contamination_filter
         |    id_field: doc_id
         |    text_field: text
         |    threshold: 0.5
         |    benchmark: {path: "$dir", text_field: text}
         |""".stripMargin, docs)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // docs 1+2 share every shingle with the benchmark; doc 3 shares 6 of
    // 8 (0.75 ≥ 0.5) → all three dropped; short doc 7 carries no evidence
    assert(ids == Seq(4L, 5L, 6L, 7L))
  }

  test("pack_chunks stage: spans join back onto full rows") {
    val out = run(
      """pipeline:
        |  - type: pack_chunks
        |    id_field: doc_id
        |    text_field: text
        |    ctx_len: 16
        |""".stripMargin, docs)
    assert(out.columns.toSeq == Seq("doc_id", "text", "source", "n_tokens",
      "tok_offset", "first_chunk", "last_chunk", "n_chunks"))
    // offsets are the running sum of token counts in doc_id order
    val rows = out.orderBy("doc_id").collect()
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    val offs = rows.map(_.getAs[Long]("tok_offset"))
    assert(offs.toSeq == toks.scanLeft(0L)(_ + _).init.toSeq)
  }

  test("chunk_spans: a precomputed column NAMED n_tokens is accepted") {
    // tokens_field: n_tokens (the natural precomputed-column name) must
    // not trip the clash check — the stage re-assigns it to its own cast
    val withCounts = docs.withColumn("n_tokens", lit(6L))
    val out = run(
      """pipeline:
        |  - type: chunk_spans
        |    text_field: text
        |    tokens_field: n_tokens
        |    size: 4
        |    overlap: 1
        |""".stripMargin, withCounts)
    // 6 tokens, step 3 → starts 0,3; ends 4,6 — from the PRECOMPUTED count
    val d1 = out.filter(col("doc_id") === 1L).orderBy("chunk_idx").collect()
      .map(r => (r.getAs[Long]("start"), r.getAs[Long]("end")))
    assert(d1.toSeq == Seq((0L, 4L), (3L, 6L)))
    // a clash on a column the stage actually ADDS still fails loudly
    val e = intercept[IllegalArgumentException](run(
      """pipeline:
        |  - type: chunk_spans
        |    text_field: text
        |""".stripMargin, docs.withColumn("chunk_idx", lit(0))))
    assert(e.getMessage.contains("chunk_idx"))
  }

  test("chunk_spans stage: sliding windows carry all columns, stream-safe") {
    val out = run(
      """pipeline:
        |  - type: chunk_spans
        |    text_field: text
        |    size: 4
        |    overlap: 1
        |""".stripMargin, docs)
    assert(out.columns.toSeq == docs.columns.toSeq ++
      Seq("n_tokens", "chunk_idx", "start", "end"))
    // doc 1: 9 tokens, step 3 → starts 0,3,6; ends 4,7,9
    val d1 = out.filter(col("doc_id") === 1L)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getAs[Long]("start"), r.getAs[Long]("end")))
    assert(d1.toSeq == Seq((0L, 4L), (3L, 7L), (6L, 9L)))
    // every chunk keeps the doc's own columns
    assert(out.filter(col("doc_id") === 1L)
      .select("source").distinct().head().getString(0) == "web")
    // runs on a stream (narrow explode, no state)
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "a b c d e"))
    val sOut = PipelineCompiler.compile(RuleLoader.fromYaml(
      """pipeline:
        |  - type: chunk_spans
        |    text_field: text
        |    size: 4
        |    overlap: 1
        |""".stripMargin))(mem.toDF().toDF("doc_id", "text")).main
    assert(sOut.isStreaming)
    val q = sOut.writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("chunk_stream").count() == 2) // starts 0, 3
  }

  test("shuffle_layout stage: content-addressed shard + position") {
    val out = run(
      """pipeline:
        |  - type: shuffle_layout
        |    id_field: doc_id
        |    shards: 3
        |""".stripMargin, docs)
    assert(out.columns.toSeq == docs.columns.toSeq ++ Seq("shard", "pos"))
    val rows = out.select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == 7)
    // positions are 1..n within each shard
    rows.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.length).toSeq)
    }
    // deterministic across runs
    val again = run(
      """pipeline:
        |  - type: shuffle_layout
        |    id_field: doc_id
        |    shards: 3
        |""".stripMargin, docs)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("review regressions: collisions rejected/handled, bad ids rejected") {
    // pack_chunks with a precomputed n_tokens column named n_tokens:
    // no ambiguous duplicate column in the output
    val withTok = docs.withColumn("n_tokens",
      graft.ml.TextAnalysis.tokenCount(col("text")).cast("long"))
    val packed = run(
      """pipeline:
        |  - type: pack_chunks
        |    id_field: doc_id
        |    tokens_field: n_tokens
        |    ctx_len: 16
        |""".stripMargin, withTok)
    assert(packed.columns.count(_ == "n_tokens") == 1)
    packed.select("n_tokens").collect() // would throw on ambiguity
    // chunk_spans after shuffle_layout (which adds `pos`): generator
    // aliases avoid the collision
    val chunked = run(
      """pipeline:
        |  - type: shuffle_layout
        |    id_field: doc_id
        |    shards: 2
        |  - type: chunk_spans
        |    text_field: text
        |    size: 4
        |""".stripMargin, docs)
    assert(chunked.columns.count(_ == "pos") == 1)
    assert(chunked.filter(col("doc_id") === 1L).count() == 3)
    // chunk_spans refuses to overwrite an existing span column
    val e1 = intercept[IllegalArgumentException](run(
      """pipeline:
        |  - type: chunk_spans
        |    text_field: text
        |    size: 4
        |""".stripMargin, docs.withColumn("start", lit(0L))))
    assert(e1.getMessage.contains("overwrite"))
    // pack_chunks on a non-numeric id fails loudly, not with empty output
    val e2 = intercept[IllegalArgumentException](run(
      """pipeline:
        |  - type: pack_chunks
        |    id_field: text
        |""".stripMargin, docs))
    assert(e2.getMessage.contains("numeric"))
  }

  test("dedup_against stage: drops rows duplicating the reference corpus") {
    val dir = java.nio.file.Files.createTempDirectory("cur-ref").toString
    val s = spark
    import s.implicits._
    Seq(("the quick brown fox jumps over the lazy dog", 1),
        ("other reference material entirely", 2))
      .toDF("content", "rid").write.mode("overwrite").parquet(dir)
    val exact = run(
      s"""pipeline:
         |  - type: dedup_against
         |    text_field: text
         |    reference: {path: "$dir", text_field: content}
         |""".stripMargin, docs)
    // docs 1+2 exactly match the reference line; everything else kept
    assert(exact.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 4L, 5L, 6L, 7L))
    val near = run(
      s"""pipeline:
         |  - type: dedup_against
         |    mode: near
         |    id_field: doc_id
         |    text_field: text
         |    threshold: 0.4
         |    reference: {path: "$dir", text_field: content}
         |""".stripMargin, docs)
    // near mode also drops doc 3 (near-dup of the reference line);
    // short doc 7 carries no shingle evidence
    assert(near.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(4L, 5L, 6L, 7L))
  }

  test("dedup_against mode fuzzy: drops rows a typo away from the " +
      "reference; distance and field are config knobs") {
    val dir = java.nio.file.Files.createTempDirectory("cur-fuzzy").toString
    val s = spark
    import s.implicits._
    Seq(("introduction to spark", 1), ("catalog of stories", 2))
      .toDF("title", "rid").write.mode("overwrite").parquet(dir)
    val rows = Seq((1L, "introduction to sparkk"), // 1 edit → drop
      (2L, "introduction to sparkql"),             // 2 edits → drop
      (3L, "introduction to sparkqlx"),            // 3 edits → keep
      (4L, "catalog of stories"),                  // exact (0) → drop
      (5L, "an unrelated entry")).toDF("doc_id", "name")
    val out = run(
      s"""pipeline:
         |  - type: dedup_against
         |    mode: fuzzy
         |    id_field: doc_id
         |    text_field: name
         |    max_dist: 2
         |    reference: {path: "$dir", text_field: title}
         |""".stripMargin, rows)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 5L))
    // max_dist: 3 pulls the three-edit row in too
    val wider = run(
      s"""pipeline:
         |  - type: dedup_against
         |    mode: fuzzy
         |    id_field: doc_id
         |    text_field: name
         |    max_dist: 3
         |    reference: {path: "$dir", text_field: title}
         |""".stripMargin, rows)
    assert(wider.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(5L))
  }

  test("dedup_ingest mode fuzzy releases every cache it creates — the " +
      "stream-lifetime leak guard (one leaked persist per micro-batch " +
      "would accumulate forever)") {
    val s = spark
    import s.implicits._
    graft.CacheSweep.sweep(s)
    val store = java.nio.file.Files
      .createTempDirectory("ingest-fuzzy-leak").toString + "/keys"
    def runBatch(rows: Seq[(Long, String)]): Unit =
      PipelineCompiler.compile(RuleLoader.fromYaml(
        s"""pipeline:
           |  - type: dedup_ingest
           |    mode: fuzzy
           |    id_field: doc_id
           |    text_field: title
           |    store: $store
           |""".stripMargin))(rows.toDF("doc_id", "title")).main.collect()
    // bootstrap batch (no store yet) and a second batch (store legs
    // active): both must leave the CACHE MANAGER exactly as swept —
    // DataFrame persists are held strongly there until an explicit
    // unpersist, so a missed release accumulates forever. (The two
    // localCheckpoint RDDs backing each batch's result are exempt:
    // ContextCleaner reclaims those once the result is unreachable.)
    runBatch(Seq((1L, "introduction to spark"), (2L, "zen")))
    assert(s.sharedState.cacheManager.isEmpty,
      "bootstrap batch leaked cached DataFrames")
    runBatch(Seq((3L, "a new title entirely"), (4L, "zen")))
    assert(s.sharedState.cacheManager.isEmpty,
      "store-leg batch leaked cached DataFrames")
  }

  test("quality_model stage: trained weights score at scan speed") {
    val dim = 8
    val w = graft.ml.Classifier.trainLogReg(
      docs.withColumn("label",
        when(col("doc_id") === 5L, 0.0).otherwise(1.0)),
      "text", "label", dim, iters = 30, lr = 2.0)
    val wfile = java.nio.file.Files.createTempFile("qm", ".json")
    java.nio.file.Files.writeString(wfile,
      w.mkString("[", ",", "]"))
    val out = run(
      s"""pipeline:
         |  - type: quality_model
         |    text_field: text
         |    weights_path: "$wfile"
         |""".stripMargin, docs)
    assert(out.columns.contains("q_model_score"))
    val scores = out.select("doc_id", "q_model_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the spam doc the model was trained against scores lowest
    assert(scores(5L) == scores.values.min)
    // inline weights give identical scores
    val inline = run(
      s"""pipeline:
         |  - type: quality_model
         |    text_field: text
         |    weights: [${w.mkString(", ")}]
         |""".stripMargin, docs)
      .select("doc_id", "q_model_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(inline == scores)
    // scoring plan stays narrow
    val plan = run(
      s"""pipeline:
         |  - type: quality_model
         |    text_field: text
         |    weights: [${w.mkString(", ")}]
         |""".stripMargin, docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("bpe_tokenize stage: trained merges tokenize from YAML") {
    val out = run(
      """pipeline:
        |  - type: bpe_tokenize
        |    text_field: text
        |    merges: [[t, h], [th, e]]
        |""".stripMargin, docs)
    val toks = out.filter(col("doc_id") === 1L)
      .select("bpe_tokens").head().getSeq[String](0)
    assert(toks.take(4) == Seq("the", "q", "u", "i"))
    assert(toks.mkString == "thequickbrownfoxjumpsoverthelazydog")
  }

  test("curation pipeline composes end-to-end: signals → dedup → split") {
    val out = run(
      """pipeline:
        |  - type: quality_signals
        |    text_field: text
        |    signals: [top_word_frac]
        |  - type: deleter
        |    rules:
        |      - filter: "q_top_word_frac:[0.9 TO *]"
        |        deleter: {delete: true}
        |  - type: dedup_exact
        |    id_field: doc_id
        |    text_field: text
        |  - type: dedup_near
        |    id_field: doc_id
        |    text_field: text
        |    threshold: 0.4
        |  - type: hash_split
        |    id_field: doc_id
        |""".stripMargin, docs)
    val got = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 5 (spam) and 7 ("xy", a single word) have top_word_frac 1.0 and are
    // deleted by the quality filter; 2 exact-dup'd; 3 near-dup'd
    assert(got.keySet == Set(1L, 4L, 6L))
    val expSplit = docs.select(col("doc_id"),
        graft.ml.Curation.hashSplit(col("doc_id"), 80, 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.forall { case (id, sp) => expSplit(id) == sp })
  }

  test("narrow curation stages run on a stream; batch-only ones refuse") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    mem.addData((1L, "the quick brown fox at a.b@example.org", "web"),
      (2L, "spam spam spam spam", "web"))
    val streamDf = mem.toDF().toDF("doc_id", "text", "source")
    val yaml =
      """pipeline:
        |  - type: quality_signals
        |    text_field: text
        |    signals: [top_word_frac, n_tokens]
        |  - type: pii_redact
        |    fields: [text]
        |  - type: hash_split
        |    id_field: doc_id
        |  - type: weighted_sample
        |    id_field: doc_id
        |    strata_field: source
        |    default_rate: 1.0
        |""".stripMargin
    val out = PipelineCompiler.compile(RuleLoader.fromYaml(yaml))(streamDf).main
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("cur_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("cur_stream").orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("text")
      == "the quick brown fox at <EMAIL>")
    assert(rows(0).getAs[String]("split").nonEmpty)
    // batch-only stages refuse the stream AT COMPILE TIME
    val e = intercept[IllegalArgumentException] {
      PipelineCompiler.compile(RuleLoader.fromYaml(
        """pipeline:
          |  - type: dedup_exact
          |    id_field: doc_id
          |    text_field: text
          |""".stripMargin))(streamDf).main
    }
    assert(e.getMessage.contains("dedup_events"))
  }

  test("quality_gopher stage: signals appended; drop_failing filters; stream-safe") {
    val out = run(
      """pipeline:
        |  - type: quality_gopher
        |    text_field: text
        |""".stripMargin, docs)
    assert(out.columns.contains("gopher_pass"))
    assert(out.count() === 7)
    // every hand-corpus doc is under the 50-word bound → all fail
    assert(out.filter(col("gopher_pass") === 1).count() === 0)
    val dropped = run(
      """pipeline:
        |  - type: quality_gopher
        |    text_field: text
        |    drop_failing: true
        |""".stripMargin, docs)
    assert(dropped.count() === 0)
    // stream-safe: narrow projection compiles on a streaming frame
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val streamed = PipelineCompiler.compile(RuleLoader.fromYaml(
      """pipeline:
        |  - type: quality_gopher
        |    text_field: text
        |""".stripMargin))(mem.toDF().toDF("doc_id", "text")).main
    assert(streamed.isStreaming)
    // column clash rejected
    val e = intercept[IllegalArgumentException] {
      run("""pipeline:
            |  - type: quality_gopher
            |    text_field: text
            |""".stripMargin, docs.withColumn("gopher_pass", lit(1)))
    }
    assert(e.getMessage.contains("gopher_pass"))
  }

  test("perplexity_score stage: LM columns joined back; min_logprob filters; batch-only") {
    val out = run(
      """pipeline:
        |  - type: perplexity_score
        |    id_field: doc_id
        |    text_field: text
        |""".stripMargin, docs)
    assert(out.count() === 7)
    assert(out.columns.contains("lm_logprob") &&
      out.columns.contains("lm_n_bigrams"))
    // matches the library function bit-for-bit
    val direct = graft.ml.CorpusStats.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logprob")).toMap
    out.collect().foreach { r =>
      assert(r.getAs[Double]("lm_logprob") === direct(r.getAs[Long]("doc_id")))
    }
    // min_logprob keeps exactly the rows at or above the threshold
    val m = out.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("lm_logprob")).toMap
    val thr = m.values.toSeq.sorted.apply(m.size / 2)
    val filtered = run(
      s"""pipeline:
         |  - type: perplexity_score
         |    id_field: doc_id
         |    text_field: text
         |    min_logprob: $thr
         |""".stripMargin, docs)
    val keptIds = filtered.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(keptIds === m.filter(_._2 >= thr).keySet)
    assert(keptIds.size < 7)
    // whole-corpus semantics refuse a stream at compile time
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    intercept[IllegalArgumentException] {
      PipelineCompiler.compile(RuleLoader.fromYaml(
        """pipeline:
          |  - type: perplexity_score
          |    id_field: doc_id
          |    text_field: text
          |""".stripMargin))(mem.toDF().toDF("doc_id", "text")).main
    }
  }

  test("perplexity_score stage: min_logprob_quantile gates at an observed score") {
    val scored = run(
      """pipeline:
        |  - type: perplexity_score
        |    id_field: doc_id
        |    text_field: text
        |""".stripMargin, docs)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("lm_logprob")).toMap
    // percentile_disc(q): the smallest observed score with cume_dist >= q
    val sorted = scored.values.toSeq.sorted
    val q = 0.4
    val thr = sorted(math.max(0, math.ceil(q * sorted.size).toInt - 1))
    val out = run(
      """pipeline:
        |  - type: perplexity_score
        |    id_field: doc_id
        |    text_field: text
        |    min_logprob_quantile: 0.4
        |""".stripMargin, docs)
    val kept = out.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept === scored.filter(_._2 >= thr).keySet)
    assert(kept.size < scored.size && kept.nonEmpty)
    // the threshold is an actual observed value — scale the corpus and
    // the kept FRACTION is stable (the property the absolute gate lacks)
    val doubled = docs.union(docs.withColumn("doc_id", col("doc_id") + 100))
    val kept2 = run(
      """pipeline:
        |  - type: perplexity_score
        |    id_field: doc_id
        |    text_field: text
        |    min_logprob_quantile: 0.4
        |""".stripMargin, doubled).count()
    assert(kept2 === 2 * kept.size)
    // out-of-range quantile rejected
    val e = intercept[IllegalArgumentException] {
      run("""pipeline:
            |  - type: perplexity_score
            |    id_field: doc_id
            |    text_field: text
            |    min_logprob_quantile: 1.5
            |""".stripMargin, docs)
    }
    assert(e.getMessage.contains("min_logprob_quantile"))
  }

  test("perplexity_score stage: quantile_buckets labels head/middle/tail") {
    val scored = run(
      """pipeline:
        |  - type: perplexity_score
        |    id_field: doc_id
        |    text_field: text
        |""".stripMargin, docs)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("lm_logprob")).toMap
    val sorted = scored.values.toSeq.sorted
    def disc(q: Double) =
      sorted(math.max(0, math.ceil(q * sorted.size).toInt - 1))
    val (t1, t2) = (disc(0.33), disc(0.67))
    val out = run(
      """pipeline:
        |  - type: perplexity_score
        |    id_field: doc_id
        |    text_field: text
        |    quantile_buckets: [0.33, 0.67]
        |""".stripMargin, docs)
    // labeling, not gating: every row survives, each carries its bucket
    val got = out.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("lm_bucket")).toMap
    assert(got.keySet == scored.keySet)
    for ((id, s) <- scored) {
      val expected = (if (s >= t1) 1 else 0) + (if (s >= t2) 1 else 0)
      assert(got(id) == expected, s"doc $id score $s: ${got(id)} != $expected")
    }
    assert(got.values.toSet == Set(0, 1, 2), s"all three buckets populated: $got")
    // composes with a gate: the gate filters, labels stay
    val gated = run(
      """pipeline:
        |  - type: perplexity_score
        |    id_field: doc_id
        |    text_field: text
        |    quantile_buckets: [0.33, 0.67]
        |    min_logprob_quantile: 0.33
        |""".stripMargin, docs)
    val gatedRows = gated.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("lm_bucket")).toMap
    assert(gatedRows.keySet == scored.filter(_._2 >= t1).keySet)
    assert(gatedRows.values.forall(_ >= 1))
    // malformed buckets rejected: descending order
    val e = intercept[IllegalArgumentException] {
      run("""pipeline:
            |  - type: perplexity_score
            |    id_field: doc_id
            |    text_field: text
            |    quantile_buckets: [0.67, 0.33]
            |""".stripMargin, docs)
    }
    assert(e.getMessage.contains("quantile_buckets"))
  }

  test("perplexity_score stage: conflicting gates fail loudly; quantile " +
      "path shares one LM execution") {
    // both gates at once: a config mistake, not a silent precedence rule
    val e = intercept[IllegalArgumentException] {
      run("""pipeline:
            |  - type: perplexity_score
            |    id_field: doc_id
            |    text_field: text
            |    min_logprob: -3.0
            |    min_logprob_quantile: 0.4
            |""".stripMargin, docs)
    }
    assert(e.getMessage.contains("mutually exclusive"), e.getMessage)
    // the quantile branch lazy-persists the SCORED table before the
    // threshold action, so the returned plan substitutes the cached
    // relation instead of re-executing the LM subtree (vocabulary
    // aggregates + prob-table joins) a second time: the executed plan
    // reads TWO caches (stage input + scores) and carries none of the
    // LM's aggregate machinery inline
    val out = run(
      """pipeline:
        |  - type: perplexity_score
        |    id_field: doc_id
        |    text_field: text
        |    min_logprob_quantile: 0.4
        |""".stripMargin, docs)
    val plan = out.queryExecution.executedPlan.toString
    val scans = "InMemoryTableScan".r.findAllIn(plan).size
    assert(scans >= 2, s"expected the input AND scores caches in-plan:\n$plan")
  }

  test("materialize: the training stages spill the composed input to " +
      "parquet instead of executor cache, results identical") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-materialize").toString
    // perplexity_score: same scores either way; the materialized plan
    // reads the parquet snapshot (no InMemoryTableScan of the input)
    val cached = run(
      """pipeline:
        |  - type: perplexity_score
        |    id_field: doc_id
        |    text_field: text
        |""".stripMargin, docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("lm_logprob")).toMap
    val mat = run(
      s"""pipeline:
         |  - type: perplexity_score
         |    id_field: doc_id
         |    text_field: text
         |    materialize: $dir/lm_input
         |""".stripMargin, docs)
    val matScores = mat.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Double]("lm_logprob")).toMap
    assert(matScores === cached)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "lm_input")), "snapshot written")
    // dsir_sample fraction form: the count comes off the snapshot too
    val kept = run(
      s"""pipeline:
         |  - type: dsir_sample
         |    id_field: doc_id
         |    text_field: text
         |    fraction: 0.5
         |    target_filter: "source:books"
         |    materialize: $dir/dsir_input
         |""".stripMargin, docs)
    assert(kept.count() === 4) // ceil(0.5*7), same as the cached form
  }

  test("dsir_sample stage: fraction form keeps ceil(fraction*n) rows") {
    val out = run(
      """pipeline:
        |  - type: dsir_sample
        |    id_field: doc_id
        |    text_field: text
        |    fraction: 0.5
        |    target_filter: "source:books"
        |""".stripMargin, docs)
    // 7 docs -> ceil(0.5*7) = 4
    assert(out.count() === 4)
    // identical to the k form at the same size (same gumbel keys)
    val byK = run(
      """pipeline:
        |  - type: dsir_sample
        |    id_field: doc_id
        |    text_field: text
        |    k: 4
        |    target_filter: "source:books"
        |""".stripMargin, docs)
    assert(out.collect().map(_.getAs[Long]("doc_id")).toSet ===
      byK.collect().map(_.getAs[Long]("doc_id")).toSet)
    val e = intercept[IllegalArgumentException] {
      run("""pipeline:
            |  - type: dsir_sample
            |    id_field: doc_id
            |    text_field: text
            |    fraction: 0.0
            |    target_filter: "source:books"
            |""".stripMargin, docs)
    }
    assert(e.getMessage.contains("fraction"))
  }

  test("dsir_sample stage: target_filter exemplars, top-k keep; k required") {
    // target = the 'books' rows; web docs sharing their vocabulary rank up
    val out = run(
      """pipeline:
        |  - type: dsir_sample
        |    id_field: doc_id
        |    text_field: text
        |    k: 3
        |    target_filter: "source:books"
        |""".stripMargin, docs)
    val kept = out.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept.size === 3)
    // all original columns survive the left_semi keep
    assert(out.columns.toSeq === Seq("doc_id", "text", "source"))
    val e = intercept[IllegalArgumentException] {
      run("""pipeline:
            |  - type: dsir_sample
            |    id_field: doc_id
            |    text_field: text
            |    target_filter: "source:books"
            |""".stripMargin, docs)
    }
    assert(e.getMessage.contains("`k`"))
  }

  test("decontaminate stage: spans cut against a benchmark side table") {
    val s = spark
    import s.implicits._
    val benchDir = java.nio.file.Files
      .createTempDirectory("graft-decontam").toString
    Seq((100L, "p q r s t u")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(benchDir)
    val corpus = Seq(
      (1L, "a b p q r s t u c d"),
      (2L, "keep   this    exact spacing")).toDF("doc_id", "text")
    val out = run(
      s"""pipeline:
         |  - type: decontaminate
         |    id_field: doc_id
         |    text_field: text
         |    min_tokens: 4
         |    benchmark:
         |      path: "$benchDir"
         |      text_field: text
         |""".stripMargin, corpus)
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) === "a b c d")
    assert(m(2L) === "keep   this    exact spacing")
  }

  test("token_budget_sample stage: rates from token totals, content-addressed keeps") {
    // hand-countable corpus: web docs total 38 tokens (9+9+6+8+6),
    // books 11. budget web=19 → rate exactly 0.5 (cut 5000 of 10000);
    // books default-huge → rate 1.0, everything kept
    val out = run(
      """pipeline:
        |  - type: token_budget_sample
        |    id_field: doc_id
        |    strata_field: source
        |    budgets: {web: 19}
        |""".stripMargin, docs)
    val rows = out.select("doc_id", "source", "n_tokens", "mix_rate")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    val books = rows.filter(_._2 == "books")
    assert(books.map(_._1).sorted.toSeq == Seq(3L, 7L),
      s"books inside budget must keep everything: ${rows.toSeq}")
    assert(books.forall(_._4 == 1.0))
    val web = rows.filter(_._2 == "web")
    assert(web.forall(_._4 == 0.5), s"web rate must be 19/38: ${web.toSeq}")
    // keeps are EXACTLY the hashBucket convention — no RNG
    val expectedWeb = docs.filter(col("source") === "web")
      .filter(graft.ml.Curation.hashBucket(col("doc_id"), 10000) < 5000)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(web.map(_._1).sorted.toSeq == expectedWeb)
    // n_tokens audit column matches tokenCount
    assert(rows.find(_._1 == 3L).get._3 == 10)
    // whole-corpus semantics: refuses a stream at compile time
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val e = intercept[IllegalArgumentException] {
      PipelineCompiler.compile(RuleLoader.fromYaml(
        """pipeline:
          |  - type: token_budget_sample
          |    id_field: doc_id
          |    strata_field: source
          |""".stripMargin))(mem.toDF().toDF("doc_id", "text", "source")).main
    }
    assert(e.getMessage.contains("token_budget_sample"))
  }

  test("media_envelope stage: typed feature structs from binary payloads") {
    val s = spark
    import s.implicits._
    // a real 44-byte WAV header (the MultimodalSpec golden layout) and
    // a payload no parser recognizes
    val wav = {
      val bb = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(16000).putInt(16000 * 2)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(0)
      bb.array()
    }
    val df = Seq((1L, wav), (2L, "junk".getBytes("US-ASCII")))
      .toDF("doc_id", "payload")
    val out = run(
      """pipeline:
        |  - type: media_envelope
        |    bytes_field: payload
        |    kind: audio
        |""".stripMargin, df)
    val rows = out.orderBy("doc_id")
      .select(col("doc_id"), col("audio_features.format"),
        col("audio_features.sample_rate")).collect()
    assert(rows(0).getString(1) == "wav" && rows(0).getInt(2) == 16000)
    assert(rows(1).isNullAt(1), "unrecognized payload must yield null")
    // stream-safe: the stage is narrow and runs inside a stream
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    mem.addData((1L, wav))
    val streamOut = PipelineCompiler.compile(RuleLoader.fromYaml(
      """pipeline:
        |  - type: media_envelope
        |    bytes_field: payload
        |    kind: audio
        |""".stripMargin))(mem.toDF().toDF("doc_id", "payload")).main
    assert(streamOut.isStreaming)
    val q = streamOut.writeStream.format("memory").queryName("media_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("media_stream")
      .select(col("audio_features.sample_rate")).head().getInt(0) == 16000)
    // misconfiguration fails loudly at compile time
    val e1 = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: media_envelope\n    bytes_field: nope\n", df)
    }
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: media_envelope\n    bytes_field: payload\n" +
        "    kind: hologram\n", df)
    }
    assert(e2.getMessage.contains("hologram"))
  }

  test("dedup_paragraph stage: cross-doc boilerplate removed, audit columns") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val paraDocs = Seq(
      (1L, "subscribe now\n\nreal article one"),
      (2L, "subscribe now\n\nreal article two"),
      (3L, "standalone text")).toDF("doc_id", "text")
    val out = run(
      """pipeline:
        |  - type: dedup_paragraph
        |    id_field: doc_id
        |    text_field: text
        |""".stripMargin, paraDocs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "real article one", 2L, 1L),
      (2L, "real article two", 2L, 1L),
      (3L, "standalone text", 1L, 0L)))
    // audit-column clash fails loudly
    val e = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: dedup_paragraph\n    id_field: doc_id\n",
        paraDocs.withColumn("n_paras", lit(0)))
    }
    assert(e.getMessage.contains("n_paras"))
    // whole-corpus semantics: refuses a stream at compile time
    val mem = MemoryStream[(Long, String)]
    val eStream = intercept[IllegalArgumentException] {
      PipelineCompiler.compile(RuleLoader.fromYaml(
        "pipeline:\n  - type: dedup_paragraph\n    id_field: doc_id\n"))(
        mem.toDF().toDF("doc_id", "text")).main
    }
    assert(eStream.getMessage.contains("dedup_paragraph"))
  }

  test("bm25_topk stage: retrieval result set from a queries side table") {
    val s = spark
    import s.implicits._
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-bm25-q").toString
    Seq((100L, "spark engines")).toDF("qid", "qtext")
      .write.mode("overwrite").parquet(qDir)
    val out = run(
      s"""pipeline:
         |  - type: bm25_topk
         |    id_field: doc_id
         |    text_field: text
         |    k: 3
         |    queries:
         |      path: "$qDir"
         |""".stripMargin, docs)
      .orderBy("rank").collect()
    // only doc 4 contains either query term; schema is the result set
    assert(out.map(_.getLong(2)).toSeq == Seq(4L))
    assert(out.head.getLong(0) == 100L && out.head.getLong(1) == 1L)
    // missing queries config fails loudly
    val e = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: bm25_topk\n    id_field: doc_id\n", docs)
    }
    assert(e.getMessage.contains("queries"))
  }

  test("hybrid_topk stage: RRF fusion of the BM25 and cosine channels, " +
      "identical to the library call; self-named queries are safe") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "spark shuffle exchange partitions", Seq(0.0f, 1.0f)),
      (2L, "completely unrelated words here", Seq(1.0f, 0.02f)),
      (3L, "spark shuffle tuning notes", Seq(1.0f, 0.01f)),
      (4L, "nothing in common at all", Seq(0.0f, -1.0f)))
      .toDF("doc_id", "text", "embedding")
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-hybrid-q").toString
    // the query table deliberately REUSES the corpus column names —
    // the ann_topk self-query regression shape
    corpus.filter(col("doc_id") === 3L)
      .select(col("doc_id"), lit("spark shuffle").as("text"),
        col("embedding"))
      .write.mode("overwrite").parquet(qDir)
    val out = run(
      s"""pipeline:
         |  - type: hybrid_topk
         |    id_field: doc_id
         |    text_field: text
         |    vec_field: embedding
         |    k: 4
         |    queries:
         |      path: "$qDir"
         |      qid_field: doc_id
         |      qtext_field: text
         |      qvec_field: embedding
         |""".stripMargin, corpus)
    val lib = graft.ml.Similarity.hybridTopK(corpus, "doc_id", "text",
      "embedding",
      corpus.filter(col("doc_id") === 3L)
        .select(col("doc_id").as("qid"), lit("spark shuffle").as("qtext"),
          col("embedding").as("qvec")),
      "qid", "qtext", "qvec", k = 4)
    assert(out.orderBy("rank").collect().toSeq ==
      lib.orderBy("rank").collect().toSeq)
    // the two-channel doc (3: lexical + semantic) fuses to rank 1
    assert(out.filter(col("rank") === 1).head().getLong(2) == 3L)
    // missing queries config fails loudly
    val e = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: hybrid_topk\n    id_field: doc_id\n",
        corpus)
    }
    assert(e.getMessage.contains("queries"))
  }

  test("bm25_topk stage: `index:` serves the result set from a written " +
      "LexIndex, identical to the full-scan stage; dead knobs refuse") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "spark shuffle exchange partitions"),
      (2L, "completely unrelated words here"),
      (3L, "spark shuffle tuning notes"),
      (4L, "nothing in common at all")).toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft-bm25-idx").toString
    val qDir = s"$root/queries"
    Seq((100L, "spark shuffle"), (200L, "zzz"))
      .toDF("qid", "qtext").write.mode("overwrite").parquet(qDir)
    val ipath = s"$root/idx"
    graft.ml.LexIndex.write(corpus, "doc_id", "text", ipath, buckets = 4)
    val scan = run(
      s"""pipeline:
         |  - type: bm25_topk
         |    id_field: doc_id
         |    text_field: text
         |    k: 3
         |    queries:
         |      path: "$qDir"
         |""".stripMargin, corpus).orderBy("qid", "rank")
      .collect().toSeq
    val served = run(
      s"""pipeline:
         |  - type: bm25_topk
         |    k: 3
         |    index:
         |      path: "$ipath"
         |    queries:
         |      path: "$qDir"
         |""".stripMargin, corpus.limit(0)) // piped input unused
      .orderBy("qid", "rank").collect().toSeq
    assert(served == scan,
      s"index-served stage diverged:\n$served\nvs\n$scan")
    // corpus-column knobs alongside `index:` are dead config — refuse
    val e = intercept[IllegalArgumentException] {
      run(
        s"""pipeline:
           |  - type: bm25_topk
           |    id_field: doc_id
           |    index:
           |      path: "$ipath"
           |    queries:
           |      path: "$qDir"
           |""".stripMargin, corpus)
    }
    assert(e.getMessage.contains("id_field"))
  }

  test("hybrid_topk stage: `lex_index:` serves the lexical channel " +
      "from a written LexIndex — identical fused output, with either " +
      "semantic leg") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "spark shuffle exchange partitions", Seq(0.0f, 1.0f)),
      (2L, "completely unrelated words here", Seq(1.0f, 0.02f)),
      (3L, "spark shuffle tuning notes", Seq(1.0f, 0.01f)),
      (4L, "nothing in common at all", Seq(0.0f, -1.0f)))
      .toDF("doc_id", "text", "embedding")
    val root = java.nio.file.Files
      .createTempDirectory("graft-hylex").toString
    val qDir = s"$root/queries"
    Seq((100L, "spark shuffle", Seq(1.0f, 0.0f)))
      .toDF("qid", "qtext", "qvec")
      .write.mode("overwrite").parquet(qDir)
    val lexPath = s"$root/lex"
    graft.ml.LexIndex.write(corpus, "doc_id", "text", lexPath,
      buckets = 4)
    val annPath = s"$root/ann"
    val centroids = graft.ml.Similarity.kmeansCentroids(
      corpus, "doc_id", "embedding", k = 2, dim = 2, iters = 1)
    graft.ml.Similarity.ivfWriteIndex(
      corpus.select(col("doc_id"), col("embedding")),
      "doc_id", "embedding", centroids, annPath)
    def yaml(extra: String): String =
      s"""pipeline:
         |  - type: hybrid_topk
         |    id_field: doc_id
         |    text_field: text
         |    k: 4
         |$extra
         |    queries:
         |      path: "$qDir"
         |""".stripMargin
    val brute = run(yaml("    vec_field: embedding"), corpus)
      .orderBy("rank").collect().toSeq
    // lex_index + brute semantic over the piped corpus
    val mixed = run(yaml(
      s"""    vec_field: embedding
         |    lex_index:
         |      path: "$lexPath"""".stripMargin), corpus)
      .orderBy("rank").collect().toSeq
    assert(mixed == brute, s"lex_index hybrid diverged:\n$mixed\nvs\n$brute")
    // both channels index-served: the piped input is fully unused
    val bothIdx = run(yaml(
      s"""    lex_index:
         |      path: "$lexPath"
         |    index:
         |      path: "$annPath"
         |    nprobe: 2""".stripMargin), corpus.drop("embedding"))
      .orderBy("rank").collect().toSeq
    assert(bothIdx == brute,
      s"double-index hybrid diverged:\n$bothIdx\nvs\n$brute")
  }

  test("hybrid_topk stage: `index:` serves the semantic channel from a " +
      "written ANN index — identical to the brute hybrid when probes " +
      "cover every bucket; geometry/knob misuse refuses (r15 missing #1)") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "spark shuffle exchange partitions", Seq(0.0f, 1.0f)),
      (2L, "completely unrelated words here", Seq(1.0f, 0.02f)),
      (3L, "spark shuffle tuning notes", Seq(1.0f, 0.01f)),
      (4L, "nothing in common at all", Seq(0.0f, -1.0f)))
      .toDF("doc_id", "text", "embedding")
    val root = java.nio.file.Files
      .createTempDirectory("graft-hybrid-idx").toString
    val qDir = s"$root/queries"
    Seq((100L, "spark shuffle", Seq(1.0f, 0.0f)))
      .toDF("qid", "qtext", "qvec")
      .write.mode("overwrite").parquet(qDir)
    val centroids = graft.ml.Similarity.kmeansCentroids(
      corpus, "doc_id", "embedding", k = 2, dim = 2, iters = 1)
    val ipath = s"$root/index"
    graft.ml.Similarity.ivfWriteIndex(
      corpus.select(col("doc_id"), col("embedding")),
      "doc_id", "embedding", centroids, ipath)
    def yaml(extra: String): String =
      s"""pipeline:
         |  - type: hybrid_topk
         |    id_field: doc_id
         |    text_field: text
         |    k: 4
         |$extra
         |    queries:
         |      path: "$qDir"
         |""".stripMargin
    // exhaustive probes (nprobe = centroid count) make the index read
    // a pure re-layout of the brute scan: fused output is identical
    val idx = yaml(s"""    index:
         |      path: "$ipath"
         |    nprobe: 2""".stripMargin)
    val brute = run(yaml("    vec_field: embedding"), corpus)
      .orderBy("rank").collect().toSeq
    assert(run(idx, corpus).orderBy("rank").collect().toSeq == brute)
    // in index mode the piped corpus feeds BM25 only — it need not
    // carry the vector column at all (the vectors live in the index)
    assert(run(idx, corpus.drop("embedding"))
      .orderBy("rank").collect().toSeq == brute)
    // a silenced lexical channel skips BM25 and still retrieves
    // semantically (rrfFuse drops zero-weight channels pre-union)
    val semOnly = run(idx + "    lex_weight: 0.0\n", corpus)
      .orderBy("rank").collect()
    assert(semOnly.nonEmpty &&
      semOnly.map(_.getLong(2)).contains(2L),
      s"semantic-only retrieval lost docs: ${semOnly.toSeq}")
    // r17 (VERDICT r16 what's-wrong #4): silencing a channel waives
    // its schema requirements at plan CONSTRUCTION, not merely at
    // execution — a corpus with no text column serves the semantic
    // channel alone instead of failing to build the silenced BM25 plan
    val semOnlyNoText = run(idx + "    lex_weight: 0.0\n",
        corpus.drop("text"))
      .orderBy("rank").collect()
    assert(semOnlyNoText.map(_.getLong(2)).toSeq ==
      semOnly.map(_.getLong(2)).toSeq,
      "text-less corpus must serve the semantic channel alone")
    // and the inverse: sem_weight 0 over a vector-less corpus (brute
    // shape, no index) retrieves lexically alone
    val lexOnly = run(yaml("    sem_weight: 0.0"),
        corpus.drop("embedding"))
      .orderBy("rank").collect()
    assert(lexOnly.nonEmpty,
      "vector-less corpus must serve the lexical channel alone")
    // all-zero weights refuse at the stage, naming the knobs
    val eAllZero = intercept[IllegalArgumentException] {
      run(idx + "    lex_weight: 0.0\n    sem_weight: 0.0\n", corpus)
    }
    assert(eAllZero.getMessage.contains("lex_weight"))
    // training knobs alongside `index:` are dead config — refuse
    val eTrainer = intercept[IllegalArgumentException] {
      run(idx + "    trainer: kmeans\n", corpus)
    }
    assert(eTrainer.getMessage.contains("trainer"))
    // codes-only index + target_recall: a quantized self-truth refuses
    val sqPath = s"$root/sq8"
    graft.ml.Similarity.ivfSqWriteIndex(
      corpus.select(col("doc_id"), col("embedding")),
      "doc_id", "embedding", centroids, sqPath)
    val eSq = intercept[IllegalArgumentException] {
      run(yaml(s"""    index:
           |      path: "$sqPath"
           |    target_recall: 0.95""".stripMargin), corpus)
    }
    assert(eSq.getMessage.contains("codes only"))
  }

  test("ann_topk stage: brute baseline and tuned ivf from a queries side table") {
    val s = spark
    import s.implicits._
    // two clean direction clusters — ivf with a sane probe must agree
    // with the exact baseline here
    val emb = (0 until 16).map { i =>
      val sign = if (i < 8) 1.0f else -1.0f
      (i.toLong, Seq(sign, sign * (1.0f + i * 0.01f),
        sign * 0.1f * (i % 3), 0.05f * (i % 2)))
    }.toDF("vec_id", "embedding")
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-ann-q").toString
    emb.filter(col("vec_id").isin(0L, 9L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .write.mode("overwrite").parquet(qDir)
    val brute = run(
      s"""pipeline:
         |  - type: ann_topk
         |    id_field: vec_id
         |    vec_field: embedding
         |    k: 3
         |    queries:
         |      path: "$qDir"
         |""".stripMargin, emb)
    assert(brute.columns.toSet == Set("qid", "id", "sim", "rank"))
    val bruteRows = brute.collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("id")))).toSet
    assert(bruteRows.size == 6) // 2 queries × k
    // neighbors come from the query's own sign cluster
    assert(bruteRows.forall { case (q, i) => (q < 8) == (i < 8) })
    // ivf with target_recall: the tuner sizes nprobe, and on this clean
    // fixture the probed search reproduces the exact result set
    val ivf = run(
      s"""pipeline:
         |  - type: ann_topk
         |    id_field: vec_id
         |    vec_field: embedding
         |    mode: ivf
         |    centroids: 2
         |    k: 3
         |    target_recall: 0.9
         |    queries:
         |      path: "$qDir"
         |""".stripMargin, emb)
    val ivfRows = ivf.collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("id")))).toSet
    assert(ivfRows == bruteRows,
      s"tuned ivf diverged from exact: $ivfRows vs $bruteRows")
    // nprobe and target_recall are alternatives, not companions
    val eBoth = intercept[IllegalArgumentException] {
      run(
        s"""pipeline:
           |  - type: ann_topk
           |    id_field: vec_id
           |    vec_field: embedding
           |    mode: ivf
           |    nprobe: 1
           |    target_recall: 0.9
           |    queries:
           |      path: "$qDir"
           |""".stripMargin, emb)
    }
    assert(eBoth.getMessage.contains("not both"))
    // unknown mode, missing queries, missing vec column all fail loudly
    val eMode = intercept[IllegalArgumentException] {
      run(
        s"""pipeline:
           |  - type: ann_topk
           |    id_field: vec_id
           |    vec_field: embedding
           |    mode: hnsw
           |    queries:
           |      path: "$qDir"
           |""".stripMargin, emb)
    }
    assert(eMode.getMessage.contains("unknown mode"))
    val eQ = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: ann_topk\n    id_field: vec_id\n", emb)
    }
    assert(eQ.getMessage.contains("queries"))
    val eVec = intercept[IllegalArgumentException] {
      run(
        s"""pipeline:
           |  - type: ann_topk
           |    id_field: vec_id
           |    vec_field: nope
           |    queries:
           |      path: "$qDir"
           |""".stripMargin, emb)
    }
    assert(eVec.getMessage.contains("nope"))
    // whole-corpus by construction: refused on a streaming input
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val eStream = intercept[IllegalArgumentException] {
      run(
        s"""pipeline:
           |  - type: ann_topk
           |    id_field: vec_id
           |    vec_field: embedding
           |    queries:
           |      path: "$qDir"
           |""".stripMargin, mem.toDF().toDF("vec_id", "embedding"))
    }
    assert(eStream.getMessage.contains("ann_topk"))
  }

  test("ann_topk stage: a queries table sharing the corpus's column " +
      "names resolves unambiguously (the self-query shape)") {
    val s = spark
    import s.implicits._
    val emb = (0 until 12).map { i =>
      val sign = if (i < 6) 1.0 else -1.0
      (i.toLong, Seq(sign, sign * (1.0 + i * 0.01), 0.1 * (i % 3)))
    }.toDF("vec_id", "embedding")
    // the routine production shape: queries ARE corpus rows, same
    // parquet columns — un-renamed, this made every reference in the
    // broadcast join ambiguous (the doc example's own failure)
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-ann-self").toString
    emb.filter(col("vec_id").isin(0L, 7L))
      .write.mode("overwrite").parquet(qDir)
    def topk(mode: String) = run(
      s"""pipeline:
         |  - type: ann_topk
         |    id_field: vec_id
         |    vec_field: embedding
         |    mode: $mode
         |    ${if (mode == "ivf") "centroids: 2\n    nprobe: 1" else ""}
         |    k: 2
         |    queries:
         |      path: "$qDir"
         |      qid_field: vec_id
         |      qvec_field: embedding
         |""".stripMargin, emb).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("id")))).toSet
    val brute = topk("brute")
    // each query's own row is its top hit (sim 1.0), from its cluster
    assert(brute.contains((0L, 0L)) && brute.contains((7L, 7L)))
    assert(brute.forall { case (q, i) => (q < 6) == (i < 6) })
    assert(topk("ivf") == brute)
  }

  test("ann_topk stage: index mode searches a written index; training " +
      "knobs alongside index refuse") {
    val s = spark
    import s.implicits._
    val emb = (0 until 16).map { i =>
      val sign = if (i < 8) 1.0f else -1.0f
      (i.toLong, Seq(sign, sign * (1.0f + i * 0.01f),
        sign * 0.1f * (i % 3), 0.05f * (i % 2)))
    }.toDF("vec_id", "embedding")
    val cs = graft.ml.Similarity.trainCentroids(emb, "vec_id", "embedding",
      k = 2, iters = 5)
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ann-idx").toString
    graft.ml.Similarity.ivfWriteIndex(emb, "vec_id", "embedding", cs, idxDir)
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-ann-idx-q").toString
    emb.filter(col("vec_id").isin(0L, 9L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .write.mode("overwrite").parquet(qDir)
    // any non-empty input frame works — index mode searches the index
    val out = run(
      s"""pipeline:
         |  - type: ann_topk
         |    id_field: vec_id
         |    vec_field: embedding
         |    mode: ivf
         |    index:
         |      path: "$idxDir"
         |    nprobe: 1
         |    k: 3
         |    queries:
         |      path: "$qDir"
         |""".stripMargin, emb)
    val got = out.collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("id")))).toSet
    // clean sign clusters at nprobe=1 ≡ the exact result
    val want = graft.ml.Similarity.bruteForceTopK(emb, "vec_id",
        "embedding", emb.filter(col("vec_id").isin(0L, 9L))
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        "qid", "qvec", k = 3)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("id")))).toSet
    assert(got == want, s"index-mode diverged from exact: $got vs $want")
    // target_recall over the index: marker centroids + the index as the
    // tuning corpus — same result set here (the tuner can only widen)
    val tuned = run(
      s"""pipeline:
         |  - type: ann_topk
         |    id_field: vec_id
         |    vec_field: embedding
         |    mode: ivf
         |    index:
         |      path: "$idxDir"
         |    target_recall: 0.9
         |    k: 3
         |    queries:
         |      path: "$qDir"
         |""".stripMargin, emb)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("id")))).toSet
    assert(tuned == want)
    // training knobs next to index: would be silently dead config
    val eDead = intercept[IllegalArgumentException] {
      run(
        s"""pipeline:
           |  - type: ann_topk
           |    id_field: vec_id
           |    vec_field: embedding
           |    mode: ivf
           |    trainer: kmeans
           |    index:
           |      path: "$idxDir"
           |    queries:
           |      path: "$qDir"
           |""".stripMargin, emb)
    }
    assert(eDead.getMessage.contains("silently ignored"))
    // sq8 index: the compressed rung — codes-only search at the pinned
    // nprobe. SQ8 ranks by INNER PRODUCT (scale·Σ code·q), not cosine,
    // so the contract pinned here is identity with the single-query
    // sq8 reader on the same index, not with the cosine-exact set
    val sqDir = java.nio.file.Files
      .createTempDirectory("graft-ann-sq").toString
    graft.ml.Similarity.ivfSqWriteIndex(emb, "vec_id", "embedding",
      cs, sqDir)
    val sqGot = run(
      s"""pipeline:
         |  - type: ann_topk
         |    id_field: vec_id
         |    vec_field: embedding
         |    mode: ivf
         |    index:
         |      path: "$sqDir"
         |    nprobe: 1
         |    k: 3
         |    queries:
         |      path: "$qDir"
         |""".stripMargin, emb)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("id")))).toSet
    val sqWant = Seq(0L, 9L).flatMap { qid =>
      val qv = emb.filter(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toSeq
      graft.ml.Similarity.ivfSqReadTopK(spark, sqDir, "vec_id", qv,
          cs, k = 3, nprobe = 1)
        .collect().map(r => (qid, r.getLong(0)))
    }.toSet
    assert(sqGot == sqWant,
      s"sq8 index-mode diverged from the per-query reader: " +
        s"$sqGot vs $sqWant")
    // no exact truth lives inside a codes-only index — tuning refuses
    val eSqTune = intercept[IllegalArgumentException] {
      run(
        s"""pipeline:
           |  - type: ann_topk
           |    id_field: vec_id
           |    vec_field: embedding
           |    mode: ivf
           |    target_recall: 0.9
           |    index:
           |      path: "$sqDir"
           |    queries:
           |      path: "$qDir"
           |""".stripMargin, emb)
    }
    assert(eSqTune.getMessage.contains("codes only"))
    // pq index: the memory-scale rung — ADC scoring over residual
    // codes, identity with the per-query pq reader; tuning refuses
    // like sq8 (codes only)
    val pqBooks = graft.ml.Similarity.ivfPqTrain(emb, "vec_id",
      "embedding", cs, m = 2, k = 4, iters = 2)
    val pqDir = java.nio.file.Files
      .createTempDirectory("graft-ann-pq").toString
    graft.ml.Similarity.ivfPqWriteIndex(emb, "vec_id", "embedding",
      cs, pqBooks, pqDir)
    val pqGot = run(
      s"""pipeline:
         |  - type: ann_topk
         |    id_field: vec_id
         |    vec_field: embedding
         |    mode: ivf
         |    index:
         |      path: "$pqDir"
         |    nprobe: 1
         |    k: 3
         |    queries:
         |      path: "$qDir"
         |""".stripMargin, emb)
    assert(pqGot.columns.contains("rank"))
    val pqPairs = pqGot.collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("id")))).toSet
    val pqWant = Seq(0L, 9L).flatMap { qid =>
      val qv = emb.filter(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toSeq
      graft.ml.Similarity.ivfPqReadTopK(spark, pqDir, "vec_id", qv,
          k = 3, nprobe = 1)
        .collect().map(r => (qid, r.getLong(0)))
    }.toSet
    assert(pqPairs == pqWant,
      s"pq index-mode diverged from the per-query reader: " +
        s"$pqPairs vs $pqWant")
    val ePqTune = intercept[IllegalArgumentException] {
      run(
        s"""pipeline:
           |  - type: ann_topk
           |    id_field: vec_id
           |    vec_field: embedding
           |    mode: ivf
           |    target_recall: 0.9
           |    index:
           |      path: "$pqDir"
           |    queries:
           |      path: "$qDir"
           |""".stripMargin, emb)
    }
    assert(ePqTune.getMessage.contains("codes only"))
    // a marker-less directory is not an index
    val bare = java.nio.file.Files
      .createTempDirectory("graft-ann-bare").toString
    emb.write.mode("overwrite").parquet(bare)
    val eMk = intercept[IllegalArgumentException] {
      run(
        s"""pipeline:
           |  - type: ann_topk
           |    id_field: vec_id
           |    vec_field: embedding
           |    mode: ivf
           |    target_recall: 0.9
           |    index:
           |      path: "$bare"
           |    queries:
           |      path: "$qDir"
           |""".stripMargin, emb)
    }
    assert(eMk.getMessage.contains("marker"))
  }

  test("ann_topk `queries: input`: the piped rows are the query set " +
      "served from a written index; corpus-less shapes refuse") {
    val s = spark
    import s.implicits._
    val corpus = (0 until 16).map { i =>
      val sign = if (i < 8) 1.0 else -1.0
      (i.toLong, Seq(sign, sign * (1.0 + i * 0.01), 0.1 * (i % 3)))
    }.toDF("vec_id", "embedding")
    val centroids = Seq(Seq(1.0, 1.0, 0.1), Seq(-1.0, -1.0, -0.1))
    val idxDir = java.nio.file.Files
      .createTempDirectory("ann-qin").toString + "/idx"
    graft.ml.Similarity.ivfWriteIndex(corpus, "vec_id", "embedding",
      centroids, idxDir)
    val queries = corpus.filter(col("vec_id").isin(0L, 9L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = run(
      s"""pipeline:
         |  - type: ann_topk
         |    id_field: vec_id
         |    vec_field: embedding
         |    mode: ivf
         |    index:
         |      path: "$idxDir"
         |    queries: input
         |    nprobe: 1
         |    k: 3
         |""".stripMargin, queries).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getInt(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("id")))).toSet
    // identical to the same index searched via a side-table config
    val qDir = java.nio.file.Files
      .createTempDirectory("ann-qin-q").toString
    queries.write.mode("overwrite").parquet(qDir)
    val want = run(
      s"""pipeline:
         |  - type: ann_topk
         |    id_field: vec_id
         |    vec_field: embedding
         |    mode: ivf
         |    index:
         |      path: "$idxDir"
         |    nprobe: 1
         |    k: 3
         |    queries:
         |      path: "$qDir"
         |""".stripMargin, corpus).collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getInt(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("id")))).toSet
    assert(got == want && got.nonEmpty,
      s"input-queries diverged from side-table queries: $got vs $want")
    // no index: there is no corpus in the pipe to search
    val eNoIdx = intercept[IllegalArgumentException] {
      run(
        """pipeline:
          |  - type: ann_topk
          |    id_field: vec_id
          |    queries: input
          |""".stripMargin, queries)
    }
    assert(eNoIdx.getMessage.contains("no corpus in the pipe"))
    // target_recall would re-tune per run (per micro-batch in a stream)
    val eTune = intercept[IllegalArgumentException] {
      run(
        s"""pipeline:
           |  - type: ann_topk
           |    id_field: vec_id
           |    vec_field: embedding
           |    mode: ivf
           |    index:
           |      path: "$idxDir"
           |    queries: input
           |    target_recall: 0.9
           |""".stripMargin, queries)
    }
    assert(eTune.getMessage.contains("pin `nprobe:`"))
  }

  test("ann_ingest stage: kind pq pins codebooks from the first batch; " +
      "a mid-stream compact is invisible to the stage and the search") {
    val s = spark
    import s.implicits._
    def batch(lo: Int, hi: Int) = (lo until hi).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, Seq(sign, sign * (1.0 + i * 0.01), 0.1 * (i % 3), 0.05))
    }.toDF("vec_id", "embedding")
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-annig-pq").toString + "/idx"
    val yaml =
      s"""pipeline:
         |  - type: ann_ingest
         |    id_field: vec_id
         |    vec_field: embedding
         |    batch_id: "%s"
         |    index:
         |      path: "$idxDir"
         |    create:
         |      centroids: 2
         |      kind: pq
         |      m: 2
         |      pq_k: 4
         |""".stripMargin
    run(yaml.format("b1"), batch(0, 12))
    // marker pins kind + trained books from the FIRST batch
    val (kind, _, books) =
      graft.ml.Similarity.ivfIndexGeometry(s, idxDir).get
    assert(kind == "pq" && books.length == 2 &&
      books.forall(_.length == 4))
    graft.ml.IvfIngest.compact(s, idxDir) // mid-stream maintenance fold
    run(yaml.format("b2"), batch(12, 24))
    run(yaml.format("b1"), batch(0, 12)) // folded bid: replay no-ops
    assert(spark.read.parquet(idxDir).count() == 24)
    assert(!spark.read.parquet(idxDir).columns.contains("embedding"))
    // the stage search == the per-query pq reader over the same index
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-annig-pq-q").toString
    batch(0, 24).filter(col("vec_id").isin(0L, 1L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .write.mode("overwrite").parquet(qDir)
    val got = run(
      s"""pipeline:
         |  - type: ann_topk
         |    id_field: vec_id
         |    vec_field: embedding
         |    mode: ivf
         |    index:
         |      path: "$idxDir"
         |    nprobe: 2
         |    k: 3
         |    queries:
         |      path: "$qDir"
         |""".stripMargin, batch(0, 1))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("id")))).toSet
    val want = Seq(0L, 1L).flatMap { q =>
      val qv = batch(0, 24).filter(col("vec_id") === q)
        .select(col("embedding")).collect().head.getSeq[Double](0)
      graft.ml.Similarity.ivfPqReadTopK(s, idxDir, "vec_id", qv,
          k = 3, nprobe = 2).collect()
        .map(r => (q, r.getLong(r.fieldIndex("vec_id"))))
    }.toSet
    assert(got == want,
      s"stage pq search over the ingested index diverged: $got vs $want")
  }

  test("ann_ingest stage: first batch creates, later batches append, " +
      "ann_topk searches the result; batch_id required; dry-run inert") {
    val s = spark
    import s.implicits._
    def batch(lo: Int, hi: Int) = (lo until hi).map { i =>
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Seq(sign, sign * (1.0f + i * 0.01f), 0.1f * (i % 3), 0.0f))
    }.toDF("vec_id", "embedding")
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-annig").toString + "/idx"
    val yaml =
      s"""pipeline:
         |  - type: ann_ingest
         |    id_field: vec_id
         |    vec_field: embedding
         |    batch_id: "%s"
         |    index:
         |      path: "$idxDir"
         |    create:
         |      centroids: 2
         |      iters: 4
         |""".stripMargin
    // rows pass through unchanged (ingest stages never filter)
    val out1 = run(yaml.format("b1"), batch(0, 12))
    assert(out1.count() == 12 &&
      out1.columns.toSeq == Seq("vec_id", "embedding"))
    run(yaml.format("b2"), batch(12, 24))
    // a replayed batch id ingests nothing
    run(yaml.format("b2"), batch(12, 24))
    assert(spark.read.parquet(idxDir).count() == 24)
    // the ingested index serves ann_topk with the exact result on the
    // clean two-cluster fixture
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-annig-q").toString
    batch(0, 24).filter(col("vec_id").isin(0L, 1L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .write.mode("overwrite").parquet(qDir)
    val got = run(
      s"""pipeline:
         |  - type: ann_topk
         |    id_field: vec_id
         |    vec_field: embedding
         |    mode: ivf
         |    index:
         |      path: "$idxDir"
         |    nprobe: 1
         |    k: 3
         |    queries:
         |      path: "$qDir"
         |""".stripMargin, batch(0, 1))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("id")))).toSet
    val want = graft.ml.Similarity.bruteForceTopK(batch(0, 24), "vec_id",
        "embedding", batch(0, 24).filter(col("vec_id").isin(0L, 1L))
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        "qid", "qvec", k = 3)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("id")))).toSet
    assert(got == want,
      s"search over the ingested index diverged from exact: $got vs $want")
    // batch mode without batch_id refuses (the stats_ingest contract)
    val eBid = intercept[IllegalArgumentException] {
      run(
        s"""pipeline:
           |  - type: ann_ingest
           |    id_field: vec_id
           |    vec_field: embedding
           |    index:
           |      path: "$idxDir"
           |""".stripMargin, batch(24, 30))
    }
    assert(eBid.getMessage.contains("batch_id"))
    // no index and no create: refused with the training contract
    val eNew = intercept[IllegalArgumentException] {
      run(
        s"""pipeline:
           |  - type: ann_ingest
           |    id_field: vec_id
           |    vec_field: embedding
           |    batch_id: x
           |    index:
           |      path: "${idxDir}-none"
           |""".stripMargin, batch(0, 6))
    }
    assert(eNew.getMessage.contains("FIRST"))
    // dry-run: a state-mutating stage writes NOTHING
    graft.pipeline.CurationStages.suppressStateWrites.withValue(true) {
      run(yaml.format("b9"), batch(24, 36))
    }
    assert(spark.read.parquet(idxDir).count() == 24,
      "dry-run must not advance the index")
  }

  test("lex_ingest stage: first batch creates, later batches append, " +
      "bm25_topk index: serves the growing store; batch_id required; " +
      "pinned buckets refuse a disagreeing knob; dry-run inert") {
    val s = spark
    import s.implicits._
    def docs(lo: Int, hi: Int) = (lo until hi).map { i =>
      (i.toLong, s"spark shuffle doc$i " + ("pad " * (i % 3)).trim)
    }.toDF("doc_id", "text")
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-lexig").toString + "/store"
    val yaml =
      s"""pipeline:
         |  - type: lex_ingest
         |    id_field: doc_id
         |    text_field: text
         |    batch_id: "%s"
         |    buckets: 8
         |    index:
         |      path: "$storeDir"
         |""".stripMargin
    // rows pass through unchanged (ingest stages never filter)
    val out1 = run(yaml.format("b1"), docs(0, 6))
    assert(out1.count() == 6 &&
      out1.columns.toSeq == Seq("doc_id", "text"))
    run(yaml.format("b2"), docs(6, 12))
    // a replayed batch id ingests nothing
    run(yaml.format("b2"), docs(6, 12))
    assert(graft.ml.LexIngest.storeStats(s, storeDir)._1 == 12L)
    // the growing store serves bm25_topk `index:` with full-scan
    // equality over everything committed
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-lexig-q").toString
    Seq((100L, "spark shuffle"), (200L, "doc7"))
      .toDF("qid", "qtext").write.mode("overwrite").parquet(qDir)
    val got = run(
      s"""pipeline:
         |  - type: bm25_topk
         |    k: 5
         |    index:
         |      path: "$storeDir"
         |    queries:
         |      path: "$qDir"
         |""".stripMargin, docs(0, 1))
      .orderBy("qid", "rank").collect().toSeq
    val want = graft.ml.CorpusStats.bm25TopK(docs(0, 12), "doc_id",
        "text", Seq((100L, "spark shuffle"), (200L, "doc7"))
          .toDF("qid", "qtext"), "qid", "qtext", k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(got == want,
      s"stage-served retrieval diverged from the scan: $got vs $want")
    // batch mode without batch_id refuses (the stats_ingest contract)
    val eBid = intercept[IllegalArgumentException] {
      run(
        s"""pipeline:
           |  - type: lex_ingest
           |    id_field: doc_id
           |    text_field: text
           |    index:
           |      path: "$storeDir"
           |""".stripMargin, docs(12, 14))
    }
    assert(eBid.getMessage.contains("batch_id"))
    // the marker is authoritative: an explicit knob that disagrees
    // with the pinned geometry is a misconfiguration
    val eBuck = intercept[IllegalArgumentException] {
      run(yaml.format("b3").replace("buckets: 8", "buckets: 16"),
        docs(12, 14))
    }
    assert(eBuck.getMessage.contains("pinned"))
    // …while omitting the knob appends fine under the pinned geometry
    run(yaml.format("b3").replace("    buckets: 8\n", ""), docs(12, 14))
    assert(graft.ml.LexIngest.storeStats(s, storeDir)._1 == 14L)
    // dry-run: a state-mutating stage writes NOTHING
    graft.pipeline.CurationStages.suppressStateWrites.withValue(true) {
      run(yaml.format("b9"), docs(14, 20))
    }
    assert(graft.ml.LexIngest.storeStats(s, storeDir)._1 == 14L,
      "dry-run must not advance the store")
  }

  test("compact_every: ann_ingest, stats_ingest AND dedup_ingest fold " +
      "themselves every N committed batches; replays never re-fold; " +
      "the key-store fold preserves attempt tokens (r17)") {
    val s = spark
    import s.implicits._
    def batch(lo: Int, hi: Int) = (lo until hi).map { i =>
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Seq(sign, sign * (1.0f + i * 0.01f), 0.1f * (i % 3), 0.0f))
    }.toDF("vec_id", "embedding")
    val root = java.nio.file.Files
      .createTempDirectory("graft-compev").toString
    val idxDir = s"$root/idx"
    val yaml =
      s"""pipeline:
         |  - type: ann_ingest
         |    id_field: vec_id
         |    vec_field: embedding
         |    batch_id: "%s"
         |    compact_every: 2
         |    index:
         |      path: "$idxDir"
         |    create:
         |      centroids: 2
         |      iters: 4
         |""".stripMargin
    run(yaml.format("b1"), batch(0, 6))
    assert(graft.ml.IvfIngest.pendingBatchCount(s, idxDir) == 1,
      "below the threshold: no fold yet")
    run(yaml.format("b2"), batch(6, 12))
    // the second commit reached the threshold: the stage folded itself
    assert(graft.ml.IvfIngest.pendingBatchCount(s, idxDir) == 0,
      "the stage must fold itself at compact_every batches")
    assert(graft.ml.Similarity.ivfIndexFolded(s, idxDir) ==
      Set("b1", "b2"))
    assert(s.read.parquet(idxDir).count() == 12)
    // a replayed FOLDED bid: the ledger no-ops it, and a no-op never
    // re-triggers a fold
    run(yaml.format("b1"), batch(0, 6))
    assert(s.read.parquet(idxDir).count() == 12,
      "replay of a folded batch double-ingested")
    run(yaml.format("b3"), batch(12, 18))
    assert(graft.ml.IvfIngest.pendingBatchCount(s, idxDir) == 1,
      "the fold counter must reset after a compaction")
    assert(s.read.parquet(idxDir).count() == 18)

    // stats_ingest: the same self-folding discipline, counts unchanged
    val store = s"$root/grams"
    val docs = Seq((1L, "the cat sat"), (2L, "the dog sat"),
      (3L, "a cat and a dog")).toDF("doc_id", "text")
    val yamlG =
      s"""pipeline:
         |  - type: stats_ingest
         |    text_field: text
         |    store: "$store"
         |    batch_id: "%s"
         |    compact_every: 2
         |""".stripMargin
    run(yamlG.format("g1"), docs.filter(col("doc_id") <= 2))
    assert(graft.ml.GramStore.pendingBatchCount(s, store) == 1)
    run(yamlG.format("g2"), docs.filter(col("doc_id") > 2))
    assert(graft.ml.GramStore.pendingBatchCount(s, store) == 0,
      "stats_ingest must fold itself at compact_every batches")
    assert(graft.ml.GramStore.foldedBids(s, store) == Set("g1", "g2"))
    val streamed = graft.ml.GramStore.counts(s, store)
      .select("kind", "g", "c").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val oneShot = graft.ml.CorpusStats.fusedGramCountsN(docs, "text", 2)
      .select("kind", "g", "c").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == oneShot, "the self-fold changed the counts")

    // dedup_ingest (r17): the knob folds the key store too — the
    // fold PRESERVES attempt tokens (no epoch re-stamp), which is
    // what makes it replay-safe; the failed-sink replay interleave
    // is gated in StreamCurationSpec
    val keys = s"$root/keys"
    def ledger(): String = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(keys, "_graft_folds.json")), "UTF-8")
    val yamlD =
      s"""pipeline:
         |  - type: dedup_ingest
         |    id_field: doc_id
         |    text_field: text
         |    store: "$keys"
         |    compact_every: 2
         |""".stripMargin
    run(yamlD, Seq((1L, "doc aa"), (2L, "doc bb")).toDF("doc_id", "text"))
    assert(ledger().contains("\"appends_since_fold\":1"),
      s"first committed append must bump the ledger: ${ledger()}")
    run(yamlD, Seq((3L, "doc cc")).toDF("doc_id", "text"))
    // second committed append reached the threshold: self-fold, reset
    assert(ledger().contains("\"appends_since_fold\":0") &&
      ledger().contains("\"folds\":1"),
      s"the stage must fold itself at compact_every appends: ${ledger()}")
    val ks = s.read.parquet(keys)
    assert(ks.count() == 3L, "one row per key after the fold")
    val bids = ks.select("bid").distinct().collect()
      .map(_.getString(0)).toSet
    assert(bids.size == 2 && bids.forall(_.startsWith("run-")),
      s"the fold must preserve the two runs' attempt tokens: $bids")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(keys + ".compact-old")),
      "parked pre-fold copy awaits the next writer entry")
    // an append that admits NOTHING (all duplicates) writes no rows
    // and must not bump the ledger toward a pointless fold; its writer
    // entry KEEPS the young parked copy (r17 age gate) and drops it
    // only past the grace window
    run(yamlD, Seq((4L, "doc aa")).toDF("doc_id", "text"))
    assert(ledger().contains("\"appends_since_fold\":0"),
      s"an empty append must not bump the ledger: ${ledger()}")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(keys + ".compact-old")),
      "a writer entry inside the grace window must keep the parked copy")
    graft.ml.ParkSwap.parkedGraceMs = 0L
    try run(yamlD, Seq((5L, "doc aa")).toDF("doc_id", "text"))
    finally graft.ml.ParkSwap.parkedGraceMs = 60000L
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(keys + ".compact-old")),
      "an aged parked copy must drop at the next writer entry")
    assert(s.read.parquet(keys).count() == 3L,
      "dedup discipline must survive the fold (doc aa rejected)")
    // a non-positive cadence refuses
    val eZero = intercept[IllegalArgumentException] {
      run(yaml.format("b9").replace("compact_every: 2",
        "compact_every: 0"), batch(18, 20))
    }
    assert(eZero.getMessage.contains("compact_every"))
  }

  test("pca_project stage: plan-time-trained whitened projection") {
    val s = spark
    import s.implicits._
    // anisotropic 3-dim cloud (hash-derived, no RNG)
    val emb = (0 until 200).map { i =>
      val t = ((i * 2654435761L) % 1000) / 1000.0 - 0.5
      (i.toLong, Seq((6.0 * t + 0.01 * (i % 7)).toFloat,
        (6.0 * t - 0.01 * (i % 7)).toFloat, (0.001 * (i % 11)).toFloat))
    }.toDF("vec_id", "embedding")
    val out = run(
      """pipeline:
        |  - type: pca_project
        |    vec_field: embedding
        |    dim: 3
        |    components: 2
        |    whiten: true
        |""".stripMargin, emb)
    assert(out.columns.contains("pca"))
    // whitened projected covariance ≈ identity
    val cov = graft.ml.Similarity.covarianceMatrix(out, "pca", dim = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(cov((0L, 0L)) - 1.0) < 1e-3 &&
      math.abs(cov((1L, 1L)) - 1.0) < 1e-3)
    assert(math.abs(cov((0L, 1L))) < 1e-3)
    // missing vector column fails loudly
    val e = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: pca_project\n    vec_field: nope\n", emb)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("knn_graph stage: edge result set, per-node degree capped; batch-only") {
    val s = spark
    import s.implicits._
    val emb = (0 until 12).map { i =>
      val dir = if (i < 6) 1.0f else -1.0f
      (i.toLong, Seq(dir, dir, dir * (1.0f + i * 0.01f)))
    }.toDF("vec_id", "embedding")
    val out = run(
      """pipeline:
        |  - type: knn_graph
        |    id_field: vec_id
        |    vec_field: embedding
        |    dim: 3
        |    bands: 4
        |    planes_per_band: 4
        |    k: 2
        |""".stripMargin, emb)
    assert(out.columns.toSeq == Seq("src", "rank", "dst", "sim"))
    val deg = out.groupBy("src").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg.values.forall(_ <= 2), s"degree over k: $deg")
    // antipodal groups never mix at top-k (same-group sims ~1)
    for (r <- out.collect())
      assert((r.getLong(0) < 6) == (r.getLong(2) < 6),
        s"cross-group edge ${r.getLong(0)}->${r.getLong(2)}")
    // whole-corpus: refused on a streaming input at compile time
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val e = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: knn_graph\n    id_field: vec_id\n    vec_field: embedding\n    dim: 3\n",
        mem.toDF().toDF("vec_id", "embedding"))
    }
    assert(e.getMessage.contains("knn_graph"))
  }

  test("knn_graph stage: geometry self-sizes from the corpus by default " +
      "(a larger corpus gets larger bands x planes); explicit knobs " +
      "override (VERDICT r14 #1)") {
    val s = spark
    import s.implicits._
    // the sizing law itself: the floor reproduces the old fixed 8x8 up
    // to 2048 rows, then r grows with log2(n) — a 10x corpus gets a
    // strictly larger geometry
    import graft.ml.Similarity
    assert(Similarity.scaledLshBandsPlanes(100L) == ((8, 8)))
    assert(Similarity.scaledLshBandsPlanes(2048L) == ((8, 8)))
    assert(Similarity.scaledLshBandsPlanes(2100L) == ((9, 9)))
    assert(Similarity.scaledLshBandsPlanes(21000L) == ((12, 12)))
    // stage path: 2100 deterministic 16-dim vectors cross the 8x8
    // floor; the DEFAULT stage output must match the library run at
    // the corpus-sized geometry, and differ from the old fixed 8x8 —
    // the silent-under-dedup default VERDICT r14 flagged
    def vec(i: Long): Seq[Float] = {
      // java.util.Random is a spec-pinned LCG — deterministic across
      // JVMs, and per-row seeding gives genuinely distinct vectors (a
      // modular formula here repeated with period 1000, flooding the
      // corpus with exact dups whose top-k is geometry-INVARIANT)
      val rnd = new java.util.Random(i * 7919L + 1L)
      Seq.fill(16)(rnd.nextFloat() * 2.0f - 1.0f)
    }
    val emb = (0L until 2100L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select(col("src"), col("rank"), col("dst"),
          round(col("sim"), 6).as("sim")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
    val staged = edges(run(
      """pipeline:
        |  - type: knn_graph
        |    id_field: vec_id
        |    vec_field: embedding
        |    dim: 16
        |    k: 2
        |""".stripMargin, emb))
    val scaledLib = edges(Similarity.knnGraph(emb, "vec_id", "embedding",
      Similarity.scaledLshGeometry(2100L, 16), k = 2))
    val fixedLib = edges(Similarity.knnGraph(emb, "vec_id", "embedding",
      Similarity.rademacherBandPlanes(8, 8, 16), k = 2))
    assert(staged == scaledLib,
      "stage default diverged from the corpus-sized library geometry")
    assert(staged != fixedLib,
      "stage still runs the fixed 8x8 default at 2100 rows")
    // explicit knobs still win
    val stagedFixed = edges(run(
      """pipeline:
        |  - type: knn_graph
        |    id_field: vec_id
        |    vec_field: embedding
        |    dim: 16
        |    bands: 8
        |    planes_per_band: 8
        |    k: 2
        |""".stripMargin, emb))
    assert(stagedFixed == fixedLib, "explicit geometry knobs ignored")
    // target_recall: the recall-targeted sizing — same r, more bands
    // (2100 rows → r = 9; target 0.98 at the default recall_cosine 0.9
    // grows b past 9), and the stage output matches the library run at
    // that geometry
    val stagedRecall = edges(run(
      """pipeline:
        |  - type: knn_graph
        |    id_field: vec_id
        |    vec_field: embedding
        |    dim: 16
        |    k: 2
        |    target_recall: 0.98
        |""".stripMargin, emb))
    val (bR, rR) = Similarity.recallLshBandsPlanes(2100L, 0.98, 0.9)
    assert(rR == 9 && bR > 9, s"recall sizing ($bR, $rR)")
    val recallLib = edges(Similarity.knnGraph(emb, "vec_id", "embedding",
      Similarity.recallLshGeometry(2100L, 16, 0.98, 0.9), k = 2))
    assert(stagedRecall == recallLib,
      "stage target_recall diverged from the recall-targeted library geometry")
  }

  test("cluster_assign stage: labels in batch; stream-safe with train:; " +
      "self-train refused on streams") {
    val s = spark
    import s.implicits._
    val emb = (0 until 24).map { i =>
      val base = if (i < 12) 0.0 else 50.0
      (i.toLong, Seq((base + (i % 12) * 0.1).toFloat, 1.0f))
    }.toDF("vec_id", "embedding")
    // self-trained batch form: two blobs → two labels, every row labeled
    val out = run(
      """pipeline:
        |  - type: cluster_assign
        |    id_field: vec_id
        |    vec_field: embedding
        |    k: 2
        |    dim: 2
        |    iters: 2
        |""".stripMargin, emb)
    assert(out.count() == 24)
    val labels = out.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    assert(labels.filterKeys(_ < 12).values.toSet.size == 1)
    assert(labels.filterKeys(_ >= 12).values.toSet.size == 1)
    assert(labels(0L) != labels(12L))
    // stream-safe with a train: side table
    val trainDir = java.nio.file.Files.createTempDirectory("catrain").toString
    emb.write.mode("overwrite").parquet(trainDir)
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    mem.addData((100L, Seq(0.5f, 1.0f)), (101L, Seq(50.5f, 1.0f)))
    val streamOut = run(
      s"""pipeline:
         |  - type: cluster_assign
         |    id_field: vec_id
         |    vec_field: embedding
         |    k: 2
         |    dim: 2
         |    train: {path: $trainDir}
         |""".stripMargin, mem.toDF().toDF("vec_id", "embedding"))
    assert(streamOut.isStreaming)
    val q = streamOut.writeStream.format("memory").queryName("ca_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("ca_stream").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    assert(rows.size == 2 && rows(100L) != rows(101L),
      s"streamed rows should land in different clusters: $rows")
    assert(rows(100L) == labels(0L) && rows(101L) == labels(12L),
      "stream labels must agree with the batch labels for the same blobs")
    // self-train on a stream: refused at compile time
    val e = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: cluster_assign\n    id_field: vec_id\n    vec_field: embedding\n",
        mem.toDF().toDF("vec_id", "embedding"))
    }
    assert(e.getMessage.contains("train"))
  }

  test("cluster_sample stage: per-cluster cap over plan-time k-means; batch-only") {
    val s = spark
    import s.implicits._
    // two separable blobs, 12 rows each
    val emb = (0 until 24).map { i =>
      val base = if (i < 12) 0.0 else 50.0
      (i.toLong, Seq((base + (i % 12) * 0.1).toFloat, 1.0f))
    }.toDF("vec_id", "embedding")
    val out = run(
      """pipeline:
        |  - type: cluster_sample
        |    id_field: vec_id
        |    vec_field: embedding
        |    k: 2
        |    dim: 2
        |    iters: 2
        |    per_cluster: 4
        |""".stripMargin, emb)
    assert(out.columns.contains("cluster"))
    val sizes = out.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ <= 4), s"cap exceeded: $sizes")
    assert(sizes.values.sum == 8L, s"both blobs should cap at 4: $sizes")
    // missing vector column fails loudly
    val e = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: cluster_sample\n    id_field: vec_id\n    vec_field: nope\n", emb)
    }
    assert(e.getMessage.contains("nope"))
    // whole-corpus semantics: refused on a streaming input at compile time
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val se = intercept[IllegalArgumentException] {
      run("pipeline:\n  - type: cluster_sample\n    id_field: vec_id\n    vec_field: embedding\n",
        mem.toDF().toDF("vec_id", "embedding"))
    }
    assert(se.getMessage.contains("cluster_sample"))
  }

  test("bucketed corpus input: perplexity_score's id-joins plan with " +
      "ZERO corpus re-shuffle (the BucketedLayout wiring)") {
    val s = spark
    import s.implicits._
    val corpus = (0L until 300L)
      .map(i => (i, s"document body number $i shares common words $i"))
      .toDF("doc_id", "text")
    val dir = "/tmp/graft-curation-bucketed"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val plainDir = s"$dir-plain"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(plainDir))
    // buckets == spark.sql.shuffle.partitions, so the score aggregate's
    // output partitioning is join-compatible with the bucketed scan
    graft.sources.BucketedLayout.write(corpus, dir, "doc_id", 4)
    corpus.write.parquet(plainDir)
    val yaml =
      """pipeline:
        |  - type: perplexity_score
        |    id_field: doc_id
        |    text_field: text
        |""".stripMargin
    // co-located SMJs are the 100 TB shape — keep broadcasts out of it
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try {
      def planOf(in: DataFrame): (Int, String) = {
        val out = run(yaml, in)
        val p = (graft.ScaleProof.planExchanges(out),
          out.queryExecution.executedPlan.toString)
        graft.CacheSweep.sweep(spark)
        p
      }
      val (plainEx, plainPlan) = planOf(spark.read.parquet(plainDir))
      val (buckEx, buckPlan) =
        planOf(graft.sources.BucketedLayout.load(spark, dir))
      assert(buckPlan.contains("Bucketed: true"),
        s"stage input lost bucket awareness:\n$buckPlan")
      // plain input: the corpus re-shuffles on its id for the join-back
      assert(plainPlan.contains("Exchange hashpartitioning(doc_id"),
        s"expected a corpus id shuffle in the plain plan:\n$plainPlan")
      // bucketed input: the id-joins add ZERO exchange — the corpus
      // side reads co-located buckets, and the score side's only
      // exchange is the per-doc aggregate's (required regardless, and
      // already join-compatible)
      assert(!buckPlan.contains("Exchange hashpartitioning(doc_id"),
        s"bucketed corpus must not re-shuffle on its id:\n$buckPlan")
      assert(buckEx == plainEx - 2,
        s"bucketing should remove exactly the two corpus id shuffles: " +
          s"plain=$plainEx bucketed=$buckEx")
      // and the result is input-layout-independent
      val a = run(yaml, spark.read.parquet(plainDir))
        .orderBy("doc_id").collect().map(_.toSeq)
      graft.CacheSweep.sweep(spark)
      val b = run(yaml, graft.sources.BucketedLayout.load(spark, dir))
        .orderBy("doc_id").collect().map(_.toSeq)
      graft.CacheSweep.sweep(spark)
      assert(a.sameElements(b))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
