package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video ride through the engine
  * as opaque `binary` columns plus a typed metadata struct; decode /
  * feature-extraction runs batched per partition so a real decoder (JNI,
  * native lib) amortizes its init per task, not per row.
  *
  * The decode kernels themselves are STUBBED deterministically — the
  * image/audio libraries are not in this container — but the Spark-side
  * contract is the real one: schema, batch shape (mapPartitions with an
  * iterator), partition sizing, and the metadata struct a downstream
  * training pipeline keys on.
  */
object Multimodal {

  /** Attach a media envelope: payload bytes + metadata struct
    * (media_type, byte length, sha256 content address).
    */
  def withMediaEnvelope(df: DataFrame, payload: Column, mediaType: String): DataFrame =
    df.withColumn("media", struct(
      payload.as("bytes"),
      lit(mediaType).as("media_type"),
      length(payload).as("n_bytes"),
      sha2(payload, 256).as("content_id")))

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("mean_luma", DoubleType)))

  /** STUB image decode: deterministic pseudo-dimensions from the byte
    * length (a real build replaces `decodeOne` with e.g. an ImageIO /
    * ffmpeg call — same signature, same batching).
    */
  private def decodeOne(bytes: Array[Byte]): Row = {
    if (bytes == null) Row(null, null, null, null)
    else {
      val n = bytes.length
      val w = 16 + (n % 256)
      val h = 16 + ((n / 256) % 256)
      val luma = math.round(((n % 1000) / 1000.0) * 1e6) / 1e6
      Row(w, h, 1, luma)
    }
  }

  /** Batched decode via mapPartitions: one decoder instance per partition,
    * rows streamed through it. Output = input columns + feature struct.
    */
  def decodeImages(df: DataFrame, bytesCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("image_features", imageFeatureSchema))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      // real impl: open decoder/native context HERE, once per task
      it.map { row =>
        val bytes = row.get(idx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        Row.fromSeq(row.toSeq :+ decodeOne(bytes))
      }
    }(enc)
  }

  /** Frame sampling plumbing for video: every `stride`-th frame index up to
    * `maxFrames` — pure expression; the decode of each sampled frame would
    * go through the same mapPartitions kernel.
    */
  def sampleFrameIndices(nFrames: Column, stride: Int, maxFrames: Int): Column =
    slice(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)),
      1, maxFrames)

  // -------------------------------------------------------------------
  // Audio / document envelopes. Unlike pixel decoding, container HEADERS
  // are pure byte layout — these parsers are REAL (RIFF/WAVE, FLAC
  // STREAMINFO, PDF header + page markers), no library needed; only
  // sample/pixel payload decoding stays behind the stub contract above.
  // Same batched mapPartitions shape: at 100 TB the bytes never leave
  // the task, and a malformed header yields a null struct, never a
  // failed job (the Tables.configure try-semantics).
  // -------------------------------------------------------------------

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType)))

  private def le(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L; var i = 0
    while (i < n) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }
  private def be(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L; var i = 0
    while (i < n) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }
  private def ascii(b: Array[Byte], off: Int, n: Int): String =
    if (b.length < off + n) "" else new String(b, off, n, "US-ASCII")

  /** Parse one audio container header: RIFF/WAVE (PCM fmt chunk walk) or
    * FLAC (STREAMINFO). Null for anything else — the envelope contract
    * is "recognized and well-formed, or null", never a guess.
    */
  private[ml] def parseAudio(b: Array[Byte]): Row = {
    if (b == null) null
    else if (ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WAVE") {
      // walk chunks: fmt_ carries the layout, data carries the payload.
      // Offsets advance in Long and every declared chunk length is
      // bounds-checked BEFORE use — a malformed 32-bit length (e.g.
      // 0xFFFFFFF8, whose truncated Int is negative) must yield null,
      // not an infinite loop or a thrown index error (the per-row
      // never-fail contract).
      var off = 12L
      var rate = -1; var ch = -1; var bits = -1; var dataLen = -1L
      while (off + 8 <= b.length) {
        val id = ascii(b, off.toInt, 4)
        val len = le(b, off.toInt + 4, 4) // unsigned 32-bit, 0..2^32-1
        // a chunk's fields are only trusted when its DECLARED length is
        // plausible and its payload is actually present — a short fmt
        // chunk must not read the next chunk's bytes as rate/channels,
        // and a data chunk declaring 4 GiB over 0 real bytes must not
        // become n_samples (well-formed or null, never a guess)
        val payloadPresent = off + 8 + len <= b.length
        if (id == "fmt " && len >= 16 && payloadPresent) {
          ch = le(b, off.toInt + 10, 2).toInt
          rate = le(b, off.toInt + 12, 4).toInt
          bits = le(b, off.toInt + 22, 2).toInt
        } else if (id == "data" && payloadPresent) dataLen = len
        // advance in Long: len is non-negative by construction, so the
        // cursor strictly moves and an oversized declared length simply
        // ends the walk past b.length (the former Int truncation turned
        // 0xFFFFFFF8 into -8 — a frozen cursor and a spinning task)
        off += 8L + len + (len & 1L) // chunks are word-aligned
      }
      if (rate <= 0 || ch <= 0 || bits <= 0 || dataLen < 0) null
      else {
        val block = ch * (bits / 8)
        val n = if (block > 0) dataLen / block else 0L
        Row("wav", rate, ch, bits, n, if (rate > 0) n * 1000L / rate else 0L)
      }
    } else if (ascii(b, 0, 4) == "fLaC" && b.length >= 26
               && (b(4) & 0x7f) == 0) {
      // block type must be STREAMINFO (0) — any other first block means
      // the layout at offset 18 is NOT the packed stream word, and
      // decoding it would be a guess, not a parse
      // METADATA_BLOCK_HEADER (4 bytes) + STREAMINFO: sample rate is 20
      // bits at byte offset 10 of STREAMINFO, channels-1 next 3 bits,
      // bits-1 next 5, total samples the following 36
      val si = 8 // STREAMINFO payload starts after fLaC + block header
      val word = be(b, si + 10, 8)
      val rate = (word >>> 44).toInt
      val ch = ((word >>> 41) & 0x7).toInt + 1
      val bits = ((word >>> 36) & 0x1f).toInt + 1
      val n = word & 0xfffffffffL
      if (rate <= 0) null
      else Row("flac", rate, ch, bits, n, n * 1000L / rate)
    } else null
  }

  /** Batched audio-envelope extraction (real header parse, see
    * [[parseAudio]]): input columns + `audio_features` struct.
    */
  def decodeAudio(df: DataFrame, bytesCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("audio_features", audioFeatureSchema))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.get(idx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        Row.fromSeq(row.toSeq :+ parseAudio(bytes))
      }
    }(enc)
  }

  val docFeatureSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("version", StringType),
    StructField("n_pages", IntegerType),
    StructField("n_bytes", IntegerType)))

  /** Parse a PDF envelope: `%PDF-M.m` version from the header, page
    * count = occurrences of the `/Type /Page` object marker (exact
    * token — `/Pages` tree nodes don't match). The crude-but-real
    * header scan every large-scale corpus triager starts with.
    */
  private[ml] def parsePdf(b: Array[Byte]): Row = {
    if (b == null || ascii(b, 0, 5) != "%PDF-") null
    else {
      val head = ascii(b, 5, math.min(8, b.length - 5))
      val ver = head.takeWhile(c => c.isDigit || c == '.')
      val marker = "/Type /Page".getBytes("US-ASCII")
      var count = 0
      var i = 0
      while (i <= b.length - marker.length) {
        var j = 0
        while (j < marker.length && b(i + j) == marker(j)) j += 1
        if (j == marker.length) {
          // exact token: next byte must not extend the name (/Pages)
          val nxt = if (i + j < b.length) b(i + j).toChar else ' '
          if (nxt != 's') count += 1
          i += j
        } else i += 1
      }
      if (ver.isEmpty) null else Row("pdf", ver, count, b.length)
    }
  }

  /** Batched document-envelope extraction: input + `doc_features`. */
  def decodeDocs(df: DataFrame, bytesCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("doc_features", docFeatureSchema))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.get(idx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        Row.fromSeq(row.toSeq :+ parsePdf(bytes))
      }
    }(enc)
  }

  // ---- expression-side WAV builder (for the oracle round-trip) -------

  private def leHex(v: Column, nBytes: Int): Column =
    concat((0 until nBytes).map(i =>
      lpad(lower(hex(shiftrightunsigned(v.cast("long"), 8 * i) % 256)),
        2, "0")): _*)

  /** Canonical 44-byte PCM WAV header + silent payload, built ENTIRELY
    * from Catalyst expressions (hex-string concat → unhex): the oracle
    * query constructs audio deterministically from table columns, the
    * kernel parses it back, and DuckDB predicts the fields from the
    * same parameters — a construction/parse round-trip with the byte
    * layout pinned separately by golden bytes in MultimodalSpec.
    */
  def wavBytes(sampleRate: Column, channels: Column, bits: Column,
               nSamples: Column): Column = {
    val block = channels * (bits / lit(8))
    val dataLen = nSamples * block
    val byteRate = sampleRate * block
    val hexStr = concat(
      lit("52494646"),                  // "RIFF"
      leHex(dataLen + 36, 4),
      lit("57415645"),                  // "WAVE"
      lit("666d7420"),                  // "fmt "
      leHex(lit(16), 4),
      leHex(lit(1), 2),                 // PCM
      leHex(channels, 2),
      leHex(sampleRate, 4),
      leHex(byteRate, 4),
      leHex(block, 2),
      leHex(bits, 2),
      lit("64617461"),                  // "data"
      leHex(dataLen, 4),
      // silent payload: dataLen zero bytes (repeat() wants a literal
      // count, so the hex pairs come from a transform over a sequence).
      // Guarded: sequence(1, 0) is DESCENDING [1, 0] in Spark, which
      // would append two junk bytes to a zero-sample file.
      when(dataLen > 0,
        array_join(transform(sequence(lit(1), dataLen.cast("int")),
          _ => lit("00")), ""))
        .otherwise(lit("")))
    unhex(hexStr)
  }
}
