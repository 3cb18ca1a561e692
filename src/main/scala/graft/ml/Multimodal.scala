package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video ride through the engine
  * as opaque `binary` columns plus a typed metadata struct; decode /
  * feature-extraction runs batched per partition so a real decoder (JNI,
  * native lib) amortizes its init per task, not per row.
  *
  * Container headers (PNG/JPEG/GIF, RIFF/FLAC, PDF, ISO-BMFF) are REAL
  * byte-layout parsers; image PIXEL facts are a real `javax.imageio`
  * decode (in-JDK codecs); audio SAMPLE facts are a real integer-PCM
  * read ([[parsePcm]] — raw PCM needs no codec) or a real FLAC decode
  * ([[FlacCodec]] — full subframe/Rice/decorrelation coverage with CRC
  * verification). VIDEO frame pixels are the one remaining decode this
  * engine rules OUT OF SCOPE rather than stubs: no in-JVM codec for
  * H.264/VP9/AV1 exists, a JNI binding is a deployment artifact (the
  * Kafka-broker class of dependency), and every fact/dedup kernel that
  * would consume frames already runs against the real image and audio
  * decoders — the envelope (ISO-BMFF walk) stays real, frame decode
  * returns the documented null. The Spark-side shape (schema,
  * mapPartitions batching, per-task decoder init, null-on-undecodable)
  * is the production one throughout.
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
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bit_depth", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("mean_luma", DoubleType)))

  /** Image decode: container HEADERS are REAL parsers (PNG IHDR, JPEG
    * SOF segment walk, GIF logical-screen descriptor — pure byte
    * layout, the WAV/PDF/MP4 convention); the pixel-payload fact
    * (mean_luma) is REAL too — a `javax.imageio` decode (in-JDK
    * PNG/JPEG/GIF codecs, no external library) with Rec.601 channel
    * weighting — and degrades to null when the payload doesn't decode
    * (truncated data, header-only envelopes). Unrecognized bytes keep
    * the documented length-derived fake (format "stub") so unit
    * plumbing stays testable with arbitrary bytes. Magic-matched but
    * malformed bytes yield a null struct, never a failed job.
    */
  private def decodeOne(bytes: Array[Byte]): Row = {
    if (bytes == null) nullImage
    else if (bytes.length >= 8 &&
        (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G' && (bytes(4) & 0xFF) == 0x0D &&
        (bytes(5) & 0xFF) == 0x0A && (bytes(6) & 0xFF) == 0x1A &&
        (bytes(7) & 0xFF) == 0x0A) withLuma(parsePng(bytes), bytes)
    else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
        (bytes(1) & 0xFF) == 0xD8) withLuma(parseJpeg(bytes), bytes)
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      withLuma(parseGif(bytes), bytes)
    else {
      val n = bytes.length
      val w = 16 + (n % 256)
      val h = 16 + ((n / 256) % 256)
      val luma = math.round(((n % 1000) / 1000.0) * 1e6) / 1e6
      Row("stub", w, h, null, 1, luma)
    }
  }

  /** Attach the pixel fact to a successfully header-parsed envelope:
    * attempt a full decode and fill `mean_luma`; keep the header facts
    * with a null luma when the payload doesn't decode. Never touches a
    * null (malformed-header) struct.
    */
  private def withLuma(hdr: Row, bytes: Array[Byte]): Row =
    if (hdr eq nullImage) hdr
    else Row(hdr(0), hdr(1), hdr(2), hdr(3), hdr(4), pixelLuma(bytes))

  /** Mean Rec.601 luma over every decoded pixel, or null when the
    * payload doesn't decode. The decode is the JDK's own `javax.imageio`
    * codec (PNG/JPEG/GIF readers ship with the JRE — public API, no
    * external dependency); file-backed stream caching is disabled so a
    * 1000-executor decode never writes temp files. Channel SUMS
    * accumulate in longs (exact), the two floating ops are the channel
    * means and the weighted combine — so a constant-color image yields
    * EXACTLY `0.299·r + 0.587·g + 0.114·b`, the value an oracle can
    * predict from the construction parameters.
    *
    * Decodes are capped at 64 MP, and the cap is enforced from the
    * reader's HEADER probe (`ImageReader.getWidth/getHeight` read only
    * the metadata) BEFORE any raster is allocated — a tiny payload whose
    * header lies (a PNG declaring 60000×60000) is rejected without ever
    * asking the codec for a multi-GB allocation. Only non-fatal
    * exceptions map to null; a VM error (OOM from a genuinely huge
    * in-cap decode) propagates and fails the task instead of silently
    * destabilizing co-resident tasks with a poisoned heap.
    */
  private def pixelLuma(bytes: Array[Byte]): java.lang.Double = {
    javax.imageio.ImageIO.setUseCache(false)
    val iis = try {
      javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
    } catch { case scala.util.control.NonFatal(_) => null }
    if (iis == null) return null
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) null
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0); val h = reader.getHeight(0)
          val n = w.toLong * h
          if (w <= 0 || h <= 0 || n > 64_000_000L) null
          else {
            val img = reader.read(0)
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
                x += 1
              }
              y += 1
            }
            val luma = 0.299 * (sr.toDouble / n) + 0.587 * (sg.toDouble / n) +
              0.114 * (sb.toDouble / n)
            math.round(luma * 1e6) / 1e6
          }
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => null }
    finally iis.close()
  }

  private val nullImage = Row(null, null, null, null, null, null)

  /** Test access to the image header dispatch ([[decodeOne]]). */
  private[ml] def parseImage(bytes: Array[Byte]): Row = decodeOne(bytes)

  private def beU32i(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
    ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  private def beU16i(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)

  /** PNG: the IHDR chunk is REQUIRED first (offset 8): length must read
    * 13, type "IHDR"; width/height u32 BE, bit depth u8. Zero or
    * over-2³¹ dimensions are malformed.
    */
  private def parsePng(b: Array[Byte]): Row = {
    if (b.length < 33) return nullImage
    if (beU32i(b, 8) != 13L) return nullImage
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return nullImage
    val w = beU32i(b, 16); val h = beU32i(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue)
      return nullImage
    Row("png", w.toInt, h.toInt, (b(24) & 0xFF), 1, null)
  }

  /** JPEG: walk marker segments from offset 2 until a SOF frame header
    * (precision u8, height u16 BE, width u16 BE); declared segment
    * lengths drive the cursor (bounds-checked — the RIFF frozen-cursor
    * lesson); scan-start/EOI before any SOF → malformed. Spec
    * conformance: consecutive 0xFF fill bytes before a marker are
    * PERMITTED padding (ITU T.81 §B.1.1.2) and are skipped, not
    * malformed; the SOF set is every C0–CF frame marker except the
    * non-frame C4 (DHT), C8 (JPG reserved), CC (DAC); a DNL-deferred
    * height (SOF height 0, resolved by a later DNL marker) keeps the
    * width/precision facts with a null height rather than rejecting a
    * standards-valid file.
    */
  private def parseJpeg(b: Array[Byte]): Row = {
    var o = 2
    while (o + 3 < b.length) {
      if ((b(o) & 0xFF) != 0xFF) return nullImage
      // skip fill bytes: any run of 0xFF before the marker byte
      while (o + 1 < b.length && (b(o + 1) & 0xFF) == 0xFF) o += 1
      if (o + 3 >= b.length) return nullImage
      val marker = b(o + 1) & 0xFF
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7) ||
          marker == 0x01) {
        o += 2 // standalone markers carry no length
      } else if (marker == 0xDA || marker == 0xD9) {
        return nullImage // entropy data / end before any frame header
      } else {
        val segLen = beU16i(b, o + 2)
        if (segLen < 2) return nullImage
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (o + 8 >= b.length || segLen < 8) return nullImage
          val precision = b(o + 4) & 0xFF
          val h = beU16i(b, o + 5); val w = beU16i(b, o + 7)
          if (w == 0) return nullImage
          return Row("jpeg", w, if (h == 0) null else h, precision, 1, null)
        }
        o += 2 + segLen
      }
    }
    nullImage
  }

  /** GIF: logical screen descriptor — width/height u16 LE at 6/8,
    * color resolution bits (packed byte 10, bits 4-6) + 1 as depth.
    */
  private def parseGif(b: Array[Byte]): Row = {
    if (b.length < 13) return nullImage
    val w = (b(6) & 0xFF) | ((b(7) & 0xFF) << 8)
    val h = (b(8) & 0xFF) | ((b(9) & 0xFF) << 8)
    if (w == 0 || h == 0) return nullImage
    Row("gif", w, h, ((b(10) >> 4) & 0x7) + 1, 1, null)
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

  /** 64-bit average-hash (aHash) of an image payload, or null when the
    * payload doesn't decode or is smaller than the 8×8 grid. The
    * perceptual fingerprint behind image DEDUP: re-encoded, resized, or
    * brightness-shifted copies of a picture keep (nearly) the same hash,
    * so near-duplicate images reduce to Hamming distance over longs —
    * [[graft.ml.Dedup.hammingPairs]] + `keepFromPairs` turn that into a
    * dedup decision, extending the text dedup ladder to the image
    * column.
    *
    * EXACT-INTEGER definition (reproducible on any engine, no float
    * resampling): crop to the top-left `(w−w%8)×(h−h%8)` region so all
    * 64 grid cells hold equally many pixels; per-pixel integer luma
    * `(299r + 587g + 114b) / 1000` (floor); cell sums accumulate in
    * longs; bit `cy·8 + cx` (LSB = top-left cell) is set iff
    * `64·cellSum > Σ cellSums` — cross-multiplied, so no division ever
    * happens. Classic aHash (Krawetz 2011, average-hash) resizes with
    * interpolation; block means are the same statistic without a
    * resampler, and the exactness is what lets a SQL oracle predict the
    * hash of a constructed image bit for bit.
    *
    * Decode discipline matches [[pixelLuma]]: header-probed 64 MP cap
    * BEFORE any raster allocation, in-JDK `javax.imageio` codecs,
    * NonFatal → null, VM errors propagate.
    */
  private def aHashOne(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null) return null
    javax.imageio.ImageIO.setUseCache(false)
    val iis = try {
      javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
    } catch { case scala.util.control.NonFatal(_) => null }
    if (iis == null) return null
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) null
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0); val h = reader.getHeight(0)
          if (w < 8 || h < 8 || w.toLong * h > 64_000_000L) null
          else {
            val img = reader.read(0)
            val cw = w / 8; val ch = h / 8
            val sums = new Array[Long](64)
            var y = 0
            while (y < ch * 8) {
              val cy = y / ch
              var x = 0
              while (x < cw * 8) {
                val p = img.getRGB(x, y)
                val l = (299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) +
                  114 * (p & 0xFF)) / 1000
                sums(cy * 8 + x / cw) += l
                x += 1
              }
              y += 1
            }
            var total = 0L; var i = 0
            while (i < 64) { total += sums(i); i += 1 }
            var hash = 0L; i = 0
            while (i < 64) {
              if (64L * sums(i) > total) hash |= (1L << i)
              i += 1
            }
            java.lang.Long.valueOf(hash)
          }
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => null }
    finally iis.close()
  }

  /** Test access to the aHash kernel. */
  private[ml] def aHashBytes(bytes: Array[Byte]): java.lang.Long =
    aHashOne(bytes)

  /** Append the [[aHashOne]] perceptual hash of `bytesCol` as a nullable
    * long column — the same batched mapPartitions kernel shape as
    * [[decodeImages]] (decoder init amortizes per task, never per row).
    */
  def imageAHash(df: DataFrame, bytesCol: String,
                 outCol: String = "ahash"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, LongType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.get(idx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        Row.fromSeq(row.toSeq :+ aHashOne(bytes))
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
  // Audio / document envelopes. Container HEADERS are pure byte layout —
  // these parsers are REAL (RIFF/WAVE, FLAC STREAMINFO, PDF header +
  // page markers), no library needed — and so are integer-PCM sample
  // facts ([[parsePcm]]); only COMPRESSED payload decoding (FLAC
  // samples, video frames) stays behind the stub contract above.
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

  val pcmFeatureSchema: StructType = StructType(Seq(
    StructField("n_vals", LongType),
    StructField("peak_abs", LongType),
    StructField("mean_abs", DoubleType),
    StructField("rms", DoubleType)))

  /** REAL audio SAMPLE facts for PCM WAV — raw PCM needs no codec, just
    * the byte layout, so the former "audio sample payloads are stubbed"
    * note narrows to compressed audio (FLAC) only. Supported: RIFF/WAVE
    * with `fmt` audioFormat 1 (integer PCM), 8-bit unsigned or 16/24-
    * bit signed little-endian, any channel count (stats run over every
    * channel-interleaved value). Amplitudes center at zero (8-bit:
    * v − 128), sums accumulate exactly — |v| in a long (bounded by
    * payload size × 2³¹ < 2⁶³), v² in an unsigned 128-bit hi/lo long
    * pair ([[addSq]]: a 24-bit sample squares to 2⁴⁶ and a 32-bit FLAC
    * sample to 2⁶², so seconds of loud audio overflow a single long) —
    * the only floating ops are the final divisions and one IEEE sqrt,
    * so an oracle predicts mean_abs/rms to round-6 from the
    * construction parameters. FLAC payloads take the REAL codec path
    * ([[FlacCodec.decode]] — lossless, so the same exact-integer stats
    * apply to the decoded samples). Anything else (float PCM,
    * truncated data) → null struct, never a failed job.
    */
  /** The integer-PCM layout of a RIFF/WAVE payload, or None: `(bits,
    * dataOff, n)` with n = total channel-interleaved values. Shared by
    * [[parsePcm]] and [[audioAHash]] — same chunk-walk hardening as
    * [[parseAudio]].
    */
  private def pcmLayout(b: Array[Byte]): Option[(Int, Long, Long)] = {
    if (b == null || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE")
      return None
    var off = 12L
    var fmt = -1; var bits = -1
    var dataOff = -1L; var dataLen = -1L
    while (off + 8 <= b.length) {
      val id = ascii(b, off.toInt, 4)
      val len = le(b, off.toInt + 4, 4)
      val payloadPresent = off + 8 + len <= b.length
      if (id == "fmt " && len >= 16 && payloadPresent) {
        fmt = le(b, off.toInt + 8, 2).toInt
        bits = le(b, off.toInt + 22, 2).toInt
      } else if (id == "data" && payloadPresent) {
        dataOff = off + 8; dataLen = len
      }
      off += 8L + len + (len & 1L)
    }
    if (fmt != 1 || (bits != 8 && bits != 16 && bits != 24) ||
        dataOff < 0 || dataLen <= 0)
      None
    else {
      val n = dataLen / (bits / 8)
      if (n == 0) None else Some((bits, dataOff, n))
    }
  }

  /** Centered sample value t of an integer-PCM payload (8-bit unsigned
    * → v−128; 16/24-bit signed LE).
    */
  private def pcmVal(b: Array[Byte], bits: Int, dataOff: Long,
                     t: Long): Long = {
    val o = (dataOff + t * (bits / 8)).toInt
    if (bits == 8) (b(o) & 0xFF) - 128L
    else if (bits == 16) ((b(o + 1) << 8) | (b(o) & 0xFF)).toShort.toLong
    else // 24-bit: sign-extend via the int shift pair
      ((((b(o + 2) & 0xFF) << 16) | ((b(o + 1) & 0xFF) << 8) |
        (b(o) & 0xFF)) << 8) >> 8
  }

  /** Decoded FLAC samples when the payload IS FLAC, else None — the
    * real codec ([[FlacCodec]]) behind the audio fact/hash kernels.
    * FLAC samples are signed (already zero-centered), so they feed the
    * same exact-integer stats as centered PCM.
    */
  private def flacSamples(b: Array[Byte]): Option[Array[Int]] =
    if (b != null && b.length >= 4 && ascii(b, 0, 4) == "fLaC")
      FlacCodec.decode(b).map(_.samples)
    else None

  /** Exact unsigned 128-bit accumulation of v² (each term ≤ 2⁶² fits a
    * long; the running SUM does not: n·2⁴⁶ for 24-bit PCM overflows a
    * long within ~3 s of loud 44.1 kHz audio, and a 32-bit FLAC sample
    * pair overflows immediately). `lo` is treated as unsigned; a carry
    * is detected by the unsigned wrap. Returns the new (hi, lo).
    */
  @inline private def addSq(hi: Long, lo: Long, v: Long): (Long, Long) = {
    val nlo = lo + v * v
    (if (java.lang.Long.compareUnsigned(nlo, lo) < 0) hi + 1 else hi, nlo)
  }

  /** The 128-bit (hi, unsigned lo) sum as a double — exact until the
    * value exceeds 2⁵³ (where double itself rounds; rms is a double
    * anyway, and the division/sqrt below are the only lossy steps).
    */
  @inline private def u128ToDouble(hi: Long, lo: Long): Double =
    hi.toDouble * 1.8446744073709552E19 +
      ((lo >>> 1).toDouble * 2.0 + (lo & 1L))

  private[ml] def sampleFacts(vals: Array[Int]): Row = {
    val n = vals.length.toLong
    if (n == 0) return null
    var sumAbs = 0L; var sqHi = 0L; var sqLo = 0L; var peak = 0L
    var i = 0
    while (i < vals.length) {
      val v = vals(i).toLong
      val a = math.abs(v)
      sumAbs += a
      val s = addSq(sqHi, sqLo, v); sqHi = s._1; sqLo = s._2
      if (a > peak) peak = a
      i += 1
    }
    Row(n, peak,
      math.round(sumAbs.toDouble / n * 1e6) / 1e6,
      math.round(math.sqrt(u128ToDouble(sqHi, sqLo) / n) * 1e6) / 1e6)
  }

  private[ml] def parsePcm(b: Array[Byte]): Row = {
    val flac = flacSamples(b)
    if (flac.isDefined) return sampleFacts(flac.get)
    val (bits, dataOff, n) = pcmLayout(b) match {
      case Some(l) => l
      case None => return null
    }
    var sumAbs = 0L; var sqHi = 0L; var sqLo = 0L; var peak = 0L
    var t = 0L
    while (t < n) {
      val v = pcmVal(b, bits, dataOff, t)
      val a = math.abs(v)
      sumAbs += a
      val s = addSq(sqHi, sqLo, v); sqHi = s._1; sqLo = s._2
      if (a > peak) peak = a
      t += 1
    }
    Row(n, peak,
      math.round(sumAbs.toDouble / n * 1e6) / 1e6,
      math.round(math.sqrt(u128ToDouble(sqHi, sqLo) / n) * 1e6) / 1e6)
  }

  /** 64-bit perceptual AUDIO hash of an integer-PCM WAV payload, or
    * null: the [[aHashOne]] scheme over FRAME ENERGIES instead of grid
    * cells — crop to 64 equal frames of ⌊n/64⌋ values, frame value =
    * Σ|centered sample| (exact longs), bit f set iff 64·S_f > ΣS
    * (cross-multiplied, no division). GAIN-INVARIANT by construction
    * (uniform k·v scales every frame sum and the total alike), so a
    * louder re-master of the same clip hashes identically — the audio
    * analog of aHash's brightness invariance. Needs ≥ 64 values; FLAC
    * payloads hash over their REAL decoded samples ([[FlacCodec]]), so
    * a WAV clip and its lossless FLAC encoding carry the SAME
    * fingerprint and collapse in media dedup.
    */
  private def audioAHashOne(b: Array[Byte]): java.lang.Long = {
    val sampleAt: (Long => Long, Long) = flacSamples(b) match {
      case Some(vals) =>
        ((t: Long) => vals(t.toInt).toLong, vals.length.toLong)
      case None =>
        pcmLayout(b) match {
          case Some((bits, dataOff, n)) =>
            ((t: Long) => pcmVal(b, bits, dataOff, t), n)
          case None => return null
        }
    }
    val (vAt, n) = sampleAt
    if (n < 64) return null
    val fl = n / 64
    val sums = new Array[Long](64)
    var f = 0
    while (f < 64) {
      var t = f * fl
      val end = t + fl
      var s = 0L
      while (t < end) { s += math.abs(vAt(t)); t += 1 }
      sums(f) = s
      f += 1
    }
    var total = 0L; var i = 0
    while (i < 64) { total += sums(i); i += 1 }
    var hash = 0L; i = 0
    while (i < 64) {
      if (64L * sums(i) > total) hash |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** Test access to the audio-hash kernel. */
  private[ml] def audioAHashBytes(b: Array[Byte]): java.lang.Long =
    audioAHashOne(b)

  /** Append the [[audioAHashOne]] perceptual hash of `bytesCol` as a
    * nullable long column — feeds [[graft.ml.Dedup.hammingPairs]] /
    * `keepFromPairs` exactly like [[imageAHash]], extending perceptual
    * dedup to the audio column.
    */
  def audioAHash(df: DataFrame, bytesCol: String,
                 outCol: String = "ahash"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, LongType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.get(idx) match {
          case bb: Array[Byte] => bb
          case _ => null
        }
        Row.fromSeq(row.toSeq :+ audioAHashOne(bytes))
      }
    }(enc)
  }

  /** Batched PCM sample-fact extraction ([[parsePcm]]): input columns +
    * `pcm_features` struct — the audio counterpart of the image pixel
    * fact, same mapPartitions kernel shape.
    */
  def decodePcm(df: DataFrame, bytesCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("pcm_features", pcmFeatureSchema))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.get(idx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        Row.fromSeq(row.toSeq :+ parsePcm(bytes))
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

  // -------------------------------------------------------------------
  // Video envelope: ISO-BMFF (MP4/MOV) box walk. Same doctrine as audio:
  // the CONTAINER header is pure byte layout and gets a real parser
  // (brand, movie timescale/duration, track count, video track
  // dimensions from tkhd, handler type from trak/mdia/hdlr); only the
  // codec payload (frame pixels) stays behind the stub contract.
  // -------------------------------------------------------------------

  val videoFeatureSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("brand", StringType),
    StructField("timescale", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_tracks", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Walk the ISO-BMFF boxes in `[start, end)`, invoking `f(type,
    * payloadStart, payloadEnd)` per box. Returns false on a malformed
    * layout (declared size smaller than its own header, or overrunning
    * the window) — the caller must then yield a null envelope, never a
    * guess. All cursor arithmetic is in Long: a 32-bit size of
    * 0xFFFFFFFF stays positive and simply fails the bounds check (the
    * RIFF walk's frozen-cursor lesson). size==1 → 64-bit largesize
    * follows; size==0 → box extends to the end of the window.
    */
  private def walkBoxes(b: Array[Byte], start: Long, end: Long)(
      f: (String, Long, Long) => Unit): Boolean = {
    var off = start
    var ok = true
    while (ok && off + 8 <= end) {
      val size32 = be(b, off.toInt, 4)
      val typ = ascii(b, off.toInt + 4, 4)
      var header = 8L
      var size = size32
      if (size32 == 1L && off + 16 <= end) {
        size = be(b, off.toInt + 8, 8); header = 16L
      } else if (size32 == 0L) size = end - off
      // a negative 64-bit largesize (top bit set) is < header and fails
      if (size < header || off + size > end) ok = false
      else { f(typ, off + header, off + size); off += size }
    }
    ok
  }

  /** Parse one MP4/ISO-BMFF container header. Recognition rule: the
    * first box must be `ftyp` (the de-facto requirement for modern
    * files). Extracted: major brand, movie timescale + duration (mvhd
    * v0/v1), track count, and the FIRST video track's presentation
    * width/height (tkhd 16.16 fixed point, track declared `vide` by
    * its trak/mdia/hdlr handler). Any malformed box layout anywhere in
    * the walk yields null — well-formed or null, never a guess.
    */
  private[ml] def parseMp4(b: Array[Byte]): Row = {
    if (b == null || b.length < 16 || ascii(b, 4, 4) != "ftyp") return null
    var bad = false
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var durUnknown = false
    var nTracks = 0
    var vidW: Integer = null
    var vidH: Integer = null
    val ok = walkBoxes(b, 0L, b.length.toLong) { (typ, ps, pe) =>
      typ match {
        case "ftyp" =>
          if (brand == null && pe - ps >= 4) brand = ascii(b, ps.toInt, 4)
        case "moov" =>
          val okMoov = walkBoxes(b, ps, pe) { (t2, qs, qe) =>
            t2 match {
              case "mvhd" =>
                // unsigned-32 extremes (ISO 14496-12 §8.2.2): the
                // all-ones duration is the spec'd "duration cannot be
                // determined" sentinel (fragmented/live captures) —
                // surfaced as a NULL duration_ms, not a ~13-hour guess;
                // a v1 duration that would overflow the *1000 ms
                // conversion is treated the same (garbage-tolerant,
                // never a wrapped number)
                val v = if (qe - qs >= 1) b(qs.toInt) & 0xff else -1
                if (v == 0 && qe - qs >= 20) {
                  timescale = be(b, qs.toInt + 12, 4)
                  duration = be(b, qs.toInt + 16, 4)
                  if (duration == 0xffffffffL) durUnknown = true
                } else if (v == 1 && qe - qs >= 32) {
                  timescale = be(b, qs.toInt + 20, 4)
                  duration = be(b, qs.toInt + 24, 8)
                  if (duration == -1L || duration > Long.MaxValue / 1000)
                    durUnknown = true
                } else bad = true
              case "trak" =>
                nTracks += 1
                var w = -1; var h = -1; var isVideo = false
                val okTrak = walkBoxes(b, qs, qe) { (t3, rs, re) =>
                  t3 match {
                    case "tkhd" =>
                      val v = if (re - rs >= 1) b(rs.toInt) & 0xff else -1
                      val wOff = if (v == 1) 88 else 76
                      if ((v == 0 || v == 1) && re - rs >= wOff + 8) {
                        w = (be(b, rs.toInt + wOff, 4) >>> 16).toInt
                        h = (be(b, rs.toInt + wOff + 4, 4) >>> 16).toInt
                      } else bad = true
                    case "mdia" =>
                      val okMdia = walkBoxes(b, rs, re) { (t4, ss, se) =>
                        if (t4 == "hdlr" && se - ss >= 12
                            && ascii(b, ss.toInt + 8, 4) == "vide")
                          isVideo = true
                      }
                      if (!okMdia) bad = true
                    case _ => ()
                  }
                }
                if (!okTrak) bad = true
                if (isVideo && vidW == null && w >= 0) { vidW = w; vidH = h }
              case _ => ()
            }
          }
          if (!okMoov) bad = true
        case _ => ()
      }
    }
    // timescale is u32: a value above Int.MaxValue would wrap negative
    // in the Int struct field — no real container uses one; malformed
    if (!ok || bad || brand == null || timescale <= 0
        || timescale > Int.MaxValue || (duration < 0 && !durUnknown)) null
    else {
      val durMs: java.lang.Long =
        if (durUnknown) null else duration * 1000L / timescale
      Row("mp4", brand, timescale.toInt, durMs, nTracks, vidW, vidH)
    }
  }

  /** Batched video-envelope extraction (real ISO-BMFF box walk, see
    * [[parseMp4]]): input columns + `video_features` struct.
    */
  def decodeVideo(df: DataFrame, bytesCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("video_features", videoFeatureSchema))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.get(idx) match {
          case b: Array[Byte] => b
          case _ => null
        }
        Row.fromSeq(row.toSeq :+ parseMp4(bytes))
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

  /** Mono 8-bit FLAC with the SAME sawtooth samples as [[wavPcmBytes]]
    * (centered: `(base + t·step) mod 256 − 128`), built per row by the
    * real [[FlacCodec]] encoder in a mapPartitions kernel (FLAC needs
    * CRCs and Rice bit-packing — not Column algebra; kernel-side codec
    * work is the documented batched exception). A small block size
    * forces MULTI-FRAME streams, so an oracle round trip exercises
    * frame sequencing, not just one subframe. The oracle predicts the
    * decode facts from the sawtooth parameters alone — identical SQL to
    * the WAV leg, which is the point: encode→decode must be identity.
    */
  def flacSawtoothBytes(df: DataFrame, nCol: String, baseCol: String,
                        stepCol: String, outCol: String,
                        sampleRate: Int = 8000,
                        blockSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val (ni, bi, si) = (df.schema.fieldIndex(nCol),
      df.schema.fieldIndex(baseCol), df.schema.fieldIndex(stepCol))
    df.mapPartitions { it =>
      it.map { row =>
        val n = row.getInt(ni); val b0 = row.getInt(bi)
        val st = row.getInt(si)
        val vals = Array.tabulate(n)(t =>
          math.floorMod(b0 + t * st, 256) - 128)
        Row.fromSeq(row.toSeq :+
          FlacCodec.encode(vals, sampleRate, 1, 8, blockSize))
      }
    }(enc)
  }

  /** Mono 8-bit PCM WAV with a SAWTOOTH payload from Catalyst
    * expressions: sample t is the unsigned byte `(base + t·step) mod
    * 256`, so the [[parsePcm]] sample facts (peak/mean/rms of the
    * centered amplitudes) are predictable from the construction
    * parameters alone — the audio counterpart of [[pngGradientBytes]].
    * Same 44-byte canonical header as [[wavBytes]].
    */
  def wavPcmBytes(sampleRate: Column, nSamples: Column, base: Column,
                  step: Column): Column = {
    val n = nSamples.cast("long")
    def vAt(t: Column): Column =
      pmod(base.cast("long") + t * step.cast("long"), lit(256L))
    val payloadHex = array_join(
      transform(sequence(lit(0L), n - lit(1L)),
        t => lpad(lower(hex(vAt(t))), 2, "0")), "")
    val hexStr = concat(
      lit("52494646"),
      leHex(n + 36, 4),
      lit("57415645"),
      lit("666d7420"),
      leHex(lit(16), 4),
      leHex(lit(1), 2),                 // PCM
      leHex(lit(1), 2),                 // mono
      leHex(sampleRate, 4),
      leHex(sampleRate, 4),             // byteRate = rate × 1 × 1
      leHex(lit(1), 2),                 // block align
      leHex(lit(8), 2),                 // 8-bit
      lit("64617461"),
      leHex(n, 4),
      payloadHex)
    unhex(hexStr)
  }

  // ---- expression-side MP4 builder (for the oracle round-trip) -------

  private def beHex(v: Column, nBytes: Int): Column =
    concat((nBytes - 1 to 0 by -1).map(i =>
      lpad(lower(hex(shiftrightunsigned(v.cast("long"), 8 * i) % 256)),
        2, "0")): _*)

  /** Minimal PNG: 8-byte magic + a single IHDR chunk (length 13, type,
    * width/height u32 BE, bit depth, color type 2 / truecolor,
    * compression 0, filter 0, interlace 0, zeroed CRC — the parser
    * reads layout, not checksums), built ENTIRELY from Catalyst
    * expressions. Same construction/parse round-trip contract as
    * [[wavBytes]]/[[mp4Bytes]]; byte layout pinned separately by golden
    * bytes in MultimodalSpec.
    */
  def pngBytes(width: Column, height: Column, bitDepth: Column): Column =
    unhex(concat(
      lit("89504e470d0a1a0a"),  // magic
      lit("0000000d"),          // IHDR length 13
      lit("49484452"),          // "IHDR"
      beHex(width, 4),
      beHex(height, 4),
      beHex(bitDepth, 1),
      lit("02"),                // color type: truecolor
      lit("000000"),            // compression, filter, interlace
      lit("00000000")))         // CRC (unchecked by the parser)

  /** A fully DECODABLE PNG from Catalyst expressions: magic + IHDR
    * (8-bit truecolor, REAL crc32 via the engine's `crc32` — the PNG
    * chunk CRC is exactly CRC-32/ISO-HDLC) + one IDAT whose zlib
    * stream is a single stored-deflate block of unfiltered scanlines,
    * every pixel the constant `(gray, gray, gray)`, with the Adler-32
    * checksum in closed form (all pixel bytes equal ⇒ s1/s2 are
    * polynomial in w, h, gray — exact integer arithmetic, mod 65521 at
    * the end) + IEND. Unlike [[pngBytes]] (header-only, zeroed CRC),
    * this one round-trips through a real codec, so the pixel fact
    * (mean_luma = 0.299·g + 0.587·g + 0.114·g) is oracle-predictable
    * from the construction parameters alone.
    *
    * Stored-deflate blocks cap at 65535 payload bytes, so
    * `(1 + 3·width)·height` must stay under that (w, h ≤ 128 is always
    * safe) — a TEST-DATA builder bound, not a decoder bound.
    */
  def pngPixelBytes(width: Column, height: Column, gray: Column): Column = {
    val w = width.cast("long"); val h = height.cast("long")
    val v = gray.cast("long")
    val rowBytes = lit(3L) * w + lit(1L)       // filter byte + 3w pixels
    val dataLen = rowBytes * h                 // raw deflate payload
    val vHex = lpad(lower(hex(v)), 2, "0")
    val rowHex = concat(lit("00"), array_join(
      transform(sequence(lit(1), (lit(3L) * w).cast("int")), _ => vHex), ""))
    val dataHex = array_join(
      transform(sequence(lit(1), h.cast("int")), _ => rowHex), "")
    // Adler-32 of h rows of [0x00, v × 3w]: before row r, s1_r = 1+3wvr;
    // the row adds (3w+1)·s1_r + v·3w(3w+1)/2 to s2 and 3wv to s1.
    val s1 = pmod(lit(1L) + lit(3L) * w * h * v, lit(65521L))
    val s2 = pmod(
      (lit(3L) * w + lit(1L)) *
        (h + lit(3L) * w * v * h * (h - lit(1L)) / lit(2L)) +
        h * v * lit(3L) * w * (lit(3L) * w + lit(1L)) / lit(2L),
      lit(65521L))
    val zlibHex = concat(
      lit("7801"),                             // zlib header, no preset dict
      lit("01"),                               // BFINAL=1, BTYPE=00 (stored)
      leHex(dataLen, 2),
      leHex(lit(0xFFFFL) - dataLen, 2),        // NLEN = ones'-complement LEN
      dataHex,
      beHex(s2 * lit(65536L) + s1, 4))
    val ihdrBodyHex = concat(lit("49484452"),  // "IHDR" + 13 data bytes
      beHex(w, 4), beHex(h, 4),
      lit("08"),                               // bit depth 8
      lit("02"),                               // color type 2 (truecolor)
      lit("000000"))                           // compression/filter/interlace
    val idatBodyHex = concat(lit("49444154"), zlibHex)
    unhex(concat(
      lit("89504e470d0a1a0a"),
      lit("0000000d"), ihdrBodyHex,
      lpad(lower(hex(crc32(unhex(ihdrBodyHex)))), 8, "0"),
      beHex(dataLen + lit(11L), 4), idatBodyHex,
      lpad(lower(hex(crc32(unhex(idatBodyHex)))), 8, "0"),
      lit("0000000049454e44ae426082")))        // IEND + its constant CRC
  }

  /** A decodable VERTICAL-GRADIENT truecolor PNG from Catalyst
    * expressions: scanline y is the constant gray `(base + y·step) mod
    * 256` (r = g = b), so a decoder-side cell statistic — the
    * [[imageAHash]] grid — is predictable from the construction
    * parameters alone, which is what lets a SQL oracle gate a REAL
    * encode→decode→hash round trip. Same stored-deflate + closed-form
    * Adler-32 scheme as [[pngPixelBytes]], generalized to per-row
    * values: with L = 3w, R = L+1, len = R·h, A = Σ v_y, B = Σ y·v_y,
    *
    *   s1 = 1 + L·A                       (mod 65521)
    *   s2 = len + L·(len·A − R·B) − (L·R/2)·A   (mod 65521)
    *
    * (position-weighted byte sum over rows of [0x00, v_y × L]; L·R is a
    * product of consecutive integers, so the /2 is exact). Closed-form
    * intermediates stay inside Long for the builder's test-scale bound
    * (same 65535-byte stored-block cap as pngPixelBytes: w, h ≤ 128 is
    * always safe). Spec-verified against `java.util.zip.Adler32`.
    */
  def pngGradientBytes(width: Column, height: Column, base: Column,
                       step: Column): Column = {
    val w = width.cast("long"); val h = height.cast("long")
    val L = lit(3L) * w
    val R = L + lit(1L)
    val dataLen = R * h
    def vAt(y: Column): Column =
      pmod(base.cast("long") + y * step.cast("long"), lit(256L))
    val ys = sequence(lit(0L), h - lit(1L))
    def lsum(f: Column => Column): Column =
      aggregate(ys, lit(0L), (acc, y) => acc + f(y))
    val a = lsum(vAt)
    val b = lsum(y => y * vAt(y))
    val s1 = pmod(lit(1L) + L * a, lit(65521L))
    val lr2 = {
      val p = L * R
      ((p - pmod(p, lit(2L))) / lit(2L)).cast("long")
    }
    val s2 = pmod(dataLen + L * (dataLen * a - R * b) - lr2 * a,
      lit(65521L))
    val rowHex = (y: Column) => concat(lit("00"), array_join(
      transform(sequence(lit(1), L.cast("int")),
        _ => lpad(lower(hex(vAt(y))), 2, "0")), ""))
    val dataHex = array_join(transform(ys, y => rowHex(y)), "")
    val zlibHex = concat(
      lit("7801"), lit("01"),
      leHex(dataLen, 2), leHex(lit(0xFFFFL) - dataLen, 2),
      dataHex,
      beHex(s2 * lit(65536L) + s1, 4))
    val ihdrBodyHex = concat(lit("49484452"),
      beHex(w, 4), beHex(h, 4),
      lit("08"), lit("02"), lit("000000"))
    val idatBodyHex = concat(lit("49444154"), zlibHex)
    unhex(concat(
      lit("89504e470d0a1a0a"),
      lit("0000000d"), ihdrBodyHex,
      lpad(lower(hex(crc32(unhex(ihdrBodyHex)))), 8, "0"),
      beHex(dataLen + lit(11L), 4), idatBodyHex,
      lpad(lower(hex(crc32(unhex(idatBodyHex)))), 8, "0"),
      lit("0000000049454e44ae426082")))
  }

  /** Unity transform matrix (tkhd/mvhd): 0x00010000 diagonals, 0x40000000
    * in the w position — 36 bytes as hex.
    */
  private val matrixHex =
    "00010000" + "00000000" + "00000000" +
    "00000000" + "00010000" + "00000000" +
    "00000000" + "00000000" + "40000000"

  /** Canonical minimal MP4: `ftyp(isom)` + `moov(mvhd + trak(tkhd +
    * mdia(hdlr 'vide')))`, built ENTIRELY from Catalyst expressions.
    * Every box is fixed-size (ftyp 20, mvhd 108, tkhd 92, hdlr 33,
    * mdia 41, trak 141, moov 257 — 277 bytes total), so the size words
    * are constants and only timescale/duration/width/height vary per
    * row. The absolute byte layout is pinned separately by golden
    * hand-assembled bytes in MultimodalSpec (including a realistic
    * variant with sibling boxes the builder does NOT emit), so the
    * oracle round-trip gates real-MP4 parsing, not self-inversion.
    */
  def mp4Bytes(timescale: Column, duration: Column, width: Column,
               height: Column): Column = {
    val hexStr = concat(
      // ftyp (20): major 'isom', minor 0x200, compatible 'isom'
      lit("00000014" + "66747970" + "69736f6d" + "00000200" + "69736f6d"),
      // moov (257)
      lit("00000101" + "6d6f6f76"),
      //   mvhd (108) v0
      lit("0000006c" + "6d766864" + "00000000"   // ver/flags
        + "00000000" + "00000000"),              // creation, modification
      beHex(timescale, 4),
      beHex(duration, 4),
      lit("00010000" + "0100" + "0000"           // rate 1.0, volume, reserved
        + "0000000000000000"                     // reserved[2]
        + matrixHex
        + "000000000000000000000000000000000000000000000000" // pre_defined
        + "00000002"),                           // next_track_ID
      //   trak (141)
      lit("0000008d" + "7472616b"),
      //     tkhd (92) v0, flags=7 (enabled|in-movie|in-preview)
      lit("0000005c" + "746b6864" + "00000007"
        + "00000000" + "00000000"                // creation, modification
        + "00000001" + "00000000"),              // track_ID, reserved
      beHex(duration, 4),
      lit("0000000000000000"                     // reserved[2]
        + "0000" + "0000" + "0000" + "0000"      // layer, alt, volume, reserved
        + matrixHex),
      beHex(width, 2), lit("0000"),              // 16.16 fixed width
      beHex(height, 2), lit("0000"),             // 16.16 fixed height
      //     mdia (41) > hdlr (33) 'vide'
      lit("00000029" + "6d646961"
        + "00000021" + "68646c72" + "00000000"   // ver/flags
        + "00000000" + "76696465"                // pre_defined, handler
        + "000000000000000000000000"             // reserved[3]
        + "00"))                                 // empty name (NUL)
    unhex(hexStr)
  }
}
