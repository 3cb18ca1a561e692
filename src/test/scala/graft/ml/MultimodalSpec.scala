package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal envelopes. The audio/PDF header parsers are REAL byte
  * parsers (unlike the deliberately-stubbed pixel decode), so they get
  * golden-byte gates: hand-assembled WAV/FLAC/PDF bytes whose layout
  * comes straight from the container specs, asserted field by field.
  * The expression-built WAV constructor is additionally checked against
  * the hand assembly — the oracle round-trip (ml_multimodal_audio)
  * then means "parses REAL WAV correctly", not merely "inverts its own
  * builder".
  */
class MultimodalSpec extends SparkSpec {

  // -- hand-assembled golden bytes ------------------------------------

  /** 44.1 kHz stereo 16-bit PCM, 4 samples: the textbook 44-byte header. */
  private def goldenWav: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 16)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                 // PCM
      .putShort(2)                 // channels
      .putInt(44100)
      .putInt(44100 * 2 * 2)       // byte rate
      .putShort(4)                 // block align
      .putShort(16)                // bits
      .put("data".getBytes("US-ASCII")).putInt(16)
      .put(new Array[Byte](16))
    bb.array()
  }

  /** fLaC + STREAMINFO: 48 kHz, 1 channel, 24-bit, 96000 samples.
    * The 64-bit packed word: rate(20) | ch-1(3) | bits-1(5) | total(36).
    */
  private def goldenFlac: Array[Byte] = {
    val word = (48000L << 44) | (0L << 41) | (23L << 36) | 96000L
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 18)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put("fLaC".getBytes("US-ASCII"))
      .put(Array[Byte](0x00, 0x00, 0x00, 0x22)) // last=0,type=0,len=34
      .putShort(4096).putShort(4096)            // min/max block size
      .put(Array[Byte](0, 0, 0)).put(Array[Byte](0, 0, 0)) // frame sizes
      .putLong(word)
    bb.array()
  }

  private def goldenPdf: Array[Byte] =
    ("%PDF-1.7\n" +
      "1 0 obj <</Type /Catalog>> endobj\n" +
      "2 0 obj <</Type /Pages /Count 2>> endobj\n" +
      "3 0 obj <</Type /Page>> endobj\n" +
      "4 0 obj <</Type /Page>> endobj\n%%EOF").getBytes("US-ASCII")

  test("golden WAV parses to its spec fields") {
    val r = Multimodal.parseAudio(goldenWav)
    assert(r != null)
    assert(r.getString(0) == "wav")
    assert(r.getInt(1) == 44100 && r.getInt(2) == 2 && r.getInt(3) == 16)
    assert(r.getLong(4) == 4L)                  // 16 bytes / block 4
    assert(r.getLong(5) == 4L * 1000 / 44100)   // 0 ms — integer contract
  }

  test("golden FLAC STREAMINFO parses to its spec fields") {
    val r = Multimodal.parseAudio(goldenFlac)
    assert(r != null)
    assert(r.getString(0) == "flac")
    assert(r.getInt(1) == 48000 && r.getInt(2) == 1 && r.getInt(3) == 24)
    assert(r.getLong(4) == 96000L && r.getLong(5) == 2000L)
  }

  test("golden PDF: version read, /Type /Page counted, /Pages excluded") {
    val r = Multimodal.parsePdf(goldenPdf)
    assert(r != null)
    assert(r.getString(0) == "pdf" && r.getString(1) == "1.7")
    assert(r.getInt(2) == 2, s"page count: $r")
    assert(r.getInt(3) == goldenPdf.length)
  }

  test("garbage, truncated, and null bytes yield null envelopes, never throws") {
    assert(Multimodal.parseAudio(null) == null)
    assert(Multimodal.parseAudio("not audio at all".getBytes) == null)
    assert(Multimodal.parseAudio(goldenWav.take(10)) == null)
    assert(Multimodal.parsePdf(null) == null)
    assert(Multimodal.parsePdf("plain text".getBytes) == null)
    assert(Multimodal.parseAudio(goldenFlac.take(12)) == null)
  }

  test("malformed RIFF chunk length cannot freeze or crash the walk") {
    // a chunk declaring length 0xFFFFFFF8: the former Int truncation
    // made it -8, leaving the cursor frozen (infinite loop in an
    // executor task); Long arithmetic must just end the walk → null
    val bb = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(16)
      .put("WAVE".getBytes("US-ASCII"))
      .put("junk".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
      .putInt(0)
    assert(Multimodal.parseAudio(bb.array()) == null)
  }

  test("fLaC whose first block is not STREAMINFO is null, not a guess") {
    val b = goldenFlac.clone()
    b(4) = 0x01 // PADDING block type — bytes 18-25 are NOT the stream word
    assert(Multimodal.parseAudio(b) == null)
  }

  test("wavBytes with zero samples is exactly the 44-byte header") {
    val s = spark
    import s.implicits._
    val built = Seq(1).toDF("x")
      .select(Multimodal.wavBytes(lit(8000), lit(1), lit(8), lit(0)).as("b"))
      .collect().head.getAs[Array[Byte]](0)
    assert(built.length == 44, s"zero-sample WAV carried junk: ${built.length}")
    val r = Multimodal.parseAudio(built)
    assert(r != null && r.getLong(4) == 0L)
  }

  test("expression-built WAV is byte-identical to the hand assembly") {
    val s = spark
    import s.implicits._
    val built = Seq(1).toDF("x")
      .select(Multimodal.wavBytes(lit(44100), lit(2), lit(16), lit(4))
        .as("b"))
      .collect().head.getAs[Array[Byte]](0)
    assert(built.toSeq == goldenWav.toSeq,
      s"expression bytes diverge from spec assembly at index " +
        s"${built.toSeq.zip(goldenWav.toSeq).indexWhere(t => t._1 != t._2)}")
  }

  // -- ISO-BMFF (MP4) golden bytes ------------------------------------

  private def beInt(vs: Int*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    vs.foreach(bb.putInt); bb.array()
  }
  private def beShort(vs: Int*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 * vs.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    vs.foreach(v => bb.putShort(v.toShort)); bb.array()
  }
  private def beLong(vs: Long*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * vs.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    vs.foreach(bb.putLong); bb.array()
  }
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def mp4Box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(8 + body.length).put(fourcc(typ)).put(body)
    bb.array()
  }
  private val unityMatrix = beInt(0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
    0x40000000)

  private def hdlrBox(handler: String, name: String = ""): Array[Byte] =
    mp4Box("hdlr", beInt(0, 0), fourcc(handler), new Array[Byte](12),
      name.getBytes("US-ASCII") :+ 0.toByte)

  private def tkhdV0(trackId: Int, dur: Int, w: Int, h: Int): Array[Byte] =
    mp4Box("tkhd", beInt(0x7, 0, 0, trackId, 0, dur), beLong(0L),
      beShort(0, 0, 0, 0), unityMatrix, beInt(w << 16, h << 16))

  /** A REALISTIC file the expression builder does NOT emit: mp42 brand
    * with two compatible brands, a free box, v1 mvhd (64-bit times),
    * the SOUND track first (its tkhd says 0×0 — the parser must not
    * take dimensions from it), the video track second with mdhd and a
    * named hdlr as siblings, and a trailing largesize (size==1 +
    * 64-bit) mdat. 90 kHz timescale, duration 630000 → 7000 ms.
    */
  private def goldenMp4: Array[Byte] = {
    val mvhdV1 = mp4Box("mvhd",
      Array[Byte](1, 0, 0, 0),           // version 1, flags 0
      beLong(0L, 0L),                    // creation, modification (64-bit)
      beInt(90000), beLong(630000L),     // timescale, duration (64-bit)
      beInt(0x10000), beShort(0x0100, 0), beLong(0L),
      unityMatrix, beInt(0, 0, 0, 0, 0, 0), beInt(3))
    val mdhd = mp4Box("mdhd", beInt(0, 0, 0, 90000, 630000), beShort(0x55c4, 0))
    val sounTrak = mp4Box("trak", tkhdV0(1, 630000, 0, 0),
      mp4Box("mdia", mdhd, hdlrBox("soun", "SoundHandler")))
    val videTrak = mp4Box("trak", tkhdV0(2, 630000, 1280, 720),
      mp4Box("mdia", mdhd, hdlrBox("vide", "VideoHandler"),
        mp4Box("minf")))
    val moov = mp4Box("moov", mvhdV1, sounTrak, videTrak)
    val ftyp = mp4Box("ftyp", fourcc("mp42"), beInt(0),
      fourcc("mp42"), fourcc("isom"))
    val free = mp4Box("free", new Array[Byte](8))
    val mdatPayload = new Array[Byte](24)
    val mdat = java.nio.ByteBuffer.allocate(16 + 24)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
      .putInt(1).put(fourcc("mdat")).putLong(16L + 24)
      .put(mdatPayload).array()
    ftyp ++ free ++ moov ++ mdat
  }

  test("golden MP4: v1 mvhd, handler-selected video dims, largesize mdat") {
    val r = Multimodal.parseMp4(goldenMp4)
    assert(r != null)
    assert(r.getString(0) == "mp4" && r.getString(1) == "mp42")
    assert(r.getInt(2) == 90000 && r.getLong(3) == 7000L)
    assert(r.getInt(4) == 2, s"track count: $r")
    assert(r.getInt(5) == 1280 && r.getInt(6) == 720,
      s"dims must come from the vide track, not the first trak: $r")
  }

  test("MP4 with only a sound track: parses with null dimensions") {
    val moov = mp4Box("moov",
      mp4Box("mvhd", beInt(0, 0, 0, 1000, 5000, 0x10000),
        beShort(0x0100, 0), beLong(0L), unityMatrix,
        beInt(0, 0, 0, 0, 0, 0), beInt(2)),
      mp4Box("trak", tkhdV0(1, 5000, 0, 0),
        mp4Box("mdia", hdlrBox("soun"))))
    val ftyp = mp4Box("ftyp", fourcc("isom"), beInt(0x200), fourcc("isom"))
    val r = Multimodal.parseMp4(ftyp ++ moov)
    assert(r != null)
    assert(r.getLong(3) == 5000L && r.getInt(4) == 1)
    assert(r.isNullAt(5) && r.isNullAt(6))
  }

  test("malformed MP4 layouts yield null, never a frozen walk or throw") {
    assert(Multimodal.parseMp4(null) == null)
    assert(Multimodal.parseMp4("not a movie".getBytes) == null)
    assert(Multimodal.parseMp4(goldenMp4.take(30)) == null) // truncated ftyp tail ok, moov cut
    // declared box size smaller than its own header (frozen-cursor bait)
    val tiny = mp4Box("ftyp", fourcc("isom"), beInt(0), fourcc("isom"))
    val badSize = tiny ++ beInt(4) ++ fourcc("moov")
    assert(Multimodal.parseMp4(badSize) == null)
    // box declaring 0xFFFFFFFF bytes over a short payload
    val overrun = tiny ++ beInt(-1) ++ fourcc("moov") ++ new Array[Byte](8)
    assert(Multimodal.parseMp4(overrun) == null)
    // mvhd payload shorter than its declared version needs
    val shortMvhd = tiny ++ mp4Box("moov", mp4Box("mvhd", beInt(0, 0)))
    assert(Multimodal.parseMp4(shortMvhd) == null)
    // mdat-first file: recognition requires ftyp as the opening box
    assert(Multimodal.parseMp4(mp4Box("mdat", new Array[Byte](16))) == null)
  }

  test("mvhd unsigned-32 extremes: unknown-duration sentinel → null ms; wild timescale → null") {
    // duration 0xFFFFFFFF is the spec'd "cannot be determined" sentinel
    // (fragmented/live captures): the envelope parses, duration_ms is
    // NULL — never a ~13-hour guess
    val ftyp = mp4Box("ftyp", fourcc("isom"), beInt(0x200), fourcc("isom"))
    def mvhdV0(ts: Int, dur: Int) = mp4Box("mvhd",
      beInt(0, 0, 0, ts, dur, 0x10000), beShort(0x0100, 0), beLong(0L),
      unityMatrix, beInt(0, 0, 0, 0, 0, 0), beInt(2))
    val live = ftyp ++ mp4Box("moov", mvhdV0(90000, 0xFFFFFFFF.toInt))
    val r = Multimodal.parseMp4(live)
    assert(r != null && r.getInt(2) == 90000, s"$r")
    assert(r.isNullAt(3), s"sentinel duration must surface as null ms: $r")
    // v1 all-ones duration: same sentinel through the 64-bit read
    val mvhdV1Sentinel = mp4Box("mvhd", Array[Byte](1, 0, 0, 0),
      beLong(0L, 0L), beInt(90000), beLong(-1L),
      beInt(0x10000), beShort(0x0100, 0), beLong(0L),
      unityMatrix, beInt(0, 0, 0, 0, 0, 0), beInt(2))
    val r1 = Multimodal.parseMp4(ftyp ++ mp4Box("moov", mvhdV1Sentinel))
    assert(r1 != null && r1.isNullAt(3), s"$r1")
    // timescale beyond Int.MaxValue (u32 top bit set) would wrap
    // negative in the struct — well-formed or null, never a wrap
    val wild = ftyp ++ mp4Box("moov", mvhdV0(0x80000000.toInt, 90000))
    assert(Multimodal.parseMp4(wild) == null)
  }

  test("expression-built MP4 is byte-identical to the hand assembly") {
    val s = spark
    import s.implicits._
    val built = Seq(1).toDF("x")
      .select(Multimodal.mp4Bytes(lit(2000), lit(3000), lit(640), lit(480))
        .as("b"))
      .collect().head.getAs[Array[Byte]](0)
    val mvhd = mp4Box("mvhd", beInt(0, 0, 0, 2000, 3000, 0x10000),
      beShort(0x0100, 0), beLong(0L), unityMatrix,
      beInt(0, 0, 0, 0, 0, 0), beInt(2))
    val trak = mp4Box("trak", tkhdV0(1, 3000, 640, 480),
      mp4Box("mdia", hdlrBox("vide")))
    val hand = mp4Box("ftyp", fourcc("isom"), beInt(0x200), fourcc("isom")) ++
      mp4Box("moov", mvhd, trak)
    assert(built.length == hand.length,
      s"length ${built.length} vs hand ${hand.length}")
    assert(built.toSeq == hand.toSeq,
      s"expression bytes diverge from spec assembly at index " +
        s"${built.toSeq.zip(hand.toSeq).indexWhere(t => t._1 != t._2)}")
    val r = Multimodal.parseMp4(built)
    assert(r != null && r.getInt(2) == 2000 && r.getLong(3) == 1500L
      && r.getInt(5) == 640 && r.getInt(6) == 480)
  }

  test("decodeVideo: batched kernel attaches the feature struct") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, goldenMp4), (2L, "junk bytes".getBytes))
      .toDF("id", "payload")
    val out = Multimodal.decodeVideo(df, "payload")
      .select(col("id"), col("video_features.brand"),
        col("video_features.width"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getInt(2))))
      .toMap
    assert(out(1L) == (Some("mp42"), Some(1280)))
    assert(out(2L) == (None, None))
  }

  test("parser fuzz: no byte soup can throw or hang any envelope parser") {
    // deterministic pseudo-random corpora, including adversarial
    // prefixes that enter each parser's walk before the soup starts —
    // the per-row contract is parse-or-null in bounded time, NEVER a
    // thrown error or a spun cursor inside an executor task
    val rnd = new scala.util.Random(20260814L)
    val prefixes = Seq(Array.emptyByteArray,
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](-1, -1, -1, -1) ++
        "WAVE".getBytes("US-ASCII"),
      "fLaC".getBytes("US-ASCII"),
      "%PDF-".getBytes("US-ASCII"),
      Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes("US-ASCII"),
      Array[Byte](0, 0, 0, 1) ++ "ftyp".getBytes("US-ASCII"), // largesize bait
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A),
      Array[Byte](0xFF.toByte, 0xD8.toByte), // JPEG SOI → segment walk
      "GIF89a".getBytes("US-ASCII"))
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    for (i <- 0 until 300) {
      val body = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(body)
      val bytes = prefixes(i % prefixes.length) ++ body
      Multimodal.parseAudio(bytes) // may be null or a Row — must return
      Multimodal.parsePdf(bytes)
      Multimodal.parseMp4(bytes)
      Multimodal.parseImage(bytes)
      Multimodal.parsePcm(bytes)
      Multimodal.aHashBytes(bytes)
      Multimodal.audioAHashBytes(bytes)
      assert(System.nanoTime() < deadline,
        s"parsers wedged on fuzz case $i (${bytes.take(16).toSeq})")
    }
  }

  test("decodeAudio/decodeDocs: batched kernels attach feature structs") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, goldenWav), (2L, goldenFlac),
        (3L, "junk".getBytes)).toDF("id", "payload")
    val audio = Multimodal.decodeAudio(df, "payload")
      .select(col("id"), col("audio_features.format"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(audio(1L).contains("wav") && audio(2L).contains("flac")
      && audio(3L).isEmpty)
    val docs = Multimodal.decodeDocs(
        Seq((1L, goldenPdf)).toDF("id", "payload"), "payload")
      .select(col("doc_features.n_pages")).collect().head.getInt(0)
    assert(docs == 2)
  }

  // -- image envelope golden bytes --------------------------------------

  /** PNG magic + IHDR: 640x480, bit depth 8, truecolor. */
  private def goldenPng: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 25)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
      .putInt(13).put("IHDR".getBytes("US-ASCII"))
      .putInt(640).putInt(480)
      .put(8.toByte).put(2.toByte)     // bit depth, color type
      .put(0.toByte).put(0.toByte).put(0.toByte) // compr, filter, interlace
      .putInt(0)                       // CRC (layout-only parser)
    bb.array()
  }

  /** JPEG: SOI, an APP0 segment the walk must SKIP, then SOF0
    * (precision 8, 600 high x 800 wide, 3 components).
    */
  private def goldenJpeg: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 + 2 + 2 + 16 + 2 + 2 + 9)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(Array[Byte](0xFF.toByte, 0xD8.toByte))
      .put(Array[Byte](0xFF.toByte, 0xE0.toByte)).putShort(18)
      .put("JFIF\u0000".getBytes("US-ASCII")).put(new Array[Byte](11))
      .put(Array[Byte](0xFF.toByte, 0xC0.toByte)).putShort(11)
      .put(8.toByte).putShort(600).putShort(800).put(3.toByte)
      .put(new Array[Byte](3))
    bb.array()
  }

  /** GIF89a, 320x200 logical screen, color resolution 7 (depth 8). */
  private def goldenGif: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes("US-ASCII"))
      .putShort(320.toShort).putShort(200.toShort)
      .put(0xF7.toByte)                // packed: global table, res 7
      .put(0.toByte).put(0.toByte)
    bb.array()
  }

  test("golden PNG/JPEG/GIF headers parse to their spec fields") {
    val png = Multimodal.parseImage(goldenPng)
    assert(png.getString(0) == "png" && png.getInt(1) == 640 &&
      png.getInt(2) == 480 && png.getInt(3) == 8 && png.getInt(4) == 1)
    val jpg = Multimodal.parseImage(goldenJpeg)
    assert(jpg.getString(0) == "jpeg" && jpg.getInt(1) == 800 &&
      jpg.getInt(2) == 600 && jpg.getInt(3) == 8,
      s"jpeg parsed: $jpg")
    val gif = Multimodal.parseImage(goldenGif)
    assert(gif.getString(0) == "gif" && gif.getInt(1) == 320 &&
      gif.getInt(2) == 200 && gif.getInt(3) == 8)
  }

  test("image parse hardening: malformed magic-matched bytes are null, not stub") {
    // PNG magic but IHDR missing / wrong first-chunk length
    assert(Multimodal.parseImage(goldenPng.take(20)).getString(0) == null)
    val badLen = goldenPng.clone(); badLen(11) = 12
    assert(Multimodal.parseImage(badLen).getString(0) == null)
    // zero-dimension PNG
    val zeroW = goldenPng.clone()
    zeroW(16) = 0; zeroW(17) = 0; zeroW(18) = 0; zeroW(19) = 0
    assert(Multimodal.parseImage(zeroW).getString(0) == null)
    // JPEG that hits SOS before any SOF
    val noSof = Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xDA.toByte, 0, 4, 0, 0)
    assert(Multimodal.parseImage(noSof).getString(0) == null)
    // JPEG with a lying zero segment length cannot loop
    val badSeg = Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xE0.toByte, 0, 0, 0, 0)
    assert(Multimodal.parseImage(badSeg).getString(0) == null)
    // unrecognized bytes keep the documented stub contract
    val stub = Multimodal.parseImage("not an image".getBytes("US-ASCII"))
    assert(stub.getString(0) == "stub" && stub.getInt(4) == 1)
  }

  test("expression-built PNG is byte-identical to the hand assembly") {
    val s = spark
    import s.implicits._
    val built = Seq(1).toDF("x")
      .select(Multimodal.pngBytes(lit(640), lit(480), lit(8)).as("b"))
      .collect().head.getAs[Array[Byte]](0)
    assert(built.toSeq == goldenPng.toSeq,
      s"expression bytes diverge from spec assembly at index " +
        s"${built.toSeq.zip(goldenPng.toSeq).indexWhere(t => t._1 != t._2)}")
  }

  test("pngPixelBytes: a REAL codec decodes the expression-built PNG") {
    val s = spark
    import s.implicits._
    for ((w, h, g) <- Seq((1, 1, 0), (3, 2, 255), (16, 16, 37), (128, 5, 200))) {
      val bytes = Seq(1).toDF("x")
        .select(Multimodal.pngPixelBytes(lit(w), lit(h), lit(g)).as("b"))
        .collect().head.getAs[Array[Byte]](0)
      // independent decode: the JDK codec itself, not our parser — CRCs,
      // zlib stream, and adler closed form all have to be right
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected the built PNG (w=$w h=$h g=$g)")
      assert(img.getWidth == w && img.getHeight == h)
      val p = img.getRGB(w - 1, h - 1)
      assert(((p >> 16) & 0xFF) == g && ((p >> 8) & 0xFF) == g &&
        (p & 0xFF) == g, s"pixel mismatch: got ${p.toHexString}, want gray $g")
    }
  }

  test("kernel pixel fact: mean_luma is the exact Rec.601 value; header-only stays null") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 9, 4, 100), (2L, 2, 2, 0), (3L, 5, 7, 255))
      .toDF("id", "w", "h", "g")
      .withColumn("payload",
        Multimodal.pngPixelBytes(col("w"), col("h"), col("g")))
    val out = Multimodal.decodeImages(df, "payload")
      .select(col("id"), col("g"), col("image_features.mean_luma"),
        col("image_features.width"), col("image_features.height"))
      .collect()
    out.foreach { r =>
      val g = r.getInt(1)
      val want = math.round(
        (0.299 * g + 0.587 * g + 0.114 * g) * 1e6) / 1e6
      assert(r.getDouble(2) === want, s"luma for gray $g")
    }
    // header-only envelope (pngBytes, no IDAT): header facts kept,
    // pixel fact null — the graceful-degradation contract
    val hdrOnly = Seq(1).toDF("x")
      .withColumn("payload", Multimodal.pngBytes(lit(640), lit(480), lit(8)))
    val hr = Multimodal.decodeImages(hdrOnly, "payload")
      .select(col("image_features.format"), col("image_features.width"),
        col("image_features.mean_luma")).collect().head
    assert(hr.getString(0) == "png" && hr.getInt(1) == 640 && hr.isNullAt(2))
  }

  test("lying header: over-cap declared dimensions are refused from the " +
      "reader's header probe, never decoded") {
    val s = spark
    import s.implicits._
    // a REAL tiny PNG (valid zlib stream, valid CRCs) whose IHDR is
    // patched to declare 60000x60000 — with the CRC recomputed so the
    // JDK reader accepts the header. The 64 MP cap must fire on the
    // header PROBE (getWidth/getHeight read metadata only); asking the
    // codec to decode would attempt a multi-GB raster allocation for a
    // payload of a few dozen bytes
    val tiny = Seq(1).toDF("x")
      .select(Multimodal.pngPixelBytes(lit(3), lit(2), lit(7)).as("b"))
      .collect().head.getAs[Array[Byte]](0)
    val lying = tiny.clone()
    val bb = java.nio.ByteBuffer.wrap(lying)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(16, 60000).putInt(20, 60000)
    val crc = new java.util.zip.CRC32()
    crc.update(lying, 12, 4 + 13) // chunk type + IHDR data
    bb.putInt(29, crc.getValue.toInt)
    val r = Multimodal.parseImage(lying)
    assert(r.getString(0) == "png" && r.getInt(1) == 60000 &&
      r.getInt(2) == 60000, s"header facts survive: $r")
    assert(r.isNullAt(5), "over-cap pixel fact must be null, not decoded")
  }

  test("jpeg spec conformance: fill bytes skipped, SOF2 accepted, DNL height null") {
    // goldenJpeg with two 0xFF fill bytes inserted before the SOF marker
    val g = goldenJpeg
    val sofAt = g.length - 13 // SOF0 marker position (2+2+2+16)
    val filled = (g.take(sofAt) ++ Array(0xFF.toByte, 0xFF.toByte) ++
      g.drop(sofAt))
    val fr = Multimodal.parseImage(filled)
    assert(fr.getString(0) == "jpeg" && fr.getInt(1) == 800 &&
      fr.getInt(2) == 600, s"fill bytes broke the walk: $fr")
    // progressive JPEG: SOF2 (0xC2) is already in C0-C3; SOF5 (0xC5) was
    // previously rejected as an unknown segment and walked past into
    // nothing — now a frame header
    val sof5 = filled.clone()
    sof5(sofAt + 3) = 0xC5.toByte
    val p5 = Multimodal.parseImage(sof5)
    assert(p5.getString(0) == "jpeg" && p5.getInt(1) == 800)
    // DNL-deferred height (SOF height 0): width/precision kept, height null
    val dnl = g.clone()
    dnl(sofAt + 5) = 0; dnl(sofAt + 6) = 0
    val dr = Multimodal.parseImage(dnl)
    assert(dr.getString(0) == "jpeg" && dr.getInt(1) == 800 && dr.isNullAt(2),
      s"DNL height: $dr")
    // zero WIDTH is still malformed (no marker defers width)
    val zw = g.clone()
    zw(sofAt + 7) = 0; zw(sofAt + 8) = 0
    assert(Multimodal.parseImage(zw).getString(0) == null)
  }

  /** PNG-encode an arbitrary gray grid with the JDK's own encoder —
    * independent of the expression builders.
    */
  private def encodePng(grid: Array[Array[Int]]): Array[Byte] = {
    val h = grid.length; val w = grid(0).length
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = grid(y)(x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("aHash golden: half-dark/half-light grid sets exactly the light cells") {
    // 16x16, left 8 columns value 0, right 8 columns value 200 → cells
    // cx >= 4 are above the mean in every row band: bits cy*8+cx for
    // cx in 4..7 → 0xF0 per cy byte
    val grid = Array.tabulate(16, 16)((_, x) => if (x < 8) 0 else 200)
    val hash = Multimodal.aHashBytes(encodePng(grid))
    assert(hash != null)
    assert(hash.longValue() == 0xF0F0F0F0F0F0F0F0L,
      f"got ${hash.longValue()}%016x")
    // brightness shift: +40 on every pixel → identical hash (the
    // perceptual invariance that makes this a dedup key)
    val shifted = Array.tabulate(16, 16)((_, x) => if (x < 8) 40 else 240)
    assert(Multimodal.aHashBytes(encodePng(shifted)).longValue() ==
      0xF0F0F0F0F0F0F0F0L)
    // constant image: no cell exceeds the mean → hash 0
    assert(Multimodal.aHashBytes(
      encodePng(Array.fill(8, 8)(123))).longValue() == 0L)
    // under the 8x8 grid → null; byte soup → null
    assert(Multimodal.aHashBytes(encodePng(Array.fill(4, 12)(9))) == null)
    assert(Multimodal.aHashBytes("not an image".getBytes) == null)
  }

  test("aHash: non-multiple-of-8 sizes crop to equal cells; tweak flips few bits") {
    // 19x13 → crop to 16x8: equal cell sizes keep the integer compare
    // exact. Same half/half layout → same mask as the 16x16 case
    val grid = Array.tabulate(13, 19)((_, x) => if (x < 8) 10 else 210)
    val base = Multimodal.aHashBytes(encodePng(grid))
    assert(base != null && base.longValue() == 0xF0F0F0F0F0F0F0F0L,
      f"got ${base.longValue()}%016x")
    // darken ONE light cell region fully → exactly that bit flips
    val tweaked = Array.tabulate(13, 19)((y, x) =>
      if (x >= 14 && x < 16 && y < 1) 0 else if (x < 8) 10 else 210)
    val t = Multimodal.aHashBytes(encodePng(tweaked))
    val hd = java.lang.Long.bitCount(base.longValue() ^ t.longValue())
    assert(hd >= 1 && hd <= 3, s"expected a small flip, hamming=$hd")
  }

  test("imageAHash kernel + hammingPairs: near-dup images pair, distinct don't") {
    val s = spark
    import s.implicits._
    val a = encodePng(Array.tabulate(16, 16)((_, x) => if (x < 8) 0 else 200))
    val a2 = encodePng(Array.tabulate(16, 16)((_, x) => if (x < 8) 35 else 235))
    val b = encodePng(Array.tabulate(16, 16)((y, _) => if (y < 8) 0 else 200))
    val junk = "nope".getBytes
    val df = Seq((1L, a), (2L, a2), (3L, b), (4L, junk))
      .toDF("doc_id", "payload")
    val hashed = Multimodal.imageAHash(df, "payload")
    assert(hashed.columns.toSeq ==
      Seq("doc_id", "payload", "ahash"))
    val rows = hashed.select("doc_id", "ahash").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(rows(1L) == rows(2L) && rows(1L).isDefined)
    assert(rows(3L).isDefined && rows(3L) != rows(1L))
    assert(rows(4L).isEmpty)
    val pairs = Dedup.hammingPairs(hashed, "doc_id", "ahash",
        bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // keepFromPairs completes the dedup decision
    val kept = Dedup.keepFromPairs(hashed, "doc_id",
        Dedup.hammingPairs(hashed, "doc_id", "ahash"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("hammingPairs: pigeonhole exhaustiveness under bands and the bucket cap") {
    val s = spark
    import s.implicits._
    // fp pairs at hamming 3 (< bands=4) MUST be found regardless of
    // which bits differ; hamming 4 may or may not — here placed to
    // straddle all four bands so it must NOT appear
    val base = 0x0123456789ABCDEFL
    val h3 = base ^ 0x7L                    // 3 bits, one band
    val h4 = base ^ ((1L << 0) | (1L << 16) | (1L << 32) | (1L << 48))
    val df = Seq((1L, base), (2L, h3), (3L, h4))
      .toDF("id", "fp")
    val got = Dedup.hammingPairs(df, "id", "fp", bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), s"got $got")
    // identical-fingerprint pile-up: the bucket cap drops the bucket
    val many = (0L until 500L).map(i => (i, 42L)).toDF("id", "fp")
    assert(Dedup.hammingPairs(many, "id", "fp",
      maxBucketSize = 100).count() == 0L)
    intercept[IllegalArgumentException] {
      Dedup.hammingPairs(df, "id", "fp", bands = 5)
    }
  }

  test("parsePcm: real sample facts on hand-built 16- and 8-bit PCM; refusals") {
    // 16-bit stereo: 4 known frames of (L, R) = (+100, -100), (+2000,
    // -2000), (0, 0), (-32768, +32767) → 8 values
    val vals = Array[Short](100, -100, 2000, -2000, 0, 0, -32768, 32767)
    val bb = java.nio.ByteBuffer.allocate(44 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 16)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(44100 * 4)
      .putShort(4).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(16)
    vals.foreach(bb.putShort)
    val r = Multimodal.parsePcm(bb.array())
    assert(r != null)
    assert(r.getLong(0) == 8L)
    assert(r.getLong(1) == 32768L)
    val sumAbs = vals.map(v => math.abs(v.toLong)).sum
    val sumSq = vals.map(v => v.toLong * v).sum
    assert(r.getDouble(2) == math.round(sumAbs.toDouble / 8 * 1e6) / 1e6)
    assert(r.getDouble(3) ==
      math.round(math.sqrt(sumSq.toDouble / 8) * 1e6) / 1e6)
    // 8-bit golden: goldenWav is 16 zero BYTES of 16-bit data → all
    // values 0 → mean/rms/peak all zero
    val z = Multimodal.parsePcm(goldenWav)
    assert(z != null && z.getLong(1) == 0L && z.getDouble(3) == 0.0)
    // refusals: a header-only FLAC envelope (no frames to decode —
    // sample facts need samples; full streams decode via FlacCodec),
    // float PCM, byte soup
    assert(Multimodal.parsePcm(goldenFlac) == null)
    val fl = bb.array().clone(); fl(20) = 3 // wFormatTag = IEEE float
    assert(Multimodal.parsePcm(fl) == null)
    assert(Multimodal.parsePcm("junk".getBytes) == null)
    // 24-bit mono: known values incl. sign extension at both extremes
    val v24 = Array(8388607, -8388608, 1000, -1000, 0, 70000)
    val b24 = java.nio.ByteBuffer.allocate(44 + v24.length * 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b24.put("RIFF".getBytes("US-ASCII")).putInt(36 + v24.length * 3)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(48000).putInt(48000 * 3)
      .putShort(3).putShort(24)
      .put("data".getBytes("US-ASCII")).putInt(v24.length * 3)
    v24.foreach { v =>
      b24.put((v & 0xFF).toByte).put(((v >> 8) & 0xFF).toByte)
        .put(((v >> 16) & 0xFF).toByte)
    }
    val r24 = Multimodal.parsePcm(b24.array())
    assert(r24 != null, "24-bit integer PCM must decode")
    assert(r24.getLong(0) == v24.length.toLong)
    assert(r24.getLong(1) == 8388608L)
    val sa24 = v24.map(v => math.abs(v.toLong)).sum
    assert(r24.getDouble(2) ==
      math.round(sa24.toDouble / v24.length * 1e6) / 1e6)
  }

  test("parsePcm/sampleFacts: sum-of-squares survives loud long audio " +
      "(ADVICE r13 — a single long overflows within seconds of 24-bit)") {
    // 140000 full-scale 24-bit samples: sumSq = 140000 * 8388607^2
    // ~ 9.85e18 > Long.MaxValue — the r13 long accumulator wrapped
    // negative here and rms came out NaN/garbage; the 128-bit pair
    // must report rms == the constant amplitude exactly
    val n = 140000
    val amp = 8388607
    val b = java.nio.ByteBuffer.allocate(44 + n * 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 3)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(48000).putInt(48000 * 3)
      .putShort(3).putShort(24)
      .put("data".getBytes("US-ASCII")).putInt(n * 3)
    (0 until n).foreach { _ =>
      b.put((amp & 0xFF).toByte).put(((amp >> 8) & 0xFF).toByte)
        .put(((amp >> 16) & 0xFF).toByte)
    }
    val r = Multimodal.parsePcm(b.array())
    assert(r != null)
    assert(r.getLong(0) == n.toLong && r.getLong(1) == amp.toLong)
    assert(r.getDouble(2) == amp.toDouble, s"mean_abs ${r.getDouble(2)}")
    assert(r.getDouble(3) == amp.toDouble, s"rms ${r.getDouble(3)}")
    // the FLAC-fed kernel at 32-bit depth: 3 near-extreme samples
    // already exceed 2^63 in summed squares
    val v32 = Array.fill(3)(-2147483647)
    val f = Multimodal.sampleFacts(v32)
    assert(f.getLong(0) == 3L && f.getLong(1) == 2147483647L)
    assert(f.getDouble(2) == 2147483647.0 && f.getDouble(3) == 2147483647.0,
      s"32-bit stats: $f")
    // and a mixed-sign loud ramp agrees with BigInt-exact arithmetic
    val ramp = Array.tabulate(100000)(i =>
      (if (i % 2 == 0) 1 else -1) * (8000000 + i))
    val g = Multimodal.sampleFacts(ramp)
    val exactSq = ramp.map(v => BigInt(v.toLong) * v).sum
    val expectRms = math.round(math.sqrt(
      (BigDecimal(exactSq) / ramp.length).toDouble) * 1e6) / 1e6
    // the kernel's 128->double conversion and BigDecimal's may round an
    // ulp apart before the sqrt — compare at the rounding grain
    assert(math.abs(g.getDouble(3) - expectRms) <= 1e-6,
      s"${g.getDouble(3)} vs $expectRms")
  }

  test("wavPcmBytes: sawtooth payload round-trips through parsePcm exactly") {
    val s = spark
    import s.implicits._
    for ((n, base, step) <- Seq((50, 0, 1), (97, 200, 7), (64, 128, 0))) {
      val bytes = Seq(1).toDF("x")
        .select(Multimodal.wavPcmBytes(lit(8000), lit(n), lit(base),
          lit(step)).as("b"))
        .collect().head.getAs[Array[Byte]](0)
      val r = Multimodal.parsePcm(bytes)
      assert(r != null, s"parsePcm rejected built WAV (n=$n)")
      assert(r.getLong(0) == n.toLong)
      val amps = (0 until n).map(t => math.abs((base + t * step) % 256 - 128L))
      assert(r.getLong(1) == amps.max)
      assert(r.getDouble(2) ==
        math.round(amps.sum.toDouble / n * 1e6) / 1e6)
      // the header side parses as a normal WAV too
      val hdr = Multimodal.parseAudio(bytes)
      assert(hdr.getString(0) == "wav" && hdr.getInt(1) == 8000 &&
        hdr.getInt(2) == 1 && hdr.getInt(3) == 8 && hdr.getLong(4) == n)
    }
  }

  /** 16-bit mono PCM WAV from raw sample values. */
  private def pcm16(vals: Array[Short]): Array[Byte] = {
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

  test("audioAHash: loud-half clip sets the loud frames; gain-invariant") {
    // 128 samples: first 64 silent, last 64 loud → frames 32..63 set
    val vals = Array.tabulate(128)(t => if (t < 64) 0 else 1000)
      .map(_.toShort)
    val h = Multimodal.audioAHashBytes(pcm16(vals))
    assert(h != null)
    assert(h.longValue() == 0xFFFFFFFF00000000L, f"got ${h.longValue()}%016x")
    // uniform gain ×3: every frame energy scales alike → SAME hash (the
    // re-master invariance that makes this a dedup key)
    val louder = vals.map(v => (v * 3).toShort)
    assert(Multimodal.audioAHashBytes(pcm16(louder)).longValue() ==
      0xFFFFFFFF00000000L)
    // constant clip → no frame above the mean → 0
    assert(Multimodal.audioAHashBytes(
      pcm16(Array.fill(128)(500.toShort))).longValue() == 0L)
    // under 64 values → null; FLAC/byte soup → null
    assert(Multimodal.audioAHashBytes(pcm16(Array.fill(50)(1.toShort))) == null)
    assert(Multimodal.audioAHashBytes(goldenFlac) == null)
    assert(Multimodal.audioAHashBytes("soup".getBytes) == null)
  }

  test("hammingAgainst: incoming drops on reference match, nulls survive") {
    val s = spark
    import s.implicits._
    val base = 0x0123456789ABCDEFL
    val incoming = Seq(
      (1L, java.lang.Long.valueOf(base)),            // == ref → dropped
      (2L, java.lang.Long.valueOf(base ^ 0x7L)),     // hamming 3 → dropped
      (3L, java.lang.Long.valueOf(~base)),           // far → survives
      (4L, null.asInstanceOf[java.lang.Long])        // undecodable → survives
    ).toDF("id", "fp")
    val ref = Seq((100L, java.lang.Long.valueOf(base)))
      .toDF("id", "fp")
    val kept = Dedup.hammingAgainst(incoming, ref, "id", "fp",
        bands = 4, maxHamming = 3)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L), s"got $kept")
    // an empty reference keeps everything
    assert(Dedup.hammingAgainst(incoming, ref.filter(lit(false)),
      "id", "fp").count() == 4L)
  }

  test("pngGradientBytes: real codec round-trip; adler matches java.util.zip") {
    val s = spark
    import s.implicits._
    for ((w, h, base, step) <- Seq((8, 8, 0, 1), (16, 32, 100, 7),
        (9, 21, 250, 3), (128, 16, 17, 255))) {
      val bytes = Seq(1).toDF("x")
        .select(Multimodal.pngGradientBytes(lit(w), lit(h), lit(base),
          lit(step)).as("b"))
        .collect().head.getAs[Array[Byte]](0)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected gradient (w=$w h=$h)")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- Seq(0, h / 2, h - 1)) {
        val v = (base + y * step) % 256
        val p = img.getRGB(w - 1, y)
        assert(((p >> 16) & 0xFF) == v && ((p >> 8) & 0xFF) == v &&
          (p & 0xFF) == v, s"row $y: got ${p.toHexString}, want $v")
      }
      // closed-form adler vs the library over the raw scanline stream
      val raw = (0 until h).flatMap { y =>
        val v = ((base + y * step) % 256).toByte
        0.toByte +: Array.fill(3 * w)(v)
      }.toArray
      val ad = new java.util.zip.Adler32()
      ad.update(raw)
      // the IDAT zlib tail: last 4 bytes before the IDAT CRC
      val idatEnd = bytes.length - 12 /*IEND*/ - 4 /*IDAT crc*/
      val got = java.nio.ByteBuffer.wrap(bytes, idatEnd - 4, 4).getInt
      assert(got == ad.getValue.toInt,
        f"adler mismatch: got $got%08x want ${ad.getValue.toInt}%08x")
    }
  }
}
