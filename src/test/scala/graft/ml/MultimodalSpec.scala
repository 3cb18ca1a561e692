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
}
