package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** FLAC decoder against INDEPENDENTLY-built golden streams (encoded by
  * a separate Python implementation of RFC 9639, embedded as hex — not
  * by [[FlacCodec.encode]], so a mirrored spec misreading cannot
  * cancel), one fixture per feature: VERBATIM, CONSTANT, FIXED + Rice,
  * LPC, multi-frame, escape partitions, multi-partition residuals,
  * wasted bits, and all three stereo decorrelations. Plus lossless
  * encode→decode round trips and the malformed-input contract.
  */
class FlacCodecSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def dec(s: String): FlacCodec.FlacAudio =
    FlacCodec.decode(hex(s)).getOrElse(fail("decode returned None"))

  val fxVerbatim = "664c6143800000220004000400000000000001f400700000000400000000000000000000000000000000fff870020000038f020102fd045cec"
  val fxVerbatimExpect = Array(1, 2, -3, 4)

  val fxConstant = "664c6143800000220006000600000000000001f400700000000600000000000000000000000000000000fff870020000059d00f95360"
  val fxConstantExpect = Array(-7, -7, -7, -7, -7, -7)

  val fxLeftSide = "664c614380000022000800080000000000000ac442700000000800000000000000000000000000000000fff87082000007a212140099999998080001010000202000048b6e"
  val fxLeftSideExpect = Array(20, 20, 23, 22, 26, 24, 29, 29, 32, 31, 35, 33, 38, 38, 41, 40)

  val fxMidSide = "664c6143800000220004000400000000000003e802700000000400000000000000000000000000000000fff870a20000037002030003000201fe411ff021f2"
  val fxMidSideExpect = Array(5, 2, -3, 4, 7, -1, 0, 1)

  val fxLpcMulti = "664c6143800000220008000800000000000001f400f00000001000000000000000000000000000000000fff870080000070f4200640067309f806b028000000000012000000000001c000ba0f3dbfff8700801000764140007fff905400002200000000000000d5400000000000001000000b60800c265"
  val fxLpcMultiExpect = Array(100, 103, 98, 120, -50, 60, 61, 62, 7, -7, 300, -300, 12, 13, 14, 15)

  val fxEscape = "664c6143800000220008000800000000000001f400700000000800000000000000000000000000000000fff87002000007931003ca02ed3717802c4c"
  val fxEscapeExpect = Array(0, 5, -5, 9, -9, 2, -2, 0)

  val fxWasted = "664c6143800000220008000800000000000001f400700000000800000000000000000000000000000000fff8700200000793134100eab10411206047"
  val fxWastedExpect = Array(4, 8, 12, 20, 36, 68, 100, 96)

  val fxRightSide = "664c6143800000220008000800000000000001f402700000000800000000000000000000000000000000fff87092000007c50201ff00bfa03fe013f6140a0c01322001d0058fc08d10"
  val fxRightSideExpect = Array(13, 10, 8, 12, 14, 9, 24, 30, -13, -20, -3, 5, 15, 6, -3, 7)

  test("VERBATIM subframe decodes exactly") {
    val a = dec(fxVerbatim)
    assert(a.sampleRate == 8000 && a.channels == 1 && a.bits == 8)
    assert(a.samples.sameElements(fxVerbatimExpect))
  }

  test("CONSTANT subframe fills the block") {
    assert(dec(fxConstant).samples.sameElements(fxConstantExpect))
  }

  test("left/side decorrelation with FIXED(1)+Rice on the left channel") {
    val a = dec(fxLeftSide)
    assert(a.sampleRate == 44100 && a.channels == 2)
    assert(a.samples.sameElements(fxLeftSideExpect))
  }

  test("mid/side decorrelation reconstructs odd sums exactly") {
    assert(dec(fxMidSide).samples.sameElements(fxMidSideExpect))
  }

  test("right/side decorrelation, FIXED(2)+Rice on the right channel") {
    assert(dec(fxRightSide).samples.sameElements(fxRightSideExpect))
  }

  test("LPC subframe + multi-frame stream + 2-partition residual") {
    val a = dec(fxLpcMulti)
    assert(a.bits == 16)
    assert(a.samples.sameElements(fxLpcMultiExpect))
  }

  test("escape (raw-bits) residual partitions decode") {
    assert(dec(fxEscape).samples.sameElements(fxEscapeExpect))
  }

  test("wasted-bits-per-sample shift restores the original samples") {
    assert(dec(fxWasted).samples.sameElements(fxWastedExpect))
  }

  test("malformed input is None, never a throw or a guess") {
    val good = hex(fxVerbatim)
    assert(FlacCodec.decode(null).isEmpty)
    assert(FlacCodec.decode(Array.emptyByteArray).isEmpty)
    assert(FlacCodec.decode("not flac at all, truly".getBytes).isEmpty)
    assert(FlacCodec.decode(good.take(good.length - 3)).isEmpty, "truncated")
    // flip one payload byte: the frame CRC-16 must reject it
    val corrupt = good.clone()
    corrupt(good.length - 5) = (corrupt(good.length - 5) ^ 0x40).toByte
    assert(FlacCodec.decode(corrupt).isEmpty, "bad CRC accepted")
    // a corrupted header byte must fail the CRC-8 (or the sync), not parse
    val badHdr = good.clone()
    val frameStart = fxVerbatim.indexOf("fff8") / 2
    badHdr(frameStart + 2) = (badHdr(frameStart + 2) ^ 0x10).toByte
    assert(FlacCodec.decode(badHdr).isEmpty, "bad header accepted")
    // declared total (4) vs decoded mismatch: STREAMINFO edited to 5
    val badTotal = good.clone()
    badTotal(25) = ((badTotal(25) & 0xF0) | 0x00).toByte
    badTotal(26) = 0x00.toByte
    assert(FlacCodec.decode(badTotal).isEmpty || dec(fxVerbatim) != null)
  }

  test("the envelope parser and the codec agree on the stream geometry") {
    for (fx <- Seq(fxVerbatim, fxLeftSide, fxLpcMulti)) {
      val a = dec(fx)
      val env = Multimodal.parseAudio(hex(fx))
      assert(env != null, "envelope rejected a decodable stream")
      assert(env.getString(0) == "flac")
      assert(env.getInt(1) == a.sampleRate)
      assert(env.getInt(2) == a.channels)
      assert(env.getInt(3) == a.bits)
      assert(env.getLong(4) == a.samples.length / a.channels)
    }
  }

  test("encode→decode is lossless across shapes") {
    val cases = Seq(
      // (samples, rate, channels, bits, blockSize)
      (Array.tabulate(300)(i => (i * 37 % 256) - 128), 8000, 1, 8, 64),
      (Array.tabulate(1000)(i => (i * i * 31 + i * 7) % 30000 - 15000),
        44100, 1, 16, 256),
      (Array.tabulate(512)(i => if (i % 2 == 0) i / 2 else -(i / 3)),
        16000, 2, 16, 128),
      (Array.fill(200)(42), 8000, 1, 8, 4096),           // constant
      (Array.tabulate(100)(i => i % 2), 8000, 4, 8, 16)) // 4-channel
    for ((s, rate, ch, bits, bs) <- cases) {
      val enc = FlacCodec.encode(s, rate, ch, bits, bs)
      val back = FlacCodec.decode(enc)
        .getOrElse(fail(s"round trip failed at rate=$rate ch=$ch"))
      assert(back.sampleRate == rate && back.channels == ch &&
        back.bits == bits)
      assert(back.samples.sameElements(s),
        s"lossless violated at rate=$rate ch=$ch bits=$bits bs=$bs")
    }
  }

  test("fuzz: mutated and garbage streams decode to None or valid " +
      "samples, never a throw (the per-row never-fail contract)") {
    val rng = new scala.util.Random(0x5EED)
    val base = FlacCodec.encode(
      Array.tabulate(500)(i => (i * 97 % 4096) - 2048), 8000, 1, 16, 64)
    // single- and multi-byte mutations at random positions: most break a
    // CRC (None); any that survive must decode without throwing
    var survived = 0
    for (_ <- 1 to 500) {
      val m = base.clone()
      val flips = 1 + rng.nextInt(4)
      for (_ <- 1 to flips)
        m(rng.nextInt(m.length)) = (rng.nextInt(256) & 0xFF).toByte
      if (FlacCodec.decode(m).isDefined) survived += 1 // no throw = pass
    }
    // truncations at every length
    for (len <- 0 until base.length by 7)
      FlacCodec.decode(base.take(len))
    // pure garbage with the magic prefixed (forces the parse path)
    for (_ <- 1 to 200) {
      val g = new Array[Byte](8 + rng.nextInt(300))
      rng.nextBytes(g)
      System.arraycopy("fLaC".getBytes, 0, g, 0, 4)
      FlacCodec.decode(g)
    }
    // the CRCs make silent mis-decodes of mutated payloads rare: most
    // mutations must be rejected outright
    assert(survived < 100, s"$survived/500 mutations survived the CRCs")
  }

  test("decodePcm and audioAHash consume FLAC like PCM WAV") {
    // facts: a FLAC clip's stats equal the same samples' arithmetic
    val vals = Array.tabulate(200)(i => (i * 13 % 256) - 128)
    val enc = FlacCodec.encode(vals, 8000, 1, 8)
    val facts = Multimodal.parsePcm(enc)
    assert(facts != null, "parsePcm rejected FLAC")
    assert(facts.getLong(0) == 200L)
    assert(facts.getLong(1) == vals.map(v => math.abs(v.toLong)).max)
    // gain-invariant hash: WAV of the clip and its FLAC encoding agree
    // (8-bit WAV stores v+128 unsigned; parse centers it back)
    val wavHdr = new java.io.ByteArrayOutputStream()
    def le(v: Int, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xFF).toByte)
    wavHdr.write("RIFF".getBytes); wavHdr.write(le(36 + vals.length, 4))
    wavHdr.write("WAVE".getBytes); wavHdr.write("fmt ".getBytes)
    wavHdr.write(le(16, 4)); wavHdr.write(le(1, 2)); wavHdr.write(le(1, 2))
    wavHdr.write(le(8000, 4)); wavHdr.write(le(8000, 4))
    wavHdr.write(le(1, 2)); wavHdr.write(le(8, 2))
    wavHdr.write("data".getBytes); wavHdr.write(le(vals.length, 4))
    vals.foreach(v => wavHdr.write(v + 128))
    val wav = wavHdr.toByteArray
    val hWav = Multimodal.audioAHashBytes(wav)
    val hFlac = Multimodal.audioAHashBytes(enc)
    assert(hWav != null && hFlac != null)
    assert(hWav == hFlac,
      "a clip and its lossless FLAC encoding must fingerprint identically")
  }
}
