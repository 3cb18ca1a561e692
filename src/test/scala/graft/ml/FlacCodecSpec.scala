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

  // randomized stress set (python-generated, seed 0xF1AC)
  val fxStress: Seq[(String, Array[Int])] = Seq(
    ("664c6143800000220010001000000000000001f400b00000001000000000000000000000000000000000fff8700400000fdf4432af82b40b3ebb04d57b81b45e255d24bd43eb13383bf65e6a577cf371f389b7386f6018b8803268",
     Array(810, -126, -1216, -1016, 182, 1299, -494, 1930, 582, -1702, -398, 1902, -991, 204, -1966, 1591)),
    ("664c6143800000220010001000000000000001f400700000001000000000000000000000000000000000fff8700200000fab4c17cf4eda2ee9efb2daeda3ca888754482ccaa81abd29a41bdc64427aec641a24104d6c2bd258ad",
     Array(23, -49, 78, -38, 46, -23, -17, -1, 67, -104, 34, 98, 118, 7, 70, 107)),
    ("664c6143800000220020002000000000000001f400f00000002000000000000000000000000000000000fff8700800001f474a05311719f9a304008ca2b91222162da0e929b1709033b1018949bc080bee85934026972f4b00829b4164782cc537cb35f607b98bb8be66068ea3bfa1e4806d5e0aa7c43024bf20bd5c0bda807618",
     Array(1329, 5913, -1629, 1024, -29534, -18158, 1134, 5664, -16784, -22106, -7000, 28232, 16225, -16979, 435, 29858, -27164, -23367, -17732, 3017, 20571, 11728, 21280, -12430, 17984, 8115, -25455, -25768, -23896, -17845, -28161, 29525)),
    ("664c6143800000220040004000000000000001f400f00000004000000000000000000000000000000000fff8700800003fa7468ff9a33b43edfc3e63fccffeaa2f525292987ad71b2fd9f52a8e05b60c8fd252b3b59bb9c1d6a18d80a8cda41ded4763e5f40b25d61e1dc4169fba6310ad1f29089448e34a116e343e975501a8a84141d8948d6e459ccc62e22d5767adeed35f52de524fb128cbbed6f7231eb7c4b96056f0c6b2a6a329670748d64220ffe5c1fff25c5b0f3507ee1f10a18093dc",
     Array(-28679, -23749, 17389, -962, -14622, -26939, 8963, 16873, -7353, 27530, -25961, -7876, 26601, 5664, 17546, 30903, -4318, -29548, -8993, -18284, -21565, 27564, 25886, 30957, -32125, 765, -27798, 8948, 16484, 32740, 7602, 2061, -12186, 5410, -21896, -17827, -28545, -26502, 23725, -29360, -15898, 3816, -31811, 31450, 5853, -32529, -30125, 25213, -22176, 21418, -8965, 18619, 14934, -15730, 26815, -1876, -10618, -10585, -7101, 15894, 11466, -27004, 8095, 16622)),
    ("664c6143800000220010001000000000000001f400b00000001000000000000000000000000000000000fff8700400000fdf42a7d483a47e03f205a0089cf259a0bc8ec6669354da2d64107634ace382c88f0f5708",
     Array(-1411, 1155, -1903, 236, -1557, 636, -985, -262, 350, 1184, 1232, -921, -1189, 1175, -44, -629)),
    ("664c6143800000220040004000000000000001f400b00000004000000000000000000000000000000000fff8700400003f4f48c9c6281beeefd7030e9d6f81a91994c3727e949953232ded2757eb29e0b385220ba6aa29f7ac7eaba80a33ec544cc0d421b931247f71368fdcad67fd29e57c4d5d4cea1b7abc7551416f3476dbc774deefd4521b6d6b7bbfbc683e1193c67fbb63d925986466898c6b1b6d255655a766863a5676f5f00ed1a0b1f1",
     Array(-868, 1576, 446, -273, -656, 1965, 745, 752, -30, 1744, -506, -675, 813, 2045, -1585, -370, -1363, 1662, 957, -1613, -1591, -205, -1724, -1634, -1481, -1276, -1485, 823, -1200, 499, 1921, 4, -856, 1349, 1040, -965, -2041, 1315, -1353, -651, 1737, -1367, -124, -788, -90, -1473, 1482, 1301, 719, -1735, 1289, -1505, 1937, 1815, -1257, -1012, -981, 1414, -1273, -1657, 957, 1784, 1092, -1598)),
    ("664c6143800000220020002000000000000001f400b00000002000000000000000000000000000000000fff8700400001faf4234b71eb1c2e41da532ff7a9c1cd4ee1b2a61648c67fe5bd0992cec35ceccec156e129dfccb7e6158a632c42fc0cc905b958722a06d59ab2145747908649432b1799fb3d3602f7538272d5461b6c649b68161df7f36f2738720a473",
     Array(843, 1822, 23, 1978, -1699, 1627, -796, -1531, 1946, 2, -815, -221, 1083, -780, -321, -1957, 506, 567, 1207, 1299, 1945, 789, 936, 661, -353, 1878, -67, -1232, -392, 1262, -424, 961)),
    ("664c6143800000220020002000000000000001f400700000002000000000000000000000000000000000fff8700200001fdb46db43e4dc53757a0b20744e5ed4272e7e26d76366c58ad4df4bc340eca988929339e8d45c2666502058df",
     Array(-37, 67, -28, -36, -55, -8, 41, -26, -81, -18, 64, 14, 3, -104, 9, -67, 84, -72, -106, 30, 35, -108, 54, -91, 125, 27, 82, 91, 111, -82, 16, 14)),
    ("664c6143800000220040004000000000000001f400f00000004000000000000000000000000000000000fff8700800003fa74a3c3600c9ea024d2466713ef364530f35a30b2169f9281a5580435e005e8e16d386c5205c0e063a42105df6349a8d9c900856de2c81d8b16f632cd9d30f9ac1b481f7c9ce38159a6fb2b2d42c07d042020171599490055d8ebe8016977ae20053d627b348b85f2201c3000112b4364c2b838c1d0027af1ee8f98e044ba458e26e4009d3c0eb0c37870039f14c9a0982a0e5c1869de1e380fa93",
     Array(15414, 201, -5630, 19748, 26225, 16115, -21683, -25270, -22458, -30158, -13789, -24802, -22378, 26372, -17760, 8324, -23340, 19408, -29808, -2962, 23407, 10014, -5894, -11567, -3469, 31709, -18407, -11679, 19267, 4460, -919, -32134, -11347, -26986, 19118, 24949, 872, 32557, -13887, -26309, -13573, 12062, -4285, 26767, 28459, 713, 5010, -23288, -26404, -11696, -895, -23681, -12573, 11132, -29640, -23179, -25208, -31068, 2468, 13029, -1100, -9546, -1169, 23933)),
    ("664c6143800000220020002000000000000001f400b00000002000000000000000000000000000000000fff8700400001faf4edbca7d19af7422a953fae4dc95430aefa45ecab68c4f6c037a033cbf2fcfc7ab7f46b13db6d000eb821d834e9ecc5295247bccdfc3c0cf47997895ef16b281d0e4b8",
     Array(-580, -1411, 410, -140, 554, -1709, -82, 1244, -327, 53, -685, 1744, 1994, 996, 212, -1443, 1652, -268, 1288, 1911, 1318, 1613, 352, -1086, -948, -1209, 1755, -1247, 1199, -716, -163, -1112))
  )

  test("randomized LPC stress set (independent encoder, seed 0xF1AC): " +
      "orders 1-8, precisions 3-12, shifts 0-10, rice/rice2, partitions") {
    for (((hx, expect), i) <- fxStress.zipWithIndex) {
      val a = FlacCodec.decode(hex(hx))
        .getOrElse(fail(s"stress case $i failed to decode"))
      assert(a.samples.sameElements(expect), s"stress case $i mismatched")
    }
  }

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
