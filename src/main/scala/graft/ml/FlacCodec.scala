package graft.ml

/** FLAC audio sample codec — the real-decode counterpart of
  * [[Multimodal.parsePcm]]'s raw-PCM path, closing the one compressed
  * AUDIO format the multimodal brief left behind a stub contract.
  * Implemented from the public specification (RFC 9639; reference
  * behavior: fkie-cad/Logprep has no media decode — this engine's
  * multimodal columns are the training-data-pipeline extension).
  *
  * Decoder coverage is the full mandatory stream feature set:
  *  - metadata walk (STREAMINFO first, all other blocks skipped),
  *  - fixed and variable blocking strategies, all block-size and
  *    sample-rate header codes, UTF-8-coded frame/sample numbers,
  *  - subframes CONSTANT / VERBATIM / FIXED (orders 0–4) / LPC
  *    (orders 1–32, quantized coefficients, signed shift),
  *  - Rice residuals, both 4-bit and 5-bit parameter widths, any
  *    partition order, escape (raw-bits) partitions,
  *  - wasted-bits-per-sample shifts,
  *  - stereo decorrelation (left/side, right/side, mid/side),
  *  - CRC-8 header and CRC-16 frame verification (a corrupt payload
  *    decodes to None, never to wrong samples).
  *
  * The per-row contract matches every other envelope kernel:
  * well-formed or None — malformed input (truncated bits, bad sync,
  * reserved codes, CRC mismatch, declared-vs-decoded sample count
  * disagreement) never throws past [[decode]] and never guesses.
  *
  * The encoder emits a REAL (if simple) subset — independent channels,
  * CONSTANT or FIXED(0–2) subframes with single-partition Rice
  * residuals, correct CRCs — enough for lossless encode→decode round
  * trips that exercise the Rice and predictor paths, and for building
  * deterministic fixtures in both engines of an oracle pair (the
  * [[Multimodal.wavPcmBytes]] convention: the oracle predicts decode
  * FACTS from construction parameters; it never parses bytes).
  *
  * Scale: decode runs inside mapPartitions kernels
  * ([[Multimodal.decodePcm]] / [[Multimodal.audioAHash]]) — per-row,
  * allocation-bounded by the clip's sample count, no driver state.
  */
object FlacCodec {

  final case class FlacAudio(sampleRate: Int, channels: Int, bits: Int,
                             samples: Array[Int])

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ---- bit reader -----------------------------------------------------

  private final class BitReader(b: Array[Byte]) {
    private val limit = b.length.toLong * 8
    var pos = 0L
    def bytePos: Int = (pos >>> 3).toInt
    def bit(): Int = {
      if (pos >= limit) throw Malformed
      val v = (b((pos >>> 3).toInt) >> (7 - (pos & 7)).toInt) & 1
      pos += 1
      v
    }
    /** Unsigned big-endian read, n in 0..57. */
    def bits(n: Int): Long = {
      if (n == 0) return 0L
      if (pos + n > limit) throw Malformed
      var v = 0L
      var left = n
      while (left > 0) {
        val byteI = (pos >>> 3).toInt
        val bitI = (pos & 7).toInt
        val take = math.min(8 - bitI, left)
        val chunk = ((b(byteI) & 0xFF) >>> (8 - bitI - take)) &
          ((1 << take) - 1)
        v = (v << take) | chunk
        pos += take
        left -= take
      }
      v
    }
    /** Signed (two's complement) big-endian read, n in 0..33. */
    def sbits(n: Int): Long = {
      if (n == 0) return 0L
      val v = bits(n)
      if ((v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    /** Unary: count of 0 bits before the terminating 1. */
    def unary(): Int = {
      var q = 0
      while (bit() == 0) q += 1
      q
    }
    def align(): Unit = pos = (pos + 7) & ~7L
  }

  // ---- CRCs (FLAC frame polynomials) ----------------------------------

  private[ml] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF
              else (crc << 1) & 0xFF
        k += 1
      }
      i += 1
    }
    crc
  }

  private[ml] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
              else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---- decoder --------------------------------------------------------

  /** Decode every sample of a FLAC payload (channel-interleaved), or
    * None for anything that is not a fully well-formed FLAC stream.
    */
  def decode(b: Array[Byte]): Option[FlacAudio] = {
    if (b == null || b.length < 42) return None
    try Some(decodeStrict(b))
    catch { case Malformed => None }
  }

  private def ascii4(b: Array[Byte], off: Int): String =
    if (off + 4 > b.length) ""
    else new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def decodeStrict(b: Array[Byte]): FlacAudio = {
    if (ascii4(b, 0) != "fLaC") throw Malformed
    val r = new BitReader(b)
    r.pos = 32L
    // metadata: STREAMINFO must be first (block type 0)
    var last = r.bit() == 1
    if (r.bits(7) != 0) throw Malformed
    val siLen = r.bits(24)
    if (siLen < 34) throw Malformed
    val siStart = r.pos
    r.bits(16); r.bits(16) // min/max block size
    r.bits(24); r.bits(24) // min/max frame size
    val rate = r.bits(20).toInt
    val channels = r.bits(3).toInt + 1
    val bps = r.bits(5).toInt + 1
    val total = r.bits(36)
    if (rate <= 0) throw Malformed
    r.pos = siStart + siLen * 8 // skip md5 + any STREAMINFO extension
    while (!last) {
      last = r.bit() == 1
      r.bits(7)
      val len = r.bits(24)
      if (r.pos + len * 8 > b.length.toLong * 8) throw Malformed
      r.pos += len * 8
    }
    val out = new java.util.ArrayList[Array[Int]]()
    var decoded = 0L
    while (r.bytePos < b.length) {
      val block = decodeFrame(b, r, rate, channels, bps)
      out.add(block)
      decoded += block.length / channels
    }
    if (total > 0 && decoded != total) throw Malformed
    var n = 0
    val it = out.iterator()
    while (it.hasNext) n += it.next().length
    val samples = new Array[Int](n)
    var o = 0
    val it2 = out.iterator()
    while (it2.hasNext) {
      val a = it2.next()
      System.arraycopy(a, 0, samples, o, a.length)
      o += a.length
    }
    FlacAudio(rate, channels, bps, samples)
  }

  /** One frame: header, per-channel subframes, decorrelation, CRCs.
    * Returns channel-interleaved samples.
    */
  private def decodeFrame(b: Array[Byte], r: BitReader, siRate: Int,
                          siChannels: Int, siBps: Int): Array[Int] = {
    val frameStart = r.bytePos
    if (r.bits(14) != 0x3FFE) throw Malformed // sync
    if (r.bit() != 0) throw Malformed         // reserved
    r.bit()                                   // blocking strategy
    val bsCode = r.bits(4).toInt
    val srCode = r.bits(4).toInt
    val chAsgn = r.bits(4).toInt
    val ssCode = r.bits(3).toInt
    if (r.bit() != 0) throw Malformed         // reserved
    // UTF-8-coded frame/sample number (up to 36 bits / 7 bytes)
    val first = r.bits(8).toInt
    val extra =
      if (first < 0x80) 0
      else if ((first & 0xE0) == 0xC0) 1
      else if ((first & 0xF0) == 0xE0) 2
      else if ((first & 0xF8) == 0xF0) 3
      else if ((first & 0xFC) == 0xF8) 4
      else if ((first & 0xFE) == 0xFC) 5
      else if (first == 0xFE) 6
      else throw Malformed
    var k = 0
    while (k < extra) {
      if ((r.bits(8) & 0xC0) != 0x80) throw Malformed
      k += 1
    }
    val blockSize = bsCode match {
      case 0 => throw Malformed
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => r.bits(8).toInt + 1
      case 7 => r.bits(16).toInt + 1
      case c => 256 << (c - 8)
    }
    srCode match { // value only needed for the CRC span; STREAMINFO rules
      case 12 => r.bits(8)
      case 13 | 14 => r.bits(16)
      case 15 => throw Malformed
      case _ => ()
    }
    val bps = ssCode match {
      case 0 => siBps
      case 1 => 8
      case 2 => 12
      case 3 => throw Malformed
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
    }
    val channels = if (chAsgn < 8) chAsgn + 1 else 2
    if (channels != siChannels) throw Malformed
    if (chAsgn > 10) throw Malformed
    // CRC-8 over the header bytes (reader is byte-aligned here)
    val crcByte = r.bytePos
    if (r.bits(8).toInt != crc8(b, frameStart, crcByte)) throw Malformed
    val chans = new Array[Array[Long]](channels)
    var c = 0
    while (c < channels) {
      // side channels carry one extra bit
      val extraBit = chAsgn match {
        case 8 => if (c == 1) 1 else 0  // left/side
        case 9 => if (c == 0) 1 else 0  // side/right
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      chans(c) = decodeSubframe(r, blockSize, bps + extraBit)
      c += 1
    }
    r.align()
    val footerAt = r.bytePos
    if (r.bits(16).toInt != crc16(b, frameStart, footerAt)) throw Malformed
    // undo stereo decorrelation
    val out = new Array[Int](blockSize * channels)
    var i = 0
    while (i < blockSize) {
      chAsgn match {
        case 8 => // left/side: right = left − side
          out(2 * i) = chans(0)(i).toInt
          out(2 * i + 1) = (chans(0)(i) - chans(1)(i)).toInt
        case 9 => // side/right: left = side + right
          out(2 * i) = (chans(0)(i) + chans(1)(i)).toInt
          out(2 * i + 1) = chans(1)(i).toInt
        case 10 => // mid/side
          val side = chans(1)(i)
          val mid = (chans(0)(i) << 1) | (side & 1L)
          out(2 * i) = ((mid + side) >> 1).toInt
          out(2 * i + 1) = ((mid - side) >> 1).toInt
        case _ =>
          var ch = 0
          while (ch < channels) {
            out(i * channels + ch) = chans(ch)(i).toInt
            ch += 1
          }
      }
      i += 1
    }
    out
  }

  private def decodeSubframe(r: BitReader, blockSize: Int,
                             bps: Int): Array[Long] = {
    if (r.bit() != 0) throw Malformed // pad
    val tpe = r.bits(6).toInt
    val wasted =
      if (r.bit() == 1) r.unary() + 1
      else 0
    val eff = bps - wasted
    if (eff <= 0) throw Malformed
    val s = new Array[Long](blockSize)
    if (tpe == 0) { // CONSTANT
      val v = r.sbits(eff)
      java.util.Arrays.fill(s, v)
    } else if (tpe == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { s(i) = r.sbits(eff); i += 1 }
    } else if ((tpe & 0x38) == 0x08 && (tpe & 0x07) <= 4) { // FIXED
      val order = tpe & 0x07
      if (order > blockSize) throw Malformed
      var i = 0
      while (i < order) { s(i) = r.sbits(eff); i += 1 }
      decodeResidual(r, s, blockSize, order)
      i = order
      while (i < blockSize) {
        s(i) += (order match {
          case 0 => 0L
          case 1 => s(i - 1)
          case 2 => 2 * s(i - 1) - s(i - 2)
          case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
          case _ => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
        })
        i += 1
      }
    } else if ((tpe & 0x20) != 0) { // LPC
      val order = (tpe & 0x1F) + 1
      if (order > blockSize) throw Malformed
      var i = 0
      while (i < order) { s(i) = r.sbits(eff); i += 1 }
      val precision = r.bits(4).toInt + 1
      if (precision > 15) throw Malformed // 0b1111 is reserved
      val shift = r.sbits(5).toInt
      if (shift < 0) throw Malformed
      val coef = new Array[Long](order)
      i = 0
      while (i < order) { coef(i) = r.sbits(precision); i += 1 }
      decodeResidual(r, s, blockSize, order)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coef(j) * s(i - 1 - j); j += 1 }
        s(i) += (acc >> shift)
        i += 1
      }
    } else throw Malformed
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { s(i) = s(i) << wasted; i += 1 }
    }
    s
  }

  /** Rice / escape residual into s(order until blockSize). */
  private def decodeResidual(r: BitReader, s: Array[Long], blockSize: Int,
                             order: Int): Unit = {
    val method = r.bits(2).toInt
    if (method > 1) throw Malformed
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    val po = r.bits(4).toInt
    val partitions = 1 << po
    if (blockSize % partitions != 0) throw Malformed
    val perPart = blockSize >> po
    var p = 0
    var i = order
    while (p < partitions) {
      val count = if (p == 0) perPart - order else perPart
      if (count < 0) throw Malformed
      val param = r.bits(paramBits).toInt
      if (param == escape) {
        val raw = r.bits(5).toInt
        var k = 0
        while (k < count) { s(i) = if (raw == 0) 0L else r.sbits(raw); i += 1; k += 1 }
      } else {
        var k = 0
        while (k < count) {
          val q = r.unary().toLong
          val u = (q << param) | r.bits(param)
          s(i) = (u >>> 1) ^ -(u & 1L) // zigzag
          i += 1; k += 1
        }
      }
      p += 1
    }
  }

  // ---- encoder (real subset: CONSTANT / FIXED 0–2 + Rice) -------------

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { buf.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Int): Unit = {
      var k = 0
      while (k < q) { writeBits(0, 1); k += 1 }
      writeBits(1, 1)
    }
    def align(): Unit = if (nbits > 0) writeBits(0, 8 - nbits)
    def toBytes: Array[Byte] = { align(); buf.toByteArray }
  }

  /** Encode channel-interleaved integer samples as a well-formed FLAC
    * stream: STREAMINFO (md5 unset) + fixed-blocksize frames with
    * independent channels; per channel CONSTANT when flat, else the
    * best FIXED(0–2) predictor with a single-partition Rice residual.
    * Lossless: [[decode]] returns exactly `samples`.
    */
  def encode(samples: Array[Int], sampleRate: Int, channels: Int,
             bits: Int, blockSize: Int = 4096): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels: $channels")
    require(bits >= 4 && bits <= 32, s"bits: $bits")
    require(sampleRate > 0 && sampleRate < (1 << 20), s"rate: $sampleRate")
    require(blockSize >= 16 && blockSize <= 65535, s"blockSize: $blockSize")
    require(samples.length % channels == 0, "ragged channel interleave")
    val nFrames0 = samples.length / channels
    val head = new BitWriter
    head.writeBits(0x664C6143L, 32) // fLaC
    head.writeBits(1, 1)            // last metadata block
    head.writeBits(0, 7)            // STREAMINFO
    head.writeBits(34, 24)
    head.writeBits(blockSize.toLong, 16)
    head.writeBits(blockSize.toLong, 16)
    head.writeBits(0, 24); head.writeBits(0, 24)
    head.writeBits(sampleRate.toLong, 20)
    head.writeBits((channels - 1).toLong, 3)
    head.writeBits((bits - 1).toLong, 5)
    head.writeBits(nFrames0.toLong, 36)
    var m = 0
    while (m < 16) { head.writeBits(0, 8); m += 1 } // md5 unset
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.toBytes)
    var frame = 0
    var t = 0
    while (t < nFrames0) {
      val bs = math.min(blockSize, nFrames0 - t)
      out.write(encodeFrame(samples, t, bs, frame, channels, bits))
      t += bs
      frame += 1
    }
    out.toByteArray
  }

  private def encodeFrame(all: Array[Int], from: Int, bs: Int, frameIdx: Int,
                          channels: Int, bits: Int): Array[Byte] = {
    val w = new BitWriter
    w.writeBits(0x3FFE, 14) // sync
    w.writeBits(0, 1)       // reserved
    w.writeBits(0, 1)       // fixed blocking
    w.writeBits(7, 4)       // block size: 16-bit follows
    w.writeBits(0, 4)       // sample rate: STREAMINFO
    w.writeBits((channels - 1).toLong, 4) // independent
    w.writeBits(bits match {
      case 8 => 1L; case 12 => 2L; case 16 => 4L
      case 20 => 5L; case 24 => 6L; case 32 => 7L
      case _ => 0L // STREAMINFO
    }, 3)
    w.writeBits(0, 1)
    // UTF-8-coded frame index (up to 21 bits here — ~2M frames, far
    // beyond any fixture; the decoder handles the full 36-bit range)
    val fi = frameIdx.toLong
    require(fi < 0x200000, s"encoder frame index out of range: $fi")
    if (fi < 0x80) w.writeBits(fi, 8)
    else if (fi < 0x800) {
      w.writeBits(0xC0L | (fi >>> 6), 8)
      w.writeBits(0x80L | (fi & 0x3F), 8)
    } else if (fi < 0x10000) {
      w.writeBits(0xE0L | (fi >>> 12), 8)
      w.writeBits(0x80L | ((fi >>> 6) & 0x3F), 8)
      w.writeBits(0x80L | (fi & 0x3F), 8)
    } else {
      w.writeBits(0xF0L | (fi >>> 18), 8)
      w.writeBits(0x80L | ((fi >>> 12) & 0x3F), 8)
      w.writeBits(0x80L | ((fi >>> 6) & 0x3F), 8)
      w.writeBits(0x80L | (fi & 0x3F), 8)
    }
    w.writeBits((bs - 1).toLong, 16)
    val headBytes = w.toBytes // aligned by construction
    val w2 = new BitWriter
    var c = 0
    while (c < channels) {
      val ch = new Array[Long](bs)
      var i = 0
      while (i < bs) { ch(i) = all(from * channels + i * channels + c); i += 1 }
      encodeSubframe(w2, ch, bits)
      c += 1
    }
    val bodyBytes = w2.toBytes
    val frameNoCrc = new Array[Byte](headBytes.length + 1 + bodyBytes.length)
    System.arraycopy(headBytes, 0, frameNoCrc, 0, headBytes.length)
    frameNoCrc(headBytes.length) =
      crc8(headBytes, 0, headBytes.length).toByte
    System.arraycopy(bodyBytes, 0, frameNoCrc, headBytes.length + 1,
      bodyBytes.length)
    val crc = crc16(frameNoCrc, 0, frameNoCrc.length)
    val outB = new java.io.ByteArrayOutputStream()
    outB.write(frameNoCrc)
    outB.write((crc >>> 8) & 0xFF)
    outB.write(crc & 0xFF)
    outB.toByteArray
  }

  private def encodeSubframe(w: BitWriter, s: Array[Long], bps: Int): Unit = {
    val bs = s.length
    var flat = true
    var i = 1
    while (i < bs && flat) { flat = s(i) == s(0); i += 1 }
    if (flat) {
      w.writeBits(0, 1); w.writeBits(0, 6); w.writeBits(0, 1) // CONSTANT
      w.writeBits(s(0) & ((1L << bps) - 1), bps)
      return
    }
    // best fixed order 0–2 by absolute-residual sum
    def res(order: Int): Array[Long] = {
      val r = new Array[Long](bs - order)
      var j = order
      while (j < bs) {
        r(j - order) = order match {
          case 0 => s(j)
          case 1 => s(j) - s(j - 1)
          case _ => s(j) - 2 * s(j - 1) + s(j - 2)
        }
        j += 1
      }
      r
    }
    val cands = (0 to math.min(2, bs - 1)).map(o => o -> res(o))
    val (order, r) = cands.minBy(_._2.iterator.map(math.abs).sum)
    // optimal single Rice parameter by exact bit count
    val us = r.map(v => (v << 1) ^ (v >> 63)) // zigzag
    var best = 0
    var bestBits = Long.MaxValue
    var p = 0
    while (p < 15) { // 0xF is the escape — never a parameter
      var tot = 0L
      var j = 0
      while (j < us.length) { tot += (us(j) >>> p) + 1 + p; j += 1 }
      if (tot < bestBits) { bestBits = tot; best = p }
      p += 1
    }
    w.writeBits(0, 1)
    w.writeBits(0x08L | order.toLong, 6) // FIXED
    w.writeBits(0, 1)
    var j = 0
    while (j < order) { w.writeBits(s(j) & ((1L << bps) - 1), bps); j += 1 }
    w.writeBits(0, 2) // 4-bit Rice parameters
    w.writeBits(0, 4) // partition order 0
    w.writeBits(best.toLong, 4)
    j = 0
    while (j < us.length) {
      w.writeUnary((us(j) >>> best).toInt)
      w.writeBits(us(j) & ((1L << best) - 1), best)
      j += 1
    }
  }
}
