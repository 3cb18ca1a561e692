package graft.operators

/** Reader for the public MaxMind-DB binary format
  * (https://maxmind.github.io/MaxMind-DB/): binary search tree over IP
  * bits → data-section record, used by the geoip_enricher's
  * [[GeoIp.mmdbProvider]] the way the reference uses `geoip2.database
  * .Reader` (processor/geoip_enricher/processor.py:84-116). Implemented
  * from the published spec only; supports record sizes 24/28/32, the full
  * field-type set, and IPv4 lookups in IPv6 trees (v4 stored under 96
  * zero bits per spec).
  *
  * The whole file is read into one byte array: GeoLite2-City is ~60 MB,
  * loaded once per executor JVM and shared by every task (the reference
  * similarly memory-maps one Reader per process).
  */
final class MaxmindDb private (buf: Array[Byte]) {

  private def u8(i: Int): Int = buf(i) & 0xFF

  // ---- metadata -----------------------------------------------------

  private val MetaMarker: Array[Byte] =
    Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++ "MaxMind.com".getBytes("US-ASCII")

  private val metaStart: Int = {
    var i = buf.length - MetaMarker.length
    var found = -1
    while (i >= 0 && found < 0) {
      var j = 0
      while (j < MetaMarker.length && buf(i + j) == MetaMarker(j)) j += 1
      if (j == MetaMarker.length) found = i
      i -= 1
    }
    require(found >= 0, "not a MaxMind-DB file (metadata marker missing)")
    found + MetaMarker.length
  }

  /** Decode a field at absolute `offset`; pointers resolve relative to
    * `base`. Returns (value, offset after the field).
    */
  private def decode(offset: Int, base: Int): (Any, Int) = {
    val ctrl = u8(offset)
    var typ = ctrl >> 5
    var sz = ctrl & 0x1F
    var p = offset + 1
    if (typ == 1) { // pointer: 2 bits size, 3 bits value
      val psz = (ctrl >> 3) & 0x3
      val v = ctrl & 0x7
      val ptr = psz match {
        case 0 => (v << 8) | u8(p)
        case 1 => ((v << 16) | (u8(p) << 8) | u8(p + 1)) + 2048
        case 2 => ((v << 24) | (u8(p) << 16) | (u8(p + 1) << 8) | u8(p + 2)) + 526336
        case _ => (u8(p).toLong << 24 | u8(p + 1) << 16 | u8(p + 2) << 8 | u8(p + 3)).toInt
      }
      val (value, _) = decode(base + ptr, base)
      return (value, p + psz + 1)
    }
    if (typ == 0) { typ = 7 + u8(p); p += 1 } // extended type
    if (sz == 29) { sz = 29 + u8(p); p += 1 }
    else if (sz == 30) { sz = 285 + (u8(p) << 8) + u8(p + 1); p += 2 }
    else if (sz == 31) { sz = 65821 + (u8(p) << 16) + (u8(p + 1) << 8) + u8(p + 2); p += 3 }
    typ match {
      case 2 => // UTF-8 string
        (new String(buf, p, sz, "UTF-8"), p + sz)
      case 3 => // double (8 bytes)
        (java.lang.Double.longBitsToDouble(be(p, 8)), p + 8)
      case 4 => // bytes
        (java.util.Arrays.copyOfRange(buf, p, p + sz), p + sz)
      case 5 | 6 | 9 => // uint16 / uint32 / uint64 — variable length BE
        (be(p, sz), p + sz)
      case 8 => // int32
        (be(p, sz).toInt.toLong, p + sz)
      case 10 => // uint128 → BigInt
        (BigInt(1, java.util.Arrays.copyOfRange(buf, p, p + sz)), p + sz)
      case 7 => // map
        var o = p
        val m = Map.newBuilder[String, Any]
        var i = 0
        while (i < sz) {
          val (k, o1) = decode(o, base)
          val (v, o2) = decode(o1, base)
          m += (k.asInstanceOf[String] -> v)
          o = o2
          i += 1
        }
        (m.result(), o)
      case 11 => // array
        var o = p
        val a = Seq.newBuilder[Any]
        var i = 0
        while (i < sz) {
          val (v, o1) = decode(o, base)
          a += v
          o = o1
          i += 1
        }
        (a.result(), o)
      case 14 => // boolean: size IS the value
        (sz != 0, p)
      case 15 => // float (4 bytes)
        (java.lang.Float.intBitsToFloat(be(p, 4).toInt).toDouble, p + 4)
      case other =>
        throw new java.io.IOException(s"unsupported MaxMind-DB field type $other")
    }
  }

  private def be(p: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | u8(p + i); i += 1 }
    v
  }

  val metadata: Map[String, Any] =
    decode(metaStart, metaStart)._1.asInstanceOf[Map[String, Any]]

  val nodeCount: Int = metadata("node_count").asInstanceOf[Long].toInt
  val recordSize: Int = metadata("record_size").asInstanceOf[Long].toInt
  val ipVersion: Int = metadata("ip_version").asInstanceOf[Long].toInt
  private val nodeBytes = recordSize * 2 / 8
  private val dataStart = nodeCount * nodeBytes + 16

  // ---- search tree --------------------------------------------------

  private def readRecord(node: Int, right: Boolean): Int = {
    val b = node * nodeBytes
    recordSize match {
      case 24 =>
        val o = b + (if (right) 3 else 0)
        (u8(o) << 16) | (u8(o + 1) << 8) | u8(o + 2)
      case 28 =>
        val mid = u8(b + 3)
        val hi = if (right) mid & 0x0F else (mid & 0xF0) >> 4
        val o = if (right) b + 4 else b
        (hi << 24) | (u8(o) << 16) | (u8(o + 1) << 8) | u8(o + 2)
      case 32 =>
        val o = b + (if (right) 4 else 0)
        be(o, 4).toInt
      case other =>
        throw new java.io.IOException(s"unsupported record size $other")
    }
  }

  /** Raw decoded record for an IP literal; None = not found / unparsable
    * / v6 address against a v4-only tree.
    */
  def lookup(ip: String): Option[Any] = {
    val parsed = IpInfo.parse(ip).getOrElse(return None)
    val bits: Array[Int] =
      if (parsed.version == 4 && ipVersion == 6)
        Array.fill(12)(0) ++ parsed.bytes // v4 under 96 zero bits (spec)
      else if (parsed.version == 6 && ipVersion == 4) return None
      else parsed.bytes
    var node = 0
    var bit = 0
    val total = bits.length * 8
    while (bit < total && node < nodeCount) {
      val right = (bits(bit / 8) & (0x80 >> (bit % 8))) != 0
      node = readRecord(node, right)
      bit += 1
    }
    if (node == nodeCount) None // no-data marker
    else if (node > nodeCount)
      Some(decode(node - nodeCount - 16 + dataStart, dataStart)._1)
    else None
  }

  /** City-schema projection (GeoLite2-City layout: the key paths the
    * reference reads, processor.py:122-143; localized names take "en").
    */
  def lookupCity(ip: String): Option[GeoIp.GeoRecord] =
    lookup(ip).collect { case m: Map[_, _] =>
      val root = m.asInstanceOf[Map[String, Any]]
      def path(segs: String*): Option[Any] =
        segs.foldLeft(Option[Any](root)) {
          case (Some(mm: Map[_, _]), s) =>
            mm.asInstanceOf[Map[String, Any]].get(s)
          case _ => None
        }
      def str(segs: String*): Option[String] = path(segs: _*).map(_.toString)
      def num(segs: String*): Option[Double] = path(segs: _*).collect {
        case d: Double => d
        case l: Long => l.toDouble
      }
      GeoIp.GeoRecord(
        accuracyRadius = path("location", "accuracy_radius").collect { case l: Long => l },
        longitude = num("location", "longitude"),
        latitude = num("location", "latitude"),
        timeZone = str("location", "time_zone"),
        continent = str("continent", "names", "en"),
        continentCode = str("continent", "code"),
        country = str("country", "names", "en"),
        countryIso = str("country", "iso_code"),
        city = str("city", "names", "en"),
        postalCode = str("postal", "code"),
        subdivision = path("subdivisions").collect {
          case xs: Seq[_] if xs.nonEmpty =>
            // most_specific = the last subdivision (geoip2 semantics)
            xs.last.asInstanceOf[Map[String, Any]].get("names")
              .collect { case nm: Map[_, _] =>
                nm.asInstanceOf[Map[String, Any]].get("en").map(_.toString)
              }.flatten
        }.flatten)
    }
}

object MaxmindDb {
  def open(path: String): MaxmindDb =
    new MaxmindDb(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  def fromBytes(bytes: Array[Byte]): MaxmindDb = new MaxmindDb(bytes)
}
