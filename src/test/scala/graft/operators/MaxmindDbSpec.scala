package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Reader test against a tiny MaxMind-DB fixture GENERATED HERE from the
  * published format spec (search tree + data section + metadata) — no
  * external .mmdb needed, and the writer doubles as documentation of the
  * byte layout the reader expects.
  */
class MaxmindDbSpec extends AnyFunSuite {

  // ---- minimal MaxMind-DB encoder (spec: maxmind.github.io/MaxMind-DB) --

  private def ctrl(typ: Int, size: Int): Array[Byte] = {
    require(size < 29)
    if (typ <= 7) Array(((typ << 5) | size).toByte)
    else Array((0 << 5 | size).toByte, (typ - 7).toByte)
  }
  private def encString(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8"); ctrl(2, b.length) ++ b
  }
  private def encDouble(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    ctrl(3, 8) ++ (7 to 0 by -1).map(i => ((bits >> (i * 8)) & 0xFF).toByte)
  }
  private def encUint(typ: Int, v: Long): Array[Byte] = {
    var bytes = List.empty[Byte]
    var x = v
    while (x != 0) { bytes = ((x & 0xFF).toByte) :: bytes; x >>>= 8 }
    ctrl(typ, bytes.length) ++ bytes
  }
  private def encMap(entries: (String, Array[Byte])*): Array[Byte] =
    ctrl(7, entries.length) ++ entries.flatMap { case (k, v) => encString(k) ++ v }
  private def encArray(items: Array[Byte]*): Array[Byte] =
    ctrl(11, items.length) ++ items.flatten

  /** One-network tree: `bits` (the network path) chains nodes; every
    * off-path record is the no-data marker (node_count). Returns the file.
    */
  private def buildMmdb(ipVersion: Int, bits: Seq[Int],
                        record: Array[Byte],
                        recordSize: Int = 24): Array[Byte] = {
    val nodeCount = bits.length
    def node24(l: Int, r: Int) = Array(
      ((l >> 16) & 0xFF).toByte, ((l >> 8) & 0xFF).toByte, (l & 0xFF).toByte,
      ((r >> 16) & 0xFF).toByte, ((r >> 8) & 0xFF).toByte, (r & 0xFF).toByte)
    // 28-bit: [l23-16, l15-8, l7-0, (l27-24 << 4 | r27-24), r23-16, r15-8, r7-0]
    def node28(l: Int, r: Int) = Array(
      ((l >> 16) & 0xFF).toByte, ((l >> 8) & 0xFF).toByte, (l & 0xFF).toByte,
      ((((l >> 24) & 0xF) << 4) | ((r >> 24) & 0xF)).toByte,
      ((r >> 16) & 0xFF).toByte, ((r >> 8) & 0xFF).toByte, (r & 0xFF).toByte)
    def node32(l: Int, r: Int) = Array(
      (l >> 24).toByte, ((l >> 16) & 0xFF).toByte, ((l >> 8) & 0xFF).toByte,
      (l & 0xFF).toByte,
      (r >> 24).toByte, ((r >> 16) & 0xFF).toByte, ((r >> 8) & 0xFF).toByte,
      (r & 0xFF).toByte)
    val mk: (Int, Int) => Array[Byte] = recordSize match {
      case 24 => node24
      case 28 => node28
      case 32 => node32
    }
    val tree = (0 until nodeCount).flatMap { i =>
      val next = if (i == nodeCount - 1) nodeCount + 16 else i + 1
      val (l, r) = if (bits(i) == 0) (next, nodeCount) else (nodeCount, next)
      mk(l, r)
    }.toArray
    val separator = Array.fill[Byte](16)(0)
    val metadata = encMap(
      "node_count" -> encUint(6, nodeCount),
      "record_size" -> encUint(5, recordSize),
      "ip_version" -> encUint(5, ipVersion),
      "database_type" -> encString("GeoLite2-City-Test"),
      "binary_format_major_version" -> encUint(5, 2),
      "binary_format_minor_version" -> encUint(5, 0),
      "build_epoch" -> encUint(9, 1600000000L),
      "languages" -> encArray(encString("en")),
      "description" -> encMap("en" -> encString("test fixture")))
    val marker = Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++
      "MaxMind.com".getBytes("US-ASCII")
    tree ++ separator ++ record ++ marker ++ metadata
  }

  private val cityRecord: Array[Byte] = encMap(
    "city" -> encMap("names" -> encMap("en" -> encString("Berlin"))),
    "continent" -> encMap(
      "code" -> encString("EU"),
      "names" -> encMap("en" -> encString("Europe"))),
    "country" -> encMap(
      "iso_code" -> encString("DE"),
      "names" -> encMap("en" -> encString("Germany"))),
    "location" -> encMap(
      "accuracy_radius" -> encUint(5, 1337),
      "latitude" -> encDouble(52.52),
      "longitude" -> encDouble(13.405),
      "time_zone" -> encString("Europe/Berlin")),
    "postal" -> encMap("code" -> encString("10115")),
    "subdivisions" -> encArray(
      encMap("names" -> encMap("en" -> encString("Brandenburg"))),
      encMap("names" -> encMap("en" -> encString("Berlin")))))

  private def v4PathBits(a: Int, b: Int, c: Int, prefix: Int): Seq[Int] =
    (0 until prefix).map { i =>
      val oct = Seq(a, b, c, 0)(i / 8)
      (oct >> (7 - (i % 8))) & 1
    }

  test("v4 tree: /24 network lookup, miss outside") {
    val db = MaxmindDb.fromBytes(
      buildMmdb(4, v4PathBits(1, 2, 3, 24), cityRecord))
    assert(db.ipVersion == 4)
    val hit = db.lookupCity("1.2.3.77")
    assert(hit.isDefined)
    val r = hit.get
    assert(r.city.contains("Berlin"))
    assert(r.country.contains("Germany"))
    assert(r.countryIso.contains("DE"))
    assert(r.continent.contains("Europe"))
    assert(r.continentCode.contains("EU"))
    assert(r.accuracyRadius.contains(1337L))
    assert(r.latitude.contains(52.52))
    assert(r.longitude.contains(13.405))
    assert(r.timeZone.contains("Europe/Berlin"))
    assert(r.postalCode.contains("10115"))
    assert(r.subdivision.contains("Berlin")) // most_specific = last
    assert(db.lookupCity("1.2.4.1").isEmpty)
    assert(db.lookupCity("9.9.9.9").isEmpty)
    assert(db.lookupCity("not-an-ip").isEmpty)
  }

  test("28- and 32-bit record sizes (nibble-packed middle byte)") {
    for (rs <- Seq(28, 32)) {
      val db = MaxmindDb.fromBytes(
        buildMmdb(4, v4PathBits(172, 16, 5, 24), cityRecord, recordSize = rs))
      assert(db.recordSize == rs)
      assert(db.lookupCity("172.16.5.200").exists(_.city.contains("Berlin")),
        s"record size $rs: hit failed")
      assert(db.lookupCity("172.16.6.1").isEmpty, s"record size $rs: false hit")
    }
  }

  test("v6 tree: v4 addresses under 96 zero bits (spec), v6 miss") {
    val bits = Seq.fill(96)(0) ++ v4PathBits(8, 8, 8, 24)
    val db = MaxmindDb.fromBytes(buildMmdb(6, bits, cityRecord))
    assert(db.lookupCity("8.8.8.123").exists(_.city.contains("Berlin")))
    assert(db.lookupCity("8.9.8.8").isEmpty)
    assert(db.lookupCity("2001:db8::1").isEmpty)
  }

  test("mmdbProvider: lazy file-backed provider") {
    val f = java.nio.file.Files.createTempDirectory("mmdb").resolve("t.mmdb")
    java.nio.file.Files.write(f,
      buildMmdb(4, v4PathBits(10, 0, 0, 24), cityRecord))
    val provider = GeoIp.mmdbProvider(f.toString)
    assert(provider("10.0.0.5").exists(_.country.contains("Germany")))
    assert(provider("10.0.1.5").isEmpty)
  }
}
