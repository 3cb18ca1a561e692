package graft.operators

/** Python-`ipaddress`-equivalent IP properties for ip_informer (reference:
  * processor/ip_informer/processor.py:38-86; the property surface is the
  * public stdlib `ipaddress` API). Pure string/bit arithmetic — no
  * java.net.InetAddress (its getByName can trigger DNS on non-literal
  * input).
  */
object IpInfo {

  final case class Parsed(version: Int, bytes: Array[Int], scopeId: Option[String])

  def parse(s: String): Option[Parsed] = {
    if (s == null) return None
    if (s.contains('.') && !s.contains(':')) parseV4(s).map(b => Parsed(4, b, None))
    else if (s.contains(':')) parseV6(s)
    else None
  }

  private def parseV4(s: String): Option[Array[Int]] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return None
    val out = new Array[Int](4)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return None
      if (p.length > 1 && p.startsWith("0")) return None // Python rejects leading zeros
      val v = p.toInt
      if (v > 255) return None
      out(i) = v
      i += 1
    }
    Some(out)
  }

  private def parseV6(s0: String): Option[Parsed] = {
    var s = s0
    var scope: Option[String] = None
    val pct = s.indexOf('%')
    if (pct >= 0) { scope = Some(s.substring(pct + 1)); s = s.take(pct) }
    if (s.count(_ == ':') < 2 && !s.contains("::")) return None
    val halves = s.split("::", -1)
    if (halves.length > 2) return None
    def groups(part: String): Option[Seq[Int]] = {
      if (part.isEmpty) return Some(Nil)
      val gs = part.split(":", -1)
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      for ((g, idx) <- gs.zipWithIndex) {
        if (g.contains('.')) {
          if (idx != gs.length - 1) return None
          parseV4(g) match {
            case Some(b) => out += (b(0) << 8 | b(1)) += (b(2) << 8 | b(3))
            case None => return None
          }
        } else {
          if (g.isEmpty || g.length > 4 ||
              !g.forall(c => Character.digit(c, 16) >= 0)) return None
          out += Integer.parseInt(g, 16)
        }
      }
      Some(out.toSeq)
    }
    val (hi, lo) =
      if (halves.length == 2) (groups(halves(0)), groups(halves(1)))
      else (groups(halves(0)), Some(Nil))
    (hi, lo) match {
      case (Some(h), Some(l)) =>
        val pad = 8 - h.length - l.length
        if (halves.length == 1 && h.length != 8) None
        else if (halves.length == 2 && pad < 0) None
        else {
          val gsAll = h ++ Seq.fill(if (halves.length == 2) pad else 0)(0) ++ l
          if (gsAll.length != 8) None
          else {
            val bytes = gsAll.flatMap(g => Seq(g >> 8, g & 0xFF)).toArray
            Some(Parsed(6, bytes, scope))
          }
        }
      case _ => None
    }
  }

  private def inNet(b: Array[Int], net: Array[Int], prefix: Int): Boolean = {
    var bit = 0
    while (bit < prefix) {
      val mask = 0x80 >> (bit % 8)
      if ((b(bit / 8) & mask) != (net(bit / 8) & mask)) return false
      bit += 1
    }
    true
  }

  private def v4(net: String): Array[Int] = parseV4(net).get
  private def v6b(net: String): Array[Int] = parseV6(net).get.bytes

  private val v4Private = Seq(
    ("0.0.0.0", 8), ("10.0.0.0", 8), ("127.0.0.0", 8), ("169.254.0.0", 16),
    ("172.16.0.0", 12), ("192.0.0.0", 24), ("192.0.2.0", 24),
    ("192.168.0.0", 16), ("198.18.0.0", 15), ("198.51.100.0", 24),
    ("203.0.113.0", 24), ("240.0.0.0", 4), ("255.255.255.255", 32))

  private lazy val v6Private: Seq[(Array[Int], Int)] = Seq(
    ("::1", 128), ("::", 128), ("::ffff:0.0.0.0", 96), ("100::", 64),
    ("2001:db8::", 32), ("fc00::", 7), ("fe80::", 10)).map { case (n, p) => (v6b(n), p) }

  def compressed(p: Parsed): String =
    if (p.version == 4) p.bytes.mkString(".")
    else {
      val gs = (0 until 8).map(i => (p.bytes(2 * i) << 8) | p.bytes(2 * i + 1))
      // longest run of zero groups (≥2) → ::
      var bestStart = -1; var bestLen = 0; var i = 0
      while (i < 8) {
        if (gs(i) == 0) {
          var j = i
          while (j < 8 && gs(j) == 0) j += 1
          if (j - i > bestLen) { bestLen = j - i; bestStart = i }
          i = j
        } else i += 1
      }
      val base =
        if (bestLen >= 2) {
          val left = gs.take(bestStart).map(_.toHexString).mkString(":")
          val right = gs.drop(bestStart + bestLen).map(_.toHexString).mkString(":")
          left + "::" + right
        } else gs.map(_.toHexString).mkString(":")
      base + p.scopeId.map("%" + _).getOrElse("")
    }

  def exploded(p: Parsed): String =
    if (p.version == 4) compressed(p)
    else (0 until 8).map(i => f"${(p.bytes(2 * i) << 8) | p.bytes(2 * i + 1)}%04x")
      .mkString(":") + p.scopeId.map("%" + _).getOrElse("")

  def reversePointer(p: Parsed): String =
    if (p.version == 4) p.bytes.reverse.mkString(".") + ".in-addr.arpa"
    else p.bytes.flatMap(b => Seq((b >> 4).toHexString, (b & 0xF).toHexString))
      .reverse.mkString(".").replaceAll("^", "") + ".ip6.arpa"

  private def isPrivate(p: Parsed): Boolean =
    if (p.version == 4) v4Private.exists { case (n, px) => inNet(p.bytes, v4(n), px) }
    else v6Private.exists { case (n, px) => inNet(p.bytes, n, px) }

  /** Property values in the stdlib's types: Boolean, Int, String, null,
    * keyed by the Python property name.
    */
  def properties(p: Parsed): scala.collection.immutable.ListMap[String, Any] = {
    import scala.collection.immutable.ListMap
    val b = p.bytes
    if (p.version == 4) {
      val priv = isPrivate(p)
      val cgn = inNet(b, v4("100.64.0.0"), 10)
      ListMap(
        "compressed" -> compressed(p),
        "exploded" -> exploded(p),
        "is_global" -> (!cgn && !priv),
        "is_link_local" -> inNet(b, v4("169.254.0.0"), 16),
        "is_loopback" -> inNet(b, v4("127.0.0.0"), 8),
        "is_multicast" -> inNet(b, v4("224.0.0.0"), 4),
        "is_private" -> priv,
        "is_reserved" -> inNet(b, v4("240.0.0.0"), 4),
        "is_unspecified" -> b.forall(_ == 0),
        "max_prefixlen" -> 32,
        "reverse_pointer" -> reversePointer(p),
        "version" -> 4)
    } else {
      val priv = isPrivate(p)
      val mapped =
        if (inNet(b, v6b("::ffff:0.0.0.0"), 96)) b.slice(12, 16).mkString(".")
        else null
      val sixToFour =
        if ((b(0) == 0x20) && (b(1) == 0x02)) b.slice(2, 6).mkString(".") else null
      val teredo =
        if (b(0) == 0x20 && b(1) == 0x01 && b(2) == 0 && b(3) == 0)
          Seq(b.slice(4, 8).mkString("."),
            b.slice(12, 16).map(x => 255 - x).mkString("."))
        else null
      ListMap(
        "compressed" -> compressed(p),
        "exploded" -> exploded(p),
        "ipv4_mapped" -> mapped,
        "is_global" -> !priv,
        "is_link_local" -> inNet(b, v6b("fe80::"), 10),
        "is_loopback" -> (b.take(15).forall(_ == 0) && b(15) == 1),
        "is_multicast" -> (b(0) == 0xFF),
        "is_private" -> priv,
        "is_reserved" -> false,
        "is_site_local" -> inNet(b, v6b("fec0::"), 10),
        "is_unspecified" -> b.forall(_ == 0),
        "max_prefixlen" -> 128,
        "reverse_pointer" -> reversePointer(p),
        "scope_id" -> p.scopeId.orNull,
        "sixtofour" -> sixToFour,
        "teredo" -> teredo,
        "version" -> 6)
    }
  }

  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case i: Int => i.toString
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case xs: Seq[_] => xs.map(jsonVal).mkString("[", ",", "]")
    case other => jsonVal(other.toString)
  }

  /** The ip_informer result for one flat IP list: JSON text of
    * {ip: {prop: value}} (invalid IPs dropped) plus the invalid flag
    * (→ ProcessingWarning upstream). `props` empty = `default` = all.
    */
  def inform(ips: Seq[String], props: Seq[String]): (String, Boolean) = {
    var invalid = false
    val entries = ips.flatMap { ip =>
      parse(ip) match {
        case None => invalid = true; None
        case Some(p) =>
          val all = properties(p)
          val selected =
            if (props.isEmpty || props.contains("default")) all
            else scala.collection.immutable.ListMap(
              props.map(n => n -> all.getOrElse(n, false: Any)): _*)
          if (selected.isEmpty) None
          else Some(jsonVal(ip) + ":" + selected.map { case (k, v) =>
            jsonVal(k) + ":" + jsonVal(v)
          }.mkString("{", ",", "}"))
      }
    }
    val json = if (entries.isEmpty) null else entries.mkString("{", ",", "}")
    (json, invalid)
  }
}
