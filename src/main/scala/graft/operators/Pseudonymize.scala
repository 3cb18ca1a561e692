package graft.operators

import scala.collection.immutable.ListMap

/** Pseudonymizer string/URL machinery (reference:
  * processor/pseudonymizer/processor.py:216-382, URL helpers
  * util/url/url.py — the URL grammar is the public django-validators
  * pattern the reference itself cites):
  *
  *  - regex-mapping-selected substrings → `<pseudonym:sha256(value+salt)>`
  *  - URL fields: subdomain / fragment / user:pass / path / query values
  *    pseudonymized component-wise
  *  - already-pseudonymized values pass through
  *
  * All pure string functions — executed per row in a deterministic UDF
  * (the substring selection + component rewriting is inherently
  * sequential); hashing is plan-free SHA-256.
  */
object Pseudonymize {

  val HashPrefix = "<pseudonym:"
  val HashSuffix = ">"
  private val pseudonymized = ("^" + java.util.regex.Pattern.quote(HashPrefix) +
    "(.+?)" + java.util.regex.Pattern.quote(HashSuffix) + "$").r

  def hash(value: String, salt: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(value.getBytes("UTF-8"))
    md.update(salt.getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  def wrap(value: String, salt: String): String =
    HashPrefix + hash(value, salt) + HashSuffix

  // ------------------------------------------------------------- URL bits

  private val validSchemes = Set("http", "https", "ftp", "sftp", "ssh",
    "file", "git", "svn", "svn+ssh", "git+ssh", "scp", "rsync")

  private val ul = "¡-￿"
  private val ipv4Re =
    "(?:0|25[0-5]|2[0-4][0-9]|1[0-9]?[0-9]?|[1-9][0-9]?)(?:\\.(?:0|25[0-5]|2[0-4][0-9]|1[0-9]?[0-9]?|[1-9][0-9]?)){3}"
  private val ipv6Re = "\\[[0-9a-f:.]+\\]"
  private val hostnameRe = s"[a-z${ul}0-9](?:[a-z${ul}0-9-]+[a-z${ul}0-9])?"
  private val domainRe = s"(?:\\.(?!-)[a-z${ul}0-9-]+(?<!-))*"
  private val tldRe = s"\\.(?!-)(?:[a-z$ul-]{2,63}|xn--[a-z0-9]{1,59})(?<!-)\\.?"
  private val hostRe = hostnameRe + domainRe + tldRe
  private val urlPattern = java.util.regex.Pattern.compile(
    "(?:(?:[a-z0-9.+-]*)://)?" +
      "(?:[^\\s:@/]+(?::[^\\s:@/]*)?@)?" +
      "(?:" + ipv4Re + "|" + ipv6Re + "|" + hostRe + ")" +
      "(?::[0-9]{1,5})?" +
      "(?:[/?#][^\\s]*)?",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  final case class Url(scheme: Option[String], username: Option[String],
                       password: Option[String], hostname: Option[String],
                       path: String, query: Option[String], fragment: Option[String])

  /** Minimal urlsplit for the component rewriting. */
  def parseUrl(u0: String): Url = {
    var rest = u0
    var scheme: Option[String] = None
    val si = rest.indexOf("://")
    if (si >= 0) { scheme = Some(rest.take(si)); rest = rest.substring(si + 3) }
    var fragment: Option[String] = None
    val fi = rest.indexOf('#')
    if (fi >= 0) { fragment = Some(rest.substring(fi + 1)).filter(_.nonEmpty); rest = rest.take(fi) }
    var query: Option[String] = None
    val qi = rest.indexOf('?')
    if (qi >= 0) { query = Some(rest.substring(qi + 1)).filter(_.nonEmpty); rest = rest.take(qi) }
    var path = ""
    val pi = rest.indexOf('/')
    if (pi >= 0) { path = rest.substring(pi); rest = rest.take(pi) }
    var user: Option[String] = None; var pass: Option[String] = None
    val ai = rest.lastIndexOf('@')
    if (ai >= 0) {
      val auth = rest.take(ai); rest = rest.substring(ai + 1)
      val ci = auth.indexOf(':')
      if (ci >= 0) { user = Some(auth.take(ci)); pass = Some(auth.substring(ci + 1)) }
      else user = Some(auth)
    }
    val hi = rest.lastIndexOf(':')
    val host = if (hi >= 0 && rest.substring(hi + 1).forall(_.isDigit)) rest.take(hi) else rest
    Url(scheme, user, pass, Some(host.toLowerCase).filter(_.nonEmpty), path, query, fragment)
  }

  def isValidUrl(value0: String): Boolean = {
    var value = value0
    if (value.contains("://")) {
      val scheme = value.take(value.indexOf("://"))
      if (!validSchemes.contains(scheme.toLowerCase)) return false
    } else value = "http://" + value
    val u = parseUrl(value)
    u.hostname match {
      case None => false
      case Some(h) =>
        h.length <= 253 && h.split("\\.", -1).forall(_.length <= 63)
    }
  }

  def extractUrls(fieldValue: String): Seq[String] = {
    val m = urlPattern.matcher(fieldValue)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toSeq.filter(isValidUrl)
  }

  /** Python parse_qs + urlencode(doseq) round-trip with pseudonymized
    * values (empty values dropped by parse_qs).
    */
  private def pseudonymizeQuery(query: String, salt: String): String = {
    val pairs = query.split("&").toSeq.filter(_.nonEmpty).flatMap { part =>
      val i = part.indexOf('=')
      if (i < 0) None // parse_qs drops keys without '='
      else {
        val (k, v) = (part.take(i), part.substring(i + 1))
        if (v.isEmpty) None else Some(k -> v)
      }
    }
    val grouped = ListMap(pairs.map(_._1).distinct.map(k =>
      k -> pairs.collect { case (`k`, v) => v }): _*)
    grouped.flatMap { case (k, vs) =>
      vs.map(v => k + "=" + pseudonymizeString(v, salt))
    }.mkString("&")
  }

  def pseudonymizeString(value: String, salt: String): String =
    if (pseudonymized.findFirstIn(value).isDefined) value
    else wrap(value, salt)

  /** `_pseudonymize_url` (processor.py:335-366). */
  def pseudonymizeUrl(urlString0: String, salt: String): String = {
    var urlString = urlString0
    val parsed =
      if (urlString.startsWith("http://") || urlString.startsWith("https://"))
        parseUrl(urlString)
      else parseUrl("http://" + urlString)
    parsed.hostname.foreach { host =>
      val labels = host.split("\\.", -1)
      if (labels.length > 2) {
        val subdomain = labels.dropRight(2).mkString(".")
        urlString = urlString.replace(subdomain, pseudonymizeString(subdomain, salt))
      }
    }
    parsed.fragment.foreach { frag =>
      urlString = urlString.replace("#" + frag, "#" + pseudonymizeString(frag, salt))
    }
    parsed.username.foreach { user =>
      val auth = user + ":" + parsed.password.getOrElse("")
      urlString = urlString.replace(auth, pseudonymizeString(auth, salt))
    }
    if (parsed.path.length > 1)
      urlString = urlString.replace(parsed.path.substring(1),
        pseudonymizeString(parsed.path.substring(1), salt))
    parsed.query.foreach { q =>
      urlString = urlString.replace(q, pseudonymizeQuery(q, salt))
    }
    urlString
  }

  /** Python re.findall value selection: 0 groups → whole matches,
    * 1 group → that group, n groups → all groups.
    */
  def findallValues(regex: java.util.regex.Pattern, value: String): Seq[String] = {
    val m = regex.matcher(value)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) {
      if (m.groupCount() == 0) out += m.group()
      else if (m.groupCount() == 1) { if (m.group(1) != null) out += m.group(1) }
      else (1 to m.groupCount()).foreach(i => if (m.group(i) != null) out += m.group(i))
    }
    out.toSeq
  }

  /** `_pseudonymize_field` (processor.py:297-315). */
  def pseudonymizeField(regex: java.util.regex.Pattern, isUrlField: Boolean,
                        salt: String, fieldValue0: String): String = {
    var fieldValue = fieldValue0
    var plaintext = findallValues(regex, fieldValue).filter(_.nonEmpty).distinct
    if (plaintext.nonEmpty && isUrlField) {
      extractUrls(fieldValue).foreach { url =>
        fieldValue = fieldValue.replace(url, pseudonymizeUrl(url, salt))
        plaintext = plaintext.filterNot(_ == url)
      }
    }
    plaintext.foreach { clear =>
      fieldValue = fieldValue.replaceAll(
        java.util.regex.Pattern.quote(clear),
        java.util.regex.Matcher.quoteReplacement(pseudonymizeString(clear, salt)))
    }
    fieldValue
  }
}
