package graft.operators

import java.util.Base64

/** Getter/connector authentication (reference: util/credentials.py:1-738).
  *
  * A credentials file (YAML or JSON, path from the
  * `graft.credentials.file` system property or the
  * `GRAFT_CREDENTIALS_FILE` / `LOGPREP_CREDENTIALS_FILE` environment
  * variables) maps `scheme://netloc` targets to one of five
  * authentication methods, matched in the reference's precedence order
  * (credentials.py:283-401):
  *
  *   1. `token` / `token_file`         → static Bearer token (no refresh)
  *   2. `client_key` + `cert` [+ `ca_cert`] → mTLS
  *   3. `endpoint` + `client_id` + `client_secret` + `username` +
  *      `password`                     → OAuth2 password grant,
  *      confidential client (rfc6749 §4.3, refresh §6)
  *   4. `endpoint` + `client_id` + `client_secret` → OAuth2 client
  *      credentials grant (rfc6749 §1.3.4)
  *   5. `endpoint` + `username` + `password` → OAuth2 password grant,
  *      public client
  *   6. `username` + `password`        → HTTP Basic
  *
  * Any `<key>_file` entry is resolved to the file's contents before
  * matching (credentials.py:236-258). Tokens cache per credentials
  * object and refresh when expired; a 401 on the resource invalidates
  * the cache so the next attempt re-authenticates ([[get]] retries
  * once — the reference gets the same effect from requests re-entering
  * `get_session`).
  *
  * The token-endpoint POST is pluggable ([[tokenPost]]) like
  * [[ListSources.fetch]] / [[Requester.transport]], so tests mock the
  * OAuth2 server while production uses the real HTTP client.
  */
object Credentials {

  final class CredentialsBadRequestError(msg: String) extends RuntimeException(msg)

  /** Bearer token + expiry bookkeeping (credentials.py:404-437).
    * `expiresIn == 0` (absent in the token response) never expires.
    */
  final case class AccessToken(token: String, refreshToken: Option[String],
                               expiresIn: Long, issuedAtMs: Long) {
    def isExpired(nowMs: Long): Boolean =
      expiresIn > 0 && nowMs > issuedAtMs + expiresIn * 1000L
  }

  /** Injectable clock so token-expiry tests don't sleep. */
  @volatile var nowMs: () => Long = () => System.currentTimeMillis()

  /** Token-endpoint transport: (url, headers, x-www-form-urlencoded body)
    * → response. Tests install a mock OAuth2 server's handler.
    */
  @volatile var tokenPost: (String, Map[String, String], String) => Option[Requester.Response] =
    realTokenPost

  def realTokenPost(url: String, headers: Map[String, String],
                    form: String): Option[Requester.Response] =
    try {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(5000)
      conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try { os.write(form.getBytes("UTF-8")) } finally os.close()
      val status = conn.getResponseCode
      val is = if (status < 400) conn.getInputStream else conn.getErrorStream
      val body = if (is == null) "" else
        try new String(is.readAllBytes(), "UTF-8") finally is.close()
      Some(Requester.Response(status, body))
    } catch {
      // malformed header values (e.g. a *_file secret ending in a
      // newline) are config errors and must surface, not read as
      // "endpoint unreachable"
      case e: IllegalArgumentException => throw e
      case _: Exception => None
    }

  sealed trait Creds {
    /** Headers for an outgoing request; may fetch/refresh a token. */
    def headers(): Map[String, String] = Map.empty
    /** Drop any cached token (called after a 401 so a retry re-auths). */
    def invalidate(): Unit = ()
    /** mTLS material, when this credential carries it. */
    def mtls: Option[MTls] = None
  }

  /** Basic auth (credentials.py:506-531). */
  final case class BasicAuth(username: String, password: String) extends Creds {
    override def headers(): Map[String, String] =
      Map("Authorization" -> ("Basic " + b64(s"$username:$password")))
    /** Server-side check, constant-time (http_input endpoints). */
    def matches(authorizationHeader: Option[String]): Boolean =
      java.security.MessageDigest.isEqual(
        headers()("Authorization").getBytes("UTF-8"),
        authorizationHeader.getOrElse("").getBytes("UTF-8"))
  }

  /** Static Bearer token — NOT refreshed on expiry (credentials.py:533-556). */
  final case class StaticToken(token: String) extends Creds {
    override def headers(): Map[String, String] =
      Map("Authorization" -> s"Bearer $token")
  }

  /** OAuth2 client-credentials grant (credentials.py:645-714): POST
    * `grant_type=client_credentials` with the client id/secret as a
    * Basic header; cache until `expires_in` passes, then refetch.
    */
  final case class OAuth2ClientFlow(endpoint: String, clientId: String,
                                    clientSecret: String) extends Creds {
    @volatile private var cached: AccessToken = null
    override def headers(): Map[String, String] = synchronized {
      if (cached == null || cached.isExpired(nowMs()))
        cached = fetchToken(endpoint, Map("grant_type" -> "client_credentials"),
          Some((clientId, clientSecret)))
      Map("Authorization" -> s"Bearer ${cached.token}")
    }
    override def invalidate(): Unit = synchronized { cached = null }
  }

  /** OAuth2 resource-owner password grant (credentials.py:558-643);
    * optional client id+secret make it a confidential client. On expiry
    * the refresh_token grant renews (rfc6749 §6); without a refresh
    * token the password grant re-runs.
    */
  final case class OAuth2PasswordFlow(endpoint: String, username: String,
                                      password: String,
                                      clientId: Option[String] = None,
                                      clientSecret: Option[String] = None) extends Creds {
    @volatile private var cached: AccessToken = null
    private def clientAuth: Option[(String, String)] =
      for (i <- clientId; s <- clientSecret) yield (i, s)
    override def headers(): Map[String, String] = synchronized {
      if (cached == null)
        cached = fetchToken(endpoint, Map("grant_type" -> "password",
          "username" -> username, "password" -> password), clientAuth)
      else if (cached.isExpired(nowMs()))
        cached = cached.refreshToken match {
          case Some(rt) => fetchToken(endpoint,
            Map("grant_type" -> "refresh_token", "refresh_token" -> rt), clientAuth)
          case None => fetchToken(endpoint, Map("grant_type" -> "password",
            "username" -> username, "password" -> password), clientAuth)
        }
      Map("Authorization" -> s"Bearer ${cached.token}")
    }
    override def invalidate(): Unit = synchronized { cached = null }
  }

  /** mTLS: PEM client key (PKCS#8) + cert, optional CA bundle
    * (credentials.py:716-738). [[sslContext]] builds once per object.
    */
  final case class MTls(clientKey: String, cert: String,
                        caCert: Option[String] = None) extends Creds {
    override def mtls: Option[MTls] = Some(this)
    lazy val sslContext: javax.net.ssl.SSLContext =
      buildSslContext(clientKey, cert, caCert)
  }

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def formEncode(kv: Map[String, String]): String =
    kv.map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" +
        java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")

  /** POST the grant to the token endpoint; 400 raises the reference's
    * BadRequest error with the server's `error` field
    * (credentials.py:462-487), other failures raise plainly.
    */
  private def fetchToken(endpoint: String, form: Map[String, String],
                         clientAuth: Option[(String, String)]): AccessToken = {
    val headers = clientAuth match {
      case Some((id, secret)) => Map("Authorization" -> ("Basic " + b64(s"$id:$secret")))
      case None => Map.empty[String, String]
    }
    val resp = tokenPost(endpoint, headers, formEncode(form)).getOrElse(
      throw new java.io.IOException(s"token endpoint unreachable: $endpoint"))
    if (resp.status == 400) {
      val err = try {
        import org.json4s._
        org.json4s.jackson.JsonMethods.parse(resp.body) \ "error" match {
          case JString(e) => e; case _ => resp.body
        }
      } catch { case _: Exception => resp.body }
      throw new CredentialsBadRequestError(
        s"Authentication failed with status code 400 Bad Request: $err")
    }
    if (resp.status >= 400)
      throw new java.io.IOException(s"token endpoint $endpoint: HTTP ${resp.status}")
    val json = org.json4s.jackson.JsonMethods.parse(resp.body)
    import org.json4s._
    def str(k: String): Option[String] = json \ k match {
      case JString(s) => Some(s); case _ => None
    }
    val expires = json \ "expires_in" match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case JString(s) => s.toLongOption.getOrElse(0L)
      case _ => 0L
    }
    AccessToken(
      str("access_token").getOrElse(
        throw new java.io.IOException(s"token endpoint $endpoint: no access_token")),
      str("refresh_token"), expires, nowMs())
  }

  // ------------------------------------------------------------------
  // factory (credentials.py:133-258)
  // ------------------------------------------------------------------

  def credentialsFilePath: Option[String] =
    sys.props.get("graft.credentials.file")
      .orElse(sys.env.get("GRAFT_CREDENTIALS_FILE"))
      .orElse(sys.env.get("LOGPREP_CREDENTIALS_FILE"))

  // per-target cache so token state survives across calls (the reference
  // keeps one Credentials object per getter instance). Invalidated when
  // the credentials FILE identity changes, so an edited file takes
  // effect without an explicit clearCache() — same freshness rule as
  // fileCache and fromEndpoint's per-request resolution.
  private val byTarget = new java.util.concurrent.ConcurrentHashMap[String, Option[Creds]]()
  @volatile private var byTargetIdentity: (String, Long, Long) = null

  def clearCache(): Unit = { byTarget.clear(); fileCache.clear() }

  private def fileIdentity(): Option[(String, Long, Long)] =
    credentialsFilePath.map { p =>
      val f = new java.io.File(p)
      (p, f.lastModified(), f.length())
    }

  /** Credentials for a full URL, keyed by `scheme://netloc`
    * (credentials.py:137-163).
    */
  def fromTarget(url: String): Option[Creds] = {
    val key = try {
      val u = new java.net.URI(url)
      s"${u.getScheme}://${u.getAuthority}"
    } catch { case _: Exception => return None }
    fileIdentity() match {
      case None => None
      case Some(id) =>
        // a changed file drops ALL memoized targets (including cached
        // token state — re-authenticating once after a credentials-file
        // edit is the safe direction)
        if (id != byTargetIdentity) { byTarget.clear(); byTargetIdentity = id }
        byTarget.computeIfAbsent(key, k =>
          loadFile().flatMap { root =>
            section(root, "getter").flatMap(g => mapAt(g, k)).flatMap(fromMap)
          })
    }
  }

  /** First usable credential for an http_input endpoint path — see
    * [[fromEndpointAll]] for the full list form.
    */
  def fromEndpoint(path: String): Option[Creds] =
    fromEndpointAll(path).flatMap(_.headOption)

  /** Server-side credentials for an http_input endpoint path; exact key
    * first, then the LONGEST matching trailing-`*` pattern (deterministic
    * when several overlap — credentials.py docs `/second*`).
    *
    * An endpoint entry may be a single mapping or a LIST of mappings
    * (credentials.py from_endpoint:190-197 + from_list:260-273;
    * http/input.py:272-298 accepts ANY matching Basic credential).
    * `None` = no entry for this path (auth not configured);
    * `Some(seq)` = an entry exists and resolved to `seq` usable
    * credentials. `seq` may be EMPTY — callers must fail CLOSED on
    * that (an endpoint with a configured-but-unusable entry denies,
    * it does not silently disable auth).
    */
  def fromEndpointAll(path: String): Option[Seq[Creds]] =
    loadFile().flatMap { root =>
      section(root, "input").flatMap(i => section(i, "endpoints")).flatMap { eps =>
        // ANY present entry counts as configured — a scalar or null value
        // (an easy YAML typo) resolves to Seq.empty and DENIES, it does
        // not silently disable auth (Map.get returns Some(null) for a
        // null-valued key, which resolveEntry maps to Seq.empty)
        eps.get(path).orElse {
          eps.toSeq.collect {
            case (k, v) if k.endsWith("*") &&
              path.startsWith(k.stripSuffix("*")) => k -> v
          }.sortBy(-_._1.length).headOption.map(_._2)
        }.map(resolveEntry)
      }
    }

  private def resolveEntry(entry: Any): Seq[Creds] = entry match {
    case m: java.util.Map[_, _] => fromMap(scalaMap(m)).toSeq
    case l: java.util.List[_] =>
      import scala.jdk.CollectionConverters._
      l.asScala.toSeq.flatMap {
        case m: java.util.Map[_, _] => fromMap(scalaMap(m))
        case _ => None
      }
    case _ => Seq.empty
  }

  // parsed credentials file memoized on (path, mtime, size): the http
  // input consults it per REQUEST, and a YAML parse per event would
  // dominate ingest cost (the reference parses once at startup)
  private val fileCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Map[String, Any]]()

  private def loadFile(): Option[Map[String, Any]] =
    credentialsFilePath.map { p =>
      val f = new java.io.File(p)
      if (!f.exists()) throw new IllegalArgumentException(
        s"credentials file path does not exist: $p")
      fileCache.computeIfAbsent((p, f.lastModified(), f.length()), _ => {
        val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        // YAML is a JSON superset, so one snakeyaml parse covers both
        // formats the reference accepts (credentials.py:202-236)
        new org.yaml.snakeyaml.Yaml().load[Any](text) match {
          case m: java.util.Map[_, _] => scalaMap(m)
          case _ => throw new IllegalArgumentException(s"invalid credentials file: $p")
        }
      })
    }

  private def scalaMap(m: java.util.Map[_, _]): Map[String, Any] = {
    import scala.jdk.CollectionConverters._
    m.asScala.map { case (k, v) => String.valueOf(k) -> v }.toMap
  }

  private def section(m: Map[String, Any], key: String): Option[Map[String, Any]] =
    m.get(key).collect { case mm: java.util.Map[_, _] => scalaMap(mm) }

  private def mapAt(m: Map[String, Any], key: String): Option[Map[String, Any]] =
    m.get(key).collect { case mm: java.util.Map[_, _] => scalaMap(mm) }

  /** Match one credential mapping to its method, after resolving
    * `<key>_file` indirections (credentials.py:236-258, 283-401).
    * Values of USED keys must be strings — a null (`cert:` with no
    * value) or a bare number raises like the reference's
    * InvalidConfigurationError ("Wrong type in given credentials file");
    * extra ignored keys are not validated, matching the
    * attrs-validate-on-construction behavior.
    */
  def fromMap(raw: Map[String, Any]): Option[Creds] = {
    def strValue(k: String, v: Any): String = v match {
      case s: String => s
      case _ => throw new IllegalArgumentException(
        s"Wrong type in given credentials file on argument: $k")
    }
    val resolved: Map[String, Any] = raw.map {
      case (k, v) if k.endsWith("_file") && k != "token_file" =>
        k.stripSuffix("_file") -> readFile(strValue(k, v))
      case ("token_file", v) => "token" -> readFile(strValue("token_file", v))
      case (k, v) => k -> v
    }
    def has(k: String) = resolved.contains(k)
    def str(k: String): String = strValue(k, resolved(k))
    def strOpt(k: String): Option[String] = resolved.get(k).map(strValue(k, _))
    if (has("token")) Some(StaticToken(str("token")))
    else if (has("client_key") && has("cert"))
      Some(MTls(str("client_key"), str("cert"), strOpt("ca_cert")))
    else if (has("endpoint") && has("username") && has("password"))
      Some(OAuth2PasswordFlow(str("endpoint"), str("username"),
        str("password"), strOpt("client_id"), strOpt("client_secret")))
    else if (has("endpoint") && has("client_id") && has("client_secret"))
      Some(OAuth2ClientFlow(str("endpoint"), str("client_id"),
        str("client_secret")))
    else if (has("username") && has("password"))
      Some(BasicAuth(str("username"), str("password")))
    else None
  }

  // byte-for-byte like the reference's Path.read_text
  // (credentials.py:248-250): a secret file's trailing newline is PART
  // of the secret in both implementations, so cross-implementation auth
  // against the same server agrees (server-side BasicAuth.matches
  // compares whatever was configured, consistently)
  private def readFile(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")

  // ------------------------------------------------------------------
  // authenticated GET — the engine's credentialed getter
  // ------------------------------------------------------------------

  /** GET with credentials from the file applied. Transient 5xx retries
    * up to 3 times (the reference's urllib3 Retry on 500/502/503/504);
    * a 401 invalidates the cached token and retries ONCE so an expired
    * server-side session re-authenticates.
    */
  def get(url: String, timeoutMs: Int = 5000): Option[Requester.Response] = {
    val creds = fromTarget(url)
    def once(): Option[Requester.Response] = {
      var attempt = 0
      var resp: Option[Requester.Response] = None
      while (attempt < 3) {
        resp = rawGet(url, creds, timeoutMs)
        resp match {
          case Some(r) if Set(500, 502, 503, 504)(r.status) => attempt += 1
          case _ => return resp
        }
      }
      resp
    }
    once() match {
      case Some(r) if r.status == 401 && creds.isDefined =>
        creds.foreach(_.invalidate())
        once()
      case other => other
    }
  }

  private def rawGet(url: String, creds: Option[Creds],
                     timeoutMs: Int): Option[Requester.Response] =
    try {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      for (c <- creds; m <- c.mtls) conn match {
        case https: javax.net.ssl.HttpsURLConnection =>
          https.setSSLSocketFactory(m.sslContext.getSocketFactory)
        case _ => ()
      }
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      creds.foreach(_.headers().foreach { case (k, v) => conn.setRequestProperty(k, v) })
      val status = conn.getResponseCode
      val is = if (status < 400) conn.getInputStream else conn.getErrorStream
      val body = if (is == null) "" else
        try new String(is.readAllBytes(), "UTF-8") finally is.close()
      Some(Requester.Response(status, body))
    } catch {
      // misconfigured auth must SURFACE (reference raises it), only
      // transport failures degrade to None. IllegalArgumentException is
      // the JDK rejecting a malformed header VALUE (e.g. a token_file
      // whose byte-for-byte content ends in a newline) — that is a
      // config error like the reference's InvalidHeader, not a
      // transport blip, and silently returning None would make it
      // indistinguishable from a network outage.
      case e: CredentialsBadRequestError => throw e
      case e: IllegalArgumentException => throw e
      case _: Exception => None
    }

  // ------------------------------------------------------------------
  // PEM → SSLContext (mTLS)
  // ------------------------------------------------------------------

  private def pemBlocks(path: String, header: String): Seq[Array[Byte]] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val re = ("(?s)-----BEGIN " + header + "-----(.*?)-----END " + header + "-----").r
    re.findAllMatchIn(text).map { m =>
      Base64.getMimeDecoder.decode(m.group(1).replaceAll("\\s", ""))
    }.toSeq
  }

  private def certsFrom(path: String): Seq[java.security.cert.X509Certificate] = {
    val cf = java.security.cert.CertificateFactory.getInstance("X.509")
    pemBlocks(path, "CERTIFICATE").map(der =>
      cf.generateCertificate(new java.io.ByteArrayInputStream(der))
        .asInstanceOf[java.security.cert.X509Certificate])
  }

  /** Client key must be PKCS#8 (`BEGIN PRIVATE KEY`) — the modern
    * openssl default; RSA and EC keys both resolve.
    */
  private def privateKeyFrom(path: String): java.security.PrivateKey = {
    val der = pemBlocks(path, "PRIVATE KEY").headOption.getOrElse(
      throw new IllegalArgumentException(
        s"$path: no PKCS#8 'BEGIN PRIVATE KEY' block (convert PKCS#1 with openssl pkcs8)"))
    val spec = new java.security.spec.PKCS8EncodedKeySpec(der)
    try java.security.KeyFactory.getInstance("RSA").generatePrivate(spec)
    catch { case _: java.security.spec.InvalidKeySpecException =>
      java.security.KeyFactory.getInstance("EC").generatePrivate(spec)
    }
  }

  private def buildSslContext(clientKey: String, cert: String,
                              caCert: Option[String]): javax.net.ssl.SSLContext = {
    val chain = certsFrom(cert)
    val key = privateKeyFrom(clientKey)
    val ks = java.security.KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry("client", key, Array.emptyCharArray, chain.toArray)
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.emptyCharArray)
    val tms: Array[javax.net.ssl.TrustManager] = caCert match {
      case Some(ca) =>
        val ts = java.security.KeyStore.getInstance("PKCS12")
        ts.load(null, null)
        certsFrom(ca).zipWithIndex.foreach { case (c, i) =>
          ts.setCertificateEntry(s"ca$i", c) }
        val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
          javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(ts)
        tmf.getTrustManagers
      case None => null
    }
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tms, null)
    ctx
  }
}
