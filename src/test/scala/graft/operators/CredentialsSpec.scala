package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterEach
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Credential factory + OAuth2 token flows + mTLS context, mirroring the
  * reference's util/credentials.py test surface: file-format matching
  * precedence, `_file` indirection, token caching/expiry/refresh,
  * 401-retry-once, and the endpoints section for http_input.
  */
class CredentialsSpec extends AnyFunSuite with Matchers with BeforeAndAfterEach {

  private def tmpFile(content: String, suffix: String = ".yml"): String = {
    val f = java.io.File.createTempFile("creds", suffix)
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    f.getAbsolutePath
  }

  private def withCredsFile[A](yaml: String)(body: => A): A = {
    sys.props("graft.credentials.file") = tmpFile(yaml)
    Credentials.clearCache()
    try body finally {
      sys.props.remove("graft.credentials.file")
      Credentials.clearCache()
    }
  }

  override def afterEach(): Unit = {
    Credentials.tokenPost = Credentials.realTokenPost
    Credentials.nowMs = () => System.currentTimeMillis()
    Credentials.clearCache()
  }

  // ---------------------------------------------------------------- factory

  test("factory: basic auth, with password_file indirection") {
    val pw = tmpFile("s3cret\n", ".txt")
    withCredsFile(
      s"""getter:
         |  "http://target.example":
         |    username: alice
         |    password_file: $pw
         |""".stripMargin) {
      val c = Credentials.fromTarget("http://target.example/rules/a.yml")
      // byte-for-byte like the reference's Path.read_text
      // (credentials.py:248-250): the trailing newline is kept
      c shouldBe Some(Credentials.BasicAuth("alice", "s3cret\n"))
      c.get.headers()("Authorization") should startWith("Basic ")
    }
  }

  test("factory: static token wins over everything else present") {
    withCredsFile(
      """getter:
        |  "https://api.example:8443":
        |    token: tok123
        |    username: ignored
        |    password: ignored
        |""".stripMargin) {
      Credentials.fromTarget("https://api.example:8443/x") shouldBe
        Some(Credentials.StaticToken("tok123"))
    }
  }

  test("factory: mTLS with and without ca_cert") {
    withCredsFile(
      """getter:
        |  "https://a.example":
        |    client_key: /k.pem
        |    cert: /c.pem
        |    ca_cert: /ca.pem
        |  "https://b.example":
        |    client_key: /k.pem
        |    cert: /c.pem
        |""".stripMargin) {
      Credentials.fromTarget("https://a.example/") shouldBe
        Some(Credentials.MTls("/k.pem", "/c.pem", Some("/ca.pem")))
      Credentials.fromTarget("https://b.example/") shouldBe
        Some(Credentials.MTls("/k.pem", "/c.pem", None))
    }
  }

  test("factory: OAuth2 flows — confidential password > client > public password > basic") {
    withCredsFile(
      """getter:
        |  "http://pw-conf.example":
        |    endpoint: http://idp/token
        |    client_id: cid
        |    client_secret: cs
        |    username: u
        |    password: p
        |  "http://client.example":
        |    endpoint: http://idp/token
        |    client_id: cid
        |    client_secret: cs
        |  "http://pw-pub.example":
        |    endpoint: http://idp/token
        |    username: u
        |    password: p
        |""".stripMargin) {
      Credentials.fromTarget("http://pw-conf.example/") shouldBe Some(
        Credentials.OAuth2PasswordFlow("http://idp/token", "u", "p", Some("cid"), Some("cs")))
      Credentials.fromTarget("http://client.example/") shouldBe Some(
        Credentials.OAuth2ClientFlow("http://idp/token", "cid", "cs"))
      Credentials.fromTarget("http://pw-pub.example/") shouldBe Some(
        Credentials.OAuth2PasswordFlow("http://idp/token", "u", "p", None, None))
    }
  }

  test("factory: unknown target or no file -> None; JSON format accepted") {
    Credentials.fromTarget("http://nobody.example/") shouldBe None
    withCredsFile(
      """{"getter": {"http://j.example": {"username": "u", "password": "p"}}}""") {
      Credentials.fromTarget("http://j.example/list.txt") shouldBe
        Some(Credentials.BasicAuth("u", "p"))
      Credentials.fromTarget("http://other.example/") shouldBe None
    }
  }

  test("factory: input endpoints — exact and trailing-star match") {
    withCredsFile(
      """input:
        |  endpoints:
        |    /json:
        |      username: u1
        |      password: p1
        |    /sec*:
        |      username: u2
        |      password: p2
        |""".stripMargin) {
      Credentials.fromEndpoint("/json") shouldBe Some(Credentials.BasicAuth("u1", "p1"))
      Credentials.fromEndpoint("/second") shouldBe Some(Credentials.BasicAuth("u2", "p2"))
      Credentials.fromEndpoint("/other") shouldBe None
    }
  }

  test("factory: input endpoints — LIST of credentials resolves all usable entries") {
    // reference from_endpoint:190-197 + from_list:260-273: a list entry
    // resolves every dict element; http/input.py accepts any matching Basic
    withCredsFile(
      """input:
        |  endpoints:
        |    /multi:
        |      - username: u1
        |        password: p1
        |      - username: u2
        |        password: p2
        |    /mixed:
        |      - token: tok
        |      - username: u3
        |        password: p3
        |""".stripMargin) {
      Credentials.fromEndpointAll("/multi") shouldBe Some(Seq(
        Credentials.BasicAuth("u1", "p1"), Credentials.BasicAuth("u2", "p2")))
      Credentials.fromEndpointAll("/mixed") shouldBe Some(Seq(
        Credentials.StaticToken("tok"), Credentials.BasicAuth("u3", "p3")))
      Credentials.fromEndpointAll("/other") shouldBe None
    }
  }

  test("factory: input endpoints — entry present but unusable yields Some(empty), not None") {
    // the distinction callers need to fail CLOSED: a configured-but-broken
    // entry must NOT look like "no auth configured" — empty list, null
    // value (the easy YAML typo `/path:` with nothing), or a scalar all
    // count as configured
    withCredsFile(
      """input:
        |  endpoints:
        |    /broken: []
        |    /nullval:
        |    /scalar: creds.yml
        |    /typo*: oops
        |""".stripMargin) {
      Credentials.fromEndpointAll("/broken") shouldBe Some(Seq.empty)
      Credentials.fromEndpointAll("/nullval") shouldBe Some(Seq.empty)
      Credentials.fromEndpointAll("/scalar") shouldBe Some(Seq.empty)
      Credentials.fromEndpointAll("/typo-match") shouldBe Some(Seq.empty)
      Credentials.fromEndpoint("/broken") shouldBe None
    }
  }

  test("factory: fromTarget re-resolves after the credentials file changes on disk") {
    val path = tmpFile(
      """getter:
        |  "http://t.example":
        |    username: before
        |    password: p
        |""".stripMargin)
    sys.props("graft.credentials.file") = path
    Credentials.clearCache()
    try {
      Credentials.fromTarget("http://t.example/a") shouldBe
        Some(Credentials.BasicAuth("before", "p"))
      val f = new java.io.File(path)
      java.nio.file.Files.write(f.toPath,
        """getter:
          |  "http://t.example":
          |    username: after
          |    password: p
          |""".stripMargin.getBytes("UTF-8"))
      // force a distinct mtime even on coarse-granularity filesystems
      f.setLastModified(f.lastModified() + 2000)
      // NO clearCache(): the file-identity key must invalidate by itself
      Credentials.fromTarget("http://t.example/a") shouldBe
        Some(Credentials.BasicAuth("after", "p"))
    } finally {
      sys.props.remove("graft.credentials.file")
      Credentials.clearCache()
    }
  }

  test("factory: overlapping wildcard endpoints — longest prefix wins") {
    withCredsFile(
      """input:
        |  endpoints:
        |    /api*:
        |      username: broad
        |      password: p
        |    /api/v2*:
        |      username: narrow
        |      password: p
        |""".stripMargin) {
      Credentials.fromEndpoint("/api/v2/logs") shouldBe
        Some(Credentials.BasicAuth("narrow", "p"))
      Credentials.fromEndpoint("/api/v1/logs") shouldBe
        Some(Credentials.BasicAuth("broad", "p"))
    }
  }

  test("get: 400 from the token endpoint PROPAGATES (not swallowed to None)") {
    Credentials.tokenPost = (_, _, _) =>
      Some(Requester.Response(400, """{"error":"invalid_client"}"""))
    val server = resourceServer { _ => (200, "never reached") }
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/x"
      withCredsFile(
        s"""getter:
           |  "http://127.0.0.1:${server.getAddress.getPort}":
           |    endpoint: http://idp/token
           |    client_id: cid
           |    client_secret: wrong
           |""".stripMargin) {
        val e = intercept[Credentials.CredentialsBadRequestError](Credentials.get(url))
        e.getMessage should include("invalid_client")
      }
    } finally server.stop(0)
  }

  // ------------------------------------------------------------ token flows

  private class MockIdp {
    var calls: List[(Map[String, String], String)] = Nil
    var expiresIn: Option[Long] = None
    var withRefresh: Boolean = false
    var serial = 0
    def install(): Unit = Credentials.tokenPost = { (url, headers, form) =>
      calls = calls :+ (headers, form)
      serial += 1
      val exp = expiresIn.map(e => s""","expires_in":$e""").getOrElse("")
      val ref = if (withRefresh) s""","refresh_token":"ref$serial"""" else ""
      Some(Requester.Response(200, s"""{"access_token":"tok$serial"$exp$ref}"""))
    }
  }

  test("client flow: fetches once, caches until expiry, refetches after") {
    val idp = new MockIdp; idp.expiresIn = Some(60); idp.install()
    var now = 1000000L
    Credentials.nowMs = () => now
    val c = Credentials.OAuth2ClientFlow("http://idp/token", "cid", "csecret")
    c.headers() shouldBe Map("Authorization" -> "Bearer tok1")
    c.headers() shouldBe Map("Authorization" -> "Bearer tok1") // cached
    idp.calls should have size 1
    // grant + Basic client auth on the token request
    idp.calls.head._2 shouldBe "grant_type=client_credentials"
    val b64 = java.util.Base64.getEncoder.encodeToString("cid:csecret".getBytes("UTF-8"))
    idp.calls.head._1("Authorization") shouldBe s"Basic $b64"
    now += 61 * 1000
    c.headers() shouldBe Map("Authorization" -> "Bearer tok2")
    idp.calls should have size 2
  }

  test("password flow: password grant first, refresh_token grant on expiry") {
    val idp = new MockIdp; idp.expiresIn = Some(30); idp.withRefresh = true; idp.install()
    var now = 5000000L
    Credentials.nowMs = () => now
    val c = Credentials.OAuth2PasswordFlow("http://idp/token", "u", "pw d")
    c.headers() shouldBe Map("Authorization" -> "Bearer tok1")
    idp.calls.head._2 shouldBe "grant_type=password&username=u&password=pw+d"
    idp.calls.head._1 shouldBe empty // public client: no Basic header
    now += 31 * 1000
    c.headers() shouldBe Map("Authorization" -> "Bearer tok2")
    idp.calls(1)._2 shouldBe "grant_type=refresh_token&refresh_token=ref1"
  }

  test("token without expires_in never expires") {
    val idp = new MockIdp; idp.install()
    var now = 0L
    Credentials.nowMs = () => now
    val c = Credentials.OAuth2ClientFlow("http://idp/token", "cid", "cs")
    c.headers() shouldBe Map("Authorization" -> "Bearer tok1")
    now += 365L * 24 * 3600 * 1000
    c.headers() shouldBe Map("Authorization" -> "Bearer tok1")
    idp.calls should have size 1
  }

  test("400 from the token endpoint raises the reference's BadRequest error") {
    Credentials.tokenPost = (_, _, _) =>
      Some(Requester.Response(400, """{"error":"invalid_grant"}"""))
    val c = Credentials.OAuth2ClientFlow("http://idp/token", "cid", "cs")
    val e = intercept[Credentials.CredentialsBadRequestError](c.headers())
    e.getMessage should include("invalid_grant")
  }

  // --------------------------------------------------- credentialed getter

  private def resourceServer(handler: HttpExchange => (Int, String)): HttpServer = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val (code, body) = handler(ex)
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    server
  }

  test("get: applies Basic auth from the file; 401 without it") {
    var sawAuth: Option[String] = None
    val server = resourceServer { ex =>
      sawAuth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (sawAuth.exists(_.startsWith("Basic "))) (200, "line1\nline2") else (401, "")
    }
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/list.txt"
      withCredsFile(
        s"""getter:
           |  "http://127.0.0.1:${server.getAddress.getPort}":
           |    username: u
           |    password: p
           |""".stripMargin) {
        val r = Credentials.get(url)
        r.map(_.status) shouldBe Some(200)
        r.map(_.body) shouldBe Some("line1\nline2")
        // and ListSources rides the same getter for http(s) lists
        ListSources.clearCache()
        ListSources.load(url) shouldBe Some(Seq("line1", "line2"))
      }
    } finally server.stop(0)
  }

  test("get: 401 invalidates the cached token and retries once with a fresh one") {
    val idp = new MockIdp; idp.install()
    val accepted = new java.util.concurrent.atomic.AtomicReference[String]("Bearer tok2")
    var hits = 0
    val server = resourceServer { ex =>
      hits += 1
      val got = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      if (got == accepted.get) (200, "ok") else (401, "")
    }
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data"
      withCredsFile(
        s"""getter:
           |  "http://127.0.0.1:${server.getAddress.getPort}":
           |    endpoint: http://idp/token
           |    client_id: cid
           |    client_secret: cs
           |""".stripMargin) {
        // first token (tok1) is rejected; the 401 invalidates it, the
        // retry fetches tok2 and succeeds
        val r = Credentials.get(url)
        r.map(_.status) shouldBe Some(200)
        hits shouldBe 2
        idp.calls should have size 2
      }
    } finally server.stop(0)
  }

  test("get: transient 503 retries up to 3 times then succeeds") {
    var hits = 0
    val server = resourceServer { _ =>
      hits += 1
      if (hits < 3) (503, "") else (200, "fine")
    }
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/flaky"
      Credentials.get(url).map(_.status) shouldBe Some(200)
      hits shouldBe 3
    } finally server.stop(0)
  }

  test("requester transport: Bearer header applied, 401-retry-once") {
    val idp = new MockIdp; idp.install()
    var hits = 0
    val server = resourceServer { ex =>
      hits += 1
      val got = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      if (got == "Bearer tok2") (200, """{"ok":true}""") else (401, "")
    }
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/api"
      withCredsFile(
        s"""getter:
           |  "http://127.0.0.1:${server.getAddress.getPort}":
           |    endpoint: http://idp/token
           |    client_id: cid
           |    client_secret: cs
           |""".stripMargin) {
        val r = Requester.realTransport("GET", url, None)
        r.map(_.status) shouldBe Some(200)
        hits shouldBe 2
      }
    } finally server.stop(0)
  }

  // ----------------------------------------------------------------- mTLS

  private def fixture(name: String): String =
    getClass.getResource(s"/credentials/$name").getPath

  test("mTLS: SSLContext builds from PEM key + cert chain + ca") {
    val m = Credentials.MTls(fixture("client.key"), fixture("client.crt"),
      Some(fixture("ca.crt")))
    m.sslContext should not be null
  }

  test("mTLS: end-to-end handshake against a client-auth-requiring HTTPS server") {
    import com.sun.net.httpserver.{HttpsConfigurator, HttpsParameters, HttpsServer}
    // server context: its own cert/key, trusts the test CA for client auth
    val serverCtx = Credentials.MTls(fixture("server.key"), fixture("server.crt"),
      Some(fixture("ca.crt"))).sslContext
    val server = HttpsServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setHttpsConfigurator(new HttpsConfigurator(serverCtx) {
      override def configure(params: HttpsParameters): Unit = {
        val ssl = serverCtx.getDefaultSSLParameters
        ssl.setNeedClientAuth(true)
        params.setSSLParameters(ssl)
      }
    })
    server.createContext("/", (ex: HttpExchange) => {
      val b = "mutual".getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      withCredsFile(
        s"""getter:
           |  "https://127.0.0.1:$port":
           |    client_key: ${fixture("client.key")}
           |    cert: ${fixture("client.crt")}
           |    ca_cert: ${fixture("ca.crt")}
           |""".stripMargin) {
        val r = Credentials.get(s"https://127.0.0.1:$port/secure")
        r.map(_.status) shouldBe Some(200)
        r.map(_.body) shouldBe Some("mutual")
      }
    } finally server.stop(0)
  }

  test("http_input: endpoints section gates /json when no explicit credentials") {
    val spool = java.nio.file.Files.createTempDirectory("spool").toString
    val srv = new graft.streaming.Connectors.HttpInputServer(spool).start()
    try {
      withCredsFile(
        """input:
          |  endpoints:
          |    /json:
          |      username: ingest
          |      password: pw
          |""".stripMargin) {
        val url = s"http://127.0.0.1:${srv.boundPort}/json"
        def post(auth: Option[String]): Int = {
          val conn = new java.net.URL(url).openConnection()
            .asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("POST")
          auth.foreach(a => conn.setRequestProperty("Authorization", a))
          conn.setDoOutput(true)
          conn.getOutputStream.write("""{"a":1}""".getBytes("UTF-8"))
          conn.getOutputStream.close()
          val code = conn.getResponseCode
          conn.disconnect()
          code
        }
        post(None) shouldBe 401
        val good = "Basic " + java.util.Base64.getEncoder
          .encodeToString("ingest:pw".getBytes("UTF-8"))
        post(Some(good)) shouldBe 200
      }
      // fail CLOSED: a non-Basic (OAuth2-shaped) endpoint entry denies
      // rather than silently disabling auth
      withCredsFile(
        """input:
          |  endpoints:
          |    /json:
          |      endpoint: http://idp/token
          |      username: u
          |      password: p
          |""".stripMargin) {
        val url = s"http://127.0.0.1:${srv.boundPort}/json"
        val conn = new java.net.URL(url).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.getOutputStream.write("""{"a":1}""".getBytes("UTF-8"))
        conn.getOutputStream.close()
        conn.getResponseCode shouldBe 401
        conn.disconnect()
      }
    } finally srv.stop()
  }
}
