package graft.streaming

import graft.SparkSpec
import graft.pipeline._
import org.apache.spark.sql.functions._
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** End-to-end connector coverage: POST /jsonl → pipeline → jsonl sink
  * (the reference's http_input acceptance shape), plus http_output and
  * opensearch_output bulk semantics against an in-process mock server.
  */
class ConnectorsSpec extends SparkSpec {

  private def mockServer(): (HttpServer, java.util.List[String]) = {
    val received = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      received.add(ex.getRequestURI.getPath + "\n" + body)
      val resp = "{}".getBytes("UTF-8")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    (server, received)
  }

  private def postTo(url: String, body: String): Int = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes("UTF-8"))
    conn.getOutputStream.close()
    val code = conn.getResponseCode
    conn.disconnect()
    code
  }

  test("http_input: POST /jsonl → pipeline → jsonl sink") {
    val spool = java.nio.file.Files.createTempDirectory("graft-spool").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val server = new Connectors.HttpInputServer(spool).start()
    try {
      assert(postTo(s"http://localhost:${server.boundPort}/jsonl",
        """{"message":"a=1 b=2"}""" + "\n" + """{"message":"c=3 d=4"}""") == 200)
      assert(postTo(s"http://localhost:${server.boundPort}/plaintext",
        "raw line one") == 200)

      val s = spark
      val stream = s.readStream
        .schema("message STRING")
        .json(spool)
      val spec = PipelineSpec(Seq(StageSpec("grokker", Seq(RuleSpec("message",
        Map("mapping" -> Map("message" ->
          "%{WORD:k1}=%{INT:v1} %{WORD:k2}=%{INT:v2}")))))))
      val q = StreamRunner.run(stream, spec,
        Map("main" -> StreamRunner.jsonlSink(outDir)), ckpt)
      q.awaitTermination(30000)

      val out = s.read.json(outDir)
      assert(out.count() == 3)
      val parsed = out.filter(col("k1") === "a").head()
      assert(parsed.getAs[String]("v1") == "1")
      assert(out.filter(col("message") === "raw line one").count() == 1)
    } finally server.stop()
  }

  test("http_input rejects bad credentials") {
    val spool = java.nio.file.Files.createTempDirectory("graft-spool2").toString
    val server = new Connectors.HttpInputServer(spool,
      credentials = Some(("user", "pass"))).start()
    try {
      assert(postTo(s"http://localhost:${server.boundPort}/jsonl",
        """{"a":1}""") == 401)
      val auth = java.util.Base64.getEncoder.encodeToString(
        "user:pass".getBytes("UTF-8"))
      val conn = new java.net.URL(
        s"http://localhost:${server.boundPort}/jsonl").openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Authorization", s"Basic $auth")
      conn.setDoOutput(true)
      conn.getOutputStream.write("""{"a":1}""".getBytes("UTF-8"))
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 200)
      conn.disconnect()
    } finally server.stop()
  }

  private def postWithAuth(url: String, body: String,
                           user: String, pass: String): Int = {
    val auth = java.util.Base64.getEncoder.encodeToString(
      s"$user:$pass".getBytes("UTF-8"))
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Authorization", s"Basic $auth")
    conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes("UTF-8"))
    conn.getOutputStream.close()
    val code = conn.getResponseCode
    conn.disconnect()
    code
  }

  test("http_input endpoint auth: LIST entry accepts any matching Basic; broken entry denies") {
    // reference http/input.py:272-298,150-158 — a list-configured
    // endpoint builds every Basic b64 and accepts any match
    val spool = java.nio.file.Files.createTempDirectory("graft-spool3").toString
    val credsFile = java.io.File.createTempFile("endpoint-creds", ".yml")
    credsFile.deleteOnExit()
    java.nio.file.Files.write(credsFile.toPath,
      """input:
        |  endpoints:
        |    /jsonl:
        |      - username: u1
        |        password: p1
        |      - username: u2
        |        password: p2
        |    /plaintext: []
        |""".stripMargin.getBytes("UTF-8"))
    sys.props("graft.credentials.file") = credsFile.getAbsolutePath
    graft.operators.Credentials.clearCache()
    val server = new Connectors.HttpInputServer(spool).start()
    try {
      val base = s"http://localhost:${server.boundPort}"
      assert(postTo(s"$base/jsonl", """{"a":1}""") == 401)
      assert(postWithAuth(s"$base/jsonl", """{"a":1}""", "u1", "p1") == 200)
      assert(postWithAuth(s"$base/jsonl", """{"a":1}""", "u2", "p2") == 200)
      assert(postWithAuth(s"$base/jsonl", """{"a":1}""", "u1", "wrong") == 401)
      // configured-but-unusable entry fails CLOSED, even with any header
      assert(postWithAuth(s"$base/plaintext", "x", "u1", "p1") == 401)
    } finally {
      server.stop()
      sys.props.remove("graft.credentials.file")
      graft.operators.Credentials.clearCache()
    }
  }

  test("http_output posts NDJSON batches; opensearch_output builds bulk bodies") {
    val (server, received) = mockServer()
    try {
      val s = spark
      import s.implicits._
      val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
        .toDF("id", "kind")
      val base = s"http://localhost:${server.getAddress.getPort}"

      Connectors.httpOutputSink(s"$base/events", backlogSize = 2)(df)
      val posts = received.toArray.map(_.toString).filter(_.startsWith("/events"))
      assert(posts.map(_.linesIterator.count(_.contains("\"id\""))).sum == 3)
      // backlog batching: 3 rows with batch size 2 → at least 2 POSTs
      assert(posts.length >= 2)

      received.clear()
      Connectors.opensearchBulkSink(base, "logs", backlogSize = 10)(df)
      val bulks = received.toArray.map(_.toString).filter(_.startsWith("/_bulk"))
      assert(bulks.nonEmpty)
      val lines = bulks.flatMap(_.linesIterator.toSeq.drop(1)).filter(_.nonEmpty)
      val actions = lines.filter(_.startsWith("""{"index""""))
      val docs = lines.filterNot(_.startsWith("""{"index""""))
      assert(actions.length == 3 && docs.length == 3)
      assert(actions.forall(_.contains(""""_index":"logs"""")))
      assert(docs.exists(_.contains(""""kind":"beta"""")))

      // per-event index routing via the _index column
      received.clear()
      val routed = df.withColumn("_index",
        when(col("id") === 1, "special").otherwise("logs"))
      Connectors.opensearchBulkSink(base, "logs")(routed)
      val routedLines = received.toArray.map(_.toString)
        .filter(_.startsWith("/_bulk")).flatMap(_.linesIterator.toSeq)
      assert(routedLines.count(_.contains(""""_index":"special"""")) == 1)
      assert(routedLines.count(_.contains(""""_index":"logs"""")) == 2)
    } finally server.stop(0)
  }

  test("http_input collect_meta: @metadata with url/remote_addr/user_agent") {
    val received = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val srv = new Connectors.HttpInputServer("unused",
      sink = Some { lines =>
        import scala.jdk.CollectionConverters._
        received.addAll(lines.asJava); ()
      },
      collectMeta = true).start()
    try {
      val url = s"http://127.0.0.1:${srv.boundPort}/json"
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setRequestProperty("User-Agent", "graft-test/1.0")
      conn.setDoOutput(true)
      conn.getOutputStream.write("""{"message":"m"}""".getBytes("UTF-8"))
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 200)
      conn.disconnect()

      assert(received.size == 1)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(received.get(0))
      assert(node.get("message").asText() == "m")
      val meta = node.get("@metadata")
      assert(meta.get("url").asText() == "/json")
      assert(meta.get("remote_addr").asText() == "127.0.0.1")
      assert(meta.get("user_agent").asText() == "graft-test/1.0")

      // plaintext wrapping also carries metadata
      val c2 = new java.net.URL(s"http://127.0.0.1:${srv.boundPort}/plaintext")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      c2.setRequestMethod("POST")
      c2.setDoOutput(true)
      c2.getOutputStream.write("a line".getBytes("UTF-8"))
      c2.getOutputStream.close()
      assert(c2.getResponseCode == 200)
      c2.disconnect()
      val plain = mapper.readTree(received.get(1))
      assert(plain.get("message").asText() == "a line")
      assert(plain.get("@metadata").get("remote_addr").asText() == "127.0.0.1")
    } finally srv.stop()
  }

  test("opensearch health probe: desired_cluster_status gate") {
    val status = new java.util.concurrent.atomic.AtomicReference[String]("yellow")
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_cluster/health", (ex: HttpExchange) => {
      val body = s"""{"status":"${status.get}"}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      assert(!Connectors.opensearchHealth(base)) // default desired = green
      assert(Connectors.opensearchHealth(base, Seq("green", "yellow")))
      status.set("green")
      assert(Connectors.opensearchHealth(base))
      assert(!Connectors.opensearchHealth("http://127.0.0.1:1/")) // unreachable
    } finally server.stop(0)
  }
}
