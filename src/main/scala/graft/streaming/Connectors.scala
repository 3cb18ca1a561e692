package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's remaining output connectors and push input, Spark-side.
  *
  *  - [[httpOutputSink]]    — POST event batches to a URL
  *    (reference connector/http/output.py:54-251)
  *  - [[opensearchBulkSink]] — _bulk index with message-backlog batching
  *    (reference connector/opensearch/output.py:71-326: `store` :233,
  *    `_write_backlog` :270-307)
  *  - [[HttpInputServer]]   — push-based HTTP ingest with /json /jsonl
  *    /plaintext endpoints (reference connector/http/input.py:335-406),
  *    bridged to a spool directory consumed by `readStream` — the
  *    file-bridge harness shape; a custom v2 streaming Source would slot
  *    in behind the same endpoints on a real deployment.
  *
  * Both sinks run per partition with bounded batches: executors POST
  * their partitions independently (no driver collect), so sink
  * throughput scales with executor count like the reference scales with
  * process_count.
  */
object Connectors {

  /** POST each partition's rows as NDJSON batches of `backlogSize` to
    * `url`. Failures raise, letting Structured Streaming's checkpoint
    * retry the batch (the reference re-queues its backlog).
    */
  def httpOutputSink(url: String, backlogSize: Int = 500,
                     timeoutMs: Int = 10000): DataFrame => Unit = { df =>
    val json = df.select(to_json(struct(df.columns.map(col): _*)).as("v"))
    json.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      rows.map(_.getString(0)).grouped(backlogSize).foreach { batch =>
        post(url, batch.mkString("\n"), "application/x-ndjson", timeoutMs)
      }
    }
  }

  /** OpenSearch `_bulk`: pairs of action+document NDJSON lines, batched
    * by `backlogSize` per partition. `indexOf` names the target index
    * (the reference routes via `_index` on the event, output.py:233-268).
    */
  def opensearchBulkSink(baseUrl: String, defaultIndex: String,
                         backlogSize: Int = 500,
                         timeoutMs: Int = 10000): DataFrame => Unit = { df =>
    val hasIndex = df.columns.contains("_index")
    val indexCol =
      if (hasIndex) coalesce(col("_index").cast("string"), lit(defaultIndex))
      else lit(defaultIndex)
    val doc = to_json(struct(df.columns.filterNot(_ == "_index").map(col): _*))
    val pairs = df.select(indexCol.as("i"), doc.as("d"))
    pairs.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      rows.grouped(backlogSize).foreach { batch =>
        val body = batch.flatMap { r =>
          // the index name is event-controlled: JSON-escape it, or a
          // quote/newline in `_index` corrupts the NDJSON framing and can
          // inject extra bulk actions (advisor finding, round 2)
          Seq(s"""{"index":{"_index":${jsonQuote(r.getString(0))}}}""", r.getString(1))
        }.mkString("", "\n", "\n")
        post(baseUrl.stripSuffix("/") + "/_bulk", body, "application/x-ndjson",
          timeoutMs)
      }
    }
  }

  /** OpenSearch cluster health probe (reference opensearch/output.py:
    * 309-322): GET `_cluster/health` and require `status` in
    * `desiredClusterStatus` (default `["green"]`). Plug into
    * `MetricsRegistry.setHealthCheck` to surface on `/health`.
    */
  def opensearchHealth(baseUrl: String,
                       desiredClusterStatus: Seq[String] = Seq("green"),
                       timeoutMs: Int = 10000): Boolean =
    try {
      val conn = new java.net.URL(baseUrl.stripSuffix("/") + "/_cluster/health")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      val code = conn.getResponseCode
      if (code != 200) { conn.disconnect(); return false }
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      conn.disconnect()
      val status = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(body).path("status").asText("")
      desiredClusterStatus.contains(status)
    } catch { case _: Exception => false }

  /** Minimal JSON string literal: escapes quote, backslash, and all
    * control chars (used for event-controlled values embedded in NDJSON).
    */
  private[streaming] def jsonQuote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def post(url: String, body: String, contentType: String,
                   timeoutMs: Int): Unit = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    var reusable = false
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestProperty("Content-Type", contentType)
      val bytes = body.getBytes("UTF-8")
      conn.setFixedLengthStreamingMode(bytes.length)
      val os = conn.getOutputStream
      try { os.write(bytes); os.flush() } finally os.close()
      val code = conn.getResponseCode
      // drain the response fully so the JVM returns the socket to its
      // per-host keep-alive pool; disconnect() would close it and force a
      // new TCP (+TLS) handshake per batch
      val is = if (code >= 200 && code < 300) conn.getInputStream
               else conn.getErrorStream
      if (is != null) try { while (is.read() >= 0) {} } finally is.close()
      if (code < 200 || code >= 300)
        throw new java.io.IOException(s"POST $url failed: HTTP $code")
      reusable = true
    } finally if (!reusable) conn.disconnect()
  }

  /** Push-based HTTP ingest endpoint set (reference http/input.py):
    *   POST /json      — one JSON event per request
    *   POST /jsonl     — newline-delimited JSON events
    *   POST /plaintext — lines wrapped as {"message": line}
    * Received events append to `spoolDir` as JSONL files, which
    * `spark.readStream.json`/`text` tails. Optional basic-auth
    * credentials (input.py:138-165).
    */
  /** Header names whose values copy into the metadata object when
    * `collectMeta` is on (reference DEFAULT_META_HEADERS,
    * http/input.py:198-204; `url`/`remote_addr` are request properties,
    * other headers key as lowercase with `-` → `_`).
    */
  val DefaultMetaHeaders: Seq[String] = Seq("url", "remote_addr", "user-agent")

  final class HttpInputServer(spoolDir: String, port: Int = 0,
                              credentials: Option[(String, String)] = None,
                              bindAddress: String = "127.0.0.1",
                              sink: Option[Seq[String] => Unit] = None,
                              collectMeta: Boolean = false,
                              metafieldName: String = "@metadata",
                              copyHeadersToLogs: Seq[String] = DefaultMetaHeaders) {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}

    private val server = HttpServer.create(
      new java.net.InetSocketAddress(bindAddress, port), 0)
    private val counter = new java.util.concurrent.atomic.AtomicLong()
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    if (sink.isEmpty)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(spoolDir))

    def boundPort: Int = server.getAddress.getPort

    private def authorized(ex: HttpExchange): Boolean = credentials match {
      case None =>
        // no explicit credentials: consult the credentials file's
        // input.endpoints section per request path (reference
        // util/credentials.py from_endpoint; input.py:138-165).
        // Fail CLOSED: an endpoint entry of any non-Basic type (the
        // server side only speaks Basic) or a credentials-file error
        // must deny, not silently disable auth.
        // An endpoint entry may be a LIST of credentials; any matching
        // Basic credential authorizes (reference http/input.py:272-298,
        // 150-158). An entry that resolves to NO usable Basic credential
        // (empty list, wrong types, non-Basic methods the server side
        // can't verify) denies — configured-but-broken auth never
        // degrades to open.
        try graft.operators.Credentials.fromEndpointAll(ex.getRequestURI.getPath) match {
          case None => true
          case Some(creds) =>
            val header = Option(ex.getRequestHeaders.getFirst("Authorization"))
            val basics = creds.collect {
              case b: graft.operators.Credentials.BasicAuth => b
            }
            basics.nonEmpty && basics.exists(_.matches(header))
        } catch { case _: Exception => false }
      case Some((u, p)) =>
        val expected = ("Basic " + java.util.Base64.getEncoder
          .encodeToString(s"$u:$p".getBytes("UTF-8"))).getBytes("UTF-8")
        val got = Option(ex.getRequestHeaders.getFirst("Authorization"))
          .getOrElse("").getBytes("UTF-8")
        // constant-time compare: a plain String == leaks a prefix-length
        // timing side channel on the credential
        java.security.MessageDigest.isEqual(expected, got)
    }

    private def validJson(line: String): Boolean =
      try { mapper.readTree(line); true }
      catch { case _: java.io.IOException => false }

    /** Inject the `metafield_name` object (reference add_metadata,
      * http/input.py:207-231) into one event line. Runs only when
      * `collectMeta` is on — the default hot path is untouched.
      */
    private def withMetadata(line: String, ex: HttpExchange): String = {
      val node = mapper.readTree(line)
      node match {
        case obj: com.fasterxml.jackson.databind.node.ObjectNode =>
          val meta = mapper.createObjectNode()
          copyHeadersToLogs.foreach {
            case "url" => meta.put("url", ex.getRequestURI.toString)
            case "remote_addr" =>
              meta.put("remote_addr", ex.getRemoteAddress.getAddress.getHostAddress)
            case header =>
              val key = header.replace("-", "_").toLowerCase(java.util.Locale.ROOT)
              Option(ex.getRequestHeaders.getFirst(header)) match {
                case Some(v) => meta.put(key, v)
                case None => meta.putNull(key)
              }
          }
          obj.set[com.fasterxml.jackson.databind.JsonNode](metafieldName, meta)
          mapper.writeValueAsString(obj)
        case _ => line
      }
    }

    private def handle(ex: HttpExchange, toJsonl: String => Seq[String],
                       requireJson: Boolean): Unit = {
      try {
        if (ex.getRequestMethod != "POST") { ex.sendResponseHeaders(405, -1); return }
        if (!authorized(ex)) { ex.sendResponseHeaders(401, -1); return }
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val lines0 = toJsonl(body).filter(_.nonEmpty)
        // reject malformed JSON with a 4xx like the reference's HTTP input
        // instead of spooling it into _corrupt_record rows downstream
        if (requireJson && !lines0.forall(validJson)) {
          ex.sendResponseHeaders(400, -1); return
        }
        val lines =
          if (collectMeta && copyHeadersToLogs.nonEmpty)
            lines0.map(withMetadata(_, ex))
          else lines0
        if (lines.nonEmpty) sink match {
          case Some(push) => push(lines) // custom-Source mode: no file hop
          case None =>
            val f = java.nio.file.Paths.get(spoolDir,
              s"ingest-${System.currentTimeMillis()}-${counter.incrementAndGet()}.jsonl")
            java.nio.file.Files.write(f,
              (lines.mkString("\n") + "\n").getBytes("UTF-8"))
        }
        ex.sendResponseHeaders(200, -1)
      } finally ex.close()
    }

    server.createContext("/json", (ex: HttpExchange) =>
      handle(ex, body => Seq(body.trim), requireJson = true))
    server.createContext("/jsonl", (ex: HttpExchange) =>
      handle(ex, body => body.split("\n").toSeq.map(_.trim), requireJson = true))
    server.createContext("/plaintext", (ex: HttpExchange) =>
      handle(ex, body => body.split("\n").toSeq.filter(_.nonEmpty)
        .map(l => s"""{"message":${jsonQuote(l)}}"""), requireJson = false))

    def start(): HttpInputServer = { server.start(); this }
    def stop(): Unit = server.stop(0)
  }
}
