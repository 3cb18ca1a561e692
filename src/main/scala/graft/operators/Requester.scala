package graft.operators

import org.json4s._
import org.json4s.jackson.JsonMethods

/** requester (reference: processor/requester/processor.py:54-129):
  * `${dotted.field}` templates render into url / json / data / params,
  * the request fires per event, and the response (JSON if parseable,
  * text otherwise) lands in `target_field` and/or through
  * `target_field_mapping` dotted extractions.
  *
  * The HTTP transport is pluggable like [[ListSources.fetch]]: tests
  * install the reference suite's mocks; production installs a pooled
  * client inside the executor (the UDF is nondeterministic external I/O,
  * the same quarantine the reference applies with its request session).
  */
object Requester {

  final case class Response(status: Int, body: String)

  @volatile var transport: (String, String, Option[String]) => Option[Response] =
    realTransport

  /** method, url, body → response; None models connect timeouts.
    * Only http/https schemes are dispatched (the reference's `requests`
    * enforces the same): URL templates start with event-controlled
    * `${field}` values, so without the allowlist an event could steer the
    * executor to `file:`/`jar:` URLs and exfiltrate local file contents
    * into the event (advisor finding, round 2). Non-http schemes return
    * None → the rule's failure tag.
    */
  def realTransport(method: String, url: String,
                    body: Option[String]): Option[Response] = {
    val creds = Credentials.fromTarget(url)
    def once(): Option[Response] = try {
      val parsed = new java.net.URL(url)
      if (parsed.getProtocol != "http" && parsed.getProtocol != "https")
        return None
      val conn = parsed.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      for (c <- creds; m <- c.mtls) conn match {
        case https: javax.net.ssl.HttpsURLConnection =>
          https.setSSLSocketFactory(m.sslContext.getSocketFactory)
        case _ => ()
      }
      conn.setRequestMethod(method)
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(5000)
      creds.foreach(_.headers().foreach { case (k, v) =>
        conn.setRequestProperty(k, v) })
      body.foreach { b =>
        conn.setDoOutput(true)
        conn.getOutputStream.write(b.getBytes("UTF-8"))
        conn.getOutputStream.close()
      }
      val status = conn.getResponseCode
      val is = if (status < 400) conn.getInputStream else conn.getErrorStream
      val text = if (is == null) "" else {
        try new String(is.readAllBytes(), "UTF-8") finally is.close()
      }
      conn.disconnect()
      Some(Response(status, text))
    } catch {
      // bad credentials surface (reference raises); transport errors
      // degrade to None → the rule's failure tag
      case e: Credentials.CredentialsBadRequestError => throw e
      case _: Exception => None
    }
    once() match {
      // expired server-side session: drop the cached token, retry once
      case Some(Response(401, _)) if creds.isDefined =>
        creds.foreach(_.invalidate()); once()
      case other => other
    }
  }

  private def resolveTemplate(template: String, values: Map[String, String]): String =
    values.foldLeft(template) { case (acc, (k, v)) =>
      acc.replace("${" + k + "}", if (v == null) "" else v)
    }

  def templateRefs(s: String): Seq[String] =
    """\$\{([^${}]*)\}""".r.findAllMatchIn(s).map(_.group(1)).toSeq

  private def render(v: JValue, values: Map[String, String]): JValue = v match {
    case JObject(fs) => JObject(fs.map { case (k, x) =>
      resolveTemplate(k, values) -> render(x, values)
    })
    case JArray(xs) => JArray(xs.map(render(_, values)))
    case JString(s) => JString(resolveTemplate(s, values))
    case other => other
  }

  private def jPath(result: JValue, path: String): JValue =
    graft.filter.FilterCompiler.splitPath(path).foldLeft(result) {
      case (JObject(fs), seg) => fs.find(_._1 == seg).map(_._2).getOrElse(JNothing)
      case (JArray(xs), seg) if seg.forall(_.isDigit) =>
        xs.lift(seg.toInt).getOrElse(JNothing)
      case _ => JNothing
    }

  /** One event's request+response processing. Returns
    * (targetValueJson, mappingValueJsons, requestFailed).
    */
  def invoke(method: String, urlTemplate: String,
             jsonTemplate: Option[String], dataTemplate: Option[String],
             paramsTemplate: Option[String],
             mappingSources: Seq[String],
             mergeExistingJson: Option[String],
             sourceValues: Map[String, String]): (String, Seq[String], Boolean) = {
    val url0 = resolveTemplate(urlTemplate, sourceValues)
    val params = paramsTemplate.map(p =>
      render(JsonMethods.parse(p), sourceValues)).map {
      case JObject(fs) => fs.map { case (k, v) =>
        k + "=" + (v match { case JString(s) => s; case o => JsonMethods.compact(JsonMethods.render(o)) })
      }.mkString("&")
      case _ => ""
    }
    val url = params.filter(_.nonEmpty).map(q => url0 + "?" + q).getOrElse(url0)
    val body = jsonTemplate.map(j =>
      JsonMethods.compact(JsonMethods.render(render(JsonMethods.parse(j), sourceValues))))
      .orElse(dataTemplate.map(resolveTemplate(_, sourceValues)))

    transport(method, url, body) match {
      case Some(Response(status, text)) if status < 400 =>
        val result =
          try JsonMethods.parse(text)
          catch { case _: Exception => JString(text) }
        val merged = (mergeExistingJson, result) match {
          case (Some(ex), JObject(newFs)) =>
            try JsonMethods.parse(ex) match {
              case JObject(exFs) =>
                // dict.update shallow merge (helper.py:143-146)
                val keep = exFs.filterNot(f => newFs.exists(_._1 == f._1))
                JObject(keep ++ newFs)
              case _ => result
            } catch { case _: Exception => result }
          case _ => result
        }
        val targetJson = JsonMethods.compact(JsonMethods.render(merged))
        val mappingVals = mappingSources.map { p =>
          jPath(result, p) match {
            case JNothing => null
            case v => JsonMethods.compact(JsonMethods.render(v))
          }
        }
        (targetJson, mappingVals, false)
      case _ => (null, mappingSources.map(_ => null), true)
    }
  }
}
