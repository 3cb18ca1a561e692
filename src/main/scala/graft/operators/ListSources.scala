package graft.operators

/** Comparison-list loading for list_comparison / network_comparison
  * (reference: processor/list_comparison/rule.py:360-455 — local files,
  * HTTP(S) getters with `${LOGPREP_LIST}` injection, and per-event
  * dynamic `${dotted.field}` URIs).
  *
  * The transport is pluggable: the default getter reads local files
  * (relative paths against `graft.rule.base`); HTTP(S) requires an
  * injected fetcher (tests install a mock, production installs a real
  * client with its own cache policy — the engine itself stays
  * zero-egress). Fetched lists are memoized per JVM, mirroring the
  * reference's cached compare sets.
  */
object ListSources {

  @volatile var fetch: String => Option[String] = defaultFetch

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Option[Seq[String]]]()

  def defaultFetch(uri: String): Option[String] =
    if (uri.startsWith("http://") || uri.startsWith("https://"))
      // credentialed getter (Basic/OAuth2/mTLS from the credentials
      // file — reference util/credentials.py); only fires when a rule
      // actually names an http(s) list, so the engine stays
      // zero-egress otherwise
      Credentials.get(uri).filter(_.status < 400).map(_.body)
    else {
      val path = uri.stripPrefix("file://")
      val base = sys.props.get("graft.rule.base")
        .orElse(sys.env.get("GRAFT_RULE_BASE")).getOrElse(".")
      val f0 = new java.io.File(path)
      val f = if (f0.isAbsolute) f0 else new java.io.File(base, path)
      if (!f.exists()) None
      else Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    }

  /** Lines minus comments/blanks (reference `_get_list_contents_from_getter`). */
  def load(uri: String): Option[Seq[String]] =
    cache.computeIfAbsent(uri, u =>
      fetch(u).map(_.split("\n").toSeq.map(_.trim)
        .filterNot(l => l.isEmpty || l.startsWith("#"))))

  def clearCache(): Unit = cache.clear()

  /** Does `ip` fall into any CIDR/plain-IP entry of the list? */
  def ipInList(ip: String, entries: Seq[String]): Boolean =
    IpInfo.parse(ip).exists { p =>
      entries.exists { e =>
        val (net, prefix) = e.split("/", 2) match {
          case Array(n, px) => (IpInfo.parse(n), px.toIntOption)
          case Array(n) => (IpInfo.parse(n), None)
        }
        net.exists { np =>
          np.version == p.version && {
            val px = prefix.getOrElse(if (p.version == 4) 32 else 128)
            var bit = 0; var ok = true
            while (ok && bit < px) {
              val mask = 0x80 >> (bit % 8)
              ok = (p.bytes(bit / 8) & mask) == (np.bytes(bit / 8) & mask)
              bit += 1
            }
            ok
          }
        }
      }
    }
}
