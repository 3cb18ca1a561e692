package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.fields.FieldOps

/** Lookup / enrichment processors. Small tables compile to `when`-chains or
  * map literals (no shuffle, codegen'd); larger tables become broadcast
  * joins — never a per-event interpreted lookup, and the reference's LRU
  * caches (e.g. generic_resolver processor.py:128-135) are unnecessary
  * because the lookup is either codegen'd or joined.
  *
  *  - generic_resolver      (reference: logprep/processor/generic_resolver/processor.py:50-221)
  *  - template_replacer     (logprep/processor/template_replacer/processor.py:60-190)
  *  - list_comparison       (logprep/processor/list_comparison/processor.py:50-167)
  *  - network_comparison    (logprep/processor/network_comparison/processor.py:39-66)
  *  - ip_informer           (logprep/processor/ip_informer/processor.py:38-85)
  *  - geoip_enricher        (logprep/processor/geoip_enricher/processor.py:47-166)
  *  - domain_label_extractor(logprep/processor/domain_label_extractor/processor.py:55-140)
  *  - domain_resolver       (logprep/processor/domain_resolver/processor.py:68-263)
  *  - requester             (logprep/processor/requester/processor.py:54-129)
  */
object Lookup {

  /** generic_resolver: first regex pattern that matches the source value
    * wins; its mapped value is written to target. Compiles to a `coalesce`
    * of `when(rlike)` branches — short-circuit order preserved.
    */
  def genericResolver(df: DataFrame, source: String, target: String,
                      resolveList: Seq[(String, String)]): DataFrame = {
    val src = FieldOps.getOrNull(df.schema, source).cast("string")
    val branches = resolveList.map { case (pattern, value) =>
      when(src.rlike(pattern), lit(value))
    }
    FieldOps.set(df, target, coalesce(branches: _*))
  }

  /** template_replacer: composite key (joined source fields) → replacement
    * from a pre-loaded template table. Small table → map literal +
    * `element_at`; large table → broadcast join (caller picks via size).
    */
  def templateReplacer(df: DataFrame, keyFields: Seq[String], delimiter: String,
                       target: String, table: Map[String, String]): DataFrame = {
    val key = concat_ws(delimiter,
      keyFields.map(f => FieldOps.getOrNull(df.schema, f).cast("string")): _*)
    val m = map(table.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    // no mapping → target keeps its value (template_replacer/processor.py:
    // value None → no replacement performed)
    FieldOps.set(df, target,
      coalesce(element_at(m, key), FieldOps.getOrNull(df.schema, target)))
  }

  /** list_comparison: which of the named term-sets contain the value?
    * Writes `<target>.in_list` (matching list names, sorted) or
    * `<target>.not_in_list` (all list names) — the reference's contract.
    */
  def listComparison(df: DataFrame, source: String, target: String,
                     lists: Map[String, Set[String]]): DataFrame = {
    val src = FieldOps.getOrNull(df.schema, source).cast("string")
    val matching = array_sort(array_compact(array(
      lists.toSeq.sortBy(_._1).map { case (name, terms) =>
        when(src.isInCollection(terms.toSeq), lit(name))
      }: _*)))
    val allNames = array(lists.keys.toSeq.sorted.map(lit): _*)
    val d1 = FieldOps.set(df, s"$target.in_list",
      when(size(matching) > 0, matching))
    FieldOps.set(d1, s"$target.not_in_list",
      when(size(matching) === 0, allNames))
  }

  // ------------------------------------------------------------------- CIDR
  /** IPv4 dotted-quad → numeric, as a Column expression (no UDF): split and
    * fold the octets. Null for non-IPv4 strings.
    */
  def ipv4ToLong(ip: Column): Column = {
    val ok = ip.rlike("""^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$""")
    val oct = (i: Int) => split(ip, "\\.").getItem(i).cast("long")
    when(ok, oct(0) * 16777216L + oct(1) * 65536L + oct(2) * 256L + oct(3))
  }

  /** Does `ip` fall into the CIDR block? Pure arithmetic — prefix compare
    * on the numeric value. (The reference shells out to Python `ipaddress`;
    * here a codegen'd expression.)
    */
  def cidrContains(ip: Column, cidr: String): Column = {
    val Array(net, bitsS) = cidr.split("/")
    val bits = bitsS.toInt
    val netNum = net.split("\\.").map(_.toLong)
      .foldLeft(0L)((acc, o) => acc * 256 + o)
    val mask = if (bits == 0) 0L else (0xFFFFFFFFL << (32 - bits)) & 0xFFFFFFFFL
    val ipn = ipv4ToLong(ip)
    ipn.isNotNull && ((ipn.bitwiseAND(lit(mask))) === lit(netNum & mask))
  }

  /** network_comparison: is the source IP inside any of the named CIDR
    * sets? Same in_list/not_in_list contract as listComparison.
    */
  def networkComparison(df: DataFrame, source: String, target: String,
                        networks: Map[String, Seq[String]]): DataFrame = {
    val src = FieldOps.getOrNull(df.schema, source).cast("string")
    val matching = array_sort(array_compact(array(
      networks.toSeq.sortBy(_._1).map { case (name, cidrs) =>
        val hit = cidrs.map(c => cidrContains(src, c)).reduce(_ || _)
        when(hit, lit(name))
      }: _*)))
    val allNames = array(networks.keys.toSeq.sorted.map(lit): _*)
    val d1 = FieldOps.set(df, s"$target.in_list",
      when(size(matching) > 0, matching))
    FieldOps.set(d1, s"$target.not_in_list",
      when(size(matching) === 0, allNames))
  }

  /** ip_informer: per-IP properties struct (v4 subset of the reference's
    * `ipaddress`-module property set) — all pure expressions.
    */
  def ipInformer(df: DataFrame, source: String, target: String): DataFrame = {
    val src = FieldOps.getOrNull(df.schema, source).cast("string")
    val n = ipv4ToLong(src)
    def in(c: String) = cidrContains(src, c)
    val isPrivate = in("10.0.0.0/8") || in("172.16.0.0/12") || in("192.168.0.0/16")
    val isLoopback = in("127.0.0.0/8")
    val isMulticast = in("224.0.0.0/4")
    val isLinkLocal = in("169.254.0.0/16")
    val isGlobal = n.isNotNull && !isPrivate && !isLoopback && !isMulticast &&
      !isLinkLocal && !in("0.0.0.0/8") && !in("100.64.0.0/10")
    FieldOps.set(df, target, struct(
      lit(4).as("version"),
      coalesce(isPrivate, lit(false)).as("is_private"),
      coalesce(isLoopback, lit(false)).as("is_loopback"),
      coalesce(isMulticast, lit(false)).as("is_multicast"),
      coalesce(isLinkLocal, lit(false)).as("is_link_local"),
      coalesce(isGlobal, lit(false)).as("is_global")))
  }

  /** geoip_enricher: geo lookup via a broadcast prefix table. The real
    * MaxMind reader is a per-executor lazily-opened resource in a
    * mapPartitions stage; in this container (no GeoLite2 db, zero egress)
    * the lookup table is injected by the caller — the Spark-side plumbing
    * (broadcast join on the /24 prefix, struct output) is the real design.
    */
  def geoipEnricher(df: DataFrame, source: String, target: String,
                    geoTable: DataFrame): DataFrame = {
    // geoTable: (prefix string "a.b.c", country, city, lat, lon)
    val src = FieldOps.getOrNull(df.schema, source).cast("string")
    val withPrefix = df.withColumn("__geo_prefix",
      regexp_extract(src, """^(\d{1,3}\.\d{1,3}\.\d{1,3})\.""", 1))
    val joined = withPrefix.join(broadcast(geoTable),
      withPrefix("__geo_prefix") === geoTable("prefix"), "left")
    val out = joined.withColumn(target, struct(
      geoTable("country").as("country"), geoTable("city").as("city"),
      geoTable("lat").as("lat"), geoTable("lon").as("lon")))
    out.drop("__geo_prefix", "prefix", "country", "city", "lat", "lon")
  }

  /** The FULL public-suffix list (publicsuffix.org data file, vendored as
    * a resource like the reference vendors it at
    * util/url/tldlist/public_suffix_list.dat): exact rules, `*.` wildcard
    * rules, and `!` exception rules.
    */
  lazy val publicSuffixRules: (Set[String], Set[String], Set[String]) = {
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filterNot(l => l.isEmpty || l.startsWith("//")).toList
    in.close()
    val (exceptions, rest) = lines.partition(_.startsWith("!"))
    val (wildcards, exact) = rest.partition(_.startsWith("*."))
    (exact.toSet, wildcards.map(_.stripPrefix("*.")).toSet,
      exceptions.map(_.stripPrefix("!")).toSet)
  }

  /** [[publicSuffixOf]] without the unknown-TLD fallback: "" when no PSL
    * rule matches (the reference's own Domain() treats unrecognized TLDs
    * as invalid, domain_label_extractor/processor.py:117-131).
    */
  def strictSuffixOf(domain: String): String = {
    val (exact, wildcards, exceptions) = publicSuffixRules
    val labels = domain.toLowerCase.split("\\.", -1)
    var best = ""
    var i = labels.length - 1
    while (i >= 0) {
      val cand = labels.slice(i, labels.length).mkString(".")
      val parentOfCand = labels.slice(i + 1, labels.length).mkString(".")
      if (exceptions.contains(cand)) return parentOfCand
      if (exact.contains(cand)) best = cand
      else if (i > 0 && wildcards.contains(parentOfCand)) best = cand
      i -= 1
    }
    best
  }

  /** Split result for the compiled domain_label_extractor.
    * kind: 0 = null source, 1 = IP literal, 2 = unrecognized TLD, 3 = valid.
    */
  final case class DomainParts(kind: Int, tld: String, registered: String,
                               subdomain: String)

  def domainParts(raw: String): DomainParts = {
    if (raw == null) return DomainParts(0, null, null, null)
    if (IpInfo.parse(raw).isDefined) return DomainParts(1, null, null, null)
    val host = extractDomain(raw).getOrElse("")
    val suffix = strictSuffixOf(host)
    if (suffix.isEmpty) DomainParts(2, null, null, null)
    else {
      val labels = host.split("\\.", -1)
      val nTld = suffix.count(_ == '.') + 1
      val domainLabel =
        if (labels.length > nTld) labels(labels.length - nTld - 1) else ""
      val registered =
        if (domainLabel.isEmpty) suffix else s"$domainLabel.$suffix"
      val subdomain =
        if (labels.length > nTld + 1)
          labels.slice(0, labels.length - nTld - 1).mkString(".")
        else ""
      DomainParts(3, suffix, registered, subdomain)
    }
  }

  /** PSL longest-match: returns the public suffix of `domain` (standard
    * publicsuffix algorithm: exceptions beat wildcards beat exact rules;
    * unknown TLDs fall back to the last label).
    */
  def publicSuffixOf(domain: String): String = {
    val (exact, wildcards, exceptions) = publicSuffixRules
    val labels = domain.toLowerCase.split("\\.", -1)
    var best = ""
    var i = labels.length - 1
    while (i >= 0) {
      val cand = labels.slice(i, labels.length).mkString(".")
      val parentOfCand = labels.slice(i + 1, labels.length).mkString(".")
      if (exceptions.contains(cand)) {
        // an exception rule's suffix is its parent
        return parentOfCand
      }
      if (exact.contains(cand)) best = cand
      else if (i > 0 && wildcards.contains(parentOfCand)) best = cand
      i -= 1
    }
    if (best.isEmpty && labels.length > 1) labels.last else best
  }

  /** domain_label_extractor: split a domain into subdomain /
    * registered_domain / top_level_domain via the full PSL. The list is
    * ~10k rules, so matching runs in a deterministic UDF over the
    * broadcast-by-closure rule sets (the when-chain form used for small
    * inline lists would explode the plan).
    */
  def domainLabelExtractor(df: DataFrame, source: String, target: String): DataFrame = {
    val src = FieldOps.getOrNull(df.schema, source).cast("string")
    val splitUdf = udf { (d: String) =>
      if (d == null) null
      else {
        val tld = publicSuffixOf(d)
        val labels = d.split("\\.", -1)
        val nTld = if (tld.isEmpty) 0 else tld.count(_ == '.') + 1
        val registered =
          if (nTld > 0 && labels.length > nTld)
            labels.slice(labels.length - nTld - 1, labels.length).mkString(".")
          else ""
        val subdomain =
          if (labels.length > nTld + 1)
            labels.slice(0, labels.length - nTld - 1).mkString(".")
          else ""
        (tld, registered, subdomain)
      }
    }
    val r = splitUdf(src)
    FieldOps.set(df, target, struct(
      coalesce(r.getField("_1"), lit("")).as("top_level_domain"),
      coalesce(r.getField("_2"), lit("")).as("registered_domain"),
      coalesce(r.getField("_3"), lit("")).as("subdomain")))
  }

  /** domain_resolver: DNS A-lookup. Real DNS is external nondeterministic
    * I/O (the reference uses a threadpool + 0.5 s timeout + TTL cache); the
    * engine models it as an enrichment stage. In this zero-egress container
    * the resolver is a deterministic fake — md5-derived stable fake IP —
    * but the stage shape (pure column transform, no driver round-trip) is
    * exactly what a mapPartitions-with-cache resolver would use.
    */
  def domainResolver(df: DataFrame, source: String, target: String): DataFrame = {
    val src = FieldOps.getOrNull(df.schema, source).cast("string")
    val h = md5(src)
    def oct(i: Int) = conv(substring(h, i * 2 + 1, 2), 16, 10).cast("long") % 256
    val fakeIp = concat_ws(".", lit(10), oct(1), oct(2), oct(3))
    FieldOps.set(df, target, fakeIp)
  }

  /** requester: templated HTTP enrichment. External I/O stage — modeled
    * with a deterministic fake response (echo of the rendered URL) so the
    * plumbing (template render from event fields → response → target_field
    * mapping) is real and testable offline.
    */
  def requester(df: DataFrame, urlTemplate: Seq[Column], target: String): DataFrame = {
    val url = concat(urlTemplate: _*)
    val fakeResponse = concat(lit("""{"url":""""), url, lit("""","status":200}"""))
    FieldOps.set(df, target, fakeResponse)
  }

  /** The production shape for external-I/O enrichment (domain_resolver,
    * requester): a `mapPartitions` stage with ONE resolver + LRU cache per
    * task — connections and caches never cross the driver, lookups batch
    * per partition, and the stage is explicitly nondeterministic-marked
    * territory quarantined from the codegen'd narrow pipeline around it
    * (reference: threadpool + TTL cache, domain_resolver/processor.py:
    * 68-263). `resolve` is pluggable: prod passes a DNS/HTTP call; tests
    * and this container pass a deterministic function.
    */
  def enrichPartitioned(df: DataFrame, source: String, target: String,
                        resolve: String => String,
                        maxCacheEntries: Int = 10000): DataFrame =
    enrichPartitionedOpt(df, source, target,
      k => Option(resolve(k)), maxCacheEntries)

  /** [[enrichPartitioned]] with failure-aware resolution: `resolve`
    * returning None models a timeout / NXDOMAIN / invalid input — the
    * target stays null (failures are cached too, like the reference's TTL
    * cache caches UNKNOWN/TIMEOUT statuses, domain_resolver/processor.py:
    * 213-235).
    */
  def enrichPartitionedOpt(df: DataFrame, source: String, target: String,
                           resolve: String => Option[String],
                           maxCacheEntries: Int = 10000): DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = StructType(df.schema.fields :+
      StructField(target, StringType, nullable = true))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(source)
    df.mapPartitions { it =>
      // per-task LRU cache (access-order LinkedHashMap)
      val cache = new java.util.LinkedHashMap[String, Option[String]](256, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Option[String]]): Boolean =
          size() > maxCacheEntries
      }
      it.map { row =>
        val key = row.get(idx)
        val value: String =
          if (key == null) null
          else {
            val k = key.toString
            val hit = cache.get(k)
            val res = if (hit != null) hit
                      else { val v = resolve(k); cache.put(k, v); v }
            res.orNull
          }
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ value)
      }
    }(enc)
  }

  /** The reference's domain extraction (domain_resolver/processor.py:
    * 200-205): URL-ish values resolve their hostname, bare values resolve
    * as-is; empty → None (no resolution attempted).
    */
  def extractDomain(raw: String): Option[String] = {
    if (raw == null || raw.isEmpty) return None
    val host =
      if (raw.contains("://"))
        try Option(new java.net.URI(raw).getHost).getOrElse("")
        catch { case _: Exception => "" }
      else raw
    if (host.isEmpty) None else Some(host)
  }

  /** Does `domain`'s last label appear in the public-suffix list? The
    * deterministic stand-in for "would real DNS know this TLD" used by
    * offline resolvers (the reference leaves this to the real socket
    * call, which NXDOMAINs unknown TLDs).
    */
  def hasKnownTld(domain: String): Boolean = {
    val d = domain.trim.toLowerCase
    val i = d.lastIndexOf('.')
    i > 0 && i < d.length - 1 && publicSuffixRules._1.contains(d.substring(i + 1))
  }
}

/** Pluggable DNS for the compiled domain_resolver stage, mirroring
  * [[graft.operators.Requester.transport]]: production installs a real
  * per-executor resolver; this zero-egress container defaults to the
  * deterministic md5-derived fake (same arithmetic as
  * [[Lookup.domainResolver]]); conformance tests install the reference
  * suite's mocked answers. None models timeout/NXDOMAIN/invalid.
  */
object DomainResolver {
  /** Stable fake IP: "10.a.b.c" from md5 hex pairs 2-7 — byte-identical
    * to the column-expression fake in [[Lookup.domainResolver]].
    */
  def fakeResolve(domain: String): Option[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(domain.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def oct(i: Int) = Integer.parseInt(h.substring(i * 2, i * 2 + 2), 16)
    Some(s"10.${oct(1)}.${oct(2)}.${oct(3)}")
  }

  @volatile var resolve: String => Option[String] = fakeResolve
}
