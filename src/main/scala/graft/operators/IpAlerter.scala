package graft.operators

import java.time.{Instant, LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}
import graft.fields.FieldOps

/** pre_detector IP-alert gate (reference:
  * logprep/processor/pre_detector/ip_alerter.py:13-99). A YAML alert list
  * maps IPs / CIDR networks to optional ISO expiry timestamps; a rule
  * carrying `ip_fields` emits its detection ONLY when one of those event
  * fields holds an IP with an unexpired alert entry.
  *
  * Two instants matter, exactly as in the reference:
  *  - LOAD time: entries already expired when the list is read are dropped
  *    entirely (`_filter_non_expired_alert_ips`) — such a single IP falls
  *    through to a covering network.
  *  - MATCH time (`asOf`): entries that survive load are re-checked per
  *    event. A single IP present in the map but expired by now answers
  *    false WITHOUT falling through to a covering network
  *    (`_ip_is_in_alert_list` returns the single's verdict) — covered by
  *    the reference's own mutation tests (test_ip_alerter.py:123-137).
  *
  * The list is driver-sized (a YAML of alert IPs); membership compiles to
  * pure codegen'd Column arithmetic — `isInCollection` over the single
  * IPs, prefix-mask compares for IPv4 CIDRs ([[Lookup.cidrContains]]).
  * IPv6 singles match exactly; IPv6 networks use a byte-prefix UDF that
  * only enters the plan when the list actually contains one.
  */
object IpAlerter {

  /** One surviving alert entry: raw key + optional expiry. */
  final case class Entry(key: String, expiry: Option[Instant])

  final case class AlertList(singles: Seq[Entry], networks: Seq[Entry]) {
    def isEmpty: Boolean = singles.isEmpty && networks.isEmpty
  }

  val empty: AlertList = AlertList(Nil, Nil)

  /** Parse the reference's expiry format: ISO-8601 with offset
    * (`2077-08-31T16:47+00:00`), naive datetime (assumed UTC), or a bare
    * date. Unparseable → None (no expiry), matching the falsy branch.
    */
  private[operators] def parseExpiry(s: String): Option[Instant] = {
    val t = s.trim
    if (t.isEmpty) None
    else {
      def tryP[A](f: => A): Option[A] = try Some(f) catch { case _: Exception => None }
      tryP(OffsetDateTime.parse(t).toInstant)
        .orElse(tryP(LocalDateTime.parse(t).toInstant(ZoneOffset.UTC)))
        .orElse(tryP(LocalDate.parse(t).atStartOfDay.toInstant(ZoneOffset.UTC)))
    }
  }

  /** Load + merge one or more alert-list YAMLs (the reference accepts a
    * single path or a list; later files' entries overwrite earlier ones,
    * dict-update semantics). Entries expired at `loadTime` are dropped.
    * Paths resolve through [[ListSources.fetch]] for `http(s)://`, else
    * the local filesystem — the reference goes through GetterFactory the
    * same way.
    */
  def load(paths: Seq[String], loadTime: Instant = Instant.now()): AlertList = {
    val merged = scala.collection.mutable.LinkedHashMap.empty[String, Option[Instant]]
    paths.foreach { p =>
      val text =
        if (p.startsWith("http://") || p.startsWith("https://"))
          ListSources.fetch(p).getOrElse(
            throw new java.io.IOException(s"alert ip list getter failed: $p"))
        else new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p.stripPrefix("file://"))), "UTF-8")
      fromYamlText(text).foreach { case (k, exp) => merged(k) = exp }
    }
    val kept = merged.toSeq.collect {
      case (k, exp) if exp.forall(_.isAfter(loadTime)) => Entry(k, exp)
    }
    val (nets, singles) = kept.partition(_.key.contains("/"))
    AlertList(singles, nets)
  }

  /** One YAML document: `ip-or-cidr: optional-expiry` mapping (a list is a
    * config error in the reference — same here).
    */
  private[operators] def fromYamlText(text: String): Seq[(String, Option[Instant])] = {
    val loaded = new org.yaml.snakeyaml.Yaml().load[Any](text)
    loaded match {
      case m: java.util.Map[_, _] =>
        import scala.jdk.CollectionConverters._
        m.asScala.toSeq.map { case (k, v) =>
          k.toString -> Option(v).map(_.toString).filter(_.nonEmpty).flatMap(parseExpiry)
        }
      case null => Seq.empty
      case _ => throw new IllegalArgumentException("expected a mapping and not a list")
    }
  }

  private def unexpired(e: Entry, asOf: Instant): Boolean =
    e.expiry.forall(asOf.isBefore)

  private def isIpv6(s: String): Boolean = s.contains(":")

  /** Byte-prefix network containment for the IPv6 (or mixed) case — only
    * referenced when the alert list actually holds an IPv6 network.
    */
  private[operators] def inNetworkBytes(ip: String, net: String, bits: Int): Boolean =
    try {
      // guard: InetAddress.getByName resolves HOSTNAMES via DNS; only IP
      // literals may reach it (the reference's ip_address() raises on
      // anything else)
      if (!ip.matches("""[0-9a-fA-F:.]+""")) return false
      val a = java.net.InetAddress.getByName(ip).getAddress
      val n = java.net.InetAddress.getByName(net).getAddress
      if (a.length != n.length) return false
      val full = bits / 8
      val rem = bits % 8
      var i = 0
      while (i < full) { if (a(i) != n(i)) return false; i += 1 }
      rem == 0 || {
        val mask = (0xFF << (8 - rem)) & 0xFF
        (a(full) & mask) == (n(full) & mask)
      }
    } catch { case _: Exception => false }

  /** Does this single IP string hit an unexpired alert entry as of `asOf`?
    * Mirrors `_ip_is_in_alert_list`: single-IP membership answers
    * definitively (no network fallthrough); otherwise first containing
    * network (deterministic list order) answers.
    */
  def ipHit(ip: Column, list: AlertList, asOf: Instant): Column = {
    val allSingles = list.singles.map(_.key)
    val liveSingles = list.singles.filter(unexpired(_, asOf)).map(_.key)
    val singleMember =
      if (allSingles.isEmpty) lit(false) else ip.isInCollection(allSingles)
    val singleLive =
      if (liveSingles.isEmpty) lit(false) else ip.isInCollection(liveSingles)
    val netLive = list.networks.filter(unexpired(_, asOf)).map { e =>
      val Array(net, bitsS) = e.key.split("/")
      if (isIpv6(net)) {
        val bits = bitsS.toInt
        udf((s: String) => s != null && inNetworkBytes(s, net, bits)).apply(ip)
      } else Lookup.cidrContains(ip, e.key)
    }.reduceOption(_ || _).getOrElse(lit(false))
    when(singleMember, singleLive).otherwise(coalesce(netLive, lit(false)))
  }

  /** The per-rule gate: any of the rule's `ip_fields` (scalar or array
    * values; missing fields never match) holds an alerted IP.
    */
  def anyFieldHit(schema: StructType, ipFields: Seq[String],
                  list: AlertList, asOf: Instant): Column = {
    if (list.isEmpty || ipFields.isEmpty) lit(false)
    else ipFields.map { f =>
      FieldOps.get(schema, f) match {
        case Some((c, _: ArrayType)) =>
          coalesce(exists(c, x => ipHit(x.cast("string"), list, asOf)), lit(false))
        case Some((c, _)) =>
          coalesce(ipHit(c.cast("string"), list, asOf), lit(false))
        case None => lit(false)
      }
    }.reduce(_ || _)
  }
}
