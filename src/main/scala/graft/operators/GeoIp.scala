package graft.operators

/** Pluggable GeoIP city lookup for the compiled geoip_enricher stage
  * (reference: processor/geoip_enricher/processor.py:118-166 reads
  * GeoLite2-City via `geoip2.database.Reader`). The provider is installed
  * once per JVM and opened lazily per executor: production points
  * [[mmdbProvider]] at an .mmdb file ([[MaxmindDb]], public MaxMind-DB
  * binary format); conformance tests install the reference suite's
  * ReaderMock answers; the default knows no addresses (not-found), which
  * is the honest zero-egress container behavior.
  */
object GeoIp {

  /** One city record — the property surface the reference reads off
    * `geoip2`'s city response (processor.py:122-143). None ≡ the reference
    * omitting the property (skip_none in add_fields_to).
    */
  final case class GeoRecord(
      accuracyRadius: Option[Long] = None,
      longitude: Option[Double] = None,
      latitude: Option[Double] = None,
      timeZone: Option[String] = None,
      continent: Option[String] = None,
      continentCode: Option[String] = None,
      country: Option[String] = None,
      countryIso: Option[String] = None,
      city: Option[String] = None,
      postalCode: Option[String] = None,
      subdivision: Option[String] = None)

  /** ip → record; None models AddressNotFoundError. */
  @volatile var provider: String => Option[GeoRecord] = _ => None

  /** A provider backed by an on-disk MaxMind-DB file, opened lazily on
    * first lookup in each executor JVM (the reference opens its Reader as
    * a cached_property per process, processor.py:84-110).
    */
  def mmdbProvider(path: String): String => Option[GeoRecord] = {
    lazy val db = MaxmindDb.open(path)
    ip => db.lookupCity(ip)
  }

  /** The reference's dotted output layout (GEOIP_DATA_STUBS,
    * geoip_enricher/rule.py:35-48): stub key → typed value extractor.
    * geometry.* appears only when longitude AND latitude are truthy
    * (Python truthiness — 0.0 counts as absent, processor.py:136-144).
    */
  def hasPoint(r: GeoRecord): Boolean =
    r.longitude.exists(_ != 0.0) && r.latitude.exists(_ != 0.0)

  /** UDF-side row for the compiled geoip_enricher stage: one nullable
    * field per GEOIP_DATA_STUBS entry (the rule maps each to its dotted
    * target path at compile time). None row ≡ invalid IP or not-found
    * (reference returns {} → no write at all, processor.py:145-166).
    */
  final case class GeoUdfOut(
      geometryType: Option[String],
      coordinates: Option[Seq[Double]],
      accuracyRadius: Option[Long],
      continent: Option[String],
      continentCode: Option[String],
      country: Option[String],
      countryIso: Option[String],
      timeZone: Option[String],
      city: Option[String],
      postalCode: Option[String],
      subdivision: Option[String])

  def udfLookup(ip: String): Option[GeoUdfOut] =
    for {
      _ <- IpInfo.parse(ip) // ip_address() ValueError → {} (processor.py:145)
      r <- provider(ip)
    } yield GeoUdfOut(
      geometryType = if (hasPoint(r)) Some("Point") else None,
      coordinates =
        if (hasPoint(r)) Some(Seq(r.longitude.get, r.latitude.get)) else None,
      accuracyRadius = r.accuracyRadius,
      continent = r.continent,
      continentCode = r.continentCode,
      country = r.country,
      countryIso = r.countryIso,
      timeZone = r.timeZone,
      city = r.city,
      postalCode = r.postalCode,
      subdivision = r.subdivision)
}
