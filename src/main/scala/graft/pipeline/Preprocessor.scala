package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.fields.FieldOps

/** Input preprocessing prelude — applied before the first processor stage,
  * mirroring the reference's per-input PreprocessingConfig
  * (logprep/abc/input.py:195-253, logprep/util/preprocessor.py:121-177):
  * HMAC of the raw event, version-info field, log-arrival timestamp and
  * arrival delta, env enrichment, original-event preservation. All are
  * plan-time-resolved narrow projections.
  */
object Preprocessor {

  /** RFC 2104 HMAC-SHA256 of a binary message column, as a composition of
    * codegen'd sha2/concat expressions: the key schedule (pad to the
    * 64-byte block, xor with ipad/opad) is constant-folded on the driver
    * since the key is a plan-time literal, so per row only the two SHA-256
    * passes run. NOT sha256(key||msg) — that construction is
    * length-extension-forgeable and doesn't match the reference (which
    * uses Python's `hmac`, logprep/abc/input.py HmacConfig).
    */
  def hmacSha256(key: String, msg: Column): Column = {
    val keyBytes0 = key.getBytes("UTF-8")
    val keyBytes =
      if (keyBytes0.length > 64)
        java.security.MessageDigest.getInstance("SHA-256").digest(keyBytes0)
      else keyBytes0
    val block = java.util.Arrays.copyOf(keyBytes, 64)
    val ipad = block.map(b => (b ^ 0x36).toByte)
    val opad = block.map(b => (b ^ 0x5c).toByte)
    val inner = unhex(sha2(concat(lit(ipad), msg), 256))
    sha2(concat(lit(opad), inner), 256)
  }

  /** zlib-compress a binary column (RFC 1950 stream, as Python's
    * `zlib.compress`). The one UDF in the prelude: the JVM Deflater has no
    * SQL-function equivalent; deterministic at the default level.
    */
  private val zlibCompress = udf((b: Array[Byte]) =>
    if (b == null) null
    else {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream(b.length / 2 + 16)
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    })

  /** HMAC-SHA256 of the raw event serialization into `target`, alongside
    * the zlib-compressed base64 of the raw event — the reference's
    * HmacConfig output shape (logprep/abc/input.py:195-253: hmac +
    * compressed_base64 of the target's serialization).
    */
  def hmac(df: DataFrame, key: String, target: String = "hmac"): DataFrame = {
    val raw = encode(to_json(struct(df.columns.map(col): _*)), "utf-8")
    FieldOps.set(df, target, struct(
      hmacSha256(key, raw).as("hmac"),
      base64(zlibCompress(raw)).as("compressed_base64")))
  }

  /** HMAC over a dotted SOURCE field instead of the whole raw event
    * (reference HmacConfig `target` other than `<RAW_MSG>`,
    * abc/input.py:326+). A missing source is the reference's critical
    * input error ("Couldn't find the hmac target field") — here the event
    * is failure-tagged so `compileWithErrors` routes it to the error
    * channel with the original payload intact.
    */
  def hmacOfField(df: DataFrame, key: String, source: String,
      target: String): DataFrame =
    graft.filter.FilterCompiler.resolve(df.schema, source) match {
      case Some((c, _)) =>
        val raw = encode(c.cast("string"), "utf-8")
        val withHmac = FieldOps.set(df, target, when(c.isNotNull, struct(
          hmacSha256(key, raw).as("hmac"),
          base64(zlibCompress(raw)).as("compressed_base64"))))
        RuleExec.addTags(withHmac, Seq(c.isNull -> Seq("_hmac_failure")))
      case None =>
        RuleExec.addTags(df, Seq(lit(true) -> Seq("_hmac_failure")))
    }

  /** Version-info field (reference: version_info_target_field). */
  def versionInfo(df: DataFrame, target: String, engineVersion: String,
                  configVersion: String): DataFrame =
    FieldOps.set(df, target, struct(
      lit(engineVersion).as("logprep"), lit(configVersion).as("configuration")))

  /** Arrival timestamp + delta vs a reference time field
    * (reference: log_arrival_time_target_field / …_timedelta).
    */
  def arrivalTime(df: DataFrame, target: String = "arrival_time",
                  deltaVs: Option[String] = None,
                  deltaTarget: String = "arrival_delta_ms"): DataFrame = {
    val stamped = FieldOps.set(df, target,
      date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
    deltaVs.fold(stamped) { ref =>
      FieldOps.set(stamped, deltaTarget,
        (unix_micros(current_timestamp()) -
          unix_micros(FieldOps.getOrNull(stamped.schema, ref).cast("timestamp"))) / 1000L)
    }
  }

  /** Preserve the full raw event under `event.original`. */
  def preserveOriginal(df: DataFrame, target: String = "event.original"): DataFrame =
    FieldOps.set(df, target, to_json(struct(df.columns.map(col): _*)))

  /** Env-var enrichment resolved at plan time (driver side), matching the
    * reference's env semantics without executor env coupling.
    */
  def envEnrichment(df: DataFrame, mapping: Map[String, String]): DataFrame =
    mapping.foldLeft(df) { case (d, (target, envVar)) =>
      FieldOps.set(d, target, lit(sys.env.getOrElse(envVar, "")))
    }
}
