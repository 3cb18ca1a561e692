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

  /** HMAC-SHA256 of the raw event serialization into `target`. The
    * reference compresses+base64s the raw event alongside
    * (input.py:326+); we keep the raw JSON in `<target>.event`.
    */
  def hmac(df: DataFrame, key: String, target: String = "hmac"): DataFrame = {
    val raw = to_json(struct(df.columns.map(col): _*))
    val mac = sha2(concat(lit(key), raw), 256)
    FieldOps.set(df, target, struct(
      mac.as("hmac"), base64(encode(raw, "utf-8")).as("compressed_base64")))
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
