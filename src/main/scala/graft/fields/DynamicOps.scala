package graft.fields

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The fully-dynamic event path (SURVEY §1.5 two-layer design): when a
  * pipeline's touched fields are NOT statically derivable, events ride as
  * one raw JSON column and dotted-field access compiles to variant
  * extraction (`parse_json` + `variant_get`, Spark 4 VariantType) — still
  * a narrow codegen'd projection, no per-event interpretation.
  *
  * The static `StructType` path (FieldOps/FilterCompiler) is preferred
  * whenever rules enumerate their fields (they always do in the
  * reference); this path exists for schema-on-read ingestion and ad-hoc
  * exploration where inferring a union schema is not wanted at 100 TB
  * (a full-corpus schema inference pass is itself a scan).
  */
object DynamicOps {

  /** Parse a raw JSON string column to a variant (done once per row;
    * downstream accesses share it).
    */
  def toVariant(raw: Column): Column = parse_json(raw)

  /** Dotted-path access on a variant column: `a.b.0.c` → `$.a.b[0].c`. */
  def jsonPath(path: String): String =
    "$" + path.split("\\.").map { p =>
      if (p.forall(_.isDigit)) s"[$p]" else s".$p"
    }.mkString

  def getString(v: Column, path: String): Column =
    try_variant_get(v, jsonPath(path), "string")

  def getLong(v: Column, path: String): Column =
    try_variant_get(v, jsonPath(path), "long")

  def getDouble(v: Column, path: String): Column =
    try_variant_get(v, jsonPath(path), "double")

  /** Exists vs null distinction on the dynamic path (the reference's
    * MISSING sentinel vs JSON null, SURVEY §1.1): `variant_get` as
    * variant returns null only when the key is MISSING; a present JSON
    * null is a non-null variant whose type is "VOID".
    */
  def existsAt(v: Column, path: String): Column =
    try_variant_get(v, jsonPath(path), "variant").isNotNull

  def isJsonNull(v: Column, path: String): Column = {
    val node = try_variant_get(v, jsonPath(path), "variant")
    node.isNotNull && schema_of_variant(node) === "VOID"
  }

  /** Dynamic ingestion: wrap a raw JSON text DataFrame into
    * (raw, variant) — the entry point for schema-less pipelines.
    */
  def ingest(df: DataFrame, rawCol: String): DataFrame =
    df.withColumn("_event", toVariant(col(rawCol)))
}
