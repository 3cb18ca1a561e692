package graft.fields

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dotted-field get/set/delete/merge on nested struct columns with the
  * reference's write semantics (reference: `_add_field_to`,
  * logprep/util/helper.py:88-157; delete: helper.py:560-614; get with list
  * index: helper.py:243-287).
  *
  * DataFrames are immutable, so every "mutation" is a projection built from
  * `Column.withField` / `dropFields` — narrow, codegen-friendly, no UDFs.
  *
  * Write modes:
  *  - [[WriteMode.Strict]]    — writing to an existing non-null field is a
  *    conflict; the engine surfaces it as a failure tag (the reference's
  *    FieldExistsWarning) rather than throwing.
  *  - [[WriteMode.Overwrite]] — replace whatever is there.
  *  - [[WriteMode.Merge]]     — dict↦shallow merge, list↦extend,
  *    scalar+list↦append (helper.py:143-152).
  */
object FieldOps {

  /** Backquote a struct field name for withField/dropFields, whose string
    * argument is PARSED (dots nest, hyphens break) — event keys are
    * arbitrary.  */
  def quote(f: String): String = "`" + f.replace("`", "``") + "`"

  sealed trait WriteMode
  object WriteMode {
    case object Strict extends WriteMode
    case object Overwrite extends WriteMode
    case object Merge extends WriteMode
  }

  /** Resolve a dotted path to (column, dataType) if it exists in `schema`. */
  def get(schema: StructType, path: String): Option[(Column, DataType)] =
    graft.filter.FilterCompiler.resolve(schema, path)

  def getOrNull(schema: StructType, path: String): Column =
    get(schema, path).map(_._1).getOrElse(lit(null))

  /** Does the dotted path exist structurally in the schema? */
  def exists(schema: StructType, path: String): Boolean = get(schema, path).isDefined

  private def fieldType(schema: StructType, path: String): Option[DataType] =
    get(schema, path).map(_._2)

  /** Set `path` to `value` on `df`. Creates intermediate structs as needed
    * (mirrors `_add_field_to` creating intermediate dicts). For Strict mode
    * the caller should pre-check [[exists]] and route to failure-tagging;
    * here Strict behaves like "only write if currently null".
    */
  def set(df: DataFrame, path: String, value: Column,
          mode: WriteMode = WriteMode.Overwrite): DataFrame = {
    val parts = graft.filter.FilterCompiler.splitPath(path)
    val schema = df.schema
    parts match {
      case top :: Nil =>
        val newVal = mode match {
          case WriteMode.Strict if schema.fieldNames.contains(top) =>
            coalesce(col(top), value)
          case WriteMode.Merge if schema.fieldNames.contains(top) =>
            mergeValues(col(top), fieldType(schema, top), value)
          case _ => value
        }
        df.withColumn(top, newVal)
      case top :: rest =>
        val existing = fieldType(schema, path)
        val newVal = mode match {
          case WriteMode.Strict if existing.isDefined =>
            coalesce(getOrNull(schema, path), value)
          case WriteMode.Merge if existing.isDefined =>
            mergeValues(getOrNull(schema, path), existing, value)
          case _ => value
        }
        val base = schema.fields.find(_.name == top)
          .map(f => (col(top), f.dataType))
        df.withColumn(top, nestedSet(base, rest, newVal))
      case Nil => df
    }
  }

  /** Build the new value for a nested write: walk existing struct levels
    * with `withField`, create missing intermediates with `struct(...)` —
    * the immutable equivalent of `_add_field_to` creating intermediate
    * dicts (helper.py:100-121).
    */
  private def nestedSet(cur: Option[(Column, DataType)], parts: List[String],
                        value: Column): Column =
    parts match {
      case Nil => value
      case p :: rest =>
        cur match {
          case Some((c, st: StructType)) =>
            val childField = st.fields.find(_.name == p)
            val childCur = childField.map(f => (c.getField(p), f.dataType))
            val updated = c.withField(quote(p), nestedSet(childCur, rest, value))
            // `withField` on a row-null struct yields null — a genuine
            // write must still land (the reference creates intermediate
            // dicts), so rebuild the struct from nulls; and when nothing
            // was written, STAY null rather than materializing an `{}`
            // shell that a later rule's Exists filter would see as a
            // present field (conformance finding: default-rule corpora
            // chain rules whose targets overlap other rules' filters)
            val childNull = childField.map(f =>
              (lit(null).cast(f.dataType), f.dataType))
            val freshChild = nestedSet(childNull, rest, value)
            // mirror withField's layout exactly: existing field replaced
            // in place, NEW field appended at the end
            val freshFields = st.fields.toSeq.map { f =>
              if (f.name == p) freshChild.as(f.name)
              else lit(null).cast(f.dataType).as(f.name)
            } ++ (if (st.fieldNames.contains(p)) Nil else Seq(freshChild.as(p)))
            val fresh = struct(freshFields: _*)
            when(c.isNotNull, updated)
              .otherwise(when(freshChild.isNotNull, fresh))
          case _ =>
            val inner = nestedSet(None, rest, value)
            when(inner.isNotNull, struct(inner.as(p)))
        }
    }

  /** Public merge-expression builder for callers composing their own
    * guards (e.g. the rule-driven pipeline): the merged value of writing
    * `value` into `path` under merge_with_target semantics.
    */
  def mergedValue(schema: StructType, path: String, value: Column): Column =
    mergeValues(getOrNull(schema, path), fieldType(schema, path), value)

  /** Merge semantics per helper.py:143-152: list↦concat (extend),
    * scalar+list target↦append; struct merge is handled at the engine layer
    * by field-wise copy (shallow dict.update equivalent).
    */
  private def mergeValues(target: Column, targetType: Option[DataType],
                          value: Column): Column =
    targetType match {
      case Some(ArrayType(_, _)) =>
        // extend with a list, or append a scalar
        coalesce(concat(target, array(value)), target, array(value))
      case _ => coalesce(value, target)
    }

  /** Delete a dotted path. Top-level → drop column; nested → dropFields. */
  def delete(df: DataFrame, path: String): DataFrame = {
    val parts = graft.filter.FilterCompiler.splitPath(path)
    parts match {
      case top :: Nil => df.drop(top)
      case top :: rest if df.schema.fieldNames.contains(top) &&
          df.schema(top).dataType.isInstanceOf[StructType] =>
        df.withColumn(top, col(top).dropFields(rest.map(quote).mkString(".")))
      case _ => df
    }
  }

  /** `set` under a name RuleExec uses to emphasize the null-writing
    * delete path keeps the column type.  */
  def setNullable(df: DataFrame, path: String, value: Column): DataFrame =
    set(df, path, value)

  /** Copy/move N source fields to a target (field_manager core). */
  def copy(df: DataFrame, sources: Seq[String], target: String,
           deleteSources: Boolean = false,
           mode: WriteMode = WriteMode.Overwrite): DataFrame = {
    val schema = df.schema
    val value =
      if (sources.size == 1) getOrNull(schema, sources.head)
      else array(sources.map(getOrNull(schema, _)): _*)
    val written = set(df, target, value, mode)
    if (deleteSources) sources.foldLeft(written)((d, s) => delete(d, s))
    else written
  }
}
