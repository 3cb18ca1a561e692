package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.fields.FieldOps

/** Shared rule-execution machinery: the Spark rendering of the reference's
  * common processor/rule knobs that every FieldManager-derived processor
  * inherits (reference: processor/field_manager/rule.py:90-140 for the
  * config surface; abc/processor.py:283-320 for failure/missing handling;
  * util/helper.py:88-157 for write/merge semantics).
  *
  * Per-row behavior replicated here:
  *  - any source field absent/null → `_<type>_missing_field_warning` tag,
  *    no write (unless `ignore_missing_fields`, then silently skipped)
  *  - any source present but "" → failure tags, no write (processors that
  *    call `_has_missing_values`, e.g. calculator — opt-in via checkEmpty)
  *  - computed value null (e.g. unparseable operand) → failure tags
  *  - occupied target (non-null) without overwrite/merge →
  *    FieldExistsWarning → failure tags, no write
  *  - merge_with_target → the helper.py:143-152 merge matrix
  *  - delete_source_fields → sources nulled on matching rows after
  *    processing (reference pops them even when the apply warned,
  *    abc/processor.py:248-252)
  *
  * All of it compiles to a single narrow projection per rule — guards are
  * boolean Columns, never row callbacks.
  */
object RuleExec {

  /** The config surface shared by FieldManager-derived rules. */
  final case class Knobs(
      ptype: String,
      sourceFields: Seq[String],
      targetField: Option[String],
      overwrite: Boolean,
      merge: Boolean,
      deleteSources: Boolean,
      ignoreMissing: Boolean,
      failureTags: Seq[String],
      missingTags: Seq[String])

  def knobs(ptype: String, c: Map[String, Any]): Knobs = {
    def flag(k: String) = c.get(k).exists(_.toString == "true")
    val tagOnFailure = c.getOrElse("tag_on_failure", Seq.empty[Any])
      .asInstanceOf[Seq[Any]].map(_.toString)
    Knobs(
      ptype = ptype,
      sourceFields = c.getOrElse("source_fields", Seq.empty[Any])
        .asInstanceOf[Seq[Any]].map(_.toString),
      targetField = c.get("target_field").map(_.toString),
      overwrite = flag("overwrite_target"),
      merge = flag("merge_with_target"),
      deleteSources = flag("delete_source_fields"),
      ignoreMissing = flag("ignore_missing_fields"),
      failureTags =
        if (tagOnFailure.nonEmpty) tagOnFailure.distinct.sorted
        else Seq(s"_${ptype}_failure"),
      missingTags = Seq(s"_${ptype}_missing_field_warning"))
  }

  /** OR over sources of "absent or null" (reference: get_dotted_field_value
    * returning None).
    */
  def anyMissing(schema: StructType, sources: Seq[String]): Column =
    sources.map { s =>
      FieldOps.get(schema, s) match {
        case Some((c, _)) => c.isNull
        case None => lit(true)
      }
    }.foldLeft(lit(false))(_ || _)

  /** OR over sources of "present but empty string" (`_has_missing_values`,
    * abc/processor.py:309-319: value in [None, ""]).
    */
  def anyEmpty(schema: StructType, sources: Seq[String]): Column =
    sources.flatMap { s =>
      FieldOps.get(schema, s) match {
        case Some((c, StringType)) => Some(c === "")
        case _ => None
      }
    }.foldLeft(lit(false))(_ || _)

  /** Merge tag arrays into `tags` on rows matching `cond`, keeping the
    * reference's sorted-set shape (abc/processor.py:283-307). Multiple
    * (cond, tags) pairs fold into ONE projection of the tags field.
    */
  def addTags(df: DataFrame, tagSets: Seq[(Column, Seq[String])]): DataFrame = {
    val active = tagSets.filter(_._2.nonEmpty)
    if (active.isEmpty) df
    else {
      val existing = FieldOps.get(df.schema, "tags").map(_._1.cast("array<string>"))
        .getOrElse(lit(null).cast("array<string>"))
      val empty = array().cast("array<string>")
      val pieces = active.map { case (cond, tags) =>
        when(cond, array(tags.map(lit): _*)).otherwise(empty)
      }
      val merged = array_sort(array_distinct(
        concat(coalesce(existing, empty) +: pieces: _*)))
      val anyCond = active.map(_._1).reduce(_ || _)
      FieldOps.set(df, "tags", when(anyCond, merged).otherwise(existing))
    }
  }

  /** Cast any column to variant; structs need to_variant_object (a plain
    * CAST to VARIANT is unsupported for struct inputs).
    */
  private def toVariant(c: Column, dt: DataType): Column = dt match {
    case _: StructType => to_variant_object(c)
    case ArrayType(_: StructType, _) => transform(c, x => to_variant_object(x))
    case _ => c.cast(VariantType)
  }

  /** Result of planning a write: the final value column and whether the
    * merge is statically impossible (scalar-into-scalar — the reference
    * raises FieldExistsWarning from the final else of helper.py:88-157).
    */
  private final case class PlannedWrite(value: Column, staticConflict: Boolean)

  /** helper.py:143-157 merge matrix, driven by static types.
    * existing==null → plain write of the new content (line 139-141).
    */
  private def planMerge(df: DataFrame, target: String, value: Column): PlannedWrite = {
    val existingType = FieldOps.get(df.schema, target).map(_._2)
    val valueType = df.select(value.as("__v")).schema.head.dataType
    val existing = FieldOps.getOrNull(df.schema, target)
    (existingType, valueType) match {
      case (None, _) => PlannedWrite(value, staticConflict = false)
      case (Some(st: StructType), vt: StructType) =>
        // dict.update shallow merge: the union struct — existing-only
        // fields keep their values (null when existing is null), value
        // fields overwrite / append in dict-update order
        val keep = st.fieldNames.filterNot(vt.fieldNames.contains)
          .map(f => existing.getField(f).as(f))
        val put = vt.fieldNames.map(f => value.getField(f).as(f))
        PlannedWrite(struct(keep ++ put: _*), staticConflict = false)
      case (Some(ArrayType(et, _)), ArrayType(vt, _)) =>
        val (ex, v) =
          if (et == vt) (existing, value)
          else (existing.cast(ArrayType(VariantType)), value.cast(ArrayType(VariantType)))
        PlannedWrite(
          when(existing.isNull, v).otherwise(concat(ex, v)),
          staticConflict = false)
      case (Some(ArrayType(et, _)), _) => // list target + scalar → append
        // heterogenous element? variant keeps the scalar's own type
        val (ex, v) =
          if (et == valueType) (existing, value)
          else (existing.cast(ArrayType(VariantType)), value.cast(VariantType))
        PlannedWrite(
          when(existing.isNull, array(v)).otherwise(concat(ex, array(v))),
          staticConflict = false)
      case (Some(et), ArrayType(vt, _)) => // scalar target + list → prepend
        val (ex, v) =
          if (et == vt) (existing, value)
          else (existing.cast(VariantType), value.cast(ArrayType(VariantType)))
        PlannedWrite(
          when(existing.isNull, v).otherwise(concat(array(ex), v)),
          staticConflict = false)
      case (Some(_), _) => // scalar into scalar: only legal if existing null
        PlannedWrite(when(existing.isNull, value).otherwise(existing),
          staticConflict = true)
    }
  }

  /** add_fields_to for one (target, value) under the rule's knobs: write on
    * `cond` rows, with occupied-target detection (strict mode) and the
    * merge matrix; conflicts tag failure_tags instead of writing (the
    * FieldExistsWarning path, helper.py:135-142).
    */
  def write(df: DataFrame, cond: Column, target: String, value: Column,
            k: Knobs): DataFrame = {
    val planned =
      if (k.merge) planMerge(df, target, value)
      else PlannedWrite(value, staticConflict = false)
    val existing = FieldOps.getOrNull(df.schema, target)
    val occupied =
      if (k.overwrite || k.merge) lit(false)
      else if (FieldOps.exists(df.schema, target)) existing.isNotNull
      else lit(false)
    val conflict =
      if (planned.staticConflict) occupied || existing.isNotNull else occupied
    // plan-time: can this write EVER conflict? If not, skip the tag
    // machinery entirely so no dead `tags` column appears in the schema
    val mayConflict = planned.staticConflict ||
      (!k.overwrite && !k.merge && FieldOps.exists(df.schema, target))
    // Guard predicates are materialized into temp columns BEFORE the write
    // projection: Columns re-resolve by name, so a predicate referencing
    // the target would otherwise be evaluated against the POST-write value
    // (wrong verdicts, or analysis errors once the type changed).
    val d0 = df.withColumns(Map(
      "__w_go" -> (coalesce(cond, lit(false)) && !coalesce(conflict, lit(false))),
      "__w_tag" ->
        (if (mayConflict) coalesce(cond, lit(false)) && coalesce(conflict, lit(false))
         else lit(false))))
    // When the new value's type differs from the occupant's, a plain
    // when/otherwise would coerce NON-written rows too (e.g. a string
    // "0.01" silently becoming 0.01d on rows the rule never touched).
    // Structs unify to the union shape (absent fields null → invisible on
    // the JSON boundary); other mismatches take a variant-typed union,
    // which keeps each row's original type and renders natively in JSON.
    val existingType = FieldOps.get(df.schema, target).map(_._2)
    val valueType = df.select(planned.value.as("__v")).schema.head.dataType
    val (v, ex) = (existingType, valueType) match {
      case (None, _) => (planned.value, existing)
      case (Some(et), vt) if et == vt || et == NullType || vt == NullType =>
        (planned.value, existing)
      case (Some(et: NumericType), _: NumericType) => (planned.value, existing)
      case (Some(et: StructType), vt: StructType) =>
        val names = (et.fieldNames ++ vt.fieldNames.filterNot(et.fieldNames.contains)).toSeq
        def proj(c: Column, st: StructType): Column = {
          val other = if (st == et) vt else et
          val fields = names.map { f =>
            if (st.fieldNames.contains(f)) c.getField(f).as(f)
            else lit(null).cast(other(f).dataType).as(f)
          }
          when(c.isNotNull, struct(fields: _*))
        }
        (proj(planned.value, vt), proj(existing, et))
      case (Some(et), vt) =>
        (toVariant(planned.value, vt), toVariant(existing, et))
    }
    val written = FieldOps.set(d0, target,
      when(col("__w_go"), v).otherwise(ex))
    val tagged =
      if (mayConflict) addTags(written, Seq((col("__w_tag"), k.failureTags)))
      else written
    tagged.drop("__w_go", "__w_tag")
  }

  /** Execute one value-producing rule with the full shared semantics.
    *
    * @param valueOf   the computed value (from the CURRENT schema)
    * @param computeOk rows where the computation itself succeeded; default =
    *                  value non-null (covers cast/parse failures)
    * @param checkEmpty opt-in `_has_missing_values` "" handling
    * @param missingSkipsWrite calculator-style early return on missing vs
    *                  field_manager-style continue-with-present-values
    */
  def applyValueRule(
      df: DataFrame,
      pred: Column,
      k: Knobs,
      target: String,
      valueOf: StructType => Column,
      computeOk: Option[StructType => Column] = None,
      checkEmpty: Boolean = false,
      sourcesOverride: Option[Seq[String]] = None,
      proceedOnMissing: Boolean = false): DataFrame = {

    val sources = sourcesOverride.getOrElse(k.sourceFields)
    val schema = df.schema
    val miss = anyMissing(schema, sources)
    val empty0 = if (checkEmpty) anyEmpty(schema, sources) else lit(false)
    // reference order: missing checked first; "" only reached when no
    // missing (calculator/processor.py:44-47)
    val emptyC = !miss && empty0

    val value = valueOf(schema)
    val ok = computeOk.map(_(schema)).getOrElse(value.isNotNull)

    // snapshot guards pre-write (see [[write]] for why); ONE batched
    // projection — every chained withColumn re-analyzes the whole
    // accumulated plan, and this runs per rule (PLANS.md compile cost)
    val d0 = df.withColumns(Map(
      "__r_miss" -> coalesce(miss, lit(false)),
      "__r_empty" -> coalesce(emptyC, lit(false)),
      "__r_ok" -> coalesce(ok, lit(false)),
      "__r_pred" -> coalesce(pred, lit(false))))
    val p = col("__r_pred")
    // FieldManager-style processors (concatenator…) proceed with the
    // PRESENT values when some sources are missing — the miss only tags
    // (_handle_missing_fields returns non-blocking there); calculator-style
    // ones skip the write entirely (processor.py:44-47 early return)
    val eligible =
      if (proceedOnMissing) p && !col("__r_empty")
      else p && !col("__r_miss") && !col("__r_empty")
    val written = write(d0, eligible && col("__r_ok"), target, value, k)

    val tagged = addTags(written,
      (if (k.ignoreMissing) Nil
       else Seq((p && col("__r_miss")) -> k.missingTags)) ++
      Seq((eligible && !col("__r_ok")) -> k.failureTags) ++
      (if (checkEmpty) Seq((p && col("__r_empty")) -> k.failureTags) else Nil))

    deleteSourcesIf(tagged, p, k, sources)
      .drop("__r_miss", "__r_empty", "__r_ok", "__r_pred")
  }

  /** delete_source_fields post-step: null sources on matching rows (static
    * schema can't drop per-row; null ⇔ absent on the JSON boundary). For
    * match-all rules the column is dropped outright when top-level.
    */
  def deleteSourcesIf(df: DataFrame, pred: Column, k: Knobs,
                      sources: Seq[String]): DataFrame =
    if (!k.deleteSources) df
    else sources.foldLeft(df) { (d, s) =>
      if (!FieldOps.exists(d.schema, s)) d
      else FieldOps.setNullable(d, s,
        when(pred, lit(null)).otherwise(FieldOps.getOrNull(d.schema, s)))
    }
}
