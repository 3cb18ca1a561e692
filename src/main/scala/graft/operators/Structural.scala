package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.fields.FieldOps
import graft.filter.FilterCompiler

/** Structural processors — pure Column projections, no UDFs, fully inside
  * whole-stage codegen. Each maps one reference processor:
  *
  *  - field_manager   (reference: logprep/processor/field_manager/processor.py:40-170)
  *  - dropper         (logprep/processor/dropper/processor.py:35-44)
  *  - deleter         (logprep/processor/deleter/processor.py:30-37)
  *  - concatenator    (logprep/processor/concatenator/processor.py:33-60)
  *  - string_splitter (logprep/processor/string_splitter/processor.py:33-48)
  *  - generic_adder   (logprep/processor/generic_adder/processor.py:35-44)
  *  - key_checker     (logprep/processor/key_checker/processor.py:35-59)
  *  - deduplicator    (logprep/processor/deduplicator/processor.py:34-50)
  *  - labeler         (logprep/processor/labeler/processor.py:39-107)
  *  - selective_extractor (logprep/processor/selective_extractor/processor.py:35-66)
  */
object Structural {

  /** field_manager: copy/move/rename source fields to targets. `mapping` is
    * src→target; move when `deleteSources`.
    */
  def fieldManager(df: DataFrame, mapping: Map[String, String],
                   deleteSources: Boolean = false): DataFrame = {
    val withCopies = mapping.foldLeft(df) { case (d, (src, tgt)) =>
      FieldOps.set(d, tgt, FieldOps.getOrNull(d.schema, src))
    }
    if (deleteSources) mapping.keys.foldLeft(withCopies)((d, s) => FieldOps.delete(d, s))
    else withCopies
  }

  /** dropper: delete the named dotted fields. */
  def dropper(df: DataFrame, fields: Seq[String]): DataFrame =
    fields.foldLeft(df)((d, f) => FieldOps.delete(d, f))

  /** deleter: drop whole events matching a Lucene filter — an anti-filter.
    * The reference mutates `event.clear()`; in Spark deletion is a
    * `filter(!pred)` narrow transformation.
    */
  def deleter(df: DataFrame, filterString: String): DataFrame =
    df.filter(!FilterCompiler.predicate(filterString, df.schema))

  /** concatenator: join source values with a separator into target. */
  def concatenator(df: DataFrame, sources: Seq[String], separator: String,
                   target: String): DataFrame = {
    val cols = sources.map(s => FieldOps.getOrNull(df.schema, s).cast("string"))
    FieldOps.set(df, target, concat_ws(separator, cols: _*))
  }

  /** string_splitter: split a string field by a literal delimiter. */
  def stringSplitter(df: DataFrame, source: String, delimiter: String,
                     target: String): DataFrame =
    FieldOps.set(df, target,
      split(FieldOps.getOrNull(df.schema, source),
        java.util.regex.Pattern.quote(delimiter)))

  /** generic_adder: add literal fields (values resolved at plan time, incl.
    * any file-sourced additions the caller pre-loads).
    */
  def genericAdder(df: DataFrame, additions: Map[String, Any]): DataFrame =
    additions.foldLeft(df) { case (d, (path, value)) =>
      FieldOps.set(d, path, lit(value))
    }

  /** key_checker: collect names of required fields that are missing into a
    * sorted list at `target`.
    */
  def keyChecker(df: DataFrame, required: Seq[String], target: String): DataFrame = {
    val schema = df.schema
    val missing = required.map { f =>
      if (FieldOps.exists(schema, f))
        when(FieldOps.getOrNull(schema, f).isNull, lit(f))
      else lit(f)
    }
    val arr = array_sort(array_compact(array(missing: _*)))
    FieldOps.set(df, target, when(size(arr) > 0, arr))
  }

  /** deduplicator: order-preserving dedup of a list-valued field.
    * `array_distinct` keeps first occurrences — matches the reference.
    */
  def deduplicator(df: DataFrame, fields: Seq[String]): DataFrame =
    fields.foldLeft(df) { (d, f) =>
      FieldOps.set(d, f, array_distinct(FieldOps.getOrNull(d.schema, f)))
    }

  /** labeler: add label values under `label.<category>`, result sorted
    * unique, merged with any pre-existing labels of that category.
    */
  def labeler(df: DataFrame, category: String, values: Seq[String]): DataFrame = {
    val path = s"label.$category"
    val existing = FieldOps.get(df.schema, path).map(_._1)
      .getOrElse(array().cast("array<string>"))
    val merged = array_sort(array_distinct(concat(
      coalesce(existing, array().cast("array<string>")),
      array(values.map(lit): _*))))
    FieldOps.set(df, path, merged)
  }

  /** selective_extractor: project whitelisted fields of matching events into
    * a new sub-event stream (a side-output DataFrame). Non-matching events
    * produce nothing; the main stream is untouched by construction.
    *
    * The sub-event keeps the source's nested shape (reference
    * `add_fields_to(filtered_event, flattened_fields)`,
    * selective_extractor/processor.py:55-66): dotted paths rebuild as
    * structs; fields absent from the schema are skipped (plan time), and
    * an event whose present fields are all null yields NO sub-event.
    */
  def selectiveExtractor(df: DataFrame, filterString: String,
                         fields: Seq[String]): DataFrame = {
    val pred = FilterCompiler.predicate(filterString, df.schema)
    val present = fields.filter(f => FieldOps.exists(df.schema, f))
    if (present.isEmpty) return df.filter(lit(false)).select()
    val anyValue = present.map(f =>
      FieldOps.getOrNull(df.schema, f).isNotNull).reduce(_ || _)
    df.filter(coalesce(pred, lit(false)) && anyValue)
      .select(nestedColumns(df, present): _*)
  }

  /** Dotted source paths → nested struct columns preserving the source
    * shape (paths group by root segment; absent paths skipped) — shared by
    * selective_extractor sub-events and pre_detector's
    * copy_fields_to_detection_event.
    */
  def nestedColumns(df: DataFrame, fields: Seq[String]): Seq[Column] = {
    val present = fields.filter(f => FieldOps.exists(df.schema, f))
    def build(paths: Seq[(List[String], Column)]): Seq[Column] =
      paths.groupBy(_._1.head).toSeq.sortBy(_._1).map { case (root, group) =>
        val (leaves, deeper) = group.partition(_._1.lengthCompare(1) == 0)
        leaves.headOption match {
          case Some((_, c)) => c.as(root)
          case None =>
            struct(build(deeper.map { case (segs, c) => (segs.tail, c) }): _*)
              .as(root)
        }
      }
    build(present.map { f =>
      (FilterCompiler.splitPath(f).toList, FieldOps.getOrNull(df.schema, f))
    })
  }
}
