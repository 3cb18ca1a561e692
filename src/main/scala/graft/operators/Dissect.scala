package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.fields.FieldOps
import graft.pipeline.RuleExec

/** Full dissect grammar + execution (reference:
  * processor/dissector/processor.py:43-110, section grammar
  * rule.py:103-131, parse :221-257):
  *
  *   `%{(+(sep))(?|&)target(-(c))(/n)(|type)}delimiter`
  *
  *  - plain target       → overwrite write of the partitioned content
  *  - `+target`          → append to existing (list→push, str→concat with
  *                         the `+(sep)` separator, default "")
  *  - `?name` / `&name`  → indirect capture: `?` declares name=content,
  *                         `&` writes content under the DECLARED name —
  *                         a data-dependent field name, carried in the
  *                         `_dynamic` map column (static schemas cannot
  *                         grow per-row columns; the JSON boundary hoists
  *                         the map to top-level fields)
  *  - `-(c)`             → strip char `c` from both ends of content
  *  - `/n`               → action application order across the whole rule
  *  - `|int|float|bool`  → convert_datatype entry for the target
  *
  * Execution is the reference's str.partition chain, compiled to a linear
  * sequence of substring expressions materialized as temp columns (one per
  * section — linear plan size, no exponential expression nesting; narrow,
  * codegen'd, shuffle-free).
  */
object Dissect {

  final case class Section(
      append: Boolean,
      separator: String,
      target: String,
      strip: Option[String],
      position: Int,
      datatype: Option[String],
      delimiter: Option[String])

  private val sectionRe =
    """%\{([+])?(?:\(((?:\\\)|[^)])+)\))?([^/|}\-]*)(?:-\((.)\))?(?:/(\d*))?(?:\|(int|float|bool|string))?\}([\s\S]*)""".r

  /** Split a mapping pattern into sections (reference `_set_mapping_actions`,
    * rule.py:221-257): patterns not starting with a dissect token get a
    * no-op `%{}` prefix section consuming the leading literal.
    */
  def parse(pattern0: String): Seq[Section] = {
    val pattern =
      if (pattern0.startsWith("%{")) pattern0 else "%{}" + pattern0
    // findall(r"%\{[^%]+") — each chunk is one %{...} plus its trailing
    // delimiter text (delimiters cannot contain '%')
    val chunks = """%\{[^%]+""".r.findAllIn(pattern).toList
    val normalized = // a bare "%{}" prefix would not match [^%]+ with empty body
      if (chunks.isEmpty && pattern == "%{}") List("%{}")
      else chunks
    normalized.map {
      case sectionRe(action, sep0, target, strip, pos, dtype, delim) =>
        val sep = Option(sep0).map(_.replace("\\(", "(").replace("\\)", ")")).getOrElse("")
        Section(
          append = action == "+",
          separator = sep,
          target = Option(target).getOrElse(""),
          strip = Option(strip),
          position = Option(pos).filter(_.nonEmpty).map(_.toInt).getOrElse(0),
          datatype = Option(dtype),
          delimiter = Option(delim).filter(_.nonEmpty))
      case other =>
        throw new IllegalArgumentException(s"dissect section did not match: $other")
    }
  }

  /** One planned write: the section, its source index, and the temp column
    * holding its partitioned content.
    */
  private final case class Act(srcIdx: Int, order: Int, sec: Section,
                               contentCol: String, okCol: String)

  /** Apply a dissector rule: `mapping` of source→pattern plus
    * `convert_datatype`, under rule filter `pred`.
    */
  def apply(df: DataFrame, pred: Column, k: RuleExec.Knobs,
            mapping: Seq[(String, String)],
            convertCfg: Seq[(String, String)]): DataFrame = {
    var out = df
    val acts = scala.collection.mutable.ArrayBuffer.empty[Act]
    val temps = scala.collection.mutable.ArrayBuffer.empty[String]
    val converts = scala.collection.mutable.LinkedHashMap.empty[String, String]
    convertCfg.foreach { case (t, d) => converts(t) = d }

    mapping.zipWithIndex.foreach { case ((src, pattern), m) =>
      val sections = parse(pattern)
      sections.foreach(s => s.datatype.foreach(d =>
        if (s.target.nonEmpty) converts(s.target) = d))
      val srcInfo = FieldOps.get(out.schema, src)
      val nonString = srcInfo.exists(_._2 != StringType)
      if (nonString) {
        // reference: ValueError on non-string source → failure tags
        out = RuleExec.addTags(out, Seq(pred -> k.failureTags))
      } else if (srcInfo.isEmpty) {
        // dissector reports missing mapping sources through the generic
        // warning path → FAILURE tags (processor.py:66-70), not the
        // FieldManager missing_field_warning
        if (!k.ignoreMissing)
          out = RuleExec.addTags(out, Seq(pred -> k.failureTags))
      } else {
        val srcCol = srcInfo.get._1
        if (!k.ignoreMissing)
          out = RuleExec.addTags(out, Seq((pred && srcCol.isNull) -> k.failureTags))
        val okCol = s"__d_ok_$m"
        out = out.withColumn(okCol, coalesce(pred, lit(false)) && srcCol.isNotNull)
        temps += okCol
        // the partition chain: rem_{i+1} = rem_i after first `delim`
        var rem: Column = srcCol
        sections.zipWithIndex.foreach { case (sec, i) =>
          val contentCol = s"__d_c_${m}_$i"
          val remCol = s"__d_r_${m}_$i"
          sec.delimiter match {
            case Some(d) =>
              out = out
                .withColumn(contentCol, substring_index(rem, d, 1))
                .withColumn(remCol, {
                  val pos = locate(d, rem)
                  when(pos > 0, rem.substr(pos + d.length, lit(Int.MaxValue)))
                    .otherwise(lit(""))
                })
              rem = col(remCol)
              temps += contentCol += remCol
            case None =>
              out = out.withColumn(contentCol, rem)
              temps += contentCol
          }
          if (sec.target.nonEmpty)
            acts += Act(m, acts.size, sec, contentCol, okCol)
        }
      }
    }

    // Dead-act analysis in GENERATION order (the reference generator
    // breaks a source's action stream at an `&` that references an
    // undeclared `?` key — later sections of that source never run,
    // processor.py:88-96); declarations and the break point are both
    // plan-time facts here.
    val declared = scala.collection.mutable.Map.empty[(Int, String), String]
    val live = scala.collection.mutable.ArrayBuffer.empty[Act]
    val brokenSources = scala.collection.mutable.Set.empty[Int]
    acts.foreach { a =>
      if (!brokenSources.contains(a.srcIdx)) {
        if (a.sec.target.startsWith("?")) {
          declared((a.srcIdx, a.sec.target.substring(1))) = a.contentCol
          live += a
        } else if (a.sec.target.startsWith("&") &&
            !declared.contains((a.srcIdx, a.sec.target.substring(1)))) {
          out = RuleExec.addTags(out, Seq(col(a.okCol) -> k.failureTags))
          brokenSources += a.srcIdx
        } else live += a
      }
    }

    // apply surviving actions in /position order (stable, like Python's
    // sorted over the generated stream)
    val sorted = live.sortBy(_.sec.position)

    def stripped(a: Act): Column = a.sec.strip match {
      case Some(ch) =>
        val q = java.util.regex.Pattern.quote(ch)
        regexp_replace(col(a.contentCol), s"^(?:$q)+|(?:$q)+$$", "")
      case None => col(a.contentCol)
    }

    sorted.foreach { a =>
      {
        val ok = col(a.okCol)
        if (a.sec.target.startsWith("?")) {
          // declare + write {content: ""} under the data-dependent name
          out = writeDynamic(out, ok, col(a.contentCol), lit(""))
        } else if (a.sec.target.startsWith("&")) {
          val nameCol = declared((a.srcIdx, a.sec.target.substring(1)))
          val content = stripped(a)
          val value =
            if (a.sec.append) {
              val dyn =
                if (out.columns.contains("_dynamic")) col("_dynamic")
                else lit(null).cast(MapType(StringType, StringType))
              val cur = element_at(
                coalesce(dyn, map().cast(MapType(StringType, StringType))),
                col(nameCol).cast("string"))
              concat(coalesce(cur, lit("")), lit(a.sec.separator), content)
            } else content
          out = writeDynamic(out, ok, col(nameCol), value)
        } else if (a.sec.append) {
          val target = a.sec.target
          val content = stripped(a)
          val existing = FieldOps.get(out.schema, target)
          val value = existing match {
            case Some((c, ArrayType(et, _))) =>
              concat(coalesce(c, array().cast(ArrayType(et))),
                array(content.cast(et)))
            case Some((c, _)) =>
              concat(coalesce(c.cast("string"), lit("")),
                lit(a.sec.separator), content)
            case None =>
              concat(lit(""), lit(a.sec.separator), content)
          }
          out = guardedOverwrite(out, ok, target, value)
        } else {
          out = guardedOverwrite(out, ok, a.sec.target, stripped(a))
        }
      }
    }

    // convert_datatype post-pass (processor.py:104-110): overwrite cast,
    // ValueError → failure tag
    converts.foreach { case (target, dtype) =>
      FieldOps.get(out.schema, target) match {
        case Some((c0, _)) =>
          val c = c0.cast("string")
          val (converted, fails) = dtype match {
            case "int" =>
              (when(c.rlike("^\\s*[+-]?\\d+\\s*$"), c.cast("long")),
                c.isNotNull && !c.rlike("^\\s*[+-]?\\d+\\s*$"))
            case "float" =>
              (c.cast("double"), c.isNotNull && c.cast("double").isNull)
            case "bool" =>
              // str_to_bool never raises (rule.py str_to_bool)
              (when(lower(c).isin("yes", "true", "on", "y"), lit(true))
                .when(c.rlike("^\\s*[+-]?\\d+\\s*$"), c.cast("long") =!= 0)
                .otherwise(lit(false)), lit(false))
            case _ => (c, lit(false))
          }
          val go = coalesce(pred, lit(false))
          out = out
            .withColumn("__d_cv_ok", go && !coalesce(fails, lit(true)))
            .withColumn("__d_cv_fail", go && coalesce(fails, lit(false)))
          // guardedOverwrite keeps untouched rows' type intact (variant
          // union when string→int changes the column type)
          out = guardedOverwrite(out, col("__d_cv_ok"), target, converted)
          out = RuleExec.addTags(out, Seq(col("__d_cv_fail") -> k.failureTags))
            .drop("__d_cv_ok", "__d_cv_fail")
        case None => // target never produced (e.g. dead source): nothing
      }
    }

    out = RuleExec.deleteSourcesIf(out, pred,
      k.copy(sourceFields = mapping.map(_._1)), mapping.map(_._1))
    temps.foldLeft(out)(_ drop _)
  }

  /** Overwrite-write `value` to `target` on `cond` rows, keeping the type
    * faithful for untouched rows (RuleExec.write with overwrite knobs).
    */
  private def guardedOverwrite(df: DataFrame, cond: Column, target: String,
                               value: Column): DataFrame =
    RuleExec.write(df, cond, target, value,
      RuleExec.Knobs("dissector", Nil, None, overwrite = true, merge = false,
        deleteSources = false, ignoreMissing = false, Nil, Nil))

  /** Write a data-dependent (name, value) pair into the `_dynamic` map
    * column — the static-schema carrier for indirect dissect captures.
    * The JSON boundary hoists these to top-level fields.
    */
  def writeDynamic(df: DataFrame, cond: Column, name: Column,
                   value: Column): DataFrame = {
    val existing =
      if (df.columns.contains("_dynamic")) col("_dynamic")
      else lit(null).cast(MapType(StringType, StringType))
    val merged = map_concat(
      coalesce(existing, map().cast(MapType(StringType, StringType))),
      map(name.cast("string"), value.cast("string")))
    df.withColumn("_dynamic", when(cond, merged).otherwise(existing))
  }
}
