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

  // ------------------------------------------------------------------
  // overflow pipeline: declared fields typed, everything else rides raw
  // ------------------------------------------------------------------

  /** Typed columns for the DECLARED dotted fields of a pipeline, built
    * from one variant column. Dotted paths reassemble into nested
    * structs (`winlog.event_id` → `winlog` struct with `event_id`); a
    * digit segment (`items.0.name`) reassembles into an ARRAY column
    * spanning indices 0..max-declared, so the static
    * FieldOps/PipelineCompiler path (whose resolver reads digit segments
    * as `element_at`) runs unchanged on top.
    *
    * Array elements must share one Spark type, so the element subtree is
    * the UNION of every declared index's subpaths — each subpath is
    * extracted at every spanned index (a value the caller didn't name at
    * some index still round-trips byte-identically through the decl
    * snapshot). Conflicting types for the same subpath, mixed digit and
    * name segments under one parent, and leaf+parent conflicts are
    * rejected at build time.
    */
  def declaredColumns(v: Column, fields: Map[String, String]): Seq[Column] = {
    def isIndex(s: String) = s.nonEmpty && s.forall(_.isDigit)
    /** The value at `prefix` built from subpath declarations (tails all
      * non-empty). Null (not an empty container) when the branch is
      * absent in the event — otherwise a declared-but-missing branch
      * would materialize as `{}`/`[null…]` in the merged output.
      */
    def value(prefix: List[String],
              entries: Seq[(List[String], String)]): Column = {
      val heads = entries.map(_._1.head).distinct
      if (heads.exists(isIndex) && !heads.forall(isIndex))
        throw new IllegalArgumentException(
          s"conflicting declared fields under '${prefix.mkString(".")}': " +
            "mixed array-index and object-key segments")
      if (heads.forall(isIndex)) arrayValue(prefix, entries)
      else when(existsAt(v, prefix.mkString(".")),
        struct(build(prefix, entries): _*))
    }
    def arrayValue(prefix: List[String],
                   entries: Seq[(List[String], String)]): Column = {
      // union subtree across the declared indices, with type-conflict check
      val union = entries.map { case (p, t) => (p.tail, t) }.distinct
      union.groupBy(_._1).foreach { case (p, ts) =>
        if (ts.map(_._2).distinct.lengthIs > 1)
          throw new IllegalArgumentException(
            s"conflicting declared fields: '${(prefix ++ p).mkString(".")}' " +
              s"declared with types ${ts.map(_._2).distinct.mkString(" and ")}")
      }
      val leaves = union.filter(_._1.isEmpty)
      val deeper = union.filter(_._1.nonEmpty)
      if (leaves.nonEmpty && deeper.nonEmpty)
        throw new IllegalArgumentException(
          s"conflicting declared fields: '${prefix.mkString(".")}' array " +
            "elements are both leaves and parents of deeper paths")
      val maxIdx = entries.map(_._1.head.toInt).max
      val elems = (0 to maxIdx).map { i =>
        val p = prefix :+ i.toString
        if (deeper.isEmpty) typed(v, p.mkString("."), leaves.head._2)
        else value(p, deeper)
      }
      when(existsAt(v, prefix.mkString(".")), array(elems: _*))
    }
    def build(prefix: List[String],
              group: Seq[(List[String], String)]): Seq[Column] =
      group.groupBy(_._1.head).toSeq.sortBy(_._1).map { case (head, entries) =>
        val leaves = entries.filter(_._1.lengthIs == 1)
        val deeper = entries.filter(_._1.lengthIs > 1)
        if (leaves.nonEmpty && deeper.nonEmpty)
          // silently extracting only one of the two would drop the other
          throw new IllegalArgumentException(
            s"conflicting declared fields: '${(prefix :+ head).mkString(".")}' " +
              s"is both a leaf and a parent of deeper paths")
        if (deeper.isEmpty)
          typed(v, (prefix :+ head).mkString("."), leaves.head._2).as(head)
        else
          // null (not an empty struct) when the branch is absent in the
          // event — otherwise a declared-but-missing branch would
          // materialize as `{}` in the merged output
          value(prefix :+ head,
            deeper.map { case (p, t) => (p.tail, t) }).as(head)
      }
    build(Nil, fields.toSeq.map { case (p, t) => (p.split("\\.").toList, t) })
  }

  private def typed(v: Column, path: String, tpe: String): Column =
    try_variant_get(v, jsonPath(path), tpe)

  /** Run a compiled pipeline over SCHEMA-LESS JSON events (VERDICT r5
    * stretch / SURVEY §1.5 dynamic path): fields no rule declares never
    * enter any inferred schema and survive to the sink byte-identically.
    *
    *  1. each event's declared fields are extracted from a variant into
    *     typed (possibly nested) columns — a narrow codegen'd projection;
    *  2. the static pipeline runs on those columns exactly as on
    *     schema'd input;
    *  3. the pipeline's output row is serialized and deep-merged back
    *     into the ORIGINAL event JSON: declared paths are first removed
    *     from the original (so a field the pipeline dropped or nulled
    *     disappears rather than resurrecting), then the output object
    *     wins recursively; undeclared fields pass through untouched.
    *
    * The merge step is a Scala UDF — a JSON-boundary serialization
    * surface like the decoder family (SURVEY §2.5): there is no Column
    * algebra over two dynamic JSON documents, and the per-row work is
    * one Jackson parse of data that is already strings at the boundary.
    *
    * Digit path segments address ARRAY indices (`items.0.name`), same
    * as the static resolver and the reference's `_get_item`
    * (helper.py:243-258): declared array coordinates extract into real
    * array columns and merge back index-wise (undeclared elements and
    * base elements past the declared span survive untouched; a JSON
    * object under a digit KEY is not addressable — digit segments
    * always mean indices).
    *
    * Returns one `json` string column.
    */
  def runWithOverflow(raw: DataFrame, rawCol: String,
                      fields: Map[String, String],
                      pipe: DataFrame => graft.pipeline.PipelineResult): DataFrame = {
    val v = toVariant(col(rawCol))
    val declared = declaredColumns(v, fields)
    // snapshot of what EXTRACTION saw, carried through the pipeline: a
    // declared path absent here (missing OR failed its type cast) never
    // reached the rules, so the merge must keep the original value
    // rather than treating the pipeline's silence as a drop
    val extracted = raw.select(
      col(rawCol).as("__raw") +:
        to_json(struct(declared: _*)).as("__decl") +: declared: _*)
    val result = pipe(extracted)
    val out = result.main
    val processedCols = out.columns.filterNot(c => c == "__raw" || c == "__decl")
    val processedJson = to_json(struct(processedCols.map(col): _*))
    val declaredPaths = fields.keys.toSeq.map(_.split("\\.").toList)
    val merge = udf { (rawJson: String, processed: String, decl: String) =>
      mergeOverflow(rawJson, processed, decl, declaredPaths)
    }
    out.select(merge(col("__raw"), processedJson, col("__decl")).as("json"))
  }

  private[graft] def mergeOverflow(rawJson: String, processedJson: String,
                                   declJson: String,
                                   declared: Seq[List[String]]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    def isIndex(s: String) = s.nonEmpty && s.forall(_.isDigit)
    def hasPath(node: JsonNode, path: List[String]): Boolean = (node, path) match {
      case (o: ObjectNode, last :: Nil) => o.has(last)
      case (a: ArrayNode, last :: Nil) if isIndex(last) =>
        last.toInt < a.size() && !a.get(last.toInt).isNull
      case (o: ObjectNode, head :: rest) =>
        val child = o.get(head)
        child != null && hasPath(child, rest)
      case (a: ArrayNode, head :: rest) if isIndex(head) =>
        head.toInt < a.size() && hasPath(a.get(head.toInt), rest)
      case _ => false
    }
    // deleting AT an array index nulls it (removal would shift the
    // indices every other declared coordinate depends on)
    def deletePath(node: JsonNode, path: List[String]): Unit = (node, path) match {
      case (o: ObjectNode, last :: Nil) => o.remove(last); ()
      case (a: ArrayNode, last :: Nil) if isIndex(last) =>
        if (last.toInt < a.size())
          a.set(last.toInt,
            com.fasterxml.jackson.databind.node.NullNode.getInstance())
        ()
      case (o: ObjectNode, head :: rest) =>
        val child = o.get(head)
        if (child != null) deletePath(child, rest)
      case (a: ArrayNode, head :: rest) if isIndex(head) =>
        if (head.toInt < a.size()) deletePath(a.get(head.toInt), rest)
      case _ => ()
    }
    def deepMerge(base: JsonNode, over: JsonNode): JsonNode = (base, over) match {
      case (b: ObjectNode, o: ObjectNode) =>
        import scala.jdk.CollectionConverters._
        o.fieldNames().asScala.foreach { n =>
          val merged =
            if (b.has(n)) deepMerge(b.get(n), o.get(n)) else o.get(n)
          b.set[JsonNode](n, merged)
        }
        b
      case (b: ArrayNode, o: ArrayNode) =>
        // index-wise: a null over-element is extraction's "nothing at
        // this index" placeholder and keeps the base element; base
        // elements past over's span survive; over never EXTENDS base
        // (the overflow pipeline cannot create array elements — a
        // longer over is declared-index padding, i.e. nulls)
        (0 until math.min(b.size(), o.size())).foreach { i =>
          if (!o.get(i).isNull) b.set(i, deepMerge(b.get(i), o.get(i)))
        }
        b
      case _ => over
    }
    val base = mapper.readTree(rawJson)
    val over = mapper.readTree(processedJson)
    val decl = mapper.readTree(declJson)
    def at(node: JsonNode, path: List[String]): Option[JsonNode] = path match {
      case Nil => Some(node)
      case head :: rest => node match {
        case o: ObjectNode if o.has(head) => at(o.get(head), rest)
        case a: ArrayNode if isIndex(head) && head.toInt < a.size() =>
          at(a.get(head.toInt), rest)
        case _ => None
      }
    }
    // Extraction emits a container for every declared PARENT whose path
    // exists — including when it exists as a SCALAR or with no declared
    // children, where the container is contentless (`{}` after to_json
    // drops null struct fields; `[null…]` for arrays, whose positions
    // to_json keeps). That artifact rides through the pipeline output
    // and deepMerge would clobber the original scalar. Prune: a
    // contentless container in the output at a declared parent prefix
    // whose decl snapshot also carries no content there is an
    // extraction artifact, not pipeline data.
    def contentless(n: JsonNode): Boolean = n match {
      case o: ObjectNode => o.isEmpty
      case a: ArrayNode =>
        (0 until a.size()).forall(i => a.get(i).isNull)
      case _ => false
    }
    val parentPrefixes = declared.flatMap(p => p.inits.toSeq.drop(1))
      .filter(_.nonEmpty).distinct.sortBy(-_.length)
    parentPrefixes.foreach { prefix =>
      val overEmpty = at(over, prefix).exists(contentless)
      val declEmpty = at(decl, prefix).forall(contentless)
      if (overEmpty && declEmpty) deletePath(over, prefix)
    }
    // replace only the declared paths the pipeline actually SAW: seen +
    // absent from output = dropped (delete); never-seen (missing or
    // type-mismatched extraction) = keep the original bytes
    declared.filter(hasPath(decl, _)).foreach(deletePath(base, _))
    mapper.writeValueAsString(deepMerge(base, over))
  }
}
