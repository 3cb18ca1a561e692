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
    * structs (`winlog.event_id` → `winlog` struct with `event_id`), so
    * the static FieldOps/PipelineCompiler path runs unchanged on top.
    */
  def declaredColumns(v: Column, fields: Map[String, String]): Seq[Column] = {
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
          when(existsAt(v, (prefix :+ head).mkString(".")),
            struct(build(prefix :+ head,
              deeper.map { case (p, t) => (p.tail, t) }): _*)).as(head)
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
    * Limitation: declared paths address OBJECT fields only — a path
    * segment through an array (`items.0.name`) is not extractable here
    * (arrays pass through whole, untouched, like any undeclared value).
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
    import com.fasterxml.jackson.databind.node.ObjectNode
    def hasPath(node: JsonNode, path: List[String]): Boolean = (node, path) match {
      case (o: ObjectNode, last :: Nil) => o.has(last)
      case (o: ObjectNode, head :: rest) =>
        val child = o.get(head)
        child != null && hasPath(child, rest)
      case _ => false
    }
    def deletePath(node: JsonNode, path: List[String]): Unit = (node, path) match {
      case (o: ObjectNode, last :: Nil) => o.remove(last); ()
      case (o: ObjectNode, head :: rest) =>
        val child = o.get(head)
        if (child != null) deletePath(child, rest)
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
      case _ => over
    }
    val base = mapper.readTree(rawJson)
    val over = mapper.readTree(processedJson)
    val decl = mapper.readTree(declJson)
    def at(node: JsonNode, path: List[String]): Option[JsonNode] = path match {
      case Nil => Some(node)
      case head :: rest => node match {
        case o: ObjectNode if o.has(head) => at(o.get(head), rest)
        case _ => None
      }
    }
    // Extraction emits a struct for every declared PARENT whose path
    // exists — including when it exists as a SCALAR or with no declared
    // children, where the struct is empty. That artifact rides through
    // the pipeline output and deepMerge would clobber the original
    // scalar with `{}`. Prune: an empty object in the output at a
    // declared parent prefix whose decl snapshot also carries no
    // content is an extraction artifact, not pipeline data.
    val parentPrefixes = declared.flatMap(p => p.inits.toSeq.drop(1))
      .filter(_.nonEmpty).distinct.sortBy(-_.length)
    parentPrefixes.foreach { prefix =>
      val overEmpty = at(over, prefix).exists(n =>
        n.isInstanceOf[ObjectNode] && n.asInstanceOf[ObjectNode].isEmpty)
      val declEmpty = at(decl, prefix).forall(n =>
        n.isInstanceOf[ObjectNode] && n.asInstanceOf[ObjectNode].isEmpty)
      if (overEmpty && declEmpty) deletePath(over, prefix)
    }
    // replace only the declared paths the pipeline actually SAW: seen +
    // absent from output = dropped (delete); never-seen (missing or
    // type-mismatched extraction) = keep the original bytes
    declared.filter(hasPath(decl, _)).foreach(deletePath(base, _))
    mapper.writeValueAsString(deepMerge(base, over))
  }
}
