package graft.operators

/** Labeling-schema support for the labeler processor.
  *
  * The reference loads a JSON schema file (with local `jsonref` `$ref`
  * pointers, processor/labeler/labeling_schema.py:48-68), extracts per
  * category the set of valid labels and each label's ancestors
  * (`_extract_parents`, labeling_schema.py:144-157), and — when the
  * processor sets `include_parent_labels` — expands every rule's labels
  * with their schema ancestors at setup time
  * (labeler/rule.py add_parent_labels_from_schema, labeler/processor.py:93-97).
  *
  * All of this is plan-time work: the expanded label sets compile into the
  * same literal-array merge expressions as inline labels, so schema size
  * never touches per-row cost.
  */
object Labeling {

  /** Parse a labeling schema and resolve local `$ref` JSON pointers
    * (`{"$ref": "#/REFERENCES/platform"}` → the subtree at that path,
    * itself resolved; cycles guard to an empty object).
    */
  def loadSchema(text: String): Map[String, Any] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def toPlain(j: JValue): Any = j match {
      case JObject(fs) => scala.collection.immutable.ListMap(
        fs.map { case (k, v) => k -> toPlain(v) }: _*)
      case JArray(xs) => xs.map(toPlain)
      case JString(s) => s
      case JInt(i) => i.toLong
      case JLong(i) => i
      case JDouble(d) => d
      case JBool(b) => b
      case _ => null
    }
    val root = toPlain(JsonMethods.parse(text)).asInstanceOf[Map[String, Any]]

    def pointer(path: String): Any =
      path.stripPrefix("#/").split('/').foldLeft(root: Any) {
        case (m: Map[_, _], seg) =>
          m.asInstanceOf[Map[String, Any]].getOrElse(seg, Map.empty)
        case (_, _) => Map.empty
      }

    def resolve(v: Any, seen: Set[String]): Any = v match {
      case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        mm.get("$ref") match {
          case Some(ref: String) =>
            if (seen.contains(ref)) Map.empty
            else resolve(pointer(ref), seen + ref)
          case _ => mm.map { case (k, x) => k -> resolve(x, seen) }
        }
      case l: Seq[_] => l.map(resolve(_, seen))
      case other => other
    }
    resolve(root, Set.empty).asInstanceOf[Map[String, Any]]
  }

  /** Read + resolve a schema file, path resolved against `graft.rule.base`
    * like every other rule-referenced artifact.
    */
  def loadSchemaFile(path: String): Map[String, Any] = {
    val base = sys.props.get("graft.rule.base")
      .orElse(sys.env.get("GRAFT_RULE_BASE")).getOrElse(".")
    val f0 = new java.io.File(path)
    val f = if (f0.isAbsolute) f0 else new java.io.File(base, path)
    // driver-side memo: every rule of a labeler stage names the same file
    schemaCache.synchronized {
      schemaCache.getOrElseUpdate(f.getCanonicalPath, loadSchema(new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")))
    }
  }

  private val schemaCache =
    scala.collection.mutable.Map.empty[String, Map[String, Any]]

  private def isDescription(k: String, v: Any): Boolean =
    k == "description" && v.isInstanceOf[String]

  private def hasDescription(m: Map[String, Any]): Boolean =
    m.get("description").exists(_.isInstanceOf[String])

  /** Per-category map label → ancestor labels (only ancestors that carry a
    * description count, and only described labels get an entry) — the
    * reference's `_extract_parents` (labeling_schema.py:144-157).
    */
  def parents(schema: Map[String, Any], category: String): Map[String, Seq[String]] = {
    def extract(anc: List[String], tree: Map[String, Any]): Map[String, Seq[String]] =
      tree.foldLeft(Map.empty[String, Seq[String]]) {
        case (acc, (k, v)) if isDescription(k, v) => acc
        case (acc, (k, v: Map[_, _])) =>
          val sub = v.asInstanceOf[Map[String, Any]]
          val described = hasDescription(sub)
          val here = if (described) Map(k -> (anc: Seq[String])) else Map.empty
          val below = extract(if (described) anc :+ k else anc, sub)
          acc ++ here ++ below
        case (acc, _) => acc
      }
    schema.get(category) match {
      case Some(cat: Map[_, _]) =>
        extract(Nil, cat.asInstanceOf[Map[String, Any]] - "category")
      case _ => Map.empty
    }
  }

  /** Expand one category's labels with their schema ancestors (labeler
    * rule.add_parent_labels_from_schema); unknown labels pass through
    * unchanged. Output order is irrelevant — the labeler writes
    * sorted-unique label arrays.
    */
  def expand(schema: Map[String, Any], category: String,
      labels: Seq[String]): Seq[String] = {
    val p = parents(schema, category)
    (labels ++ labels.flatMap(l => p.getOrElse(l, Nil))).distinct
  }
}
