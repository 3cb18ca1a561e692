package graft.pipeline

import scala.jdk.CollectionConverters._

/** Rule & pipeline config model (reference: rule files are YAML multi-doc /
  * JSON arrays of {filter, <type>: {config}, description}
  * logprep/processor/base/rule.py:149-248; pipeline config is an ordered
  * list of processor blocks, logprep/util/configuration.py:473-637).
  *
  * Loading happens once on the driver at plan-build time; rules compile to
  * Column expressions, so rule count affects plan size, not per-row cost.
  */
final case class RuleSpec(
    filter: String,
    config: Map[String, Any],
    description: String = "")

final case class StageSpec(
    processorType: String,
    rules: Seq[RuleSpec],
    /** Processor-block-level options (sibling keys of `type`/`rules` in
      * the YAML — e.g. pre_detector's `alert_ip_list_path`,
      * reference configuration.py processor blocks).
      */
    config: Map[String, Any] = Map.empty)

final case class PipelineSpec(stages: Seq[StageSpec])

object RuleLoader {

  /** Parse a YAML document set into a PipelineSpec. Top-level shape:
    * {{{
    * pipeline:
    *   - type: dissector
    *     rules:
    *       - filter: "message"
    *         dissector: {mapping: {message: "%{a} %{b}"}}
    * }}}
    */
  def fromYaml(yaml: String): PipelineSpec = {
    val loaded = new org.yaml.snakeyaml.Yaml().load[Any](yaml)
    val root = toScala(loaded).asInstanceOf[Map[String, Any]]
    val stages = root.getOrElse("pipeline", Seq.empty).asInstanceOf[Seq[Any]]
      .map { st =>
        val m = st.asInstanceOf[Map[String, Any]]
        val ptype = m("type").toString
        val rules = Option(m.getOrElse("rules", null))
          .map(_.asInstanceOf[Seq[Any]]).getOrElse(Seq.empty)
          .map(r => parseRule(ptype, r.asInstanceOf[Map[String, Any]]))
        // rule-less RELATIONAL stages (aggregate, join, window_stats,
        // dedup_events, sessionize, asof_join, sort_limit) carry their
        // config on the stage map itself — fold it into one synthetic
        // match-all rule. Gated on the relational stage types: a
        // processor stage with stray stage-level keys must stay a no-op
        // StageSpec (its rules live under `rules:`), not compile a rule
        // whose config isn't nested under the processor-type key.
        val stageCfg = m - "type" - "rules"
        if (rules.isEmpty && stageCfg.nonEmpty &&
            (RelationalStages.stageTypes.contains(ptype) ||
             CurationStages.stageTypes.contains(ptype)))
          StageSpec(ptype, Seq(RuleSpec(
            filter = stageCfg.getOrElse("filter", "*").toString,
            config = stageCfg - "filter")))
        else StageSpec(ptype, rules, config = stageCfg)
      }
    PipelineSpec(stages)
  }

  /** One rule document: {filter, <type>: {...}, description}. A rule-level
    * `regex_fields` list (reference: rule.py regex_fields) marks fields
    * whose filter values match as regexes — expressed here by rewriting
    * `field:` to the filter DSL's native `field|re:` modifier.
    */
  def parseRule(ptype: String, m: Map[String, Any]): RuleSpec = {
    val filter0 = m.getOrElse("filter", "*").toString
    val regexFields = m.getOrElse("regex_fields", Seq.empty[Any])
      .asInstanceOf[Seq[Any]].map(_.toString)
    val filter1 = regexFields.foldLeft(filter0)((f, rf) =>
      f.replace(rf + ":", rf + "|re:"))
    // sigma_fields: true (all fields) or a field list — terms become
    // case-insensitive sigma wildcards (lucene_filter.py:643-653); the
    // filter is rewritten through the AST so `|sigma` reaches every term
    val sigmaFields: Option[Option[Set[String]]] =
      m.get("sigma_fields") match {
        case Some(b: Boolean) => if (b) Some(None) else None
        case Some(l: Seq[_]) if l.nonEmpty =>
          Some(Some(l.map(_.toString).toSet))
        case _ => None
      }
    val filter = sigmaFields match {
      case Some(fields) =>
        graft.filter.LuceneParser.parse(filter1) match {
          case Right(ast) => graft.filter.FilterAst.renderParseable(
            graft.filter.FilterAst.sigmaize(ast, fields))
          case Left(_) => filter1
        }
      case None => filter1
    }
    // pre_detector's `ip_fields` is a RULE-level key (sibling of filter,
    // pre_detector/rule.py:188) — fold it into the config map so the
    // compiler sees it alongside the processor config
    val cfg0 = m.getOrElse(ptype, Map.empty[String, Any])
      .asInstanceOf[Map[String, Any]]
    val cfg =
      if (ptype == "pre_detector" && m.contains("ip_fields"))
        cfg0 + ("ip_fields" -> m("ip_fields"))
      else cfg0
    RuleSpec(
      filter = filter,
      config = cfg,
      description = m.getOrElse("description", "").toString)
  }

  /** Rules from any getter URI (reference GetterFactory.from_string,
    * util/getter.py:56-98): `http(s)://` via the pluggable
    * [[graft.operators.ListSources.fetch]] transport, `file://` or plain
    * paths from disk (directories recurse).
    */
  def rulesFromUri(uri: String, ptype: String): Seq[RuleSpec] =
    if (uri.startsWith("http://") || uri.startsWith("https://"))
      graft.operators.ListSources.fetch(uri) match {
        case Some(text) => rulesFromText(text, json = uri.endsWith(".json"), ptype)
        case None => throw new java.io.IOException(s"rule getter failed: $uri")
      }
    else {
      val path = uri.stripPrefix("file://")
      if (new java.io.File(path).isDirectory) rulesFromDir(path, ptype)
      else rulesFromFile(path, ptype)
    }

  /** Rule files: YAML multi-doc or JSON arrays of rule dicts (reference:
    * processor/base/rule.py:149-248; loaded per processor from dirs/URIs
    * via getters, abc/processor.py:89-99). Returns the rules for `ptype`.
    */
  def rulesFromFile(path: String, ptype: String): Seq[RuleSpec] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    rulesFromText(text, json = path.endsWith(".json"), ptype)
  }

  def rulesFromText(text: String, json: Boolean, ptype: String): Seq[RuleSpec] = {
    val docs: Seq[Any] =
      if (json) {
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
          case JDecimal(d) => d.toDouble
          case JBool(b) => b
          case _ => null
        }
        toPlain(JsonMethods.parse(text)) match {
          case l: Seq[_] => l
          case other => Seq(other)
        }
      } else {
        val yaml = new org.yaml.snakeyaml.Yaml()
        yaml.loadAll(text).asScala.toSeq.map(toScala)
      }
    docs.collect { case m: Map[_, _] =>
      parseRule(ptype, m.asInstanceOf[Map[String, Any]])
    }
  }

  /** Load every .yml/.yaml/.json rule file under a directory, recursing
    * into subdirectories (the reference's recursive glob filtered by
    * RULE_FILE_EXTENSIONS, util/rule_loader.py:95). Entries are sorted by
    * name at every level so rule order is deterministic — the reference
    * inherits filesystem readdir order, which only stays stable by
    * convention.
    */
  def rulesFromDir(dir: String, ptype: String): Seq[RuleSpec] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .sortBy(_.getName).toSeq.flatMap(walk)
      else if (f.getName.matches(".*\\.(ya?ml|json)$")) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir)).flatMap(f => rulesFromFile(f.getPath, ptype))
  }

  /** [[toScala]] for callers outside the loader (e.g. graft.Run's full
    * service config, whose non-`pipeline` sections this loader ignores).
    */
  def toScalaPublic(v: Any): Any = toScala(v)

  /** snakeyaml gives java collections; normalize to immutable Scala. */
  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] => // LinkedHashMap in snakeyaml: keep order
      scala.collection.immutable.ListMap(
        m.asScala.toSeq.map { case (k, vv) => k.toString -> toScala(vv) }: _*)
    case l: java.util.List[_] => l.asScala.map(toScala).toSeq
    case other => other
  }
}
