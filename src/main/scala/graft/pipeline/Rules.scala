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
    rules: Seq[RuleSpec])

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
        StageSpec(ptype, rules)
      }
    PipelineSpec(stages)
  }

  /** One rule document: {filter, <type>: {...}, description}. */
  def parseRule(ptype: String, m: Map[String, Any]): RuleSpec =
    RuleSpec(
      filter = m.getOrElse("filter", "*").toString,
      config = m.getOrElse(ptype, Map.empty[String, Any])
        .asInstanceOf[Map[String, Any]],
      description = m.getOrElse("description", "").toString)

  /** snakeyaml gives java collections; normalize to immutable Scala. */
  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => k.toString -> toScala(vv) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toSeq
    case other => other
  }
}
