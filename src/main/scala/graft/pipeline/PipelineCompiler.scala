package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.fields.FieldOps
import graft.filter.FilterCompiler
import graft.operators._

/** Compiles a [[PipelineSpec]] into a DataFrame → [[PipelineResult]]
  * function: the Spark replacement for the reference's
  * `Pipeline.process_pipeline` hot loop (logprep/framework/pipeline.py:
  * 279-304). Every stage is a narrow projection; rule filters become
  * `when(pred, new).otherwise(old)` guards so later rules see earlier
  * rules' writes (the reference's in-place ordering, abc/processor.py:
  * 212-215, emulated by sequential projection composition).
  *
  * Side-output producers (pre_detector, selective_extractor,
  * pseudonymizer mappings) contribute extra DataFrames keyed by output
  * name (reference: ProcessorResult.data routing,
  * framework/pipeline.py:320-325). Rows that fail a stage (e.g.
  * unparseable input) are tagged, not dropped — the `tags` column carries
  * `_<type>_failure` markers exactly like the reference's failure tags
  * (abc/processor.py:283-307).
  */
final case class PipelineResult(main: DataFrame,
                                extra: Map[String, DataFrame])

object PipelineCompiler {

  // spec→function compilations, observable by specs: a stream must pay
  // this ONCE, not per micro-batch (PLANS.md "Chain compile cost")
  private val compileCount = new java.util.concurrent.atomic.AtomicLong()
  private[graft] def compileInvocations: Long = compileCount.get

  def compile(spec: PipelineSpec): DataFrame => PipelineResult = {
    compileCount.incrementAndGet()
    input =>
      spec.stages.foldLeft(PipelineResult(input, Map.empty)) { (acc, stage) =>
        // label the stage application (guide §1.5): stages with eager
        // plan-time actions (ingest appends, quantile thresholds,
        // sampling counts) submit jobs HERE, and the thread-local
        // description — inherited by AQE stage jobs — attributes every
        // one of them to the stage instead of an anonymous call site
        CurationStages.labeled(acc.main,
          s"stage ${stage.processorType}")(applyStage(acc, stage))
      }
  }

  /** [[compile]] with a per-stage `observe` after every processor stage
    * (reference: per-processor `number_of_processed_events` /
    * `number_of_failed_events` counters, abc/processor.py Metrics).
    * The observes ride the same job — zero extra passes; each stage's
    * counters surface as `graft_stage_<i>_<type>` on the
    * `StreamingQueryListener` / `QueryExecutionListener` and feed
    * [[MetricsRegistry]].
    */
  def compileInstrumented(spec: PipelineSpec): DataFrame => PipelineResult = {
    // spec→function compilation happens ONCE here (not per batch — the
    // compileInvocations counter and the one-time-compile contract hold
    // for the instrumented path too)
    val clean = compile(spec)
    input => {
      // extra channels — INCLUDING the error channel — come from the
      // CLEAN compile: each extra sink runs its own action, and if the
      // extras' lineage carried the observes, every such action would
      // re-fire the same CollectMetrics nodes into the registry —
      // per-stage counters inflated by (1 + extra sinks). Only the main
      // channel (one action per batch) is instrumented.
      val cleanResult = withErrorChannel(clean(input))
      val observedMain = spec.stages.zipWithIndex
        .foldLeft(PipelineResult(input, Map.empty)) {
          case (acc, (stage, i)) =>
            val applied = applyStage(acc, stage)
            applied.copy(main =
              Metrics.observeStage(applied.main, i + 1, stage.processorType))
        }.main
      PipelineResult(observedMain, cleanResult.extra)
    }
  }

  /** Compile with an error channel: events that accumulated failure tags
    * are additionally emitted on an "errors" side output, wrapped
    * `{event, errors, @timestamp}` like the reference's error output
    * (Pipeline.enqueue_error, framework/pipeline.py:364-415). The main
    * channel still carries them (tagged) — the reference keeps failed
    * events flowing too, tags are diagnostic.
    */
  def compileWithErrors(spec: PipelineSpec): DataFrame => PipelineResult = { input =>
    withErrorChannel(compile(spec)(input))
  }

  /** Attach the "errors" side channel to an already-compiled result —
    * streaming callers compose this per micro-batch around whatever
    * compile path they run (plain / instrumented / config-refreshed).
    */
  def withErrorChannel(result: PipelineResult): PipelineResult = {
    val main = result.main
    // idempotent: compileInstrumented already attaches the channel from
    // its CLEAN lineage — re-deriving it from the observed main would
    // re-fire the stage observes on every errors-count action
    if (result.extra.contains("errors")) result
    else if (!main.columns.contains("tags")) result
    else {
      val failed = main.filter(size(col("tags")) > 0)
        .select(
          to_json(struct(main.columns.map(col): _*)).as("event"),
          array_join(col("tags"), ",").as("errors"),
          date_format(current_timestamp(),
            "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("@timestamp"))
      PipelineResult(main, result.extra + ("errors" -> failed))
    }
  }

  /** snakeyaml java collections → Scala (nested). */
  private def toScalaAny(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      scala.collection.immutable.ListMap(
        scala.jdk.CollectionConverters.MapHasAsScala(m).asScala.toSeq
          .map { case (a, b) => a.toString -> toScalaAny(b) }: _*)
    case l: java.util.List[_] =>
      scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq.map(toScalaAny)
    case other => other
  }

  /** Render a config value as compact JSON (for variant-typed writes). */
  private def jsonAny(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case ch if ch < ' ' => f"\\u${ch.toInt}%04x"
      case ch => ch.toString
    } + "\""
    case m: Map[_, _] =>
      m.map { case (k2, x) => jsonAny(k2.toString) + ":" + jsonAny(x) }
        .mkString("{", ",", "}")
    case s: Seq[_] => s.map(jsonAny).mkString("[", ",", "]")
    case other => other.toString
  }

  /** Shallow dict.update of two JSON objects (helper.py:143-146); either
    * side non-object → the new value wins.
    */
  private val jsonMergeUdf = udf { (existing: String, value: String) =>
    if (value == null) null
    else if (existing == null) value
    else {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      try (JsonMethods.parse(existing), JsonMethods.parse(value)) match {
        case (JObject(exFs), JObject(newFs)) =>
          val keep = exFs.filterNot(f => newFs.exists(_._1 == f._1))
          JsonMethods.compact(JsonMethods.render(JObject(keep ++ newFs)))
        case _ => value
      } catch { case _: Exception => value }
    }
  }

  private def cfgStr(c: Map[String, Any], k: String): String = c(k).toString
  private def cfgStrOpt(c: Map[String, Any], k: String): Option[String] =
    c.get(k).map(_.toString)
  private def cfgMap(c: Map[String, Any], k: String): Map[String, String] =
    c.getOrElse(k, Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
      .map { case (a, b) => a -> b.toString }
  private def cfgSeq(c: Map[String, Any], k: String): Seq[String] =
    c.getOrElse(k, Seq.empty[Any]).asInstanceOf[Seq[Any]].map(_.toString)

  /** Conditionally write `value` to `path`: rows matching `pred` get the
    * new value, others keep what they had (or null for a new field).
    */
  private def guardedSet(df: DataFrame, pred: Column, path: String,
                         value: Column): DataFrame = {
    val existing = FieldOps.getOrNull(df.schema, path)
    FieldOps.set(df, path, when(pred, value).otherwise(existing))
  }

  /** Append `_<type>_failure`-style tags on matching rows that failed —
    * here failure = rule matched but produced null from non-null source.
    */
  private def tagFailures(df: DataFrame, pred: Column, tag: String): DataFrame = {
    val existing = FieldOps.get(df.schema, "tags").map(_._1)
      .getOrElse(lit(null).cast("array<string>"))
    val tagged = array_sort(array_distinct(concat(
      coalesce(existing, array().cast("array<string>")), array(lit(tag)))))
    FieldOps.set(df, "tags", when(pred, tagged).otherwise(existing))
  }

  private def applyStage(acc: PipelineResult, stage: StageSpec): PipelineResult = {
    stage.processorType match {
      // ---- side-output producers ------------------------------------
      case "pre_detector" =>
        val rules = stage.rules.map { r =>
          val c = r.config
          Detection.PreDetectorRule(r.filter,
            cfgStr(c, "id"), cfgStr(c, "title"),
            cfgStrOpt(c, "severity").getOrElse("low"),
            cfgSeq(c, "mitre"),
            caseCondition = cfgStrOpt(c, "case_condition").getOrElse("directly"),
            description = r.description,
            link = cfgStrOpt(c, "link"),
            timestampField = cfgStrOpt(c, "timestamp_field").getOrElse("@timestamp"),
            sourceFormat = cfgStrOpt(c, "source_format").getOrElse("ISO8601"),
            sourceTimezone = cfgStrOpt(c, "source_timezone").getOrElse("UTC"),
            targetTimezone = cfgStrOpt(c, "target_timezone").getOrElse("UTC"),
            copyFields = {
              val cf = cfgSeq(c, "copy_fields_to_detection_event")
              if (cf.nonEmpty) cf else Seq("host.name")
            },
            ipFields = cfgSeq(c, "ip_fields"))
        }
        // alert_ip_list_path (stage-level, a path or list of paths):
        // rules with ip_fields only detect when an event IP hits an
        // unexpired list entry (ip_alerter.py via processor.py:137-141)
        val alertList = stage.config.get("alert_ip_list_path") match {
          case Some(p: String) => IpAlerter.load(Seq(p))
          case Some(ps: Seq[_]) => IpAlerter.load(ps.map(_.toString))
          case _ => IpAlerter.empty
        }
        val alertAsOf = java.time.Instant.now()
        val key = eventHashKey(acc.main)
        val detections =
          Detection.preDetector(acc.main, rules, key, alertList, alertAsOf)
        // the triggering event itself gets the (shared) pre_detection_id
        // so it can be linked with its detections (processor.py:152-158);
        // the IP gate applies here too — a gated-off rule adds no id
        val anyMatch = rules
          .map(r => coalesce(
            graft.filter.FilterCompiler.predicate(r.filter, acc.main.schema) &&
              Detection.ruleIpGate(acc.main, r, alertList, alertAsOf),
            lit(false)))
          .reduce(_ || _)
        val linked = graft.fields.FieldOps.set(acc.main, "pre_detection_id",
          when(anyMatch, Detection.preDetectionId(key)))
        PipelineResult(linked,
          acc.extra + ("pre_detector" -> detections))

      case "selective_extractor" =>
        // fields come inline (source_fields) or from a whitelist file
        // (extract_from_file, rule.py:122-145); each rule routes its
        // sub-events to the topics in its `outputs`
        val ruleFields: Seq[(RuleSpec, Seq[String], Seq[String])] =
          stage.rules.map { r =>
            val inline = cfgSeq(r.config, "source_fields")
            val fields =
              if (inline.nonEmpty) inline
              else cfgStrOpt(r.config, "extract_from_file").map { pth =>
                val base = sys.props.get("graft.rule.base")
                  .orElse(sys.env.get("GRAFT_RULE_BASE")).getOrElse(".")
                val f0 = new java.io.File(pth)
                val f = if (f0.isAbsolute) f0 else new java.io.File(base, pth)
                new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
                  .split('\n').map(_.trim).filter(_.nonEmpty).toSeq
              }.getOrElse(Seq.empty)
            val topics = r.config.getOrElse("outputs", Seq.empty[Any])
              .asInstanceOf[Seq[Any]].flatMap {
                case m: Map[_, _] =>
                  m.asInstanceOf[Map[String, Any]].values.map(_.toString)
                case _ => Nil
              }
            (r, fields, topics)
          }
        val extracts = ruleFields.map { case (r, fields, _) =>
          Structural.selectiveExtractor(acc.main, r.filter, fields)
        }
        val merged = extracts.reduce(_.unionByName(_, allowMissingColumns = true))
        // per-topic side outputs, merged across the rules naming the topic
        val byTopic = ruleFields.zip(extracts)
          .flatMap { case ((_, _, topics), ex) => topics.map(_ -> ex) }
          .groupBy(_._1).map { case (topic, exs) =>
            s"selective_extractor:$topic" ->
              exs.map(_._2).reduce(_.unionByName(_, allowMissingColumns = true))
          }
        // the MAIN event still gets the missing-field warning when a rule
        // matches but a source is absent AND the rule opts into
        // ignore_missing_fields: false (the selective_extractor rule
        // DEFAULTS to true, rule.py:158 — unlike other field managers)
        val tagged = stage.rules.foldLeft(acc.main) { (d, r) =>
          val k = RuleExec.knobs("selective_extractor", r.config)
          val optsIntoWarning =
            r.config.get("ignore_missing_fields").exists(_.toString == "false")
          if (!optsIntoWarning || k.sourceFields.isEmpty) d
          else {
            val p = coalesce(
              graft.filter.FilterCompiler.predicate(r.filter, d.schema),
              lit(false))
            val miss = RuleExec.anyMissing(d.schema, k.sourceFields)
            RuleExec.addTags(d, Seq((p && miss) -> k.missingTags))
          }
        }
        PipelineResult(tagged,
          acc.extra ++ byTopic + ("selective_extractor" -> merged))

      // ---- relational stage types (beyond-parity, SURVEY §2.4) ------
      case rel if RelationalStages.stageTypes.contains(rel) =>
        val rule = stage.rules.headOption
          .getOrElse(RuleSpec("*", Map.empty))
        PipelineResult(
          RelationalStages.compile(rel, rule, acc.main), acc.extra)

      // ---- corpus-curation stage types (SURVEY §2b) -----------------
      case cur if CurationStages.stageTypes.contains(cur) =>
        val rule = stage.rules.headOption
          .getOrElse(RuleSpec("*", Map.empty))
        PipelineResult(
          CurationStages.compile(cur, rule, acc.main), acc.extra)

      // ---- event-deleting / mutating stages -------------------------
      case "deleter" =>
        val remaining = stage.rules.foldLeft(acc.main)((d, r) =>
          Structural.deleter(d, r.filter))
        PipelineResult(remaining, acc.extra)

      case other =>
        // the unknown-type check lives in the PER-RULE dispatch, so a
        // typo'd stage type with an EMPTY rules list would fold over
        // nothing and compile to a silent no-op — the worst outcome for
        // a misconfiguration; refuse it here instead
        if (stage.rules.isEmpty)
          throw new IllegalArgumentException(
            s"stage type `$other` is not a relational/curation stage " +
              "and carries no rules — either the type is misspelled or " +
              "the processor's rules list is missing")
        // apply_multiple_times (reference abc/processor.py:203-210): the
        // fixpoint loop is bounded-unrolled at compile time — K sequential
        // guarded projections; rules whose predicate no longer matches
        // become no-ops on later passes, so K passes reach the fixpoint
        // for terminating rule sets. Streaming-safe (plan is static).
        val repeats = stage.rules.headOption
          .flatMap(_.config.get("apply_multiple_times"))
          .map(_.toString.toInt).getOrElse(1)
        val applied = (1 to math.max(1, repeats)).foldLeft(acc.main) { (d0, _) =>
          stage.rules.foldLeft(d0)((d, r) => applyRule(d, other, r))
        }
        // cross-rule working state (clusterer signature chain) is stage-scoped
        val cleaned =
          if (applied.columns.contains("__clu_sig")) applied.drop("__clu_sig")
          else applied
        PipelineResult(cleaned, acc.extra)
    }
  }

  /** Content-addressed per-event key: sha2 over the canonical JSON of ALL
    * top-level columns. The reference assigns uuid4 per event
    * (pre_detector/processor.py:152-158) — nondeterministic ids break
    * exactly-once reprocessing, so the engine derives the id from the full
    * event instead. Two BYTE-IDENTICAL events share an id (content
    * addressing, by design); two events differing in any field do not —
    * unlike a single-column key, which silently merged unrelated
    * detections whenever e.g. timestamps collided.
    */
  private def eventHashKey(df: DataFrame): Column =
    sha2(to_json(struct(df.columns.map(col): _*)), 256)

  /** Apply `op` to the whole frame, then blend each target path so rows NOT
    * matching `pred` keep their prior value (or stay null for new fields).
    * This is how the rule filter reaches operators that write via their own
    * `FieldOps.set` internally — the reference only processes events whose
    * filter matches (abc/processor.py:212-215); unmatched events must pass
    * through untouched.
    */
  private def guardedApply(df: DataFrame, pred: Column, targets: Seq[String])
                          (op: DataFrame => DataFrame): DataFrame = {
    val stash = targets.indices.map(i => s"__pre$i")
    val withOld = targets.zip(stash).foldLeft(df) { case (d, (t, s)) =>
      d.withColumn(s, FieldOps.getOrNull(d.schema, t))
    }
    val applied = op(withOld)
    val blended = targets.zip(stash).foldLeft(applied) { case (d, (t, s)) =>
      val cur = FieldOps.getOrNull(d.schema, t)
      FieldOps.set(d, t, when(pred, cur).otherwise(col(s)))
    }
    stash.foldLeft(blended)(_ drop _)
  }

  /** field_manager (reference: processor/field_manager/processor.py:40-170):
    * mapping path copies each present source to its target; single-target
    * path writes the present values (scalar when one source and no merge,
    * else a list), with merge_with_target flattening lists and
    * order-preserving-deduping sources first (`_overwrite_from_source_values`)
    * and all-dict values collapsing to one shallow-merged dict.
    */
  private def applyFieldManager(df: DataFrame, pred: Column, ptype: String,
                                c: Map[String, Any]): DataFrame = {
    import org.apache.spark.sql.types._
    val k = RuleExec.knobs(ptype, c)
    val mappingPairs = cfgMap(c, "mapping").toSeq
    var out = df

    if (mappingPairs.nonEmpty) {
      val sources = mappingPairs.map(_._1)
      if (!k.ignoreMissing) {
        val miss = RuleExec.anyMissing(out.schema, sources)
        out = RuleExec.addTags(out, Seq((pred && miss) -> k.missingTags))
      }
      // absent-in-schema sources can never write: skip at plan time so no
      // dead target columns appear
      for ((src, tgt) <- mappingPairs if FieldOps.exists(out.schema, src)) {
        val srcCol = FieldOps.getOrNull(out.schema, src)
        out = RuleExec.write(out, pred && srcCol.isNotNull, tgt, srcCol, k)
      }
      out = RuleExec.deleteSourcesIf(out, pred, k, sources)
    }

    if (k.sourceFields.nonEmpty && k.targetField.isDefined) {
      val sources = k.sourceFields
      val target = k.targetField.get
      if (!k.ignoreMissing) {
        val miss = RuleExec.anyMissing(out.schema, sources)
        out = RuleExec.addTags(out, Seq((pred && miss) -> k.missingTags))
      }
      val schema = out.schema
      val types = sources.map(s => FieldOps.get(schema, s).map(_._2))
      val cols = sources.map(s => FieldOps.getOrNull(schema, s))

      if (types.forall(_.isEmpty)) {
        // no source exists in the schema: nothing can ever be written
        out
      } else if (!k.merge) {
        if (sources.size == 1) {
          val v = cols.head
          out = RuleExec.write(out, pred && v.isNotNull, target, v, k)
        } else {
          val et = commonType(types.map(_.getOrElse(NullType)))
          val arr = array_compact(array(cols.map(_.cast(et)): _*))
          out = RuleExec.write(out, pred && size(arr) > 0, target, arr, k)
        }
      } else if (types.forall(_.exists(_.isInstanceOf[StructType]))) {
        // all dicts → one shallow-merged dict, later sources win
        val merged = sources.zip(cols).foldLeft(Option.empty[Column]) {
          case (acc, (s, cc)) =>
            val st = FieldOps.get(schema, s).get._2.asInstanceOf[StructType]
            val upd = st.fieldNames.foldLeft(acc) { (a, f) =>
              Some(a.fold(struct(cc.getField(f).as(f)))(
                _.withField(FieldOps.quote(f), cc.getField(f))))
            }
            upd
        }.get
        val anyPresent = cols.map(_.isNotNull).reduce(_ || _)
        out = RuleExec.write(out, pred && anyPresent, target, merged, k)
      } else {
        // flatten lists / wrap scalars, drop missing, order-preserving dedup
        val et = commonType(types.map(_.getOrElse(NullType)).map {
          case ArrayType(t, _) => t
          case t => t
        })
        val empty = array().cast(ArrayType(et))
        val pieces = types.zip(cols).map {
          case (Some(ArrayType(_, _)), cc) => coalesce(cc.cast(ArrayType(et)), empty)
          case (_, cc) => when(cc.isNotNull, array(cc.cast(et))).otherwise(empty)
        }
        val deduped = array_distinct(concat(pieces: _*))
        // merge+overwrite together = replace target with the deduped list
        // (_write_to_single_target disables merging after dedup when
        // overwrite_target is set, field_manager/processor.py:100-110)
        val k2 = if (k.overwrite) k.copy(merge = false) else k
        out = RuleExec.write(out, pred && size(deduped) > 0, target, deduped, k2)
      }
      out = RuleExec.deleteSourcesIf(out, pred, k, sources)
    }
    out
  }

  /** Config value → typed literal Column (string/long/double/boolean,
    * lists as typed arrays).
    */
  private def anyLit(v: Any): Column = v match {
    case null => lit(null)
    case b: Boolean => lit(b)
    case i: Int => lit(i.toLong)
    case l: Long => lit(l)
    case bi: BigInt => lit(bi.toLong)
    case d: Double => lit(d)
    case s: Seq[_] => array(s.map(anyLit): _*)
    case l: java.util.List[_] =>
      array(scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq.map(anyLit): _*)
    case other => lit(other.toString)
  }

  /** Widest common type for heterogenous value lists: identical → itself,
    * all-numeric → double, else string (JSON-faithful for the common
    * cases; Python lists are heterogenous, Spark arrays are not).
    */
  private def commonType(ts: Seq[org.apache.spark.sql.types.DataType]): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    val real = ts.filterNot(_ == NullType)
    if (real.isEmpty) StringType
    else if (real.distinct.size == 1) real.head
    else if (real.forall(_.isInstanceOf[NumericType])) DoubleType
    else StringType
  }

  /** One mutating rule on one stage type → guarded projection. */
  private def applyRule(df0: DataFrame, ptype: String, rule: RuleSpec): DataFrame = {
    val ast = graft.filter.LuceneParser.parseOrThrow(rule.filter)
    val matchAll = ast == graft.filter.FilterAst.Always(true)
    // The reference matches the rule filter against the event BEFORE the
    // transform mutates it (abc/processor.py:212-215). A raw Column pred
    // would re-evaluate against mutated fields mid-rule (e.g.
    // delete_source_fields nulling a field the filter tests), so the
    // match verdict is materialized into a temp column first.
    val df = if (matchAll) df0 else
      df0.withColumn("__pred",
        coalesce(FilterCompiler.compile(ast, df0.schema), lit(false)))
    val pred = if (matchAll) lit(true) else col("__pred")
    val c = rule.config
    // shorthand: guard `op`'s writes to `targets` by the rule filter,
    // skipping the blend entirely for match-all rules (keeps those plans
    // as narrow as before)
    def g(d: DataFrame, targets: Seq[String])(op: DataFrame => DataFrame): DataFrame =
      if (matchAll) op(d) else guardedApply(d, pred, targets)(op)
    val out = ptype match {
      case "field_manager" =>
        applyFieldManager(df, pred, ptype, c)

      case "dissector" =>
        // full section grammar incl. append/indirect/strip/position/convert
        // — see graft.operators.Dissect
        val k = RuleExec.knobs(ptype, c)
        Dissect.apply(df, pred, k, cfgMap(c, "mapping").toSeq,
          cfgMap(c, "convert_datatype").toSeq)

      case "grokker" =>
        // full grok engine: ecs-v1 set + rule `patterns`, pattern lists
        // first-match-wins, [a][b] targets, :int/:float conversions,
        // strict-write conflicts, missing/no-match tags
        // (grokker/processor.py:89-120, util/grok/grok.py:86-200)
        val k = RuleExec.knobs(ptype, c)
        val custom = cfgMap(c, "patterns") ++ cfgMap(c, "custom_patterns")
        val mappingRaw = c.getOrElse("mapping", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]].toSeq
        var out = df
        val matchedCols = scala.collection.mutable.ArrayBuffer.empty[Column]
        val temps = scala.collection.mutable.ArrayBuffer.empty[String]
        mappingRaw.zipWithIndex.foreach { case ((src, patternsAny), i) =>
          val patterns = patternsAny match {
            case s: String => Seq(s)
            case xs: Seq[_] => xs.map(_.toString)
            case other => Seq(other.toString)
          }
          val compiled = patterns.map(Grok.compile(_, custom))
          FieldOps.get(out.schema, src) match {
            case None => // missing source handled collectively below
            case Some((srcCol, _)) =>
              // native expression (graft.functions.GrokMatchExpr): the
              // former per-row Scala UDF broke codegen on the events hot
              // path; same first-match-wins sweep + backtracking budget
              val matchCol = org.apache.spark.sql.GraftSqlBridge.column(
                graft.functions.GrokMatchExpr(
                  org.apache.spark.sql.GraftSqlBridge.expression(
                    srcCol.cast("string")), compiled))
              val mc = s"__gk_$i"
              temps += mc
              out = out.withColumn(mc,
                when(coalesce(pred, lit(false)), matchCol))
              val matched = col(mc).isNotNull && size(col(mc)) > 0
              matchedCols += coalesce(matched, lit(false))
              // plan-time union of this source's capture targets; later
              // captures of a target win (reference dict merge), so take
              // the LAST conv per target
              val targetConv = compiled.flatMap(_.captures)
                .map(cap => cap.target -> cap.conv).toMap
              targetConv.foreach { case (target, conv) =>
                val raw = element_at(col(mc), target)
                val value = conv match {
                  case Some("int") => raw.cast("long")
                  case Some("float") => raw.cast("double")
                  case _ => raw
                }
                out = RuleExec.write(out, matched && raw.isNotNull, target, value, k)
              }
          }
        }
        val anyMissing = RuleExec.anyMissing(out.schema, mappingRaw.map(_._1))
        val anyMatched = matchedCols.foldLeft(lit(false))(_ || _)
        val noMatchGate =
          if (k.ignoreMissing) lit(true) else !anyMissing
        out = RuleExec.addTags(out,
          (if (k.ignoreMissing) Nil
           else Seq((pred && anyMissing) -> k.missingTags)) ++
          Seq((pred && noMatchGate && !anyMatched) -> k.failureTags))
        temps.foldLeft(out)(_ drop _)


      case "timestamper" =>
        // try formats in order; output = Python isoformat in target_timezone
        // with +00:00→Z (timestamper/processor.py:42-67)
        val k = RuleExec.knobs(ptype, c)
        val src = k.sourceFields.headOption.getOrElse("@timestamp")
        val formats = c.get("source_format") match {
          case Some(s: String) => Seq(s)
          case Some(xs: Seq[_]) => xs.map(_.toString)
          case _ => Seq("ISO8601")
        }
        val sourceTz = cfgStrOpt(c, "source_timezone").getOrElse("UTC")
        val targetTz = cfgStrOpt(c, "target_timezone").getOrElse("UTC")
        val target = k.targetField.getOrElse("@timestamp")
        RuleExec.applyValueRule(df, pred, k, target,
          { schema =>
            val s = FieldOps.getOrNull(schema, src).cast("string")
            val ts = coalesce(formats.map(f =>
              TimeOps.parseWithFormat(s, f, sourceTz)): _*)
            TimeOps.isoformatIn(ts, targetTz)
          },
          sourcesOverride = Some(Seq(src)))

      case "dropper" =>
        // match-all rules drop the column from the schema; selective rules
        // null the field on matching rows only (static schema can't drop
        // per-row, and null ⇔ absent for our tables)
        val dropFields = cfgSeq(c, "drop")
        if (matchAll) Structural.dropper(df, dropFields)
        else dropFields.foldLeft(df) { (d, f) =>
          if (!FieldOps.exists(d.schema, f)) d
          else FieldOps.set(d, f,
            when(pred, lit(null)).otherwise(FieldOps.getOrNull(d.schema, f)))
        }

      case "concatenator" =>
        // join the present source values with the separator; missing
        // sources tag-but-continue; "" when nothing is present is still
        // written (Python "".join([]), concatenator/processor.py:51-60)
        val k = RuleExec.knobs(ptype, c)
        val sep = cfgStr(c, "separator")
        RuleExec.applyValueRule(df, pred, k, cfgStr(c, "target_field"),
          schema => concat_ws(sep,
            k.sourceFields.map(s => FieldOps.getOrNull(schema, s).cast("string")): _*),
          computeOk = Some(_ => lit(true)),
          proceedOnMissing = true)

      case "calculator" =>
        // source_fields derive from the template (calculator/rule.py:174);
        // missing → skip + missing tag, "" → skip + failure tag, parse
        // failure (null result from non-null sources) → failure tag
        val template = cfgStr(c, "calc")
        val k0 = RuleExec.knobs(ptype, c)
        val k = if (k0.sourceFields.nonEmpty) k0
          else k0.copy(sourceFields = Calculator.sources(template))
        RuleExec.applyValueRule(df, pred, k, cfgStr(c, "target_field"),
          schema => Calculator.compile(template, schema),
          // NaN/Infinity = the reference's ArithmeticError/timeout path
          // (div by zero, runaway pow) → failure tag, no write
          computeOk = Some { schema =>
            val v = Calculator.compile(template, schema)
            val d = v.cast("double")
            v.isNotNull && !isnan(d) && d =!= Double.PositiveInfinity &&
              d =!= Double.NegativeInfinity
          },
          checkEmpty = true)

      case "generic_adder" =>
        // additions from inline `add` plus YAML file(s) via add_from_file,
        // resolved once at plan time (generic_adder/rule.py:25-74);
        // only_first_existing_file picks the first readable path
        val k = RuleExec.knobs(ptype, c)
        val inline = c.getOrElse("add", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]].toSeq
        val paths: Seq[String] = c.get("add_from_file") match {
          case Some(s: String) => Seq(s)
          case Some(xs: Seq[_]) => xs.map(_.toString)
          case _ => Seq.empty
        }
        val base = sys.props.get("graft.rule.base")
          .orElse(sys.env.get("GRAFT_RULE_BASE")).getOrElse(".")
        def resolvePath(p: String): java.io.File = {
          val f = new java.io.File(p)
          if (f.isAbsolute) f else new java.io.File(base, p)
        }
        val usable =
          if (c.get("only_first_existing_file").exists(_.toString == "true"))
            paths.map(resolvePath).find(_.exists()).toSeq
          else paths.map(resolvePath)
        val fromFiles = usable.filter(_.exists()).flatMap { f =>
          val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          new org.yaml.snakeyaml.Yaml().load[Any](text) match {
            case m: java.util.Map[_, _] =>
              scala.jdk.CollectionConverters.MapHasAsScala(m).asScala.toSeq
                .map { case (kk, vv) => kk.toString -> (vv: Any) }
            case _ => Seq.empty
          }
        }
        (inline ++ fromFiles).foldLeft(df) { case (d, (path, v)) =>
          RuleExec.write(d, pred, path, anyLit(v), k)
        }

      case "string_splitter" =>
        // no delimiter = Python str.split(None): whitespace runs, empties
        // dropped; explicit delimiter keeps empties unless drop_empty
        // (string_splitter/processor.py:38-48); non-string source →
        // ProcessingWarning → failure tag
        val k = RuleExec.knobs(ptype, c)
        val src = k.sourceFields.head
        val delimOpt = cfgStrOpt(c, "delimiter")
        val dropEmpty = c.get("drop_empty").exists(_.toString == "true")
        RuleExec.applyValueRule(df, pred, k, k.targetField.getOrElse(src),
          { schema =>
            val sc = FieldOps.getOrNull(schema, src)
            val isStr = FieldOps.get(schema, src).exists(_._2 ==
              org.apache.spark.sql.types.StringType)
            if (!isStr) lit(null).cast("array<string>")
            else {
              val parts = delimOpt match {
                case Some(d) => split(sc, java.util.regex.Pattern.quote(d), -1)
                case None => split(regexp_replace(sc, "^\\s+|\\s+$", ""), "\\s+", -1)
              }
              if (dropEmpty || delimOpt.isEmpty)
                // Python's item.isspace() covers \t\n etc., not just spaces
                filter(parts, x => x =!= "" && !x.rlike("^\\s+$"))
              else parts
            }
          })

      case "requester" =>
        // templated HTTP enrichment (requester/processor.py:54-129):
        // ${field} refs across url/json/data/params are the source fields
        // (missing/empty → skip+tag); non-2xx or timeout → failure tag;
        // JSON responses land whole in target_field and/or via dotted
        // target_field_mapping extractions. External I/O runs in a
        // nondeterministic UDF with a pluggable transport.
        val k0 = RuleExec.knobs(ptype, c)
        val method = cfgStrOpt(c, "method").getOrElse("GET")
        val urlT = cfgStr(c, "url")
        def asJsonText(v: Any): String = v match {
          case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
            .map { case (kk, vv) => "\"" + kk + "\":" + asJsonText(vv) }
            .mkString("{", ",", "}")
          case s: Seq[_] => s.map(asJsonText).mkString("[", ",", "]")
          case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
          case null => "null"
          case other => other.toString
        }
        val jsonT = c.get("json").map(asJsonText)
        val dataT = cfgStrOpt(c, "data")
        val paramsT = c.get("params").map(asJsonText)
        val mappingPairs = cfgMap(c, "target_field_mapping").toSeq
        val templText = urlT + jsonT.getOrElse("") + dataT.getOrElse("") +
          paramsT.getOrElse("")
        val sources =
          if (k0.sourceFields.nonEmpty) k0.sourceFields
          else Requester.templateRefs(templText).distinct
        val k = k0.copy(sourceFields = sources)
        var out = df
        val schema = out.schema
        val miss = RuleExec.anyMissing(schema, sources)
        val empty0 = RuleExec.anyEmpty(schema, sources)
        // merge_with_target on a struct target merges INSIDE the UDF
        // (dict.update), then writes with overwrite
        val mergeExisting: Column = k.targetField
          .flatMap(t => FieldOps.get(schema, t)).collect {
            case (cc, _: org.apache.spark.sql.types.StructType) if k.merge =>
              to_json(cc)
          }.getOrElse(lit(null).cast("string"))
        val valueArr = array(sources.map(s =>
          FieldOps.getOrNull(schema, s).cast("string")): _*)
        val mappingSources = mappingPairs.map(_._1)
        val reqUdf = udf { (vals: Seq[String], mergeJson: String) =>
          Requester.invoke(method, urlT, jsonT, dataT, paramsT,
            mappingSources, Option(mergeJson), sources.zip(vals).toMap)
        }.asNondeterministic()
        out = out.withColumns(Map(
          "__rq_miss" -> coalesce(miss, lit(false)),
          "__rq_empty" -> (!coalesce(miss, lit(false)) && coalesce(empty0, lit(false)))))
        val eligible = coalesce(pred, lit(false)) &&
          !col("__rq_miss") && !col("__rq_empty")
        out = out.withColumn("__rq",
          when(eligible, reqUdf(valueArr, mergeExisting)))
        val targetJson = col("__rq").getField("_1")
        val mappingVals = col("__rq").getField("_2")
        val reqFailed = coalesce(col("__rq").getField("_3"), lit(false))
        k.targetField.foreach { t =>
          val kW = if (k.merge) k.copy(merge = false, overwrite = true) else k
          out = RuleExec.write(out, eligible && targetJson.isNotNull, t,
            parse_json(targetJson), kW)
        }
        mappingPairs.zipWithIndex.foreach { case ((_, tgt), i) =>
          val v = element_at(mappingVals, i + 1)
          out = RuleExec.write(out, eligible && v.isNotNull, tgt, parse_json(v), k)
        }
        out = RuleExec.addTags(out,
          (if (k.ignoreMissing) Nil
           else Seq((coalesce(pred, lit(false)) && col("__rq_miss")) -> k.missingTags)) ++
          Seq((coalesce(pred, lit(false)) && col("__rq_empty")) -> k.failureTags,
            (eligible && reqFailed) -> k.failureTags))
        out = RuleExec.deleteSourcesIf(out, pred, k, sources)
        out.drop("__rq", "__rq_miss", "__rq_empty")


      case "pseudonymizer" =>
        // regex-mapping-selected substring pseudonymization with URL-field
        // component handling (pseudonymizer/processor.py:274-366); regex
        // keywords resolve through the regex_mapping file at plan time
        val k = RuleExec.knobs(ptype, c)
        val mapping0 = cfgMap(c, "mapping")
        val mapping = if (mapping0.nonEmpty) mapping0 else cfgMap(c, "pseudonyms")
        val urlFields = cfgSeq(c, "url_fields").toSet
        val salt = cfgStrOpt(c, "hash_salt").getOrElse("")
        val regexMapping: Map[String, String] =
          cfgStrOpt(c, "regex_mapping").map { pth =>
            val base = sys.props.get("graft.rule.base")
              .orElse(sys.env.get("GRAFT_RULE_BASE")).getOrElse(".")
            val f0 = new java.io.File(pth)
            val f = if (f0.isAbsolute) f0 else new java.io.File(base, pth)
            val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
            new org.yaml.snakeyaml.Yaml().load[Any](text) match {
              case m: java.util.Map[_, _] =>
                scala.jdk.CollectionConverters.MapHasAsScala(m).asScala
                  .map { case (a, b) => a.toString -> b.toString }.toMap
              case _ => Map.empty[String, String]
            }
          }.getOrElse(Map.empty)
        var out = df
        if (!k.ignoreMissing) {
          val miss = RuleExec.anyMissing(out.schema, mapping.keys.toSeq)
          out = RuleExec.addTags(out, Seq((pred && miss) -> k.missingTags))
        }
        mapping.foreach { case (field, keyword) =>
          FieldOps.get(out.schema, field).foreach { case (srcCol, srcType) =>
            // unknown keyword = raw regex (engine-level convenience; the
            // reference rejects unknown keywords at setup)
            val regexStr = regexMapping.getOrElse(keyword, keyword)
            val isUrl = urlFields.contains(field)
            val pUdf = udf { (s: String) =>
              if (s == null) null
              else Pseudonymize.pseudonymizeField(
                java.util.regex.Pattern.compile(regexStr), isUrl, salt, s)
            }
            import org.apache.spark.sql.types.ArrayType
            val value = srcType match {
              case ArrayType(_, _) =>
                transform(srcCol.cast("array<string>"), x => pUdf(x))
              case _ => pUdf(srcCol.cast("string"))
            }
            val kW = k.copy(overwrite = true)
            out = RuleExec.write(out, pred && srcCol.isNotNull, field, value, kW)
          }
        }
        out


      case "generic_resolver" =>
        // ordered resolve_list (unanchored SEARCH, first match wins) plus
        // the file-based capture-group table: `resolve_from_file.pattern`
        // is anchored with a named `mapping` group whose capture keys into
        // the YAML additions table (generic_resolver/processor.py:137-203,
        // rule.py:281-300). Both compile to codegen'd expressions —
        // pattern tables become literal-map lookups, no UDF, no LRU
        // (Catalyst evaluates the compiled regex once per row).
        val k = RuleExec.knobs(ptype, c)
        val mapping = cfgMap(c, "field_mapping")
        val resolveListAny = c.getOrElse("resolve_list", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]].toSeq
        val ignoreCase = c.get("ignore_case").exists(_.toString == "true")
        val fromFileAny: Option[(String, Map[String, Any])] =
          c.get("resolve_from_file").map { rf =>
            val m = rf.asInstanceOf[Map[String, Any]]
            val path = m("path").toString
            val pattern = m("pattern").toString
            val base = sys.props.get("graft.rule.base")
              .orElse(sys.env.get("GRAFT_RULE_BASE")).getOrElse(".")
            val f0 = new java.io.File(path)
            val f = if (f0.isAbsolute) f0 else new java.io.File(base, path)
            val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
            val additions = new org.yaml.snakeyaml.Yaml().load[Any](text) match {
              case mm: java.util.Map[_, _] =>
                scala.jdk.CollectionConverters.MapHasAsScala(mm).asScala
                  .map { case (a, b) =>
                    (if (ignoreCase) a.toString.toUpperCase else a.toString) ->
                      toScalaAny(b)
                  }.toMap
              case _ => Map.empty[String, Any]
            }
            (pattern, additions)
          }
        // all-string tables take the fast path (string map lookups, merge
        // matrix, list-dup skip); any typed value (int/float/bool/list/
        // dict/null — reference resolve_list values are arbitrary JSON)
        // switches to the JSON/variant path below
        val allStrings = resolveListAny.forall(_._2.isInstanceOf[String]) &&
          fromFileAny.forall(_._2.values.forall(_.isInstanceOf[String]))
        var out = df
        if (!k.ignoreMissing) {
          val miss = RuleExec.anyMissing(out.schema, mapping.keys.toSeq)
          out = RuleExec.addTags(out, Seq((pred && miss) -> k.missingTags))
        }
        mapping.foreach { case (src, tgt) =>
          FieldOps.get(out.schema, src).foreach { case (srcCol0, _) =>
            val srcCol = srcCol0.cast("string")
            val flags = if (ignoreCase) "(?i)" else ""
            def fileResolvedWith(render: Any => Column): Option[Column] =
              fromFileAny.map { case (pattern, additions) =>
                val javaPattern = pattern.replace("(?P<", "(?<")
                val anchored = s"$flags^$javaPattern$$"
                val grpIdx = PatternOps.groupIndexOf(javaPattern, "mapping")
                val captured0 = regexp_extract(srcCol, anchored, grpIdx)
                val captured = if (ignoreCase) upper(captured0) else captured0
                val table = map(additions.toSeq.flatMap { case (mk, mv) =>
                  Seq(lit(mk), render(mv))
                }: _*)
                when(srcCol.rlike(anchored), element_at(table, captured))
              }
            if (allStrings) {
              val fileResolved = fileResolvedWith(v => lit(v.toString))
              val listResolved = coalesce(
                (resolveListAny.map { case (p, v) =>
                  when(srcCol.rlike(flags + p), lit(v.toString))
                } :+ lit(null).cast("string")): _*)
              val resolved = fileResolved
                .map(fr => coalesce(fr, listResolved)).getOrElse(listResolved)
              val existing = FieldOps.get(out.schema, tgt)
              // list target that already holds the content is left alone
              val dupSkip = existing.collect {
                case (cc, org.apache.spark.sql.types.ArrayType(_, _)) =>
                  array_contains(cc, resolved)
              }.getOrElse(lit(false))
              val value =
                if (k.merge && existing.isEmpty) array(resolved)
                else resolved
              out = RuleExec.write(out,
                pred && resolved.isNotNull && !coalesce(dupSkip, lit(false)),
                tgt, value, k)
            } else {
              // typed path: resolve in JSON space, merge shallow like
              // dict.update (helper.py:143-146), write as variant
              val fileResolved = fileResolvedWith(v => lit(jsonAny(v)))
              val listResolved = coalesce(
                (resolveListAny.map { case (p, v) =>
                  when(srcCol.rlike(flags + p), lit(jsonAny(v)))
                } :+ lit(null).cast("string")): _*)
              val resolvedJ = fileResolved
                .map(fr => coalesce(fr, listResolved)).getOrElse(listResolved)
              val existing = FieldOps.get(out.schema, tgt)
              val valueJ =
                if (k.merge) existing match {
                  case Some((ec, _: org.apache.spark.sql.types.StructType)) =>
                    jsonMergeUdf(to_json(ec), resolvedJ)
                  case _ => resolvedJ
                } else resolvedJ
              // merge handled above in JSON space → the write itself must
              // be allowed to replace the occupied target
              val kw = if (k.merge) k.copy(merge = false, overwrite = true)
                       else k.copy(merge = false)
              out = RuleExec.write(out, pred && resolvedJ.isNotNull,
                tgt, parse_json(valueJ), kw)
            }
          }
        }
        out


      case "deduplicator" =>
        // non-list fields are skipped (deduplicator/processor.py:42-44)
        cfgSeq(c, "fields").foldLeft(df) { (d, f) =>
          FieldOps.get(d.schema, f) match {
            case Some((cc, org.apache.spark.sql.types.ArrayType(_, _))) =>
              guardedSet(d, pred, f, array_distinct(cc))
            case _ => d
          }
        }

      case "labeler" =>
        // label: {category: [values]}; with a processor-level `schema` +
        // `include_parent_labels` (labeler/processor.py:93-97) each label
        // expands with its schema ancestors at plan time
        val schemaForParents =
          if (c.get("include_parent_labels").exists(_.toString == "true"))
            c.get("schema").map(_.toString).filter(_.nonEmpty)
              .map(graft.operators.Labeling.loadSchemaFile)
          else None
        c.getOrElse("label", Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
          .foldLeft(df) { case (d, (category, values)) =>
            val vals0 = values.asInstanceOf[Seq[Any]].map(_.toString)
            val vals = schemaForParents match {
              case Some(sch) => graft.operators.Labeling.expand(sch, category, vals0)
              case None => vals0
            }
            val path = s"label.$category"
            val existing = FieldOps.get(d.schema, path).map(_._1)
              .getOrElse(lit(null).cast("array<string>"))
            val merged = array_sort(array_distinct(concat(
              coalesce(existing, array().cast("array<string>")),
              array(vals.map(lit): _*))))
            guardedSet(d, pred, path, merged)
          }

      case "key_checker" =>
        // reference (key_checker/processor.py:41-59): dedup'd missing set;
        // no missing → no write at all; existing list target → set-union;
        // result sorted; write honors overwrite/merge knobs
        val k = RuleExec.knobs(ptype, c)
        val target = k.targetField.getOrElse("missing_fields")
        val required = k.sourceFields.distinct
        val missing = required.map { f =>
          if (FieldOps.exists(df.schema, f))
            when(FieldOps.getOrNull(df.schema, f).isNull, lit(f))
          else lit(f)
        }
        val arr = array_compact(array(missing: _*))
        val existingArr = FieldOps.get(df.schema, target) match {
          case Some((cc, org.apache.spark.sql.types.ArrayType(_, _))) =>
            coalesce(cc.cast("array<string>"), array().cast("array<string>"))
          case _ => array().cast("array<string>")
        }
        val unioned = array_sort(array_distinct(concat(arr, existingArr)))
        RuleExec.write(df, pred && size(arr) > 0, target, unioned, k)

      case "replacer" =>
        // template parsed at plan time; the partition-based rewrite runs
        // in a deterministic UDF (processor.py:61-131 semantics); a
        // non-matching template writes nothing
        val k = RuleExec.knobs(ptype, c)
        val overwrite = c.get("overwrite_target").forall(_.toString == "true") // default TRUE (rule.py:148)
        val kW = k.copy(overwrite = overwrite)
        val targetOpt = k.targetField.filter(_.nonEmpty)
        cfgMap(c, "mapping").toSeq.foldLeft(df) { case (d, (src, template)) =>
          val tmpl = Replacer.parseTemplate(template)
          val replaceUdf = udf { (s: String) =>
            // reference: str(None) == "None" reaches the prefix check
            val v = if (s == null) "None" else s
            if (!v.startsWith(tmpl.prefix)) None
            else Replacer.replaceByTemplates(tmpl, v)
          }
          var out = d
          val srcInfo = FieldOps.get(out.schema, src)
          if (srcInfo.isEmpty || srcInfo.exists(_._2 ==
              org.apache.spark.sql.types.NullType)) {
            if (!k.ignoreMissing)
              out = RuleExec.addTags(out, Seq(pred -> k.failureTags))
            out
          } else {
            val srcCol = srcInfo.get._1
            if (!k.ignoreMissing)
              out = RuleExec.addTags(out, Seq((pred && srcCol.isNull) -> k.failureTags))
            val result = replaceUdf(srcCol.cast("string"))
            out = out.withColumn("__rp", result)
            out = RuleExec.write(out, pred && col("__rp").isNotNull,
              targetOpt.getOrElse(src), col("__rp"), kW)
            out.drop("__rp")
          }
        }

      case "decoder" =>
        // all 11 reference formats (decoders.py:235-247); FieldManager
        // write semantics; any undecodable present value fails the whole
        // rule's writes (processor.py _decode returns [])
        val k = RuleExec.knobs(ptype, c)
        val format = cfgStrOpt(c, "source_format").getOrElse("json")
        val mappingPairs = cfgMap(c, "mapping").toSeq
        val mappingMode = mappingPairs.nonEmpty
        val pairs =
          if (mappingMode) mappingPairs
          else {
            val s = k.sourceFields.head
            Seq(s -> k.targetField.getOrElse(s))
          }
        var out = df
        val sources = pairs.map(_._1)
        if (!k.ignoreMissing) {
          val miss = RuleExec.anyMissing(out.schema, sources)
          out = RuleExec.addTags(out, Seq((pred && miss) -> k.missingTags))
        }
        val schema = out.schema
        val present = sources.map(s =>
          FieldOps.get(schema, s).map(_._1.isNotNull).getOrElse(lit(false)))
        // mapping path gates on Python truthiness (any("") is False →
        // silent skip); single-target only filters None
        val gate =
          if (mappingMode)
            sources.zip(present).map { case (s, p) =>
              p && FieldOps.getOrNull(schema, s).cast("string") =!= ""
            }.foldLeft(lit(false))(_ || _)
          else present.foldLeft(lit(false))(_ || _)
        val decoded = pairs.map { case (s, _) =>
          FieldOps.get(schema, s) match {
            case Some((cc, _)) => Decoders.decode(format, cc.cast("string"))
            case None => (lit(null), lit(true))
          }
        }
        val okAll = sources.zip(present).zip(decoded)
          .map { case ((_, p), (_, ok)) => !p || coalesce(ok, lit(false)) }
          .foldLeft(lit(true))(_ && _)
        out = out.withColumns(Map(
          "__dec_go" -> coalesce(pred && gate && okAll, lit(false)),
          "__dec_fail" -> coalesce(pred && gate && !okAll, lit(false))))
        pairs.zip(decoded).zip(present).foreach { case (((s, tgt), (v, _)), p) =>
          if (FieldOps.exists(schema, s))
            out = RuleExec.write(out, col("__dec_go") && p, tgt, v, k)
        }
        out = RuleExec.addTags(out, Seq(col("__dec_fail") -> k.failureTags))
        out = RuleExec.deleteSourcesIf(out, pred, k, sources)
        out.drop("__dec_go", "__dec_fail")

      case "datetime_extractor" =>
        val k = RuleExec.knobs(ptype, c)
        val src = cfgSeq(c, "source_fields").head
        val target = k.targetField.getOrElse("datetime")
        val value = TimeOps.datetimeParts(df, src)
        val srcCol = FieldOps.getOrNull(df.schema, src)
        var out = RuleExec.write(df, pred && srcCol.isNotNull, target, value, k)
        out = RuleExec.deleteSourcesIf(out, pred && srcCol.isNotNull, k, Seq(src))
        out

      case "timestamp_differ" =>
        // `diff: "${a:fmt} - ${b:fmt}"` → (a - b); ints are unix seconds,
        // fmt-less strings lenient ISO (timestamp_differ/processor.py:41-86)
        val diffTemplate = cfgStr(c, "diff")
        val parts = """\$\{([^}]*)\}""".r.findAllMatchIn(diffTemplate)
          .map(_.group(1)).toSeq
        require(parts.size == 2, s"diff template needs two fields: $diffTemplate")
        val specs = parts.map { body =>
          val i = body.indexOf(':')
          if (i < 0) (body, None) else (body.take(i), Some(body.drop(i + 1)))
        }
        val k0 = RuleExec.knobs(ptype, c)
        val k = k0.copy(sourceFields = specs.map(_._1))
        val outputFormat = cfgStrOpt(c, "output_format").getOrElse("seconds")
        val showUnit = c.get("show_unit").exists(_.toString == "true")
        RuleExec.applyValueRule(df, pred, k,
          k.targetField.getOrElse("time_diff"),
          { schema =>
            def inst(path: String, fmt: Option[String]): Column =
              FieldOps.get(schema, path) match {
                case Some((cc, org.apache.spark.sql.types.LongType)) =>
                  timestamp_seconds(cc)
                case other =>
                  val s = other.map(_._1).getOrElse(lit(null)).cast("string")
                  fmt match {
                    case Some(f) => TimeOps.parseWithFormat(s, f, "UTC")
                    case None => TimeOps.parseIso(s, "UTC")
                  }
              }
            val micros = unix_micros(inst(specs(0)._1, specs(0)._2)) -
              unix_micros(inst(specs(1)._1, specs(1)._2))
            val (digits, unit) = outputFormat match {
              case "milliseconds" => (3, " ms")
              case "nanoseconds" => (0, " ns")
              case _ => (6, " s")
            }
            val v = TimeOps.pyFloatOfMicros(micros, digits)
            if (showUnit) concat(v, lit(unit)) else v
          },
          checkEmpty = true)

      case "list_comparison" | "network_comparison"
          if c.contains("list_paths") || c.contains("list_file_paths") =>
        // file/HTTP comparison lists with ${LOGPREP_LIST} injection and
        // per-event ${dotted.field} dynamic URIs
        // (list_comparison/rule.py:360-455, processor.py:84-140)
        val k = RuleExec.knobs(ptype, c)
        val isNet = ptype == "network_comparison"
        val target = k.targetField.getOrElse(ptype)
        val base = cfgStrOpt(c, "list_search_base_path").getOrElse("")
        val isHttp = base.startsWith("http")
        val named = c.get("list_paths").map(_.asInstanceOf[Map[String, Any]].toSeq
          .map { case (n, pth) => n -> pth.toString }).getOrElse(Seq.empty)
        val files = cfgSeq(c, "list_file_paths").map { pth =>
          val name = if (isHttp) pth else pth.split("/").last
          name -> pth
        }
        val lists = named ++ files
        val names = lists.map(_._1)
        // URL template: LOGPREP_LIST injected literally, remaining ${ref}
        // placeholders resolve from the event per row
        def urlCol(schema: org.apache.spark.sql.types.StructType, path: String): Column = {
          val template = if (base.nonEmpty) base.replace("${LOGPREP_LIST}", path) else path
          val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
          val re = """\$\{([^}]+)\}""".r
          var last = 0
          re.findAllMatchIn(template).foreach { m =>
            if (m.start > last) parts += lit(template.substring(last, m.start))
            parts += coalesce(FieldOps.getOrNull(schema, m.group(1)).cast("string"), lit(""))
            last = m.end
          }
          if (last < template.length) parts += lit(template.substring(last))
          if (parts.isEmpty) lit(template) else concat(parts.toSeq: _*)
        }
        var out = df
        if (!k.ignoreMissing) {
          val miss = RuleExec.anyMissing(out.schema, k.sourceFields)
          out = RuleExec.addTags(out, Seq((pred && miss) -> k.missingTags))
        }
        val schema = out.schema
        val src = k.sourceFields.head
        val emptyArr = array().cast("array<string>")
        val values = FieldOps.get(schema, src) match {
          case Some((cc, org.apache.spark.sql.types.ArrayType(_, _))) =>
            coalesce(cc.cast("array<string>"), emptyArr)
          case Some((cc, _)) => when(cc.isNotNull, array(cc.cast("string"))).otherwise(emptyArr)
          case None => emptyArr
        }
        val urls = array(lists.map { case (_, pth) => urlCol(schema, pth) }: _*)
        val cmpUdf = udf { (vals: Seq[String], us: Seq[String]) =>
          val loaded = us.map(ListSources.load)
          if (loaded.exists(_.isEmpty)) (null: String, null: Seq[String], true, false)
          else {
            val anyInvalid = isNet && vals.exists(v => IpInfo.parse(v).isEmpty)
            val matching = names.zip(loaded).collect {
              case (n, Some(entries)) if vals.exists(v =>
                if (isNet) ListSources.ipInList(v, entries) else entries.contains(v)) => n
            }
            if (matching.nonEmpty) ("in_list", matching, false, anyInvalid)
            else ("not_in_list", names, false, anyInvalid)
          }
        }
        out = out.withColumn("__lc",
          when(coalesce(pred, lit(false)), cmpUdf(values, urls)))
        val key = col("__lc").getField("_1")
        val resNames = col("__lc").getField("_2")
        val err = coalesce(col("__lc").getField("_3"), lit(false))
        val warn = coalesce(col("__lc").getField("_4"), lit(false))
        out = out.withColumn("__lc_err",
          coalesce(pred, lit(false)) && (err || warn))
        val kM = k.copy(merge = true, overwrite = false)
        out = RuleExec.write(out, key === "in_list", s"$target.in_list", resNames, kM)
        out = RuleExec.write(out, key === "not_in_list", s"$target.not_in_list", resNames, kM)
        out = RuleExec.addTags(out, Seq(col("__lc_err") -> k.failureTags))
        out.drop("__lc", "__lc_err")

      case "list_comparison" =>
        val src = cfgSeq(c, "source_fields").head
        val target = cfgStrOpt(c, "target_field").getOrElse("list_comparison")
        val lists = c.getOrElse("lists", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]].map { case (k, v) =>
            k -> v.asInstanceOf[Seq[Any]].map(_.toString).toSet
          }
        g(df, Seq(s"$target.in_list", s"$target.not_in_list"))(
          Lookup.listComparison(_, src, target, lists))

      case "network_comparison" =>
        val src = cfgSeq(c, "source_fields").head
        val target = cfgStrOpt(c, "target_field").getOrElse("network_comparison")
        val nets = c.getOrElse("networks", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]].map { case (k, v) =>
            k -> v.asInstanceOf[Seq[Any]].map(_.toString)
          }
        g(df, Seq(s"$target.in_list", s"$target.not_in_list"))(
          Lookup.networkComparison(_, src, target, nets))

      case "ip_informer" =>
        // flat IP list (list-valued sources' elements first, then scalar
        // strings), per-IP stdlib-`ipaddress` property dict keyed by the
        // IP, invalid IPs dropped + warned (processor.py:47-86); dynamic
        // keys + mixed value types ride a variant column
        val k = RuleExec.knobs(ptype, c)
        val target = k.targetField.getOrElse("ip_info")
        val props = cfgSeq(c, "properties")
        var out = df
        if (!k.ignoreMissing) {
          val miss = RuleExec.anyMissing(out.schema, k.sourceFields)
          out = RuleExec.addTags(out, Seq((pred && miss) -> k.missingTags))
        }
        val schema = out.schema
        import org.apache.spark.sql.types.{ArrayType, StringType}
        val emptyArr = array().cast("array<string>")
        val listCols = k.sourceFields.flatMap(s => FieldOps.get(schema, s).collect {
          case (cc, ArrayType(_, _)) => coalesce(cc.cast("array<string>"), emptyArr)
        })
        val strCols = k.sourceFields.flatMap(s => FieldOps.get(schema, s).collect {
          case (cc, StringType) =>
            when(cc.isNotNull, array(cc)).otherwise(emptyArr)
        })
        val flat = concat((listCols ++ strCols :+ emptyArr): _*)
        val informUdf = udf((ips: Seq[String]) => IpInfo.inform(ips, props))
        out = out.withColumn("__ipi", when(coalesce(pred, lit(false)), informUdf(flat)))
        val json = col("__ipi").getField("_1")
        val invalid = coalesce(col("__ipi").getField("_2"), lit(false))
        out = out.withColumn("__ipi_inv", coalesce(pred, lit(false)) && invalid)
        out = RuleExec.write(out, coalesce(pred, lit(false)) && json.isNotNull,
          target, parse_json(json), k)
        out = RuleExec.addTags(out, Seq(col("__ipi_inv") -> k.failureTags))
        out.drop("__ipi", "__ipi_inv")

      case "domain_label_extractor" =>
        // reference contract (processor.py:74-140): IP source → tag
        // "ip_in_<source>", unrecognized TLD → "invalid_domain_in_<source>"
        // (APPENDED to the tagging field, insertion order kept); valid →
        // registered_domain / top_level_domain / subdomain written as
        // SIBLING subfields of target_field
        val k = RuleExec.knobs(ptype, c)
        val src = k.sourceFields.head
        val target = k.targetField.getOrElse("domain")
        val taggingField = cfgStrOpt(c, "tagging_field_name").getOrElse("tags")
        val tagSuffix = graft.filter.FilterCompiler.splitPath(src).mkString("_")
        val partsUdf = udf((s: String) => Lookup.domainParts(s))
        val srcCol = FieldOps.getOrNull(df.schema, src).cast("string")
        var out = df.withColumn("__dle", when(pred, partsUdf(srcCol)))
        if (!k.ignoreMissing) {
          val miss = RuleExec.anyMissing(out.schema, Seq(src))
          out = RuleExec.addTags(out, Seq((pred && miss) -> k.missingTags))
        }
        val kind = col("__dle").getField("kind")
        val tagVal = when(kind === 1, lit(s"ip_in_$tagSuffix"))
          .when(kind === 2, lit(s"invalid_domain_in_$tagSuffix"))
        val existingTags = FieldOps.get(out.schema, taggingField)
          .map(_._1.cast("array<string>"))
          .getOrElse(lit(null).cast("array<string>"))
        val appended = concat(
          coalesce(existingTags, array().cast("array<string>")), array(tagVal))
        out = FieldOps.set(out, taggingField,
          when(pred && tagVal.isNotNull, appended).otherwise(existingTags))
        def wv(d: DataFrame, sub: String, value: Column): DataFrame =
          RuleExec.write(d, pred && kind === 3, s"$target.$sub", value, k)
        out = wv(out, "registered_domain", col("__dle").getField("registered"))
        out = wv(out, "top_level_domain", col("__dle").getField("tld"))
        out = wv(out, "subdomain", col("__dle").getField("subdomain"))
        out = RuleExec.deleteSourcesIf(out, pred && kind === 3, k, Seq(src))
        out.drop("__dle")

      case "domain_resolver" =>
        // external-I/O stage: hostname extraction (urlsplit semantics,
        // processor.py:200-205) feeds the PLUGGABLE per-task resolver via
        // the mapPartitions+LRU shape (Lookup.enrichPartitionedOpt) —
        // connections and caches live in the executor, never the driver.
        // Container default = deterministic fake; prod installs real DNS;
        // conformance installs the reference suite's mocked answers.
        val k = RuleExec.knobs(ptype, c)
        val src = k.sourceFields.head
        val target = k.targetField.getOrElse("resolved_ip")
        val domUdf = udf((s: String) => Lookup.extractDomain(s))
        val srcCol = FieldOps.getOrNull(df.schema, src).cast("string")
        val staged = df.withColumn("__dr_dom", when(pred, domUdf(srcCol)))
        val resolved = Lookup.enrichPartitionedOpt(
          staged, "__dr_dom", "__dr_ip", DomainResolver.resolve)
        var out = RuleExec.write(resolved,
          pred && col("__dr_ip").isNotNull, target, col("__dr_ip"), k)
        out = RuleExec.deleteSourcesIf(out, pred && col("__dr_ip").isNotNull,
          k, Seq(src))
        out.drop("__dr_dom", "__dr_ip")

      case "geoip_enricher" =>
        // city lookup through the pluggable per-executor GeoIp.provider
        // (mmdb-file-backed in prod via GeoIp.mmdbProvider — the public
        // MaxMind-DB format reader); each GEOIP_DATA_STUBS entry writes to
        // its (possibly customize_target_subfields-remapped) dotted path,
        // None values skipped (processor.py:118-166, skip_none semantics)
        val k = RuleExec.knobs(ptype, c)
        val src = k.sourceFields.head
        val target = k.targetField.getOrElse("geoip")
        val customize = cfgMap(c, "customize_target_subfields")
        def pathFor(stub: String) = customize.getOrElse(stub, s"$target.$stub")
        val geoUdf = udf((ip: String) => GeoIp.udfLookup(ip))
        val srcCol = FieldOps.getOrNull(df.schema, src).cast("string")
        var out = df.withColumn("__geo", when(pred, geoUdf(srcCol)))
        if (!k.ignoreMissing) {
          val miss = RuleExec.anyMissing(out.schema, Seq(src))
          out = RuleExec.addTags(out, Seq((pred && miss) -> k.missingTags))
        }
        val found = col("__geo").isNotNull
        def w(d: DataFrame, stub: String, value: Column): DataFrame =
          RuleExec.write(d, pred && found && value.isNotNull,
            pathFor(stub), value, k)
        out = w(out, "type", when(found, lit("Feature")))
        out = w(out, "geometry.type", col("__geo").getField("geometryType"))
        out = w(out, "geometry.coordinates", col("__geo").getField("coordinates"))
        out = w(out, "properties.accuracy_radius", col("__geo").getField("accuracyRadius"))
        out = w(out, "properties.continent", col("__geo").getField("continent"))
        out = w(out, "properties.continent_code", col("__geo").getField("continentCode"))
        out = w(out, "properties.country", col("__geo").getField("country"))
        out = w(out, "properties.country_iso_code", col("__geo").getField("countryIso"))
        out = w(out, "properties.time_zone", col("__geo").getField("timeZone"))
        out = w(out, "properties.city", col("__geo").getField("city"))
        out = w(out, "properties.postal_code", col("__geo").getField("postalCode"))
        out = w(out, "properties.subdivision", col("__geo").getField("subdivision"))
        out = RuleExec.deleteSourcesIf(out, pred && found, k, Seq(src))
        out.drop("__geo")

      case "template_replacer" =>
        // replacement table from the inline `table` or the `template` YAML
        // file the reference uses (template_replacer/processor.py:60-190)
        val fileTable: Map[String, String] = cfgStrOpt(c, "template").map { pth =>
          val base = sys.props.get("graft.rule.base")
            .orElse(sys.env.get("GRAFT_RULE_BASE")).getOrElse(".")
          val f0 = new java.io.File(pth)
          val f = if (f0.isAbsolute) f0 else new java.io.File(base, pth)
          val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          new org.yaml.snakeyaml.Yaml().load[Any](text) match {
            case m: java.util.Map[_, _] =>
              scala.jdk.CollectionConverters.MapHasAsScala(m).asScala
                .map { case (a, b) => a.toString -> b.toString }.toMap
            case _ => Map.empty[String, String]
          }
        }.getOrElse(Map.empty)
        val table = cfgMap(c, "table") ++ fileTable
        val target = cfgStrOpt(c, "target_field").getOrElse("replaced")
        g(df, Seq(target))(Lookup.templateReplacer(_, cfgSeq(c, "fields"),
          cfgStrOpt(c, "delimiter").getOrElse("-"), target, table))

      case "clusterer" if c.contains("pattern") =>
        // the reference rule shape: pattern → repl substitution chained
        // ACROSS rules on a working signature text (`__clu_sig`, seeded
        // from the source on the first matching rule), then the cluster
        // signature = `<+>…</+>`-tagged regions joined by " ", prefixed
        // "facility , severity , " when the event carries syslog PRI
        // (clusterer/processor.py:132-161, signature_phase.py:59-120)
        val k = RuleExec.knobs(ptype, c)
        val src = k.sourceFields.headOption.getOrElse("message")
        val target = cfgStrOpt(c, "output_field_name").getOrElse("cluster_signature")
        val pattern = cfgStr(c, "pattern")
        val repl = cfgStr(c, "repl").replaceAll("""\\(\d)""", "\\$$1")
        val srcCol = FieldOps.getOrNull(df.schema, src).cast("string")
        val sigPrev =
          if (df.columns.contains("__clu_sig")) col("__clu_sig")
          else lit(null).cast("string")
        val base = coalesce(sigPrev, srcCol)
        val newSig = when(pred && base.isNotNull,
          regexp_replace(base, pattern, repl)).otherwise(sigPrev)
        var out = df.withColumn("__clu_sig", newSig)
        val parts = regexp_extract_all(col("__clu_sig"),
          lit("""<\+>(.*?)</\+>"""), lit(1))
        val msgSig = array_join(parts, " ")
        val fac = FieldOps.get(out.schema, "syslog.facility").map(_._1)
          .getOrElse(lit(null))
        val sev = FieldOps.get(out.schema, "event.severity").map(_._1)
          .getOrElse(lit(null))
        val fullSig = when(fac.isNotNull && sev.isNotNull,
          concat_ws(" , ", fac.cast("string"), sev.cast("string"), msgSig))
          .otherwise(msgSig)
        out = RuleExec.write(out, pred && col("__clu_sig").isNotNull,
          target, fullSig, k.copy(overwrite = true))
        out

      case "clusterer" =>
        val subs = cfgMap(c, "substitutions").toSeq
        val target = cfgStrOpt(c, "output_field_name").getOrElse("cluster_signature")
        g(df, Seq(target))(PatternOps.clusterer(_,
          cfgSeq(c, "source_fields").headOption.getOrElse("message"),
          target, subs,
          c.get("iterations").map(_.toString.toInt).getOrElse(1)))

      case "amides" =>
        val weights = cfgMap(c, "weights").map { case (k, v) => k -> v.toDouble }
        val target = cfgStrOpt(c, "target_field").getOrElse("amides")
        val thresholdOpt = c.get("decision_threshold").map(_.toString.toDouble)
        val modelsPath = cfgStrOpt(c, "models_path").map { pth =>
          val base = sys.props.get("graft.rule.base")
            .orElse(sys.env.get("GRAFT_RULE_BASE")).getOrElse(".")
          val f0 = new java.io.File(pth)
          (if (f0.isAbsolute) f0 else new java.io.File(base, pth)).getPath
        }
        g(df, Seq(target))(d =>
          if (weights.isEmpty && modelsPath.isDefined &&
              graft.operators.AmidesScored.isScoredArtifact(modelsPath.get)) {
            // full-fidelity scored path: TF-IDF + collapsed SVC +
            // MinMaxScaler export with rule attribution; memoized load +
            // file-identity model id so the result cache hits across
            // micro-batches
            val (model, modelId) =
              graft.operators.AmidesScored.loadCached(modelsPath.get)
            graft.operators.AmidesScored(d, cfgSeq(c, "source_fields").head,
              target, model,
              thresholdOpt.getOrElse(0.5),
              c.get("num_rule_attributions").map(_.toString.toInt).getOrElse(10),
              c.get("max_cache_entries").map(_.toString.toInt)
                .getOrElse(1024 * 1024),
              modelId)
          }
          else if (weights.isEmpty && modelsPath.isDefined)
            Detection.amidesFromArtifact(d, cfgSeq(c, "source_fields").head,
              target, modelsPath.get, thresholdOpt)
          else
            Detection.amides(d, cfgSeq(c, "source_fields").head, target,
              weights,
              c.get("bias").map(_.toString.toDouble).getOrElse(0.0),
              thresholdOpt.getOrElse(0.5)))

      case unknown =>
        throw new IllegalArgumentException(s"unknown processor type: $unknown")
    }
    out.drop("__pred")
  }
}
