package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.fields.FieldOps
import graft.filter.FilterCompiler

/** Detection / privacy processors — the side-output producers. In the
  * reference these append `(document, outputs)` tuples to
  * `ProcessorResult.data` routed to named sinks
  * (logprep/framework/pipeline.py:320-325); here each producer contributes
  * a derived DataFrame (`filter` + `select`) that the pipeline routes to
  * its own sink — in streaming, one query per (output, target) over the
  * shared processed stream.
  *
  *  - pre_detector  (reference: logprep/processor/pre_detector/processor.py:51-173,
  *    rule.py:175-243)
  *  - pseudonymizer (logprep/processor/pseudonymizer/processor.py:62-382)
  *  - amides        (logprep/processor/amides/processor.py:107-271)
  */
object Detection {

  /** One pre-detector rule: fire on the Lucene filter; emit the detection
    * sub-event. `detectionId` defaults to a deterministic sha2 of the rule
    * id + a caller-chosen event key (the reference uses uuid4 —
    * nondeterministic ids break exactly-once reprocessing on a cluster, so
    * the engine derives ids content-addressed; pass `uuid()` to match the
    * reference exactly).
    */
  case class PreDetectorRule(filter: String, id: String, title: String,
                             severity: String, mitre: Seq[String],
                             caseCondition: String = "directly",
                             description: String = "",
                             link: Option[String] = None,
                             timestampField: String = "@timestamp",
                             sourceFormat: String = "ISO8601",
                             sourceTimezone: String = "UTC",
                             targetTimezone: String = "UTC",
                             copyFields: Seq[String] = Seq("host.name"),
                             ipFields: Seq[String] = Seq.empty)

  /** Per-event detection id, shared by the detection sub-event and the
    * main event's added `pre_detection_id` (processor.py:152-158; the
    * reference uses uuid4 — nondeterministic ids break exactly-once
    * reprocessing on a cluster, so the engine derives ids
    * content-addressed from the event key).
    */
  def preDetectionId(eventKey: Column): Column =
    sha2(eventKey.cast("string"), 256)

  /** Emit the detection stream for a set of rules: union of per-rule
    * filtered projections (unionByName — rules may copy different field
    * sets). Catalyst merges the scans; with few rules this is a single
    * pass with `when`-guarded projections.
    *
    * Full reference sub-event shape (processor.py:157-175): detection
    * data + normalized `rule_filter` string + rule description +
    * `copy_fields_to_detection_event` subtrees (default `host.name`,
    * skip-missing) + the event's `timestamp_field` normalized to
    * isoformat + `creation_timestamp`.
    */
  def preDetector(df: DataFrame, rules: Seq[PreDetectorRule],
                  eventKey: Column,
                  alertList: IpAlerter.AlertList = IpAlerter.empty,
                  alertAsOf: java.time.Instant = java.time.Instant.now()): DataFrame = {
    val streams = rules.map { r =>
      val pred = FilterCompiler.predicate(r.filter, df.schema) &&
        ruleIpGate(df, r, alertList, alertAsOf)
      val ruleFilter = graft.filter.LuceneParser.parse(r.filter)
        .map(graft.filter.FilterAst.render).getOrElse(r.filter)
      val base = Seq(
        preDetectionId(eventKey).as("pre_detection_id"),
        lit(r.id).as("id"),
        lit(r.title).as("title"),
        lit(r.severity).as("severity"),
        array(r.mitre.map(lit): _*).as("mitre"),
        lit(r.caseCondition).as("case_condition"),
        lit(r.description).as("description"),
        lit(ruleFilter).as("rule_filter"),
        eventKey.as("event_key"),
        TimeOps.isoformatIn(current_timestamp(), "UTC")
          .as("creation_timestamp"))
      val linkCol = r.link.map(l => lit(l).as("link")).toSeq
      // the reference copies fields first and THEN overwrites with the
      // normalized timestamp (processor.py _apply_rules), so when a rule
      // lists its timestamp_field in copy_fields_to_detection_event the
      // normalized value must win: exclude it from the copies, not from
      // the normalized-ts column
      val copied = copiedFieldColumns(df,
        r.copyFields.filterNot(_ == r.timestampField))
      val ts = FieldOps.get(df.schema, r.timestampField)
        .map { case (c, _) =>
          when(c.isNotNull, TimeOps.isoformatIn(
            TimeOps.parseWithFormat(c.cast("string"), r.sourceFormat,
              r.sourceTimezone), r.targetTimezone)).as(r.timestampField)
        }.toSeq
      df.filter(pred).select(base ++ linkCol ++ copied ++ ts: _*)
    }
    streams.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Dotted source paths → nested struct columns on the detection event
    * (copy_fields_to_event, skip_missing=True).
    */
  private def copiedFieldColumns(df: DataFrame, fields: Seq[String]): Seq[Column] =
    Structural.nestedColumns(df, fields)

  /** The IP-alert gate (ip_alerter.py:82-90 via processor.py:137-141): a
    * rule WITHOUT `ip_fields` always detects; a rule WITH them detects
    * only when one of those event fields holds an IP with an unexpired
    * alert-list entry. Shared by the detection stream and the main
    * event's `pre_detection_id` link.
    */
  def ruleIpGate(df: DataFrame, r: PreDetectorRule,
                 alertList: IpAlerter.AlertList,
                 asOf: java.time.Instant): Column =
    if (r.ipFields.isEmpty) lit(true)
    else IpAlerter.anyFieldHit(df.schema, r.ipFields, alertList, asOf)

  /** pseudonymizer: replace the value (or regex-selected substrings) with
    * `<pseudonym:{sha256(salt + value)}>`; the (pseudonym → encrypted
    * original) mapping is emitted as a second DataFrame for the pseudonym
    * sink. Hashing is `sha2` (codegen'd); the reference's RSA/AES hybrid
    * encryption of originals is JCA work inside the mapping stream (kept
    * out of the hot path by design — only matching rows reach it).
    */
  def pseudonymize(df: DataFrame, source: String, target: String,
                   salt: String): DataFrame = {
    val src = FieldOps.getOrNull(df.schema, source).cast("string")
    val pseudo = concat(lit("<pseudonym:"),
      sha2(concat(lit(salt), src), 256), lit(">"))
    FieldOps.set(df, target, when(src.isNotNull, pseudo))
  }

  /** The pseudonym-mapping side output: distinct (pseudonym, origin). */
  def pseudonymMapping(df: DataFrame, source: String, salt: String): DataFrame = {
    val src = FieldOps.getOrNull(df.schema, source).cast("string")
    df.filter(src.isNotNull)
      .select(sha2(concat(lit(salt), src), 256).as("pseudonym"),
        src.as("origin"))
      .distinct()
  }

  /** GDPR-complete mapping stream: origins hybrid-encrypted under the
    * analyst public key (reference: encrypted pseudonym originals,
    * pseudonymizer/processor.py:62-382 + util/pseudo/encrypter.py). The
    * UDF is nondeterministic (fresh AES key + IV per value) and runs only
    * on the already-distinct mapping rows — matching rows only, never the
    * event hot path.
    */
  def pseudonymMappingEncrypted(df: DataFrame, source: String, salt: String,
                                rsaPublicKeyDer: Array[Byte]): DataFrame = {
    val encryptUdf = udf((origin: String) =>
      Crypto.encrypt(origin, rsaPublicKeyDer)).asNondeterministic()
    pseudonymMapping(df, source, salt)
      .withColumn("origin_encrypted", encryptUdf(col("origin")))
      .drop("origin")
  }

  /** amides: misuse-classification of command lines. The reference scores
    * a pickled scikit-learn TF-IDF + linear model; the engine's equivalent
    * is a broadcast (token → weight) map + bias evaluated as a pure
    * column expression: tokenize, look up weights, sum, sigmoid. Weights
    * ship from an exported model; here the caller passes them in.
    */
  def amides(df: DataFrame, source: String, target: String,
             weights: Map[String, Double], bias: Double,
             threshold: Double = 0.5): DataFrame = {
    val src = FieldOps.getOrNull(df.schema, source).cast("string")
    val tokens = split(lower(src), """[^a-z0-9_.-]+""")
    val wmap = map(weights.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val score = aggregate(tokens, lit(0.0),
      (acc, t) => acc + coalesce(element_at(wmap, t), lit(0.0)))
    val confidence = lit(1.0) / (lit(1.0) + exp((score + lit(bias)) * -1))
    FieldOps.set(df, target, struct(
      round(confidence, 6).as("confidence"),
      (confidence >= threshold).as("detected")))
  }

  /** [[amides]] with the model loaded from a `models_path` artifact — the
    * way a trained model actually ships (reference loads a models archive,
    * amides/processor.py:215-229).
    */
  def amidesFromArtifact(df: DataFrame, source: String, target: String,
                         modelsPath: String,
                         thresholdOverride: Option[Double] = None): DataFrame = {
    val m = AmidesModel.load(modelsPath)
    amides(df, source, target, m.weights, m.bias,
      thresholdOverride.orElse(m.threshold).getOrElse(0.5))
  }
}

/** amides model artifact: a .zip whose `model` entry (or a bare .json
  * file) holds `{"weights": {token: w}, "bias": b, "decision_threshold"}`
  * — the role of the reference's models_path archive (amides/processor.py:
  * 215-229, `_load_and_unpack_models`) re-expressed as an engine-portable
  * linear-model export instead of a pickled sklearn object (a pickle is
  * python-runtime-specific AND an arbitrary-code-execution surface; the
  * reference itself warns about this in its Config docs).
  */
object AmidesModel {
  final case class Model(weights: Map[String, Double], bias: Double,
                         threshold: Option[Double])

  def load(path: String): Model = {
    val text =
      if (path.endsWith(".zip")) {
        val zf = new java.util.zip.ZipFile(path)
        try {
          val entry = Option(zf.getEntry("model"))
            .getOrElse(zf.entries().nextElement())
          new String(zf.getInputStream(entry).readAllBytes(), "UTF-8")
        } finally zf.close()
      } else new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(text)
    def num(v: JValue): Double = v match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case JDecimal(d) => d.toDouble
      case _ => 0.0
    }
    val weights = (j \ "weights") match {
      case JObject(fs) => fs.map { case (k, v) => k -> num(v) }.toMap
      case _ => Map.empty[String, Double]
    }
    val bias = (j \ "bias") match { case JNothing => 0.0; case v => num(v) }
    val threshold = (j \ "decision_threshold") match {
      case JNothing => None
      case v => Some(num(v))
    }
    Model(weights, bias, threshold)
  }

  /** Write an artifact zip (used by tests and model-export tooling). */
  def write(path: String, m: Model): Unit = {
    val json = {
      val ws = m.weights.map { case (k, v) =>
        "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\":" + v
      }.mkString(",")
      val thr = m.threshold.map(t => s""","decision_threshold":$t""").getOrElse("")
      s"""{"weights":{$ws},"bias":${m.bias}$thr}"""
    }
    val out = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try {
      out.putNextEntry(new java.util.zip.ZipEntry("model"))
      out.write(json.getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
  }
}
