package graft.pipeline

/** The user-facing stage reference, reified: one entry per pipeline
  * stage type (processor / relational / curation) with a working YAML
  * example. `graft.Docs` renders this catalog into `doc/` (the engine's
  * analogue of the reference's sphinx processor pages), and
  * StageCatalogSpec force-compiles EVERY example — documentation that
  * stops compiling fails CI, so the pages cannot drift from the
  * compiler.
  *
  * `schemaKind` names the input-frame shape an example compiles
  * against: `events`-like, `documents`-like, `embeddings`-like typed
  * frames (with rows — training stages act at plan time), or `any`
  * (processors null-guard missing fields, so an empty dynamic frame
  * suffices — the TestConfig contract).
  */
final case class StageDoc(
    name: String,
    kind: String,          // processor | relational | curation
    summary: String,
    example: String,       // complete `pipeline:` YAML document
    schemaKind: String = "any",     // any | events | documents | embeddings | media
    oracle: Seq[String] = Nil,      // oracle queries gating the semantics
    notes: String = "")

object StageCatalog {

  private def y(s: String): String = s.stripMargin.trim + "\n"

  // ---- processors (reference parity; registry order) -----------------

  private val processors = Seq(
    StageDoc("field_manager", "processor",
      "Copy/move/merge source fields into a target (or field→field mapping), with merge/overwrite/delete flags.",
      y("""pipeline:
          |  - type: field_manager
          |    rules:
          |      - filter: "host.name"
          |        field_manager: {source_fields: [host.name], target_field: meta.host}"""),
      oracle = Seq("proc_field_manager")),
    StageDoc("dissector", "processor",
      "Logstash-dissect tokenizing: %{field} patterns with append/indirect/strip/position/convert operators.",
      y("""pipeline:
          |  - type: dissector
          |    rules:
          |      - filter: "message"
          |        dissector:
          |          mapping: {message: "%{meta.head} %{meta.rest}"}"""),
      oracle = Seq("proc_dissector", "proc_dissector_append")),
    StageDoc("grokker", "processor",
      "Grok patterns (vendored ecs-v1 set + custom), first-match-wins lists, native regex kernel.",
      y("""pipeline:
          |  - type: grokker
          |    rules:
          |      - filter: "message"
          |        grokker:
          |          mapping: {message: ["%{WORD:meta.first} %{GREEDYDATA:meta.rest}"]}"""),
      oracle = Seq("proc_grokker")),
    StageDoc("dropper", "processor",
      "Delete fields (optionally pruning emptied parents).",
      y("""pipeline:
          |  - type: dropper
          |    rules:
          |      - filter: "agent.ephemeral_id"
          |        dropper: {drop: [agent.ephemeral_id]}""")),
    StageDoc("deleter", "processor",
      "Drop the entire event when the filter matches (an anti-filter).",
      y("""pipeline:
          |  - type: deleter
          |    rules:
          |      - filter: "event_type: debug"
          |        deleter: {delete: true}"""),
      oracle = Seq("proc_deleter")),
    StageDoc("concatenator", "processor",
      "Join several source values with a separator into a target field.",
      y("""pipeline:
          |  - type: concatenator
          |    rules:
          |      - filter: "host.name AND log.level"
          |        concatenator:
          |          source_fields: [host.name, log.level]
          |          separator: "-"
          |          target_field: meta.hostlevel""")),
    StageDoc("calculator", "processor",
      "Arithmetic/comparison over ${field} templates, compiled to native Catalyst expressions at plan time.",
      y("""pipeline:
          |  - type: calculator
          |    rules:
          |      - filter: "event.code"
          |        calculator: {calc: "${event.code} + 1", target_field: meta.codeplus}""")),
    StageDoc("timestamper", "processor",
      "Parse a timestamp via a format list (ISO8601 | UNIX | strptime) with timezone handling, normalize to ISO-8601 Z.",
      y("""pipeline:
          |  - type: timestamper
          |    rules:
          |      - filter: "event.created"
          |        timestamper:
          |          source_fields: [event.created]
          |          source_format: [ISO8601]
          |          target_field: "@timestamp""""),
      oracle = Seq("proc_timestamper")),
    StageDoc("datetime_extractor", "processor",
      "Split a timestamp into a {year…microsecond, weekday, timezone} struct.",
      y("""pipeline:
          |  - type: datetime_extractor
          |    rules:
          |      - filter: "@timestamp"
          |        datetime_extractor:
          |          source_fields: ["@timestamp"]
          |          target_field: meta.dt"""),
      oracle = Seq("proc_datetime_extractor")),
    StageDoc("timestamp_differ", "processor",
      "Difference of two templated timestamps in s/ms/ns with optional unit suffix.",
      y("""pipeline:
          |  - type: timestamp_differ
          |    rules:
          |      - filter: "event.created AND @timestamp"
          |        timestamp_differ:
          |          diff: "${event.created:ISO8601} - ${@timestamp:ISO8601}"
          |          target_field: meta.age"""),
      oracle = Seq("proc_timestamp_differ")),
    StageDoc("string_splitter", "processor",
      "Split a string field by a delimiter into an array.",
      y("""pipeline:
          |  - type: string_splitter
          |    rules:
          |      - filter: "host.os.kernel"
          |        string_splitter:
          |          source_fields: [host.os.kernel]
          |          delimiter: " "
          |          target_field: meta.kernel_parts"""),
      oracle = Seq("proc_string_splitter")),
    StageDoc("replacer", "processor",
      "Template-based partial string rewrite: %{new} segments, wildcard keep, greedy |g.",
      y("""pipeline:
          |  - type: replacer
          |    rules:
          |      - filter: "log.level"
          |        replacer:
          |          mapping: {log.level: "normal%{}"}"""),
      oracle = Seq("proc_replacer", "proc_replacer_template")),
    StageDoc("generic_adder", "processor",
      "Add literal fields (inline or from a YAML file) under merge control.",
      y("""pipeline:
          |  - type: generic_adder
          |    rules:
          |      - filter: "*"
          |        generic_adder: {add: {meta.engine: graft}}"""),
      oracle = Seq("proc_generic_adder")),
    StageDoc("generic_resolver", "processor",
      "Regex-pattern table lookup: first matching pattern key maps to a value (inline list or file with capture pattern).",
      y("""pipeline:
          |  - type: generic_resolver
          |    rules:
          |      - filter: "log.level"
          |        generic_resolver:
          |          field_mapping: {log.level: meta.level_class}
          |          resolve_list: {"^inf": low, "^warn": mid, ".*": other}"""),
      oracle = Seq("proc_generic_resolver")),
    StageDoc("template_replacer", "processor",
      "Composite-key (e.g. provider-event_id) lookup into a template file.",
      y("""pipeline:
          |  - type: template_replacer
          |    rules:
          |      - filter: "winlog.channel"
          |        template_replacer:
          |          template: "tests/testdata/unit/template_replacer/replacer_template.yml"
          |          fields: [winlog.channel, winlog.event_id]
          |          delimiter: "-"
          |          target_field: message"""),
      oracle = Seq("proc_template_replacer"),
      notes = "The template path resolves through the getter layer (file:// or http(s):// with credentials)."),
    StageDoc("key_checker", "processor",
      "Report missing required fields into a target list.",
      y("""pipeline:
          |  - type: key_checker
          |    rules:
          |      - filter: "*"
          |        key_checker:
          |          source_fields: [host.name, meta.surely_missing]
          |          target_field: meta.missing"""),
      oracle = Seq("proc_key_checker")),
    StageDoc("deduplicator", "processor",
      "Order-preserving dedup of list-valued fields.",
      y("""pipeline:
          |  - type: deduplicator
          |    rules:
          |      - filter: "winlog.keywords"
          |        deduplicator: {fields: [winlog.keywords]}"""),
      oracle = Seq("proc_deduplicator")),
    StageDoc("labeler", "processor",
      "Add labels under label.<category> per a jsonref schema, with optional parent-label expansion.",
      y("""pipeline:
          |  - type: labeler
          |    rules:
          |      - filter: "winlog.api: \"wineventlog\""
          |        labeler:
          |          schema: "tests/testdata/acceptance/labeler/no_regex/labeling/schema.json"
          |          include_parent_labels: true
          |          label: {reporter: [windows]}"""),
      oracle = Seq("proc_labeler")),
    StageDoc("list_comparison", "processor",
      "Membership of a value in named term lists (inline, file, or credentialed HTTP) → in_list / not_in_list.",
      y("""pipeline:
          |  - type: list_comparison
          |    rules:
          |      - filter: "winlog.provider_name"
          |        list_comparison:
          |          source_fields: [winlog.provider_name]
          |          target_field: meta.provlist
          |          lists: {known_providers: [EventLog, VSS, volsnap]}"""),
      oracle = Seq("proc_list_comparison")),
    StageDoc("network_comparison", "processor",
      "IP membership in named CIDR sets (v4/v6).",
      y("""pipeline:
          |  - type: network_comparison
          |    rules:
          |      - filter: "host.ip"
          |        network_comparison:
          |          source_fields: [host.ip]
          |          target_field: meta.netcheck
          |          networks: {private10: ["10.0.0.0/8"]}"""),
      oracle = Seq("proc_network_comparison")),
    StageDoc("ip_informer", "processor",
      "Per-IP property map (version, is_private, …) for v4/v6.",
      y("""pipeline:
          |  - type: ip_informer
          |    rules:
          |      - filter: "host.ip"
          |        ip_informer: {source_fields: [host.ip], target_field: meta.ipinfo}"""),
      oracle = Seq("proc_ip_informer")),
    StageDoc("geoip_enricher", "processor",
      "MaxMind GeoLite2 lookup into a geo struct (real .mmdb reader, per-executor lazily opened).",
      y("""pipeline:
          |  - type: geoip_enricher
          |    rules:
          |      - filter: "host.ip"
          |        geoip_enricher: {source_fields: [host.ip], target_field: meta.geo}"""),
      oracle = Seq("proc_geoip_enricher")),
    StageDoc("domain_label_extractor", "processor",
      "Split a domain into registered/top-level/subdomain via the public-suffix list.",
      y("""pipeline:
          |  - type: domain_label_extractor
          |    rules:
          |      - filter: "agent.hostname"
          |        domain_label_extractor:
          |          source_fields: [agent.hostname]
          |          target_field: meta.domain"""),
      oracle = Seq("proc_domain_label_extractor")),
    StageDoc("domain_resolver", "processor",
      "DNS A-lookup with per-executor cache (pluggable resolver; container default is a deterministic fake).",
      y("""pipeline:
          |  - type: domain_resolver
          |    rules:
          |      - filter: "agent.hostname"
          |        domain_resolver: {source_fields: [agent.hostname]}"""),
      oracle = Seq("proc_domain_resolver")),
    StageDoc("requester", "processor",
      "Templated HTTP request per event through the credentialed transport; JSON/text response into target field(s).",
      y("""pipeline:
          |  - type: requester
          |    rules:
          |      - filter: "meta.needs_lookup"
          |        requester:
          |          method: GET
          |          url: "http://enrich.internal.example/api?q=${host.name}"
          |          target_field: meta.req"""),
      oracle = Seq("proc_requester")),
    StageDoc("pre_detector", "processor",
      "SIEM detection side output: on match emit a detection sub-event (id/title/severity/mitre…) routed to named outputs.",
      y("""pipeline:
          |  - type: pre_detector
          |    rules:
          |      - filter: "event_type: alert"
          |        pre_detector:
          |          id: example-rule
          |          title: suspicious activity
          |          severity: low
          |          mitre: [T0000]"""),
      oracle = Seq("proc_pre_detector")),
    StageDoc("pseudonymizer", "processor",
      "GDPR pseudonymization: regex-selected substrings → <pseudonym:sha256>, originals hybrid-encrypted as extra data.",
      y("""pipeline:
          |  - type: pseudonymizer
          |    rules:
          |      - filter: "winlog.event_data.SubjectUserName"
          |        pseudonymizer:
          |          mapping: {winlog.event_data.SubjectUserName: RE_WHOLE_FIELD}
          |          hash_salt: a_secret_tasty_ingredient
          |          regex_mapping: "tests/testdata/acceptance/pseudonymizer/regex_mapping.yml""""),
      oracle = Seq("proc_pseudonymizer", "proc_pseudonymizer_substring",
        "proc_pseudonym_mapping")),
    StageDoc("selective_extractor", "processor",
      "Project whitelisted fields into a sub-event routed to named outputs.",
      y("""pipeline:
          |  - type: selective_extractor
          |    rules:
          |      - filter: "*"
          |        selective_extractor:
          |          source_fields: [host.name]
          |          outputs: [{jsonl: extracted_topic}]"""),
      oracle = Seq("proc_selective_extractor")),
    StageDoc("clusterer", "processor",
      "SLCT/Drain-lite log clustering: tagged-signature substitutions, bounded fixpoint, signature output.",
      y("""pipeline:
          |  - type: clusterer
          |    rules:
          |      - filter: "message"
          |        clusterer:
          |          source_fields: [message]
          |          pattern: "service"
          |          repl: "<+>service</+>"
          |          output_field_name: meta.cluster"""),
      oracle = Seq("proc_clusterer")),
    StageDoc("amides", "processor",
      "AMIDES misuse detection on command lines: TF-IDF + linear model scoring with rule attribution.",
      y("""pipeline:
          |  - type: amides
          |    rules:
          |      - filter: "message"
          |        amides:
          |          source_fields: [message]
          |          weights: {service: 0.9, stopped: -0.3}
          |          decision_threshold: 0.5
          |          target_field: meta.amides"""),
      oracle = Seq("proc_amides")),
    StageDoc("decoder", "processor",
      "Decode a string field: json, base64, clf, nginx, syslog (3164/5424), logfmt, cri, docker, decolorize.",
      y("""pipeline:
          |  - type: decoder
          |    rules:
          |      - filter: "message"
          |        decoder:
          |          source_fields: [message]
          |          source_format: decolorize
          |          target_field: meta.msg_clean"""),
      oracle = Seq("proc_decoder_json", "proc_decoder_base64",
        "proc_decoder_clf", "proc_decoder_nginx", "proc_decoder_syslog",
        "proc_decoder_syslog5424", "proc_decoder_logfmt",
        "proc_decoder_cri", "proc_decoder_docker",
        "proc_decoder_decolorize")))

  // ---- relational stages (beyond the reference) ----------------------

  private val relational = Seq(
    StageDoc("aggregate", "relational",
      "groupBy + aggregations (count, count_distinct, sum, min, max, avg), with optional event-time windows + watermark on streams.",
      y("""pipeline:
          |  - type: aggregate
          |    filter: "NOT event_type: click"
          |    group_by: [event_type]
          |    aggregations:
          |      n: {fn: count}
          |      uniq_users: {fn: count_distinct, field: user_id}
          |      maxv: {fn: max, field: value}"""),
      schemaKind = "events", oracle = Seq("q13_pipeline_agg")),
    StageDoc("join", "relational",
      "Join against a side table (broadcast-pinnable for small dimensions).",
      y("""pipeline:
          |  - type: join
          |    right: {path: "/root/testdata/sf0.001/customer.parquet"}
          |    left_on: [user_id]
          |    right_on: [c_custkey]
          |    select: [c_custkey, c_mktsegment]
          |    broadcast: true"""),
      schemaKind = "events", oracle = Seq("q14_pipeline_join")),
    StageDoc("window_stats", "relational",
      "Analytic window functions with a `keep:` top-k filter in the engine's own filter DSL.",
      y("""pipeline:
          |  - type: window_stats
          |    partition_by: [user_id]
          |    order_by: [{field: value, desc: true}, {field: event_id}]
          |    functions:
          |      pos: {fn: row_number}
          |    keep: "pos:[1 TO 3]""""),
      schemaKind = "events", oracle = Seq("q15_pipeline_window")),
    StageDoc("dedup_events", "relational",
      "Key-based event dedup; on streams uses dropDuplicatesWithinWatermark (state horizon-bounded).",
      y("""pipeline:
          |  - type: dedup_events
          |    keys: [user_id, event_type]"""),
      schemaKind = "events", oracle = Seq("q16_pipeline_dedup")),
    StageDoc("sort_limit", "relational",
      "Total-ordered top-N (plans as TakeOrderedAndProject — no global sort materialization).",
      y("""pipeline:
          |  - type: sort_limit
          |    order_by: [{field: value, desc: true}, {field: event_id}]
          |    limit: 100"""),
      schemaKind = "events", oracle = Seq("q17_pipeline_sort")),
    StageDoc("sessionize", "relational",
      "Gap-based sessionization per key with per-session aggregations.",
      y("""pipeline:
          |  - type: sessionize
          |    keys: [user_id]
          |    time_field: ts
          |    gap: "30 minutes"
          |    aggregations:
          |      n_events: {fn: count}"""),
      schemaKind = "events", oracle = Seq("q18_pipeline_sessionize")),
    StageDoc("asof_join", "relational",
      "As-of join: latest right row at-or-before each left event time, per key.",
      y("""pipeline:
          |  - type: asof_join
          |    right: {path: "/root/testdata/sf0.001/orders.parquet"}
          |    left_on: user_id
          |    right_on: o_custkey
          |    left_time: ts
          |    right_time: o_orderdate
          |    select: [o_orderkey, o_totalprice]"""),
      schemaKind = "events", oracle = Seq("q12_asof_join")))

  // ---- curation stages (training-data pipeline) ----------------------

  private val curation = Seq(
    StageDoc("quality_signals", "curation",
      "Per-document text-quality columns: language id, quality score, token count, Gopher repetition trio, fingerprint.",
      y("""pipeline:
          |  - type: quality_signals
          |    text_field: text
          |    signals: [lang, quality, n_tokens, top_word_frac]"""),
      schemaKind = "documents",
      oracle = Seq("ml_lang_id", "ml_quality_score", "ml_token_count",
        "ml_repetition")),
    StageDoc("pii_redact", "curation",
      "Email/IP/phone redaction over the listed string fields (narrow, stream-safe).",
      y("""pipeline:
          |  - type: pii_redact
          |    fields: [text]"""),
      schemaKind = "documents", oracle = Seq("ml_pii_redact")),
    StageDoc("hash_split", "curation",
      "Content-addressed train/validation/test split — reproducible across engines and runs.",
      y("""pipeline:
          |  - type: hash_split
          |    id_field: doc_id
          |    train_pct: 80
          |    valid_pct: 10"""),
      schemaKind = "documents", oracle = Seq("ml_hash_split")),
    StageDoc("leakage_safe_split", "curation",
      "hash_split keyed by the near-dup cluster root: near-duplicates never straddle a train/test boundary (batch-only — LSH + component labeling).",
      y("""pipeline:
          |  - type: leakage_safe_split
          |    id_field: doc_id
          |    text_field: text
          |    train_pct: 80
          |    valid_pct: 10"""),
      schemaKind = "documents", oracle = Seq("ml_cluster_split"),
      notes = "The MinHash geometry takes the dedup_near knobs: explicit `bands:`/`rows_per_band:` win, `target_recall:` sizes both from the S-curve contract at the stage's `threshold:` (Dedup.minhashBandsRows), neither resolves the legacy 4x3."),
    StageDoc("quality_budget_select", "curation",
      "Exact quality-ranked token-budget cut: keep the best-scored documents until the budget fills (banded two-phase prefix sum - no global sort; batch-only).",
      y("""pipeline:
          |  - type: quality_signals
          |    text_field: text
          |    signals: [quality]
          |  - type: quality_budget_select
          |    id_field: doc_id
          |    score_field: q_quality
          |    budget: 1000000"""),
      schemaKind = "documents", oracle = Seq("ml_quality_budget")),
    StageDoc("weighted_sample", "curation",
      "Per-source mixture sampling at configured rates (content-addressed, rate-nested across changes).",
      y("""pipeline:
          |  - type: weighted_sample
          |    id_field: doc_id
          |    strata_field: source
          |    rates: {src0: 0.2, src1: 0.5}
          |    default_rate: 0.65"""),
      schemaKind = "documents", oracle = Seq("ml_weighted_sample")),
    StageDoc("stratified_sample", "curation",
      "Top-k rows per stratum (rank below the sort — plans as WindowGroupLimit).",
      y("""pipeline:
          |  - type: stratified_sample
          |    id_field: doc_id
          |    strata: [lang]
          |    k: 100"""),
      schemaKind = "documents", oracle = Seq("ml_stratified_sample")),
    StageDoc("dedup_exact", "curation",
      "Exact dedup on md5(text), min-id keeps — one shuffle on a 16-byte key.",
      y("""pipeline:
          |  - type: dedup_exact
          |    id_field: doc_id
          |    text_field: text"""),
      schemaKind = "documents", oracle = Seq("ml_dedup_exact")),
    StageDoc("dedup_near", "curation",
      "MinHash-LSH near-dup keep-set (banded join + label propagation), edits caught without O(n²) pairs.",
      y("""pipeline:
          |  - type: dedup_near
          |    id_field: doc_id
          |    text_field: text
          |    bands: 4
          |    rows_per_band: 3
          |    threshold: 0.5"""),
      schemaKind = "documents", oracle = Seq("ml_neardup_keep"),
      notes = "Geometry: explicit `bands:`/`rows_per_band:` win; `target_recall: <0..1>` sizes BOTH from the S-curve contract instead (Dedup.minhashBandsRows at the stage's `threshold:`, optional `noise_jaccard:` default threshold/2 and `max_noise_rate:` default 0.05) - e.g. threshold 0.8 at target 0.9 resolves 8x6 where the legacy 4x3 default is 0.943 recall but passes ~23% of half-threshold noise as candidates; low thresholds are HONESTLY expensive (Jaccard 0.5 at 0.9 recall needs 147 bands) and the sizing surfaces that cost instead of silently under-recalling. MinHash band keys are hash-sized, so recall does not decay with corpus growth - no expected_corpus involved, unlike the embedding geometry."),
    StageDoc("dedup_fuzzy", "curation",
      "Edit-distance dedup over a SHORT normalized field (titles, URLs, names) - the typo rung between dedup_exact (byte-identical) and dedup_near (shingle Jaccard, built for bodies); keep-one per edit-distance component.",
      y("""pipeline:
          |  - type: dedup_fuzzy
          |    id_field: doc_id
          |    text_field: text
          |    max_dist: 2
          |    blocking: segment   # segment (default) | length
          |    max_bucket_size: 4096"""),
      schemaKind = "documents",
      oracle = Seq("ml_fuzzy_pairs", "ml_fuzzy_pairs_seg", "ml_fuzzy_keep"),
      notes = "Blocking is LOSSLESS, and the oracle proves it: the DuckDB oracle runs the FULL quadratic join and value-identical output is the proof, not an assumption. Two schemes behind `blocking:`. `segment` (DEFAULT - the scale path): PassJoin pigeonhole keys (Li/Deng/Feng VLDB 2011) - an edit script of cost <= d cannot touch every one of d+1 segments, so some segment of the shorter string appears verbatim in the longer one within a +-shift window bounded by |s|+|delta-s| <= d; each row emits its d+1 segments plus the windowed probe substrings (~24 8-byte hashed keys/row at d=2, all whole-stage codegen), and candidates exist only where content actually shares a segment. `length` (legacy): bucket len/max_dist +-1 - cheapest emit constant, but its quadratic same-length term is the scale hazard: measured at 1M title-like rows, length banding needs ~10^10 candidate pairs uncapped, and AT THE SHIPPED CAP (4096) it exempts essentially every bucket and finds 36 of 10,000 planted typo pairs - a 99.6% silent recall loss, vs segment blocking's 230k candidates finding ALL 10,000 in comparable wall time. Verification is Spark's thresholded levenshtein (codegen'd, Ukkonen-banded O(max_dist*len) with early abort). Cap exemptions surface as stage=cap_fuzzy_dedup on /metrics; under segment blocking a capped key (a shared template slot like a common title prefix) degrades recall GRADUALLY - a pair's other untouched segments still find it - where the length band's cap zeroes the whole bucket. Keep semantics: component MINIMUM id survives (keepFromPairs label propagation - a typo CHAIN a~b~c collapses to one survivor even where a and c are beyond max_dist). Whole-corpus by construction - batch only."),
    StageDoc("dedup_media", "curation",
      "Perceptual media dedup: 64-bit aHash of the payload column (image grid cells or gain-invariant audio frame energies), banded Hamming pairs, keep-one per component; undecodable payloads always survive (batch-only).",
      y("""pipeline:
          |  - type: dedup_media
          |    id_field: doc_id
          |    bytes_field: payload
          |    media_kind: image   # image | audio
          |    max_hamming: 3"""),
      schemaKind = "media",
      oracle = Seq("ml_image_ahash", "ml_image_neardup", "ml_audio_ahash")),
    StageDoc("dedup_semantic", "curation",
      "SemDeDup: k-means-cluster the embedding column, drop rows with a senior in-cluster neighbor at cosine ≥ threshold.",
      y("""pipeline:
          |  - type: dedup_semantic
          |    id_field: vec_id
          |    vec_field: embedding
          |    clusters: 4
          |    iters: 2
          |    threshold: 0.9"""),
      schemaKind = "embeddings", oracle = Seq("ml_semantic_keep")),
    StageDoc("dedup_against", "curation",
      "Incremental dedup vs a STATIC reference corpus (exact digests, MinHash near mode, edit-distance fuzzy mode for short fields, or perceptual media mode for image/audio payloads).",
      y("""pipeline:
          |  - type: dedup_against
          |    id_field: doc_id
          |    text_field: text
          |    mode: exact         # exact | near | fuzzy | media
          |    reference:
          |      path: "/root/testdata/sf0.001/documents.parquet"
          |      text_field: text"""),
      schemaKind = "documents",
      oracle = Seq("ml_dedup_against", "ml_neardup_against",
        "ml_fuzzy_against", "ml_media_against"),
      notes = "Media mode (`bytes_field` on both sides) hashes incoming and reference payloads with the 64-bit perceptual aHash (`media_kind: image | audio` picks the kernel - image brightness-shift-invariant, audio gain-invariant over decoded PCM/FLAC samples; both sides must share the kind) and drops incoming rows within `max_hamming` of any reference fingerprint (banded join, joint bucket cap); undecodable incoming payloads never match and survive. A parquet `reference.path` written as a BucketedLayout (Curate --bucket-by) reads bucket-aware automatically - its keyed joins plan co-located. Near mode takes the dedup_near geometry knobs: explicit `bands:`/`rows_per_band:` win, `target_recall:` sizes both from the S-curve contract at the stage's `threshold:`, neither resolves the legacy 4x3. Fuzzy mode (`max_dist:`, default 2) is dedup_fuzzy's against leg - typo-rung decontamination over a SHORT normalized field (a one-typo copy of a benchmark title is byte-different AND can slip a conservative Jaccard threshold): dedup_fuzzy's blocking ladder with the sides kept apart (`blocking: segment` default - pigeonhole keys, either side of a cross pair can be the shorter one so candidates union the two oriented joins; `length` legacy bands), thresholded codegen levenshtein verify, joint cap surfaced as cap_fuzzy_against; null-field incoming rows always survive; its oracle runs the FULL quadratic reference join, so the value-identical gate is the losslessness proof."),
    StageDoc("dedup_spans", "curation",
      "Exact-substring removal (Lee et al. 2022): cut every token inside a corpus-duplicated substring of ≥ min_tokens.",
      y("""pipeline:
          |  - type: dedup_spans
          |    id_field: doc_id
          |    text_field: text
          |    min_tokens: 8"""),
      schemaKind = "documents",
      oracle = Seq("ml_dup_spans", "ml_dup_spans_clean")),
    StageDoc("dedup_paragraph", "curation",
      "Paragraph-level boilerplate dedup (MassiveText/RefinedWeb): remove every paragraph whose exact text occurs in >= min_docs distinct documents, reassemble the rest in order.",
      y("""pipeline:
          |  - type: dedup_paragraph
          |    id_field: doc_id
          |    text_field: text
          |    min_docs: 2
          |    delim: "\n{2,}"    # paragraph-split regex"""),
      schemaKind = "documents", oracle = Seq("ml_para_dedup"),
      notes = "The middle rung of the dedup ladder: whole-document dedup misses shared boilerplate inside otherwise-unique pages; token-positional dedup_spans is finer but costlier. Within-document repetition is deliberately kept (that is the repetition quality signal's business). Shuffles carry 16-byte paragraph digests, never text; adds n_paras / n_removed audit columns."),
    StageDoc("bm25_topk", "curation",
      "BM25 lexical retrieval: top-k corpus documents per query (Okapi with the always-positive Lucene idf) - the text-side complement of the embedding ANN family.",
      y("""pipeline:
          |  - type: bm25_topk
          |    id_field: doc_id
          |    text_field: text
          |    k: 10
          |    queries:
          |      path: "/root/testdata/sf0.001/documents.parquet"
          |      qid_field: doc_id
          |      qtext_field: text"""),
      schemaKind = "documents", oracle = Seq("ml_bm25_topk", "ml_bm25_index"),
      notes = "Terminal stage: the output is the result set (qid, rank, doc, score). The query set is small by definition, so its distinct terms broadcast and prune the corpus token stream BEFORE any shuffle - the only corpus-wide work runs at scan speed; per-query top-k plans as WindowGroupLimit. `index: {path}` (r16) serves the result set from a WRITTEN LexIndex (`Curate build-lex <corpus> <index> [idField textField [buckets]]` or ml/LexIndex.write) instead of scanning the piped corpus: tokenization and the df/dl/n_docs/avgdl statistics were paid once at write, the query terms' hash buckets prune `tb=` partitions at PLANNING and the term literal pushes into row-group stats, so a query reads O(query terms) of the postings - bit-identical scores to the full-scan path (same aggregates, same term-score expression; the shared oracle SQL proves it). k1/b stay query-time knobs; id_field/text_field alongside `index:` refuse as dead config (the index pinned its columns at write). The frozen index is IMMUTABLE by contract - BM25's df/avgdl drift under append is a correctness drift, unlike ANN's recall drift, so its honest refresh is re-index on a cadence (`build-lex --check` prices when). `index:` ALSO serves a growing lex_ingest store (r17; the reader dispatches on the marker's layout): there n_docs/avgdl/df compute from exactly the committed batches at read, so a corpus that keeps growing retrieves current without any re-index - see the lex_ingest page for the trade-off. `queries: input` (r17) flips the stage into the retrieval-SERVICE shape (the ann_topk convention): the piped rows ARE the query set (top-level `qid_field:`/`qtext_field:` name their columns) - inside StreamRunner each micro-batch of arriving queries retrieves and the result set flows to the sink; it REQUIRES `index:` (no corpus in the pipe), and over a lex_ingest store each micro-batch is served the statistics of exactly what is committed at that instant - ingest and serve concurrently (e2e-gated: a document ingested between micro-batches is retrievable in the next)."),
    StageDoc("hybrid_topk", "curation",
      "Hybrid retrieval: BM25 lexical top-fetch_k and exact-cosine embedding top-fetch_k over the same corpus, reciprocal-rank-fused (RRF) to top-k per query.",
      y("""pipeline:
          |  - type: hybrid_topk
          |    id_field: doc_id
          |    text_field: text
          |    vec_field: embedding
          |    k: 10
          |    fetch_k: 20         # per-channel depth before fusion
          |    rrf_k: 60           # RRF constant (Cormack et al. 2009)
          |    queries:
          |      path: "/tmp/graft-hybrid-queries"   # parquet with qid + qtext + qvec
          |      qid_field: qid
          |      qtext_field: qtext
          |      qvec_field: qvec"""),
      schemaKind = "hybrid", oracle = Seq("ml_hybrid_topk", "ml_hybrid_index"),
      notes = "The standard two-channel retrieval shape: the term-match channel wins on names and rare tokens, the embedding channel wins on paraphrase, and reciprocal-rank fusion (score = sum over channels of weight/(rrf_k + rank); `lex_weight:`/`sem_weight:` default 1.0 - weighted RRF biases a channel without re-introducing score calibration, weight 0 silences a channel ENTIRELY: since r17 the silenced channel's plan is not even CONSTRUCTED, so its schema requirements are waived with it - `lex_weight: 0` retrieves from a text-less corpus/query set, `sem_weight: 0` from a vector-less one. BEHAVIOR CHANGE vs pre-r16 configs: a silenced channel's docs no longer ride in as score-0 tail fillers, so a query can return FEWER than k rows than the same config returned before r16, and all-zero weights now refuse instead of returning unranked fillers) combines them WITHOUT score calibration - a log-scale BM25 and a [-1, 1] cosine fuse on ranks alone, which is why RRF is the standard combiner. A channel miss is not fatal (the fusion is a union: a query with zero lexical hits still retrieves semantically). Terminal stage, output = (qid, rank, id, score); queries carry BOTH a text and a vector column and are small by definition (side-table convention), so both channels broadcast the query side - the corpus never shuffles, and the fusion input is at most 2 * |queries| * fetch_k rank rows. The semantic channel is exact cosine over the piped corpus by default; `index: {path}` serves it from a PRE-WRITTEN ANN index instead (the ann_topk dispatch, shared code: marker kind picks flat | sq8 | pq, probe-union bucket pruning at planning, `nprobe:` or - flat only - `target_recall:`; training knobs alongside `index:` refuse as dead config, codes-only + target_recall refuses) - at index scale retrieval reads only the probed bucket directories instead of re-scanning the full vector column per query batch, and the piped input feeds BM25 alone (it need not carry `vec_field`). `lex_index: {path}` (r16) serves the LEXICAL channel from a written LexIndex (see bm25_topk `index:`) — with both knobs set the piped input is fully unused and retrieval reads O(query terms) of the postings plus the probed ANN buckets: the full index-scale hybrid. `queries: input` flips the stage into the retrieval-SERVICE shape (the ann_topk convention): the piped rows ARE the query set (top-level `qid_field:`/`qtext_field:`/`qvec_field:` name their columns) — inside StreamRunner each micro-batch of arriving queries retrieves hybrid and the result set flows to the sink; there is no corpus in the pipe, so it REQUIRES `index: {path}` (semantic) plus exactly ONE lexical leg: `corpus: {path}` (full-scan BM25 per batch - idf/avgdl recompute over the side table, the honest cost of corpus-statistics retrieval; keep it materialized small at high batch rates) or `lex_index: {path}` (the index-scale shape). Refuses `target_recall:` (per-batch re-tuning - tune once with a side-table config, pin `nprobe:`). Each document contributes at most one reciprocal term per channel, so the fused sum is order-insensitive and round(6) makes the oracle gate exact. Whole-corpus statistics (BM25 idf/avgdl) make it batch-only outside StreamRunner's micro-batch scope, the bm25_topk rule."),
    StageDoc("ann_topk", "curation",
      "Embedding similarity search: top-k corpus rows per query vector (cosine) - bm25_topk's sibling on the vector column, from exact baseline to probe-pruned written indexes.",
      y("""pipeline:
          |  - type: ann_topk
          |    id_field: vec_id
          |    vec_field: embedding
          |    mode: brute         # brute (exact) | ivf (scale path)
          |    k: 5
          |    queries:
          |      path: "/root/testdata/sf0.001/embeddings.parquet"
          |      qid_field: vec_id
          |      qvec_field: embedding"""),
      schemaKind = "embeddings",
      oracle = Seq("ml_ann_pipeline", "ml_embed_topk", "ml_ivf_kmeans_topk"),
      notes = "Terminal stage: the output IS the result set (qid, rank, id, sim). `mode: brute` broadcasts the (small-by-definition) query set against ONE corpus scan - exact, no corpus shuffle, per-query top-k as a partitioned window. `mode: ivf` trains centroids at plan time over the input corpus (`trainer: maximin` default; `kmeans` is the SQL-replayable trainer oracle configs use) and scans only each query's `nprobe` best buckets. Probe width: `nprobe:` explicit, or `target_recall: <0..1>` - Recall.tuneNprobe measures recall@k of a content-addressed 16-query sample against exact brute-force truth and binary-refines to the minimal passing width (IVF recall has no closed form: it depends on how the corpus clusters around the trained centroids, so the contract is MEASURED, where the LSH stages' target_recall is modeled); the two knobs refuse together. `index: {path}` searches a PRE-WRITTEN bucket-partitioned index instead of the piped input - the 100 TB query path: the probe union collects to a literal so bucket pruning happens at PLANNING time, one broadcast join restricts rows to the queries that probed their bucket, one job for the whole query set. The marker's kind dispatches flat | sq8 | pq (the index-size ladder: dim*4 -> dim+8 -> m bytes/vector); marker geometry is authoritative, so training knobs alongside `index:` refuse loudly as dead config, and `target_recall:` on a codes-only index (sq8/pq) refuses - no exact truth inside the index to tune against (tune on the flat index or corpus, pin `nprobe:` here). Ingested (ann_ingest) and single-write indexes read identically. `queries: input` flips the stage into the retrieval-SERVICE shape: the piped rows ARE the query set (top-level `qid_field:`/`qvec_field:` name their columns), searched against `index:` - inside StreamRunner each micro-batch of arriving queries is served from the written index and the result set flows to the sink (real-time retrieval; the e2e gates it); it requires `index:` (there is no corpus in the pipe) and refuses `target_recall:` (the tuner would re-measure per micro-batch - tune once with a side-table config, pin `nprobe:`). Whole-corpus semantics otherwise - batch only outside StreamRunner's micro-batch scope."),
    StageDoc("ann_ingest", "curation",
      "Incremental ANN index build: append each batch's embeddings into a growing bid-partitioned IVF index (flat or SQ8-compressed) that ann_topk `index:` then searches with unchanged planning-time pruning.",
      y("""pipeline:
          |  - type: ann_ingest
          |    id_field: vec_id
          |    vec_field: embedding
          |    index:
          |      path: "/tmp/graft-docs-ann-index"
          |    create:
          |      centroids: 2      # trained on the FIRST batch
          |      kind: flat        # flat | sq8 | pq (codes-only rungs)
          |    compact_every: 64   # self-fold after N unfolded batches
          |    batch_id: example-batch"""),
      schemaKind = "embeddings",
      oracle = Seq("ml_ann_ingest"),
      notes = "Rows pass through unchanged - ingest stages label/copy state, they never filter. The GramStore commit discipline applied to the IVF layout: the geometry marker (kind + centroids + layout) is written BEFORE any data, each batch is ONE bid=<batch_id>/bucket=N partition committed by an atomic rename (the rename IS the commit point), the seen-check is an O(1) directory probe plus the marker's folded ledger - so at-least-once delivery ingests each batch EXACTLY once under a crash at any point, and crash-abandoned staging is reclaimed by the retry. Geometry pins at creation: `create:` trains centroids on the FIRST batch (maximin; its distribution fixes the bucket geometry for the index's lifetime - re-index to retrain, the dedup_ingest re-banding convention; a tuned nprobe restores recall against drift meanwhile at a visible probe-width cost). IvfIngest.compact (CLI: `Curate compact-ann <path>`) folds the per-batch partitions into one bid=__compact partition with ONE file per bucket and records folded batch ids in the marker's ledger (replays of folded batches still no-op) - the small-files control that keeps a year of batches from turning partition discovery into the dominant query cost; the fold commits by park-swap (an interrupted swap rolls back on the next writer entry) and readers stay safe across the swap instant (they resolve through the parked copy, which survives until the next writer entry). `compact_every: N` makes the fold SELF-TRIGGERING (r16): once the unfolded batch-partition count reaches N after a committed append, the stage folds the store in the same writer turn - safe under at-least-once delivery because the ledger no-ops replays of folded batches and the trigger fires only on a batch THIS call committed (a replay never re-folds); measured motivation: the uncompacted read path degrades 3.1x at just 100 batches. Batch mode REQUIRES explicit `batch_id:` (a random id per run would double-ingest re-runs); streaming uses the checkpoint attempt token automatically, so failed-sink replays no-op. Dry-run (suppressStateWrites) writes nothing. SINGLE-WRITER per index: serialize appends and compactions; readers are safe alongside a writer. Kinds span the full index-size ladder: `flat` (dim*4 B/vector, tunable/exact-verifiable), `sq8` (dim+8), `pq` (m bytes/vector - `create: {kind: pq, m:, pq_k:}` trains the residual codebooks on the first batch alongside the centroids, both frozen in the marker; the shared row builder makes ingested codes bit-identical to the one-shot ivfPqWriteIndex layout)."),
    StageDoc("lex_ingest", "curation",
      "Incremental BM25 index build: append each batch's postings into a growing bid-partitioned lex store that bm25_topk `index:` / hybrid_topk `lex_index:` then serve with statistics computed from exactly the committed batches.",
      y("""pipeline:
          |  - type: lex_ingest
          |    id_field: doc_id
          |    text_field: text
          |    index:
          |      path: "/tmp/graft-docs-lex-store"
          |    buckets: 64         # term-hash geometry, pinned at creation
          |    compact_every: 64   # self-fold after N unfolded batches
          |    batch_id: example-batch"""),
      schemaKind = "documents",
      oracle = Seq("ml_bm25_ingest"),
      notes = "ann_ingest's term-channel twin, and the STRUCTURAL fix for frozen-LexIndex staleness: the frozen layout pins df/n_docs/avgdl at write, so every later document is invisible until a re-index (`doc_drift_pct` IS that blind fraction, measured in the r17 lexdrift table); here NOTHING is frozen. df was already a read-time aggregate over the read postings in the frozen layout, so growing the postings grows df correctly for free; n_docs/avgdl become read-time sums over tiny per-batch stats sidecars (`_graft_lex_stats.json`, shipped inside each batch partition by the commit rename; O(batches) metadata reads, bounded by compaction). Retrieval through the SAME reader (`bm25_topk index:` dispatches on the marker's layout) is exact BM25 over exactly the committed batches, always - scores match the full-scan path up to the floating-point summation order of avgdl, which the 6-decimal rounding erases (the shared oracle SQL gates it). Rows pass through unchanged - ingest stages label/copy state, they never filter. The GramStore commit discipline: marker (bucket geometry + folded ledger) BEFORE any data, one bid=<batch_id>/tb=<bucket> partition per batch committed by an atomic rename, O(1) replay no-op via the directory probe plus the folded ledger. Reads prune exactly as the frozen layout: query-term hash buckets prune `tb=` partitions at PLANNING inside every batch, the term literal pushes into row-group stats - O(query terms) of postings per query, never the corpus. `buckets:` binds only at creation (the marker is authoritative; a disagreeing explicit knob refuses). LexIngest.compact (CLI: `Curate compact-lex <path>`) folds batch partitions into one bid=__compact with ONE file per term bucket + merged stats, folded ids into the marker ledger; `compact_every: N` makes it self-triggering (the ann_ingest contract: trigger only on a batch THIS call committed, replays never re-fold). Batch mode REQUIRES explicit `batch_id:`; streaming uses the checkpoint attempt token. SINGLE-WRITER per store; readers are safe alongside a writer (ParkSwap). Caller discipline: the store does not dedup ids - a doc id appended twice double-counts in df/n_docs (the IvfIngest two-vectors rule); feed it admitted rows (downstream of dedup_ingest) or accept the count. Trade-off vs the frozen index, stated: per-batch tb partitioning writes up to `buckets` files per batch (compaction is the control), and the frozen layout remains the right choice for a corpus that does not grow between rebuilds. `Curate migrate-lex <frozenIndex> <store>` adopts an existing frozen index into a fresh store WITHOUT re-tokenizing (one re-layout commit; the frozen corpus becomes the store's first batch) - the upgrade path when a frozen deployment's corpus starts growing."),
    StageDoc("pca_project", "curation",
      "Project embeddings onto a PCA basis trained on the input corpus (optionally whitened) - embedding post-processing before ANN indexing or semantic dedup.",
      y("""pipeline:
          |  - type: pca_project
          |    vec_field: embedding
          |    dim: 64
          |    components: 8
          |    whiten: true
          |    target_field: pca"""),
      schemaKind = "embeddings", oracle = Seq("ml_embed_covariance"),
      notes = "Training is ONE map-side-combined moment aggregate (dim^2 doubles to the driver - the distributed kernel is the oracle-gated ml_embed_covariance); the eigensolve is driver-local Jacobi (model-sized, corpus-independent) and the projection a narrow native kernel carrying basis+mean as plan references. Malformed vectors project to null."),
    StageDoc("cluster_sample", "curation",
      "Cluster-balanced diversity sample: deterministic k-means over the embedding column, then at most per_cluster rows kept per cluster (content-addressed order) - every embedding-space region survives a downsample.",
      y("""pipeline:
          |  - type: cluster_sample
          |    id_field: vec_id
          |    vec_field: embedding
          |    k: 8
          |    dim: 64
          |    iters: 1
          |    per_cluster: 1000"""),
      schemaKind = "embeddings",
      oracle = Seq("ml_kmeans_assign", "ml_cluster_sample"),
      notes = "Lloyd k-means with hash-partition init and 6-decimal centroid snapping (the oracle replays the exact trajectory in SQL). Training is iters+1 map-side-combined aggregates, k*dim doubles to the driver each - corpus-size-independent driver state; assignment is a narrow native argmin kernel (centroids ride as ONE plan reference) and the per-cluster cap plans as WindowGroupLimit below the sort. The composed stage input is shared across training rounds + the sampling pass via lazy cache (`materialize: path` spills to parquet instead). Malformed vectors (wrong dim, null elements) are excluded from training AND output."),
    StageDoc("temperature_sample", "curation",
      "Temperature-based mixture sampling (mT5, Xue et al. 2021): stratum share proportional to n^alpha - alpha < 1 up-samples tail strata (low-resource languages, rare sources), content-addressed keeps.",
      y("""pipeline:
          |  - type: temperature_sample
          |    id_field: doc_id
          |    strata_field: source
          |    alpha: 0.3
          |    fraction: 0.5"""),
      schemaKind = "documents",
      oracle = Seq("ml_temperature_sample"),
      notes = "Rates are min(1, fraction*N*p_s/n_s) with p_s = n_s^alpha / sum_t n_t^alpha, computed from ONE plan-time count aggregate (<= strata rows to the driver); the keep filter is the narrow hashBucket convention (reproducible across engines/runs, no RNG). Rows with a NULL stratum drop. Expected counts are statistical (hash-uniform) - the token_budget_sample note. Whole-corpus (rates need full stratum counts) - batch only."),
    StageDoc("knn_graph", "curation",
      "Approximate k-NN graph over the embedding column: every node's top-k cosine neighbors among its banded-LSH candidates - edges (src, rank, dst, sim) as the result set.",
      y("""pipeline:
          |  - type: knn_graph
          |    id_field: vec_id
          |    vec_field: embedding
          |    dim: 64
          |    k: 10
          |    max_bucket_size: 4096"""),
      schemaKind = "embeddings",
      oracle = Seq("ml_knn_graph"),
      notes = "The NN-descent seed / graph-dedup / label-propagation structure; exact all-pairs is O(n^2) by definition, so the LSH candidate set IS the scale path (0.8 recall@5 floor spec-gated on the clustered fixture). GEOMETRY SELF-SIZES from the corpus at plan time by default (one count(), Similarity.scaledLshGeometry: r = ceil(log2(n/8)) planes and bands, min 8x8 - identical to the old fixed default up to ~2k rows): a fixed 8x8 keyspace saturates as the corpus grows (measured 98.7x candidate pairs at 10x rows), and because oversized buckets are exempted from pairing, saturation silently DROPS recall rather than blowing the join up. Explicit `bands:`/`planes_per_band:` override the self-sizing. `target_recall: <0..1>` (optional `recall_cosine:`, default 0.9) upgrades the sizing to Similarity.recallLshBandsPlanes: r still comes from the occupancy law but the band count grows past r until the analytic OR-of-bands recall at recall_cosine reaches the target - the square b=r geometry's recall@0.9 decays ~2.5 points/decade (measured r15: 0.9805 -> 0.9576 -> 0.9297 across three corpus decades) and this knob holds it flat (~0.99 measured at every tier) at an explicit, linear b/r candidate-work cost (1.2x/1.6x/2.2x at the three tiers). Output is EDGES, not the input schema (the bm25_topk result-set precedent). Candidate generation shares the cosineNearDupPairs plan (capped buckets, one scoring per pair); both directed edges come from one pass and per-node top-k plans as WindowGroupLimit. Whole-corpus by construction - batch only."),
    StageDoc("cluster_assign", "curation",
      "Narrow embedding-cluster labeling: plan-time-trained deterministic k-means centroids, nearest-centroid label per row (malformed vectors label null, rows never drop).",
      y("""pipeline:
          |  - type: cluster_assign
          |    id_field: vec_id
          |    vec_field: embedding
          |    k: 8
          |    dim: 64
          |    iters: 1
          |    target_field: cluster
          |    train: {path: "/root/testdata/sf0.001/embeddings.parquet"}"""),
      schemaKind = "embeddings",
      oracle = Seq("ml_kmeans_assign"),
      notes = "With `train: {path, vec_field, id_field, format}` the centroids come from a reference table at plan time (the perplexity_score train: convention) and the stage is STREAM-SAFE - assignment is the narrow native argmin kernel with centroids riding as one plan reference. Without `train:` the k-means runs over the input corpus itself (whole-corpus semantics - refused on streaming inputs at compile time), and the composed input is shared across the training rounds + labeling pass via lazy cache (`materialize: path` spills to parquet instead - the 100 TB form). Training cost: iters+1 map-side-combined aggregates over the training table, k*dim doubles to the driver each."),
    StageDoc("stats_ingest", "curation",
      "Incremental corpus statistics: append this batch's gram counts (orders 1..n) to a growing GramStore and pass rows through unchanged.",
      y("""pipeline:
          |  - type: stats_ingest
          |    text_field: text
          |    store: "/tmp/graft-docs-gram-store"
          |    orders: 2
          |    compact_every: 64   # self-fold after N unfolded batches
          |    batch_id: example-batch"""),
      schemaKind = "documents",
      oracle = Seq("ml_bigram_xent_store", "ml_trigram_backoff_store"),
      notes = "The tap that keeps a reference LM's count tables current as data lands: each batch pays ONE fused count pass (vocabulary-of-batch rows landing as their own bid=<batch_id> partition), and `perplexity_score train: {store: ...}` then retrains from the merged vocabulary-sized table instead of re-scanning the exemplar corpus - batch counts sum EXACTLY to one-shot counts, so store-trained scores are bit-identical (oracle-gated, bigram AND trigram). Idempotent per batch id UNDER A CRASH AT ANY POINT (r14): the marker (orders pin + compaction ledger) is written before any data, each batch commits by one atomic rename from a hidden staging dir, and the seen-check is an O(1) directory probe plus a ledger lookup - never a store scan, so per-batch overhead stays constant at production batch counts. Streaming runs use the checkpoint attempt token (replays are no-ops); batch runs must supply `batch_id:` explicitly - a random id per run would double-count re-runs, which corrupts every score trained afterwards. GramStore.compact folds per-batch partitions into one and records the folded batch ids in the marker's ledger, so a batch replayed after compaction still no-ops; an interrupted park-swap rolls back intact on the next entry. `compact_every: N` (r16) makes the fold self-triggering once the unfolded batch-partition count reaches N after a committed append - the ann_ingest contract (ledger no-ops folded replays; a replay never re-folds). SINGLE-WRITER per store: appends and compactions must be serialized (Structured Streaming's one-query-per-checkpoint already is); readers are safe alongside a writer."),
    StageDoc("dedup_ingest", "curation",
      "Incremental-ingestion dedup with a GROWING key store: batch N's admitted keys reject batch N+1 duplicates.",
      y("""pipeline:
          |  - type: dedup_ingest
          |    id_field: doc_id
          |    text_field: text
          |    store: "/tmp/graft-docs-ingest-keys"
          |    mode: near          # exact (default) | near | fuzzy | embedding | media
          |    bands: 4
          |    rows_per_band: 3
          |    shingle_k: 3
          |    threshold: 0.8      # near: min signature-agreement fraction
          |    compact_every: 64   # self-fold after N committed appends"""),
      schemaKind = "documents",
      oracle = Seq("ml_fuzzy_ingest"),
      notes = "State = one 16-byte digest per distinct admitted text (exact), plus one n-long MinHash signature (near); bounded by corpus cardinality, not stream length. Fuzzy mode (`max_dist:`, default 2) is dedup_fuzzy's ingest leg over a SHORT normalized field (titles, URLs, names): state per admitted row = the RAW string itself (fstr) - recomparable at ANY max_dist, so the distance is decision-side and never marker-pinned (only the mode is; the field-choice consistency obligation is the caller's, exactly as exact mode's md5 key); rejection = within-batch senior or stored string at <= max_dist edits (dedup_fuzzy's lossless blocking ladder, `blocking: segment` default with `length` legacy bands; thresholded codegen levenshtein verify; cap exemptions surface as cap_ingest_fuzzy); its oracle (ml_fuzzy_ingest) replays the two-batch semantics against full quadratic levenshtein joins in DuckDB. Near mode rejects on LSH band match verified at >= ceil(threshold*n) matching signature components - the constant-state estimate of n-gram Jaccard. Embedding mode (`vec_field`, `dim`, cosine `threshold`) is streaming SEMANTIC dedup: state per admitted vector = sign-LSH band keys + the SQ8-quantized vector (dim+8 bytes, raw floats never stored); rejection = band match verified at quantized-cosine >= threshold, symmetric because both sides decode from SQ8. Size the LSH geometry with `expected_corpus: <rows>` at store CREATION (Similarity.scaledLshBandsPlanes - an ingest store cannot count a corpus that has not arrived, so declare the order of magnitude being built toward and err HIGH: oversizing costs a few extra narrow band keys, undersizing saturates the keyspace and silently drops near-dup recall via the bucket-cap exemption); explicit `bands:`/`planes_per_band:` override, and with neither knob the legacy 8x8 applies (adequate to ~2k vectors). Adding `target_recall: <0..1>` (optional `recall_cosine:`, default = the stage's cosine `threshold:`) grows the pinned band count past r until the analytic OR-of-bands recall at recall_cosine reaches the target (Similarity.recallLshBandsPlanes) - the square b=r sizing holds candidate work to n*log n but its recall@threshold decays ~2.5 points/decade (measured r15), and this is the knob that buys the decay back at an explicit linear b/r cost instead of surfacing as a production dedup-rate drift; it requires expected_corpus (refused loudly without - band sizing is a function of the corpus size being built toward). The geometry is pinned in the store marker: RE-BANDING = re-ingest into a fresh store with the new knob (band keys of different geometry are incomparable; the marker refuses the mismatch loudly). Media mode (`bytes_field`) keys on the 64-bit perceptual aHash of the payload - `media_kind: image` (default; re-encodes and brightness shifts collapse) or `media_kind: audio` (gain shifts and lossless FLAC re-encodes collapse; decoded-sample frame energies); undecodable payloads fall back to exact-bytes md5. A media store mixes with NO text-keyed mode AND no other media_kind - both fingerprint spaces are 16-hex longs, so the kind is part of the contract marker (legacy kind-less media markers read as image-keyed). `compact_every: N` (r17) makes the key-store fold self-triggering: once N committed non-empty appends accumulate (counted in the store's `_graft_folds.json` ledger - metadata-only, maintained only when the knob is set), the stage folds the store to one row per key in the same writer turn. The fold is REPLAY-SAFE because it PRESERVES each surviving row's attempt token instead of re-stamping under a fresh epoch (pre-r17 the epoch fold made an attempt replayed from before the fold find its own keys foreign and DROP its rows, which is why the knob used to refuse): under the single-writer discipline each key is stored under exactly one token, so a replayed batch still recognizes its own keys and re-admits its rows - zero lost, zero duplicated (streaming e2e-gated). The fold commits via ParkSwap (build complete beside the store incl. marker + reset ledger, park, swap); the parked pre-fold copy survives writer entries for a grace window (60 s, age-gated r17) and until at latest the NEXT FOLD (which must clear the park target), so a reader that timed out into the parked copy keeps its files for max(grace, fold cadence) - not merely until the next micro-batch. `Curate compact-store` runs the same fold offline (single-writer: no concurrent appending stream; concurrent readers are fine and resolve through the parked copy)."),
    StageDoc("text_normalize", "curation",
      "In-place pretraining text cleanup: HTML-tag strip, control-char drop, entity decode (&amp; last - no double-decode), Unicode NFC (native kernel), whitespace collapse + trim.",
      y("""pipeline:
          |  - type: text_normalize
          |    fields: [text]
          |    c4_lines: false
          |    dedup_lines: false"""),
      schemaKind = "documents",
      oracle = Seq("ml_text_normalize", "ml_dedup_lines",
        "ml_c4_line_filter"),
      notes = "Narrow, stream-safe, fully codegen'd (the NFC step is a native Catalyst expression, not a UDF). Run BEFORE quality signals / dedup / tokenization. Optional line-level passes run before the whitespace collapse erases line structure: `c4_lines:` keeps only terminal-punctuation lines with >= c4_min_words words (C4; default 5, the paper rule), then `dedup_lines:` drops within-doc duplicate lines keep-first (RefinedWeb)."),
    StageDoc("media_envelope", "curation",
      "Attach a typed `<kind>_features` struct parsed from an opaque binary column: REAL container-header parsers for all four modalities — image (PNG/JPEG/GIF), audio (RIFF/WAVE, FLAC), doc (PDF), video (MP4/ISO-BMFF) — and a REAL image pixel fact (mean_luma via the in-JDK javax.imageio codecs, Rec.601 weighting, null when the payload doesn't decode).",
      y("""pipeline:
          |  - type: media_envelope
          |    bytes_field: payload
          |    kind: video         # image | audio | audio_pcm | doc | video"""),
      schemaKind = "media",
      oracle = Seq("ml_multimodal_decode", "ml_multimodal_audio",
        "ml_multimodal_pdf", "ml_multimodal_video", "ml_multimodal_pixels",
        "ml_audio_pcm"),
      notes = "Narrow and stream-safe (batched mapPartitions - a real decoder amortizes its init per task, never per row). Malformed or unrecognized headers yield null structs, never failed jobs. audio_pcm reads raw integer-PCM samples (peak/mean/rms - no codec needed); only compressed audio samples (FLAC) and video frame pixels remain behind the stub contract (no in-JVM codec)."),
    StageDoc("contamination_filter", "curation",
      "Drop documents whose shingle overlap with a benchmark side table reaches the threshold (train/test-leak gate).",
      y("""pipeline:
          |  - type: contamination_filter
          |    id_field: doc_id
          |    text_field: text
          |    shingle_k: 3
          |    threshold: 0.5
          |    benchmark:
          |      path: "/root/testdata/sf0.001/documents.parquet"
          |      text_field: text"""),
      schemaKind = "documents", oracle = Seq("ml_contamination")),
    StageDoc("token_budget_sample", "curation",
      "Data-mixing by token budget: scale each stratum's content-addressed sampling rate so its expected kept-token count hits the budget (min(1, budget/total)); strata inside budget keep everything.",
      y("""pipeline:
          |  - type: token_budget_sample
          |    id_field: doc_id
          |    strata_field: source
          |    budgets: {src0: 3000, src1: 6000}
          |    default_budget: 9000"""),
      schemaKind = "documents", oracle = Seq("ml_token_budget_sample"),
      notes = "The budget is statistical (hash-uniform sampling concentrates tightly at corpus scale); rates quantize to 1/buckets. Adds n_tokens and the applied mix_rate for audit."),
    StageDoc("pack_chunks", "curation",
      "Sequence-packing layout (concat-and-chunk) via a distributed prefix sum — window partitioned by bucket, never global.",
      y("""pipeline:
          |  - type: pack_chunks
          |    id_field: doc_id
          |    ctx_len: 2048
          |    buckets: 256"""),
      schemaKind = "documents", oracle = Seq("ml_pack_chunks")),
    StageDoc("chunk_spans", "curation",
      "Sliding-window chunk spans per document (stream-safe, integer-exact).",
      y("""pipeline:
          |  - type: chunk_spans
          |    size: 512
          |    overlap: 64"""),
      schemaKind = "documents", oracle = Seq("ml_chunk_spans")),
    StageDoc("shuffle_layout", "curation",
      "Deterministic shard-hash training layout (per-shard sort, one file per shard — never a global sort).",
      y("""pipeline:
          |  - type: shuffle_layout
          |    id_field: doc_id
          |    shards: 1024"""),
      schemaKind = "documents", oracle = Seq("ml_shuffle_layout")),
    StageDoc("quality_model", "curation",
      "Score text with a TRAINED quality classifier (hashed-BoW features, literal weights — narrow codegen projection).",
      y("""pipeline:
          |  - type: quality_model
          |    text_field: text
          |    weights: [0.1, -0.2, 0.3, 0.05, -0.1, 0.2, 0.15, -0.05, 0.4]"""),
      schemaKind = "documents", oracle = Seq("ml_classifier_margin")),
    StageDoc("bpe_tokenize", "curation",
      "Tokenize with trained BPE merges (inline or JSONL file) — the merge chain compiles to literal replaces.",
      y("""pipeline:
          |  - type: bpe_tokenize
          |    text_field: text
          |    merges: [[t, h], [th, e]]"""),
      schemaKind = "documents", oracle = Seq("ml_bpe_merges", "ml_bpe_tokens")),
    StageDoc("quality_gopher", "curation",
      "Gopher rule-based quality signals (Rae et al. 2021): word/line heuristics as g_* columns + the gopher_pass conjunction; optional drop_failing filter.",
      y("""pipeline:
          |  - type: quality_gopher
          |    text_field: text
          |    drop_failing: false"""),
      schemaKind = "documents", oracle = Seq("ml_gopher_quality"),
      notes = "One narrow codegen'd projection over two staged arrays (words, lines) — stream-safe, scan speed at any corpus size. Signals: g_n_words, g_mean_word_len, g_symbol_ratio, g_bullet_frac, g_ellipsis_frac, g_alpha_frac, g_stop_hits, g_dup_line_frac."),
    StageDoc("perplexity_score", "curation",
      "CCNet-style LM quality score: corpus-trained interpolated bigram model, mean log-probability per document (optional min_logprob_quantile / min_logprob filter, quantile_buckets head/middle/tail labeling).",
      y("""pipeline:
          |  - type: perplexity_score
          |    id_field: doc_id
          |    text_field: text
          |    lambda: 0.9
          |    min_logprob_quantile: 0.1"""),
      schemaKind = "documents",
      oracle = Seq("ml_bigram_logprob", "ml_bigram_xent", "ml_lm_quantile",
        "ml_lm_buckets", "ml_bigram_xent_store", "ml_trigram_backoff_store"),
      notes = "`model: bigram` (default) or `model: trigram` (stupid backoff, Brants et al. 2007 - knob `alpha:` instead of `lambda:`; a knob for the other model is refused, not ignored); both expose the score as `<prefix>logprob` so gates and buckets compose identically, and both take every train mode incl. `train: {store:}` (trigram needs an orders>=3 store - refused loudly otherwise). Perplexity = exp(-logprob) is monotone in the score, so filters threshold lm_logprob directly. `quantile_buckets: [q1, q2, ...]` labels each doc with the number of percentile_disc thresholds at or below its score (CCNet's head/middle/tail split with [0.33, 0.67]; bucket N-1 = best) - labeling, not gating, composable with either gate; all thresholds come from ONE aggregate pass over the persisted scored table. ONE fused vocabulary count aggregate (unigrams + bigrams in a single corpus pass, persisted type-sized); the per-type probability table assembles with vocabulary-keyed joins; the corpus side is one gram-keyed join (16-byte digest keys, the dup-span convention) — never pairwise. Default is self-trained (word-ORDER anomaly signal); `train_filter:` (filter-DSL exemplar subset) or `train: {path, text_field}` switches to the reference-trained CCNet form, where OOV text is penalized at the add-one unigram floor; `train: {store: path}` trains from an incremental GramStore (stats_ingest) - a vocabulary-sized scan instead of a training-corpus pass, bit-identical scores. Gate with `min_logprob_quantile:` (drop the lowest-likelihood fraction — CCNet's quantile architecture, stable under distribution shift) or `min_logprob:` (absolute threshold, for externally-calibrated cutoffs; silently over- or under-selects when the corpus mix changes) — exactly one of the two. The composed stage input is shared via lazy executor cache by default; `materialize: path` writes it to parquet and reads it back instead — the 100 TB form, where a storage round-trip beats pinning the corpus in cache (caller owns the path's lifecycle). A BUCKETED corpus input (BucketedLayout.load over a Curate --bucket-by output, buckets = shuffle partitions) plans the id-join-backs with ZERO corpus re-shuffle - the per-doc score aggregate's output partitioning is already join-compatible and the corpus side reads co-located buckets (spec-asserted); `train: {path}` parquet references read bucket-aware the same way."),
    StageDoc("dsir_sample", "curation",
      "DSIR importance resampling (Xie et al. 2023): hashed n-gram importance weights vs an exemplar target set, Gumbel top-k selection.",
      y("""pipeline:
          |  - type: dsir_sample
          |    id_field: doc_id
          |    text_field: text
          |    k: 100
          |    target:
          |      path: "/root/testdata/sf0.001/documents.parquet"
          |      text_field: text"""),
      schemaKind = "documents", oracle = Seq("ml_dsir_weights", "ml_dsir_sample"),
      notes = "`target_filter` (filter DSL) selects an in-corpus exemplar subset instead of an external table. Sample size is `k:` (absolute) or `fraction:` (relative — k = ceil(fraction*n), the scale-safe form when output must stay proportional to input; n comes back with the bucket-model training aggregate, not a separate count pass). Bucket count tables are driver-small and broadcast; the raw corpus is never shuffled beyond one per-doc aggregate; selection is TakeOrdered (per-partition heaps), never a global sort. The composed stage input is shared via lazy executor cache by default; `materialize: path` writes it to parquet and reads it back instead (the 100 TB form; caller owns the path's lifecycle)."),
    StageDoc("decontaminate", "curation",
      "Positional benchmark decontamination: cut every token span covered by a k-gram that also occurs in the benchmark table (the surgery counterpart of contamination_filter).",
      y("""pipeline:
          |  - type: decontaminate
          |    id_field: doc_id
          |    text_field: text
          |    min_tokens: 8
          |    benchmark:
          |      path: "/root/testdata/sf0.001/documents.parquet"
          |      text_field: text"""),
      schemaKind = "documents",
      oracle = Seq("ml_decontam_spans", "ml_decontam_clean"),
      notes = "The benchmark gram set is eval-sized by definition and broadcasts as 16-byte digests; the corpus side is one posexplode + broadcast join feeding one id-keyed aggregate; the interval merge is local array arithmetic (the dedup_spans machinery)."))

  val all: Seq[StageDoc] = processors ++ relational ++ curation
}
