package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions — no UDFs, fully codegen'd, embarrassingly parallel
  * (the 100 TB case is a narrow scan).
  */
object TextAnalysis {

  /** Stopword marker sets per language for the n-gram/stopword heuristic
    * language identifier. (A real deployment broadcasts larger profiles;
    * the heuristic shape — score per language, argmax — is the same.)
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "un", "una", "que", "por"))

  /** Language-ID: per-language marker-hit count over the token set; argmax
    * with deterministic (alphabetical) tie-break; "und" (undetermined) when
    * no marker hits.
    */
  def langId(text: Column): Column = {
    val toks = Dedup.tokens(lower(text))
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val hits = size(array_intersect(toks, array(markers.map(lit): _*)))
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    // max by (hits, then lang desc) — array_max on struct compares fieldwise;
    // to make alphabetical-first win ties we compare (hits, reversed lang)
    val best = scored.reduce { (a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a)
    }
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** LINE-level language mix: [[langId]] applied per newline-split line,
    * aggregated to `(n_lines, n_langs, main_lang, mixed)` — the CCNet
    * cross-lingual hygiene check (Wenzek et al. 2020 run language-ID per
    * PARAGRAPH precisely because web pages mix languages, and a
    * document-level argmax hides a bilingual page from both languages'
    * corpora). `n_langs` counts DISTINCT identified languages over the
    * non-empty lines ("und" lines are unidentified, not a language);
    * `main_lang` is the line-majority language under the [[langId]]
    * tie-break order; `mixed` flags n_langs > 1. Pure Column algebra —
    * narrow, codegen'd, stream-safe like every quality signal.
    */
  def langMix(text: Column): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => l =!= "")
    val langs = transform(lines, l => langId(l))
    val known = filter(langs, l => l =!= "und")
    val perLang = langMarkers.keys.toSeq.sorted.map { lang =>
      lang -> size(filter(known, x => x === lang))
    }
    val allMax = greatest(perLang.map(_._2): _*)
    // first-max-wins in alphabetical order — the langId tie-break,
    // mirrored in the oracle SQL (foldRight puts the earliest language's
    // `when` outermost)
    val main = when(allMax === 0, lit("und")).otherwise(
      perLang.foldRight(lit("und")) { case ((lang, n), acc) =>
        when(n === allMax, lit(lang)).otherwise(acc)
      })
    struct(
      size(lines).as("n_lines"),
      size(array_distinct(known)).as("n_langs"),
      main.as("main_lang"),
      (size(array_distinct(known)) > 1).cast("int").as("mixed"))
  }

  /** Quality score in [0,1]: blend of length band, punctuation ratio,
    * stopword ratio, mean word length band. Deterministic arithmetic,
    * rounded for cross-engine stability.
    */
  def qualityScore(text: Column): Column =
    qualityScoreOf(text, Dedup.tokens(lower(text)))

  /** [[qualityScore]] over a pre-staged LOWERCASED token array — callers
    * alias `Dedup.tokens(lower(text))` into a column first so the split
    * runs once per row (lowering doesn't change token count, so one
    * array serves both the count and the stopword intersect).
    */
  def qualityScoreOf(text: Column, wl: Column): Column = {
    val len = length(text).cast("double")
    val nTok = size(wl).cast("double")
    val punct = (length(regexp_replace(text, """[^.,;:!?]""", ""))).cast("double")
    val stop = size(array_intersect(wl,
      array(langMarkers.values.flatten.toSeq.distinct.map(lit): _*))).cast("double")
    val lenScore = least(len / 500.0, lit(1.0))
    val punctRatio = when(len > 0, punct / len).otherwise(lit(0.0))
    val punctScore = lit(1.0) - least(punctRatio * 10.0, lit(1.0))
    val stopScore = when(nTok > 0, least(stop / nTok * 4.0, lit(1.0))).otherwise(lit(0.0))
    val meanWord = when(nTok > 0, (len - nTok + 1) / nTok).otherwise(lit(0.0))
    val wordScore = when(meanWord.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    round(lenScore * 0.3 + punctScore * 0.2 + stopScore * 0.3 + wordScore * 0.2, 6)
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(Dedup.tokens(text)))

  /** BPE-ish subword count: word-chunks + digits + punctuation pieces, the
    * standard pre-tokenizer regex family (public GPT-2 style class shapes).
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("""[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"""), lit(0)))

  /** PII redaction: emails → `<EMAIL>`, IPv4 literals → `<IP>`, then
    * phone-shaped digit runs → `<PHONE>` — three codegen'd
    * `regexp_replace` passes, scan-speed at any corpus size. Order is
    * load-bearing: emails first (their local part may look phone-like),
    * IPs before phones (dots and digits match the phone class), and both
    * engines must apply the same order. The patterns stay inside the
    * RE2-compatible subset so the DuckDB oracle runs them verbatim.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>")
    val ip = regexp_replace(email,
      """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "<IP>")
    regexp_replace(ip, """[+(]?\d[\d\s().-]{5,}\d""", "<PHONE>")
  }

  /** Luhn checksum over the digits of a candidate string (ISO/IEC
    * 7812): from the right, double every second digit, subtract 9 when
    * the double exceeds 9, sum ≡ 0 (mod 10). Pure Column algebra on a
    * lambda-var-safe path so it runs INSIDE higher-order functions.
    */
  private def luhnOk(cand: Column): Column = {
    val d = regexp_replace(cand, "[^0-9]", "")
    val n = length(d)
    val s = aggregate(sequence(lit(1), n), lit(0), (acc, i) => {
      val v = d.substr(n - i + lit(1), lit(1)).cast("int")
      val dbl = v * lit(2)
      val v2 = when(dbl > 9, dbl - 9).otherwise(dbl)
      acc + when(pmod(i, lit(2)) === 0, v2).otherwise(v)
    })
    pmod(s, lit(10)) === 0
  }

  /** Payment-card redaction with LUHN VALIDATION: 13–19-digit runs
    * (spaces/dashes allowed between digits) replace with `<CARD>` ONLY
    * when the checksum passes — a shape-only regex would eat order ids,
    * timestamps, and serial numbers, which is why card redaction cannot
    * be another [[redactPii]] regexp pass. The replacement is SPAN-
    * ANCHORED: the text splits on the match sites and reassembles as
    * segment‖decision‖segment‖… — a global substring replace would
    * mangle a longer, Luhn-INVALID run elsewhere in the text that
    * happens to contain a valid card's digits (serials, order ids).
    * Still one narrow codegen'd HOF projection, stream-safe. Opt-in
    * (the `pii_redact` stage's `cards: true`), applied BEFORE the
    * standard passes so the phone pattern can't eat a card first.
    */
  def redactCards(text: Column): Column = {
    val pat = """\d(?:[ -]?\d){12,18}"""
    // parts and cands come from the SAME pattern, so parts has exactly
    // size(cands)+1 segments and the splice is positionally exact
    val parts = split(text, pat, -1)
    val reps = transform(
      regexp_extract_all(text, lit(pat), lit(0)),
      c => when(luhnOk(c), lit("<CARD>")).otherwise(c))
    concat(element_at(parts, 1), array_join(
      zip_with(reps, slice(parts, lit(2), size(reps)), (r, p) => concat(r, p)),
      ""))
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * stable under formatting noise; the cheap exact-dup key.
    */
  /** Unicode normalization via the native codegen expression
    * ([[graft.functions.UnicodeNormalizeExpr]]) — no builtin exists and
    * a UDF would break whole-stage codegen in the cleanup hot path.
    */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.functions.UnicodeNormalizeExpr(
      GraftSqlBridge.expression(text.cast("string")), form))
  }

  /** HTML entities the cleanup decodes, in APPLICATION ORDER: `&amp;`
    * must decode LAST or "&amp;lt;" double-decodes to "<" instead of
    * the literal "&lt;" the author wrote. `&nbsp;` maps to a plain
    * space deliberately (cleanup semantics — a U+00A0 would survive
    * the whitespace collapse and fragment tokenization downstream).
    */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Pretraining text cleanup — the normalization pass every web-scale
    * corpus pipeline runs before signals/dedup/tokenization: strip HTML
    * tags, drop control characters, decode the common HTML entities,
    * Unicode-NFC normalize (native kernel), collapse whitespace, trim.
    * One narrow codegen'd projection; scan speed at any corpus size.
    */
  def normalizeText(text: Column): Column = {
    val noHtml = regexp_replace(text, "<[^>]*>", " ")
    val noCtl = regexp_replace(noHtml,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val decoded = htmlEntities.foldLeft(noCtl) { case (c, (k, v)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(k), v)
    }
    val nfc = unicodeNormalize(decoded)
    trim(regexp_replace(nfc, "\\s+", " "))
  }

  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), """\s+""", " "))

  /** Within-document duplicate-line removal (the RefinedWeb/MassiveText
    * line-dedup cleanup step — the REMOVAL counterpart of
    * [[gopherSignals]]' `g_dup_line_frac` flag): keep the FIRST
    * occurrence of each exact line, preserve order, rejoin with
    * newlines. Cross-document boilerplate is
    * [[Dedup.paragraphDedup]]'s business; this is the per-row pass.
    * `array_distinct` preserves first-occurrence order in Spark; the
    * oracle re-derives the same keep-set with a window (DuckDB's
    * `list_distinct` does not guarantee order). One narrow projection.
    */
  def dedupLines(text: Column): Column =
    array_join(array_distinct(split(text, "\n")), "\n")

  /** C4 line filter (Raffel et al. 2020 §2.2): keep only lines that end
    * in terminal punctuation (. ! ? ") AND carry at least `minWords`
    * words — the line-level cleaning pass that drops navigation
    * fragments, headers, and cookie banners. Lines are trimmed for the
    * checks but kept verbatim; one narrow projection. The default
    * `minWords = 5` is the paper's own rule ("only retained lines that
    * ... contained at least 5 words"); pass a lower value to
    * under-filter deliberately.
    */
  def c4FilterLines(text: Column, minWords: Int = 5): Column = {
    val kept = filter(split(text, "\n"), l => {
      val t = trim(l)
      val terminal = t.endsWith(".") || t.endsWith("!") ||
        t.endsWith("?") || t.endsWith("\"")
      val words = size(filter(split(t, " "), w => w =!= ""))
      terminal && words >= minWords
    })
    array_join(kept, "\n")
  }

  /** The Gopher "required words" stopword set (Rae et al. 2021 §A1.1):
    * a document must contain at least two of these to pass.
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher rule-based quality filter signals (Rae et al. 2021 §A1.1,
    * the MassiveText quality heuristics; the duplicate-line fraction is
    * the same family's repetition rule, and the bullet/ellipsis line
    * rules are shared with C4-style line filtering). Appends one column
    * per signal plus the conjunction flag `gopher_pass`:
    *
    *  - `g_n_words`            — whitespace word count (bound [50, 100k])
    *  - `g_mean_word_len`      — mean word length (bound [3, 10])
    *  - `g_symbol_ratio`       — '#' / '…' / '...' occurrences per word (≤ 0.1)
    *  - `g_bullet_frac`        — lines starting with a bullet (≤ 0.9)
    *  - `g_ellipsis_frac`      — lines ending in an ellipsis (≤ 0.3)
    *  - `g_alpha_frac`         — words containing ≥1 [A-Za-z] (≥ 0.8)
    *  - `g_stop_hits`          — distinct [[gopherStopwords]] present (≥ 2)
    *  - `g_dup_line_frac`      — 1 − distinct/total non-empty lines (≤ 0.3)
    *
    * Every signal is pure column arithmetic over two staged arrays (words,
    * lines) — a single narrow codegen'd projection, stream-safe, scan
    * speed at any corpus size. Ratios are rounded to 6 places for
    * cross-engine stability (the qualityScore convention).
    */
  def gopherSignals(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val w = filter(split(trim(text), """\s+"""), x => x =!= "")
    val lines = filter(transform(split(text, "\n"), x => trim(x)),
      x => x =!= "")
    val staged = df
      .withColumn("__w", w)
      .withColumn("__lines", lines)
    val nW = size(col("__w")).cast("double")
    val nL = size(col("__lines")).cast("double")
    def frac(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den, 6)).otherwise(lit(0.0))
    def occurrences(needle: String): Column =
      size(regexp_extract_all(text,
        lit(java.util.regex.Pattern.quote(needle)), lit(0)))
    // '...' counted first would swallow '…'? No — disjoint literals; but
    // '...' and '#' never overlap. Non-overlapping counts per literal.
    val symbols = (occurrences("#") + occurrences("…") +
      occurrences("...")).cast("double")
    val bulletLines = size(filter(col("__lines"),
      l => l.startsWith("•") || l.startsWith("- ") || l.startsWith("* ")))
    val ellipsisLines = size(filter(col("__lines"),
      l => l.endsWith("...") || l.endsWith("…")))
    val alphaWords = size(filter(col("__w"), x => x.rlike("[A-Za-z]")))
    val stopHits = size(array_intersect(
      array_distinct(transform(col("__w"), x => lower(x))),
      array(gopherStopwords.map(lit): _*)))
    val dupLineFrac = when(nL > 0,
      round(lit(1.0) - size(array_distinct(col("__lines"))).cast("double") / nL, 6))
      .otherwise(lit(0.0))
    val out = staged
      .withColumn("g_n_words", size(col("__w")).cast("long"))
      .withColumn("g_mean_word_len",
        frac(length(array_join(col("__w"), "")), nW))
      .withColumn("g_symbol_ratio", frac(symbols, nW))
      .withColumn("g_bullet_frac", frac(bulletLines, nL))
      .withColumn("g_ellipsis_frac", frac(ellipsisLines, nL))
      .withColumn("g_alpha_frac", frac(alphaWords, nW))
      .withColumn("g_stop_hits", stopHits.cast("long"))
      .withColumn("g_dup_line_frac", dupLineFrac)
    out.withColumn("gopher_pass",
      (col("g_n_words").between(50L, 100000L) &&
        col("g_mean_word_len").between(3.0, 10.0) &&
        col("g_symbol_ratio") <= 0.1 &&
        col("g_bullet_frac") <= 0.9 &&
        col("g_ellipsis_frac") <= 0.3 &&
        col("g_alpha_frac") >= 0.8 &&
        col("g_stop_hits") >= 2L &&
        col("g_dup_line_frac") <= 0.3).cast("int"))
      .drop("__w", "__lines")
  }
}
