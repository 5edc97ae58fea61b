package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text cleaning + PII redaction for training-data curation — the strip/
  * mask pass every web-scale corpus runs before tokenization (reference
  * scope: the normalise/derive stages of `/root/reference/src/polars_pipe/
  * core/transform.py`; the redaction patterns themselves are the standard
  * public curation recipe, e.g. CCNet/Dolma-style pipelines).
  *
  * All pure `Column` expressions — no UDFs, fully codegen'd, per-row with
  * no shuffle, so throughput scales linearly with executors at 100 TB.
  *
  * Pattern portability: every regex here uses only syntax with IDENTICAL
  * semantics in Java's engine (Spark) and RE2 (the DuckDB oracle) — no
  * backreferences, no lookahead, no possessive quantifiers. Character
  * classes are explicit ASCII ranges rather than `\\w`/`\\s`/`\\p{...}`
  * classes whose membership differs across engines (Java's `\\s` includes
  * vertical tab `\\x0B`; RE2's does not — so even "simple" whitespace
  * collapse diverges on corpus text containing `\\x0B` unless the class
  * is spelled out).
  */
object TextClean {

  /** Whitespace as an explicit class (space, tab, LF, FF, CR) — the
    * engine-portable spelling of `\s` per the header note. */
  private val Ws = "[ \\t\\n\\f\\r]"

  /** Unicode normalization ([[graft.sparkext.UnicodeNormalize]] — native
    * codegen'd expression, no UDF): composed-vs-decomposed spellings of
    * the same text must not split dedup fingerprints or tokenizers.
    * `form` ∈ NFC/NFD/NFKC/NFKD. */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    graft.sparkext.UnicodeNormalize(text, form)

  /** Accent stripping: normalize to `form`, decompose, drop combining
    * marks (Mn) — DuckDB `strip_accents` semantics (ø and compatibility
    * ligatures kept under NFC/NFD). */
  def stripAccents(text: Column, form: String = "NFC"): Column =
    graft.sparkext.UnicodeNormalize(text, form, stripAccents = true)

  /** HTML/XML tag removal: drops `<...>` spans (non-greedy via the
    * negated-class idiom — portable, unlike lazy quantifier corner cases),
    * then collapses the whitespace runs left behind. */
  def stripHtml(text: Column): Column =
    regexp_replace(regexp_replace(text, "<[^>]*>", " "), Ws + "+", " ")

  /** Email addresses -> `<EMAIL>`. */
  def redactEmails(text: Column): Column =
    regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>")

  /** http(s) URLs -> `<URL>`. Run BEFORE email redaction if URLs may
    * contain `@` userinfo; [[cleanAll]] orders this correctly. */
  def redactUrls(text: Column): Column =
    regexp_replace(text, "https?://[^ \\t\\n]+", "<URL>")

  /** NNN-NNN-NNNN / NNN.NNN.NNNN phone shapes -> `<PHONE>`. Deliberately
    * conservative: loose "any 7+ digit run" rules mass-redact ids,
    * timestamps, and version strings, destroying data quality — curation
    * pipelines widen patterns per-locale only with measured precision. */
  def redactPhones(text: Column): Column =
    regexp_replace(text,
      "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "<PHONE>")

  /** The three redaction placeholders, protected by [[cleanAll]]. */
  private val Placeholders = Seq("URL", "EMAIL", "PHONE")

  /** Full cleaning pass in canonical order: tags out first (so URLs/emails
    * inside attributes are seen bare), then URLs (may contain `@`), then
    * emails, then phones, then whitespace collapse + trim.
    *
    * IDEMPOTENT by construction: the redaction placeholders are tag-shaped
    * (`<URL>` etc.), so a naive second pass would strip them as markup and
    * silently delete the redaction record — found by PropertySpec's
    * idempotence property. Pre-existing placeholders are shielded behind a
    * `\u0001` (SOH) sentinel (a byte no pattern here touches) for the duration
    * of the pass and restored at the end; lookahead in the strip regex
    * would be the compact alternative but RE2 (the oracle engine) has
    * none, per the portability header.
    *
    * Raw SOH bytes already present in the INPUT (possible in crawl data)
    * are stripped first — otherwise corpus text that happens to contain a
    * SOH-wrapped placeholder word (e.g. literal SOH+"URL"+SOH) would be
    * rewritten to `<URL>` by the restore step, fabricating a redaction
    * marker that never happened. SOH is a C0 control byte with no textual
    * meaning, so deleting it is itself a legitimate cleaning step; the
    * q19 oracle mirrors the strip. */
  def cleanAll(text: Column): Column = {
    val deSoh = regexp_replace(text, "\\u0001", "")
    val shielded = Placeholders.foldLeft(deSoh) { (c, p) =>
      regexp_replace(c, s"<$p>", s"\u0001$p\u0001")
    }
    val cleaned = trim(regexp_replace(
      redactPhones(redactEmails(redactUrls(stripHtml(shielded)))), Ws + "+", " "))
    Placeholders.foldLeft(cleaned) { (c, p) =>
      regexp_replace(c, s"\u0001$p\u0001", s"<$p>")
    }
  }

  /** Gopher-style composed quality filter: each rule contributes a named
    * reason; a document is kept iff NO rule fires. Returns
    * (keep, reasons-csv) columns — reasons as a deterministic sorted csv
    * string (array columns crash pandas-side oracle harnesses; see q64's
    * round-2/3 history).
    *
    * Rules (public Gopher / C4 heuthresholds, tuned loose so synthetic test
    * corpora keep a majority):
    *   - too_short: < minTokens tokens
    *   - too_long: > maxTokens tokens
    *   - punct_heavy: punctuation ratio > maxPunctRatio
    *   - digit_heavy: digit ratio > maxDigitRatio
    *   - low_quality: composite [[TextAnalysis.qualityScore]] < minScore
    */
  def qualityFilterFlags(
      text: Column,
      minTokens: Int = 5,
      maxTokens: Int = 100000,
      maxPunctRatio: Double = 0.2,
      maxDigitRatio: Double = 0.3,
      minScore: Double = 0.1
  ): (Column, Column) = {
    val s = TextAnalysis.qualitySignals(text)
    val rules: Seq[(String, Column)] = Seq(
      "digit_heavy" -> (s("digit_ratio") > maxDigitRatio),
      "low_quality" -> (TextAnalysis.qualityScore(text) < minScore),
      "punct_heavy" -> (s("punct_ratio") > maxPunctRatio),
      "too_long" -> (s("n_tokens") > maxTokens),
      "too_short" -> (s("n_tokens") < minTokens)
    ) // alphabetical: the csv is order-deterministic by construction
    val reasons = concat_ws(",",
      rules.map { case (name, fired) => when(fired, lit(name)) }: _*)
    val keep = rules.map(_._2).reduce(_ || _).unary_!
    (keep, reasons)
  }
}
