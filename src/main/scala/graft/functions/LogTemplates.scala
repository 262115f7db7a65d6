package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log template mining — the engine analog of the reference's AEL
  * pre-parse stage (/root/reference/jaeger_prometheus_joining/
  * transformationscripts/LogsParser.py:21-37: raw `.log` text →
  * (EventId, EventTemplate, ParameterList) before anything can join).
  *
  * AEL bins lines by token count and merges on token overlap; the
  * engine instead masks the VARIABLE token classes (uuid / 0x-hex /
  * number) with ONE regexp alternation — a deterministic, fully
  * relational template that needs no driver-side model state and
  * therefore scales to any corpus as a plain codegen'd projection:
  *
  *  - `template`  = text with every variable masked to `<VAR>`
  *  - `event_id`  = [[TextFunctions.Fingerprint]] of the template —
  *    a content hash DuckDB reproduces (list_reduce), so the whole
  *    output is oracle-checkable, unlike xxhash64-keyed ids
  *  - `params`    = the masked substrings in order (the diff between
  *    line and template), extracted with the SAME single pattern so
  *    masking and extraction can never disagree
  *
  * Masking uses one alternation (uuid before hex before number) in a
  * single regexp_replace pass: a CHAIN of replaces would let a later
  * pattern match inside an earlier replacement and break the
  * params-equals-diff invariant.
  *
  * A line whose CONSTANT text already contains the literal mask token
  * is handled by ESCAPING before masking: every pre-existing
  * `<\*VAR>` token gains one backslash (`<VAR>` → `<\VAR>`,
  * `<\VAR>` → `<\\VAR>`, …) — injective over ALL inputs, so a bare
  * `<VAR>` in a template always denotes a masked variable and
  * [[reconstruct]] (splice params, strip one backslash) is an exact
  * inverse of template+params on every line (r3 verdict ask).
  */
object LogTemplates {

  // escape/unescape of pre-existing mask tokens (Java regex + Matcher
  // replacement syntax; the DuckDB oracle mirrors them in RE2 syntax)
  private val escPat = """<(\\*)VAR>"""
  private val escRep = """<\\$1VAR>"""
  private val unescPat = """<\\(\\*)VAR>"""
  private val unescRep = """<$1VAR>"""

  private def escape(text: Column): Column = regexp_replace(text, escPat, escRep)
  private def unescape(text: Column): Column =
    regexp_replace(text, unescPat, unescRep)

  /** Variable-token classes, priority-ordered (uuid ⊃ hex ⊃ number
    * prefixes — the alternation tries them leftmost-first in both
    * Java regex and DuckDB's RE2). Non-capturing groups only:
    * regexp_extract_all group 0 must be the full match in both
    * engines.
    */
  val varPattern: String =
    "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}" +
      "|0x[0-9a-fA-F]+" +
      "|\\b\\d+(?:\\.\\d+)?\\b"

  val mask: String = "<VAR>"

  /** The line's template: pre-existing mask tokens escaped, then
    * variables masked, constants kept. The escape never creates or
    * destroys a [[varPattern]] match (it only inserts a backslash
    * inside `<…VAR>` tokens, which contain no variable characters),
    * so params-by-diff is unaffected.
    */
  def template(text: Column): Column =
    regexp_replace(escape(text), varPattern, mask)

  /** Exact inverse of ([[template]], [[params]]): splice the params
    * into the template's mask slots in order, then strip one escape
    * level — returns the original line for EVERY input, including
    * lines whose constant text contains literal `<VAR>` tokens.
    * Pure codegen'd projection (split/zip_with/concat).
    */
  def reconstruct(template: Column, params: Column): Column = {
    val segs = split(template, java.util.regex.Pattern.quote(mask), -1)
    val spliced = concat(
      element_at(segs, 1),
      array_join(zip_with(
        slice(segs, lit(2), greatest(size(segs) - 1, lit(0))), params,
        (s, p) => concat(p, s)), ""))
    unescape(spliced)
  }

  /** The variable values, in order of appearance (AEL ParameterList). */
  def params(text: Column): Column =
    regexp_extract_all(text, lit(varPattern), lit(0))

  /** Deterministic, oracle-checkable event id of a line's template. */
  def eventId(text: Column): Column =
    TextFunctions.fingerprint(template(text))

  /** Parameterize a text column: adds (template, event_id, params,
    * n_params). Pure projection — no shuffle, whole-stage codegen.
    */
  def mine(df: DataFrame, textCol: String): DataFrame =
    df
      .withColumn("template", template(col(textCol)))
      .withColumn("event_id", TextFunctions.fingerprint(col("template")))
      .withColumn("params", params(col(textCol)))
      .withColumn("n_params", size(col("params")).cast("long"))

  /** Per-template event counts — the mined vocabulary (what AEL's
    * `*_templates.csv` output reports). One map-side-combined
    * aggregate keyed on the event id.
    */
  def templateCounts(df: DataFrame, textCol: String): DataFrame =
    mine(df, textCol)
      .groupBy(col("event_id"), col("template"))
      .agg(count(lit(1)).as("line_cnt"),
        sum(col("n_params")).as("param_cnt"))
}
