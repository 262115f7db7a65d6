package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis operators for a training-data pipeline: token
  * counting, quality scoring, language-ID heuristic, document
  * fingerprinting. All are built-in Catalyst expressions except the
  * fingerprint, which is a custom codegen'd `Expression` (preference
  * order (b) of the build brief — a native expression beats a UDF).
  *
  * Every numeric output is integral or an explicit floor() of a
  * double ratio, so results hash-compare exactly against the DuckDB
  * oracle (half-up vs banker's rounding never enters).
  */
object TextFunctions {

  /** Rolling polynomial fingerprint: h = (h*31 + codepoint) mod
    * (2^31-1) over the Unicode CODE POINTS — not UTF-8 bytes, so the
    * result matches the DuckDB oracle's per-character `ord()` fold on
    * any text, not just ASCII (max codepoint 0x10FFFF ⇒ h*31 + c <
    * 2^37, Long arithmetic never overflows). Codegen'd: stays inside
    * WholeStageCodegen. The same recurrence is expressible in DuckDB
    * (`list_reduce`), giving the oracle parity a custom Expression
    * normally can't have.
    */
  case class Fingerprint(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      var h = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31L + cp) % 2147483647L
        i += Character.charCount(cp)
      }
      java.lang.Long.valueOf(h)
    }
    // locals via ctx.freshName — multiple Fingerprints in one codegen
    // method body (non-nullable children) must not collide (see
    // VectorExpressions.DotProduct)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val s = ctx.freshName("fpS")
      val h = ctx.freshName("fpH")
      val i = ctx.freshName("fpI")
      val cp = ctx.freshName("fpCp")
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |java.lang.String $s = $c.toString();
           |long $h = 0L;
           |int $i = 0;
           |while ($i < $s.length()) {
           |  int $cp = $s.codePointAt($i);
           |  $h = ($h * 31L + $cp) % 2147483647L;
           |  $i += java.lang.Character.charCount($cp);
           |}
           |${ev.value} = $h;
           |""".stripMargin)
    }
    override protected def withNewChildInternal(c: Expression): Fingerprint = copy(c)
  }

  def fingerprint(c: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(Fingerprint(GraftShims.expression(c)))
  }

  private def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: alphanumeric runs + standalone
    * non-space punctuation, the usual pre-tokenizer regex shape.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
      .cast("long")

  /** Quality components (all integral): token/char/distinct-token
    * counts, stopword hits, punctuation count, and floor(1000 *
    * distinct/total) type-token ratio.
    */
  def qualityComponents(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    Seq(
      "n_tokens" -> size(toks).cast("long"),
      "n_chars" -> length(text).cast("long"),
      "n_distinct_tokens" -> size(array_distinct(toks)).cast("long"),
      "stopword_hits" -> size(filter(toks,
        t => t.isin("the", "a", "of", "and", "to"))).cast("long"),
      "punct_cnt" -> (length(text) -
        length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))).cast("long"),
      "ttr_millis" -> floor(lit(1000.0) * size(array_distinct(toks)) / size(toks))
        .cast("long"))
  }

  /** Marker stopword lists for the language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  /** Per-language marker hit counts (integral). */
  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = split(lower(trim(text)), "\\s+")
    langMarkers.map { case (lang, markers) =>
      s"hits_$lang" -> size(filter(toks,
        t => t.isin(markers: _*))).cast("long")
    }
  }

  /** Predicted language: argmax of marker hits via a struct-max
    * (greatest on (hits, -rank, lang)); 'und' when nothing hits;
    * ties break toward the alphabetically-first language.
    */
  def langId(text: Column): Column = {
    val structs = langScores(text).zipWithIndex.map { case ((name, c), i) =>
      struct(c.as("hits"), lit(-i).as("nrank"),
        lit(name.stripPrefix("hits_")).as("lang"))
    }
    val winner = greatest(structs: _*)
    when(winner.getField("hits") > 0, winner.getField("lang")).otherwise(lit("und"))
  }

  /** PII redaction patterns, applied IN THIS ORDER (most-specific
    * digit shapes first, so an SSN or card number is claimed whole
    * before the looser phone shape can eat a prefix of it). Every
    * pattern is written in the common subset of Java regex and RE2
    * (character classes, bounded repetition, `\b` — no lookaround,
    * no backreferences), so the DuckDB oracle applies the IDENTICAL
    * patterns and redacted text hash-matches. Counts are per-category
    * over the ORIGINAL text (order-independent); replacement is
    * sequential.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("ssn",   "\\b\\d{3}-\\d{2}-\\d{4}\\b",                  "<SSN>"),
    ("cc",    "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b",  "<CC>"),
    ("phone", "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b",            "<PHONE>"),
    ("ip",    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"))

  /** Text with every [[piiPatterns]] match replaced by its category
    * token — the pre-training scrub pass. Pure codegen'd
    * regexp_replace chain: per-row, no shuffle, no UDF.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (_, pat, token)) =>
      regexp_replace(acc, pat, token)
    }

  /** Per-category match counts on the original text (audit columns:
    * "how much PII did the scrub remove, of what kind"), named
    * `pii_<category>`. Integral, order-independent.
    */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (name, pat, _) =>
      s"pii_$name" -> regexp_count(text, lit(pat)).cast("long")
    }

  /** Intra-document repetition signals — the Gopher-family quality
    * rules ("fraction of duplicate tokens / most-common token /
    * most-common 2-gram") that catch boilerplate and degenerate
    * generation loops exact dedup can't (the document is unique, its
    * CONTENT is repetitive). All per-row array algebra inside
    * whole-stage codegen: nested HOF lambdas, no shuffle, no UDF —
    * cost is O(distinct·n) per row, bounded by document length, and
    * embarrassingly parallel at any corpus size. Outputs are
    * floor-millis of exact small-integer ratios, so they hash-match
    * the DuckDB list-lambda mirror bit-exactly.
    */
  def repetitionStats(text: Column): Seq[(String, Column)] = {
    val toks = split(trim(text), "\\s+")
    val n = size(toks)
    val uniq = array_distinct(toks)
    val topTokCnt = array_max(transform(uniq,
      t => size(filter(toks, x => x === t))))
    // sequence() flips to DESCENDING when start > stop — guard n <= 1
    // with an explicit empty array, never sequence(1, 0)
    val bigrams = when(n > 1,
      transform(sequence(lit(1), n - 1), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    val topBigramCnt = array_max(transform(array_distinct(bigrams),
      b => size(filter(bigrams, x => x === b))))
    Seq(
      "dup_tok_frac_millis" -> when(n > 0,
        floor(lit(1000.0) * (n - size(uniq)) / n)).otherwise(lit(0)).cast("long"),
      "top_tok_frac_millis" -> when(n > 0,
        floor(lit(1000.0) * topTokCnt / n)).otherwise(lit(0)).cast("long"),
      "top_bigram_frac_millis" -> when(n > 1,
        floor(lit(1000.0) * topBigramCnt / (n - 1))).otherwise(lit(0)).cast("long"))
  }
}
