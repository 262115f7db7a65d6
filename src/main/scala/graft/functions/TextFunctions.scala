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
}
