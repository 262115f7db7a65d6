package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics text retrieval: per-document keyword extraction
  * (tf-idf family) and conjunctive term search over the relational
  * inverted index. The reference has no text analysis at all; a
  * training-data pipeline needs both (topic tagging, corpus slicing
  * by content) over corpora where "load it into a search engine" is
  * not an option.
  *
  * Determinism/oracle design: the idf weight is the RATIONAL
  * `n_docs/df` (score_micro = floor(10⁶·tf/df) — tf·(n/df) ordering
  * is invariant to the constant n within a corpus), NOT `ln(n/df)`:
  * engine-vs-oracle hash equality must not hinge on two libm `ln`
  * implementations rounding identically at the last ulp. The log
  * damping matters for absolute BM25-style scores, not for ranking —
  * and rank is what keyword extraction returns. Ties pin on the term.
  *
  * Scale shape: one shuffle to (doc, term) counts, one dimension-
  * sized shuffle to df, one equi join back on the term, one top-k
  * window per doc. No collect, no vocabulary literal; hot (high-df)
  * terms never concentrate — the per-term df row is one row however
  * many documents contain it.
  */
object TextRetrieval {

  /** (doc, term, tf) counts over whitespace tokens — the relational
    * inverted index (postings stay rows; a per-term array would
    * concentrate a common term's postings into one task).
    *
    * Tokenization contract: Java-regex `\s+`, which differs from
    * RE2/DuckDB `\s+` on vertical tab and some Unicode whitespace —
    * oracle hash-equality is guaranteed for ASCII-space/tab/newline
    * corpora only (same documented assumption as
    * [[SetSim.editDistanceNearDup]]'s char counts).
    */
  def termCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // repartition before the explode: sub-128MB inputs are one scan
    // split, so the per-row heavy map work would run single-task
    // (EXPLICIT session-conf width — see [[Dedup.shuffleWidth]])
    docs.repartition(Dedup.shuffleWidth(docs), col(idCol))
      .select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k distinctive terms per document, ranked by
    * `score_micro = floor(10⁶·tf/df)` descending (rare-but-frequent
    * terms first), term ascending on ties. Emits (id, rank, term,
    * tf, df, score_micro).
    */
  def keywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val tc = termCounts(docs, idCol, textCol)
    val df = tc.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df"))
    val scored = tc.join(df, "term")
      .withColumn("score_micro",
        floor(col("tf") * lit(1000000.0) / col("df")).cast("long"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("df"), col("score_micro"))
  }

  /** Conjunctive search: documents containing EVERY query term, with
    * an integral relevance score (Σ tf over the query terms). The
    * result is an UNORDERED (id, score) frame — callers sort (the
    * declared query's oracle compares order-insensitively). The term
    * filter is a broadcast-size IN-list pushed into the scan of the
    * (doc, term) counts; the AND semantics is
    * `count(distinct matched term) = |terms|` — one grouped pass,
    * never a per-term self-join chain.
    */
  def conjunctiveSearch(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "query needs at least one term")
    val uniq = terms.distinct
    termCounts(docs, idCol, textCol)
      .filter(col("term").isin(uniq: _*))
      .groupBy(col(idCol))
      .agg(countDistinct(col("term")).as("_matched"),
        sum(col("tf")).as("score"))
      .filter(col("_matched") === uniq.size)
      .select(col(idCol), col("score"))
  }

  /** Convenience over the driver corpus shape. */
  def keywordsOf(spark: SparkSession, dir: String, k: Int): DataFrame =
    keywords(spark.read.parquet(s"$dir/documents.parquet"),
      "doc_id", "text", k)
}
