package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-threshold set-similarity join via prefix filtering (the
  * AllPairs/PPJoin family) — the EXACT counterpart of the MinHash+LSH
  * near-dup path: every pair with n-gram Jaccard ≥ t is returned, no
  * probabilistic recall, yet the candidate join is bounded the same
  * way banding bounds LSH.
  *
  * The reference dedups only on full-row equality
  * (/root/reference/jaeger_prometheus_joining/transformationscripts/
  * FileConcat.py:22); similarity joins are an engine addition for the
  * training-data tier, where "exact pairs above a Jaccard threshold"
  * is the contract audits want and LSH can only approximate.
  *
  * Prefix-filtering lemma: order every document's shingle set by one
  * GLOBAL order (here: document frequency ascending, then shingle —
  * rare tokens first, so prefixes land in the emptiest buckets). If
  * J(x, y) ≥ t then |x ∩ y| ≥ t·|x ∪ y| ≥ t·|x|, so x's matches
  * cannot all hide in its last ceil(t·|x|) − 1 positions: any
  * qualifying pair shares a token within the first
  * |x| − ceil(t·|x|) + 1 positions of BOTH sides (take the globally
  * smallest common element; were it outside either prefix, that
  * side's overlap budget is already spent). Joining prefix tokens
  * against prefix tokens is therefore COMPLETE for J ≥ t.
  *
  * Scale design: candidate shuffle ∝ Σ_token df_prefix(token)² over
  * PREFIX occurrences only — the df-ascending order concentrates
  * prefixes on rare tokens, the classic AllPairs bound — never the
  * all-pairs n². Verification reuses [[Dedup.jaccardCounts]] (shingle
  * equi-joins keyed on the candidate ids). The threshold is the exact
  * rational tNum/tDen; the final filter is the integer cross-multiply
  * `inter·tDen ≥ tNum·union`, so engine and oracle agree bit-for-bit.
  */
object SetSim {

  /** Candidate pairs complete for Jaccard ≥ tNum/tDen: ids sharing a
    * shingle within both prefixes. `shingles` must be DISTINCT
    * (id, shingle) rows — [[Dedup.charShingles]] output shape —
    * carrying `groupCols` (constant per id) when the join is scoped.
    *
    * `groupCols` scopes the join WITHIN strata (e.g. (lang, source)):
    * candidates never cross a group boundary, and document frequency
    * is computed per group (the lemma's global order holds per group,
    * and within-group df is what makes a token "rare" there). Scoping
    * is also the DENSITY rail: prefix filtering prunes in proportion
    * to df skew, so a corpus with an adversarially uniform, tiny
    * shingle vocabulary (every token df ≈ n/vocab) leaves ANY exact
    * algorithm near-quadratic — real dedup pipelines scope by
    * language/source/domain for exactly this reason.
    */
  def prefixCandidates(shingles: DataFrame, idCol: String,
      tNum: Int, tDen: Int, groupCols: Seq[String] = Nil): DataFrame = {
    require(tNum >= 1 && tNum <= tDen, s"threshold must be in (0, 1]: $tNum/$tDen")
    val gkey = groupCols :+ "shingle"
    val dfreq = shingles.groupBy(gkey.map(col): _*).agg(count(lit(1)).as("_df"))
    val wSz = Window.partitionBy(col(idCol))
    val wRk = Window.partitionBy(col(idCol))
      .orderBy(col("_df").asc, col("shingle").asc)
    // prefix length = sz − ceil(t·sz) + 1; ceil via floor((num·sz +
    // den − 1)/den) — exact below 2⁵², identical in the SQL mirror
    val ceilT = floor((lit(tNum.toLong) * col("_sz") + lit(tDen.toLong - 1))
      .cast("double") / lit(tDen.toDouble)).cast("long")
    val prefix = shingles
      .join(dfreq, gkey)
      .withColumn("_sz", count(lit(1)).over(wSz))
      .withColumn("_rk", row_number().over(wRk))
      .filter(col("_rk") <= col("_sz") - ceilT + 1)
      .select(gkey.map(col) :+ col(idCol): _*)
    prefix.withColumnRenamed(idCol, "id1")
      .join(prefix.withColumnRenamed(idCol, "id2"), gkey)
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Exact set-similarity join: ALL pairs (id1 < id2) whose shingle
    * Jaccard ≥ tNum/tDen — within a `groupCols` stratum when scoped —
    * with their integral (inter_sz, union_sz). Candidates from
    * [[prefixCandidates]] (complete by the lemma), verification via
    * [[Dedup.jaccardCounts]].
    */
  def similarityJoin(shingles: DataFrame, idCol: String,
      tNum: Int, tDen: Int, groupCols: Seq[String] = Nil): DataFrame = {
    val cands = prefixCandidates(shingles, idCol, tNum, tDen, groupCols)
    Dedup.jaccardCounts(cands, shingles.select(col(idCol), col("shingle")),
        idCol)
      .filter(col("inter_sz") * lit(tDen.toLong) >=
        lit(tNum.toLong) * col("union_sz"))
  }

  /** Edit-distance near-duplicate verification over a candidate pair
    * table: keep pairs whose Levenshtein distance is at most
    * `maxDistPctNum/maxDistPctDen` of the LONGER text (a relative
    * bound — absolute thresholds misread long documents). The
    * `|len1 − len2|` length prefilter is semantically redundant
    * (levenshtein ≥ length difference) but prunes candidates BEFORE
    * the O(len²) distance kernel runs — at 100 TB most LSH candidates
    * die on this comparison alone. Feed [[prefixCandidates]] /
    * [[Dedup.lshCandidates]]; never all pairs.
    *
    * Levenshtein is the unit-cost DP both engines implement exactly
    * (Spark `levenshtein` == DuckDB `levenshtein`), so the output is
    * hash-comparable with no fixed-point dance.
    */
  def editDistanceNearDup(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, maxDistPctNum: Int, maxDistPctDen: Int): DataFrame = {
    require(maxDistPctNum >= 0 && maxDistPctDen >= 1,
      s"bad relative bound: $maxDistPctNum/$maxDistPctDen")
    val t = docs.select(col(idCol).as("_id"), col(textCol).as("_t"))
    val bound = (l1: Column, l2: Column) =>
      lit(maxDistPctNum.toLong) * greatest(l1, l2)
    pairs
      .join(t.select(col("_id").as("id1"), col("_t").as("t1")), "id1")
      .join(t.select(col("_id").as("id2"), col("_t").as("t2")), "id2")
      .withColumn("_l1", length(col("t1")).cast("long"))
      .withColumn("_l2", length(col("t2")).cast("long"))
      .filter(abs(col("_l1") - col("_l2")) * lit(maxDistPctDen.toLong) <=
        bound(col("_l1"), col("_l2")))
      .withColumn("edit_dist", levenshtein(col("t1"), col("t2")).cast("long"))
      .filter(col("edit_dist") * lit(maxDistPctDen.toLong) <=
        bound(col("_l1"), col("_l2")))
      .select(col("id1"), col("id2"), col("edit_dist"))
  }
}
