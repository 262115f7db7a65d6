package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prometheus-histogram operators: fixed-ladder bucket counts per
  * (series, time bucket) and `histogram_quantile`-style estimates
  * from them. The reference consumes Prometheus metrics but can only
  * align raw samples; bucketed quantiles are THE standard latency
  * question asked of such feeds ("p90 per service per hour").
  *
  * Scale shape: [[bucketCounts]] is one grouped aggregate — each
  * sample maps to its smallest covering ladder rung via a codegen'd
  * when-chain (ladder is a plan literal, never a join), then
  * map-side-combined counts per (key, bucket_ts, le). Cardinality
  * out is series × time-buckets × ladder — tier-table sized, not
  * sample sized. [[quantileFromBuckets]] runs windows over that
  * ALREADY-REDUCED frame. The two compose incrementally: bucket
  * counts are additive partials (mergeable across batches exactly
  * like the rollup tiers), quantiles recompute from merged counts.
  *
  * Determinism/oracle design: counts are integers; the interpolation
  * arithmetic is a fixed sequence of IEEE double ops on integer-
  * valued inputs (< 2⁵³) and ladder literals, identical in DuckDB, so
  * `floor(1000·q)` outputs hash-match. Rank semantics follow
  * Prometheus: rank = φ·total, linear interpolation inside the
  * chosen bucket from its lower edge; a rank landing in the overflow
  * bucket clamps to the highest finite rung.
  */
object Histograms {

  /** Smallest ladder rung ≥ v, else the +Inf overflow. The ladder
    * must be strictly increasing.
    */
  private def leOf(v: Column, ladder: Seq[Double]): Column =
    ladder.reverse.foldLeft(lit(Double.PositiveInfinity)) { (acc, le) =>
      when(v <= lit(le), lit(le)).otherwise(acc)
    }

  /** Cumulative bucket counts per (keyCols, bucket_ts): one row per
    * touched rung with `le`, `cnt` (samples in this rung) and
    * `cum_cnt` (samples ≤ le — the Prometheus cumulative form).
    * Null values are dropped (no bucket).
    */
  def bucketCounts(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valCol: String, widthSpec: String, ladder: Seq[Double]): DataFrame = {
    require(ladder.nonEmpty && ladder == ladder.sorted && ladder.distinct == ladder,
      s"ladder must be strictly increasing: $ladder")
    val grouped = df
      .filter(col(valCol).isNotNull)
      .withColumn("bucket_ts",
        graft.rollup.Rollup.bucketWidth(col(tsCol), widthSpec))
      .withColumn("le", leOf(col(valCol), ladder))
      .groupBy((keyCols :+ "bucket_ts" :+ "le").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy((keyCols :+ "bucket_ts").map(col): _*)
      .orderBy(col("le"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped.withColumn("cum_cnt", sum(col("cnt")).over(w))
  }

  /** φ-quantile per (keyCols, bucket_ts) from [[bucketCounts]]
    * output, Prometheus interpolation. Emits `q_millis` =
    * floor(1000·estimate); φ = qNum/qDen rational so both engines
    * compute the identical `rank = (qNum/qDen)·total` double.
    */
  def quantileFromBuckets(buckets: DataFrame, keyCols: Seq[String],
      qNum: Int, qDen: Int, ladder: Seq[Double]): DataFrame = {
    require(qNum >= 1 && qNum <= qDen, s"quantile must be in (0, 1]: $qNum/$qDen")
    val part = (keyCols :+ "bucket_ts").map(col)
    val wAll = Window.partitionBy(part: _*)
    val maxFinite = ladder.last
    val rank = lit(qNum.toDouble) * col("_total") / lit(qDen.toDouble)
    // the bucket's TRUE lower edge: the ladder-adjacent rung (a plan
    // literal mapping) — NOT lag(le), which under sparse rows (empty
    // rungs absent) would widen the interpolation interval
    val lo = ladder.zip(0.0 +: ladder.init).reverse
      .foldLeft(lit(maxFinite)) { case (acc, (le, prev)) =>
        when(col("le") === lit(le), lit(prev)).otherwise(acc)
      }
    // cumulative count STRICTLY BELOW this bucket is cum - cnt (exact
    // from the bucket's own columns, no window dependence on presence)
    val cumPrev = col("cum_cnt") - col("cnt")
    val interp = lo + (col("le") - lo) * (rank - cumPrev) / col("cnt")
    buckets
      .withColumn("_total", max(col("cum_cnt")).over(wAll))
      .withColumn("_est",
        when(col("le") === Double.PositiveInfinity, lit(maxFinite))
          .otherwise(interp))
      // the chosen rung: the first touched one whose cumulative count
      // reaches rank (cum is strictly increasing across touched rungs,
      // rank ∈ (0, total] ⇒ exactly one row survives per group)
      .filter(col("cum_cnt") >= rank && cumPrev < rank)
      .select(part :+ floor(col("_est") * lit(1000.0)).cast("long")
        .as("q_millis"): _*)
  }

  /** One-call form over raw samples. */
  def quantile(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valCol: String, widthSpec: String, ladder: Seq[Double],
      qNum: Int, qDen: Int): DataFrame =
    quantileFromBuckets(
      bucketCounts(df, keyCols, tsCol, valCol, widthSpec, ladder),
      keyCols, qNum, qDen, ladder)
}
