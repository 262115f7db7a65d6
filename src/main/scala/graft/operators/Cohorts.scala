package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention — the standard product-analytics matrix over an
  * event stream: users bucketed by FIRST-activity day, each cell
  * (cohort_day, day_offset) counting how many of that cohort were
  * active offset days later, plus a per-mille retention rate against
  * the cohort's day-0 size. The reference renders activity series
  * but has no user-lifecycle view at all; this is that view,
  * Spark-first.
  *
  * Scale shape: activity collapses to DISTINCT (day, user) pairs
  * first (map-side combined — the shuffle is active-pairs, not raw
  * events), first-day is one grouped min over those pairs, and the
  * matrix is a self-equi-join on the user id followed by one grouped
  * count-distinct. Output cardinality is days × maxOffsetDays —
  * dashboard-sized however large the corpus. All outputs integral
  * (counts + floor per-mille), so the query hash-matches SQL.
  */
object Cohorts {

  /** Retention matrix with columns `cohort_day`, `day_offset`,
    * `active_users`, `cohort_size`, `retained_permille`. Offset 0 is
    * the cohort itself (retained_permille = 1000 by construction —
    * kept as the matrix's anchor row).
    */
  def retention(df: DataFrame, tsCol: String, idCol: String,
      maxOffsetDays: Int): DataFrame = {
    require(maxOffsetDays >= 0, s"maxOffsetDays must be >= 0: $maxOffsetDays")
    val acts = df
      .select(to_date(col(tsCol)).as("day"), col(idCol).as("_id"))
      .filter(col("day").isNotNull && col("_id").isNotNull)
      .distinct()
    val first = acts.groupBy(col("_id")).agg(min(col("day")).as("cohort_day"))
    val cells = acts.join(first, Seq("_id"))
      .withColumn("day_offset",
        datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("_id")).as("active_users"))
    // day-0 cell IS the cohort size (every user is active on their
    // own first day) — lift it across the cohort's row via a window,
    // no second join
    val w = Window.partitionBy(col("cohort_day"))
    cells
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0, col("active_users"))).over(w))
      .withColumn("retained_permille",
        floor(lit(1000.0) * col("active_users") / col("cohort_size"))
          .cast("long"))
  }
}
