package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-event-sequence analytics over a (ts, id, step) stream:
  * funnel conversion and first-order transition matrices — the two
  * standard "what do users do next" questions the reference's
  * rendered activity series cannot answer.
  *
  * Scale shapes:
  *  - [[funnel]] is a left fold over the (small, literal) step list:
  *    step k's reach frame = events(step k) equi-joined to step k−1's
  *    reach on the user id, filtered to strictly-later timestamps,
  *    grouped min. Every shuffle is keyed on the user id; the k
  *    grouped mins are map-side combined; per-step outputs are
  *    one-row counts. Never a window over the whole stream, never a
  *    cross join — cost is k passes over the single relevant step's
  *    slice (the step filter prunes at the scan).
  *  - [[transitionMatrix]] is one lag window per user (a single
  *    shuffle on the id) then a grouped count over (from, to) — the
  *    output is vocabulary², dashboard-sized however large the
  *    corpus. The per-source probability lifts via a window over
  *    that ALREADY-REDUCED frame.
  *
  * Determinism: ordering pins on (ts, orderCols...); all emitted
  * metrics are integral (counts + floor per-mille), so both compose
  * with the DuckDB hash oracle.
  */
object Sequences {

  /** Funnel conversion over an ordered step list: row k reports how
    * many distinct ids reached step k (strictly increasing
    * timestamps through the steps — the classic "signup then view
    * then purchase" rule) plus floor per-mille conversion vs step 0.
    * Output: `step_idx`, `step`, `users_reached`,
    * `conversion_permille`.
    */
  def funnel(df: DataFrame, tsCol: String, idCol: String,
      stepCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"funnel steps must be distinct: $steps")
    val base = df
      .filter(col(tsCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).as("_id"), col(tsCol).cast("timestamp").as("_ts"),
        col(stepCol).as("_step"))
    // reach(0) = earliest step-0 event per id; reach(k) = earliest
    // step-k event strictly after reach(k-1), per id
    val reaches = steps.zipWithIndex.tail.scanLeft(
      base.filter(col("_step") === steps.head)
        .groupBy(col("_id")).agg(min(col("_ts")).as("_t"))) {
      case (prev, (step, _)) =>
        base.filter(col("_step") === step)
          .join(prev.select(col("_id"), col("_t").as("_pt")), Seq("_id"))
          .filter(col("_ts") > col("_pt"))
          .groupBy(col("_id")).agg(min(col("_ts")).as("_t"))
    }
    val counts = reaches.zipWithIndex.map { case (r, i) =>
      r.agg(count(lit(1)).as("users_reached"))
        .select(lit(i).as("step_idx"), lit(steps(i)).as("step"),
          col("users_reached"))
    }.reduce(_ union _)
    val w = Window.partitionBy(lit(1))
    counts
      .withColumn("conversion_permille",
        floor(lit(1000.0) * col("users_reached") /
          max(when(col("step_idx") === 0, col("users_reached"))).over(w))
          .cast("long"))
  }

  /** First-order transition matrix: consecutive (from → to) step
    * pairs per id in (ts, orderCols) order, counted globally, with a
    * floor per-mille row-conditional probability (share of each
    * `from_step`'s outgoing transitions). Output: `from_step`,
    * `to_step`, `n_transitions`, `prob_permille`.
    */
  def transitionMatrix(df: DataFrame, tsCol: String, idCol: String,
      stepCol: String, orderCols: Seq[String]): DataFrame = {
    val ord = (col(tsCol).cast("timestamp") +: orderCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(idCol)).orderBy(ord: _*)
    val pairs = df
      .filter(col(tsCol).isNotNull && col(idCol).isNotNull)
      .withColumn("_from", lag(col(stepCol), 1).over(w))
      .filter(col("_from").isNotNull)
      .groupBy(col("_from").as("from_step"), col(stepCol).as("to_step"))
      .agg(count(lit(1)).as("n_transitions"))
    val wf = Window.partitionBy(col("from_step"))
    pairs.withColumn("prob_permille",
      floor(lit(1000.0) * col("n_transitions") /
        sum(col("n_transitions")).over(wf)).cast("long"))
  }
}
