package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-table as-of join — the design the reference wished for
  * (/root/reference/meta/wiki/old/insights-experience.md:5) to align
  * two feeds sampled at mismatched timestamps (its trace↔metric
  * clock offset problem, DEPR_time-offset-calculation.md:24-33),
  * without the row-loss its rounded-timestamp equi-join suffered.
  *
  * Backward inclusive semantics: each left row is matched with the
  * LATEST right row of the same key with `right.ts <= left.ts`
  * (within `toleranceUs`), exactly DuckDB's `ASOF LEFT JOIN` — which
  * is what makes the operator oracle-checkable.
  *
  * Implementation is the union+window trick, not a range join:
  * tag rows by side, union by key, and carry the last right payload
  * forward with a running window. ONE shuffle on (key), O(n log n)
  * per key for the sort — a range-condition join would be a
  * cartesian-per-key under Spark (BroadcastNestedLoop), the classic
  * as-of scale trap.
  */
object AsOf {

  /** @param right must be unique per (keyCols, rightTs) — pre-aggregate
    *   otherwise (a duplicate right timestamp would make "the" match
    *   nondeterministic in ANY engine).
    * @return all `left` columns, plus each right value column (null
    *   when unmatched or out of tolerance), plus `matched_ts` = the
    *   matched right timestamp.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String = "ts",
      rightTs: String = "ts",
      toleranceUs: Long = Long.MaxValue): DataFrame = {
    val rightVals = right.columns.filterNot(c => keyCols.contains(c) || c == rightTs)
    val payload = struct(
      (col(rightTs).cast("timestamp").as("_rts") +: rightVals.map(col)): _*)
    // right sorts BEFORE left at equal ts (side 0 < 1): backward
    // INCLUSIVE — a right row at exactly left.ts is visible to it
    val l2 = left.select(
      (left.columns.map(col) :+ col(leftTs).cast("timestamp").as("_ts")
        :+ lit(1).as("_side")): _*)
    val r2 = right.select(
      (keyCols.map(col) :+ col(rightTs).cast("timestamp").as("_ts")
        :+ lit(0).as("_side") :+ payload.as("_rp")): _*)
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("_m", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val ok: Column = col("_m").isNotNull &&
      (unix_micros(col("_ts")) - unix_micros(col("_m._rts")) <= toleranceUs)
    matched.select(
      (left.columns.map(col) ++
        rightVals.map(v => when(ok, col(s"_m.$v")).as(v)) :+
        when(ok, col("_m._rts")).as("matched_ts")): _*)
  }
}
