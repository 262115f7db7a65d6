package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-dependent wide pivot — the reference's signature output shape:
  * one row per trace with per-service prefixed columns, ">1000 and
  * not static" (/root/reference/jaeger_prometheus_joining/
  * featureengineering/TraceInOneRowExploder.py:2-21,383-389;
  * metric-name-becomes-column at transformationscripts/
  * MetricsParser.py:111-123).
  *
  * Two passes, which is the only scale-sound shape for a pivot whose
  * columns the data decides:
  *
  *  1. a distinct scan of the pivot column — output is |vocabulary|
  *     rows (column-count scale, NOT data scale; the driver holds
  *     column NAMES either way, that's what a schema is). Sorted for
  *     deterministic column order; `maxColumns` guards runaway
  *     vocabularies (Spark's own `spark.sql.pivotMaxValues` analog).
  *  2. a single-shuffle `pivot(col, values)` with the explicit list —
  *     handing Spark the values up front avoids its own hidden
  *     distinct job AND keeps pass 2 one map-side-combined aggregate.
  */
object DynamicPivot {

  /** Pivot `pivotCol` into `prefix<value>` columns of `valueAgg`,
    * grouped by `groupCols`. Null pivot values are dropped (they
    * name no column); missing (group, value) cells are 0, matching
    * conditional-aggregation SQL semantics.
    */
  def pivotWide(
      df: DataFrame,
      groupCols: Seq[String],
      pivotCol: String,
      valueAgg: Column,
      prefix: String = "",
      maxColumns: Int = 10000): DataFrame = {
    // limit BEFORE collect: a runaway-cardinality pivot column must
    // trip the guard, not OOM the driver fetching the whole vocabulary
    // first (Spark's own pivot limits its distinct job the same way)
    val vals = df
      .select(col(pivotCol)).filter(col(pivotCol).isNotNull)
      .distinct().orderBy(col(pivotCol))
      .limit(maxColumns + 1)
      .collect().map(_.get(0))
    require(vals.length <= maxColumns,
      s"pivot vocabulary exceeds maxColumns=$maxColumns")
    val pivoted = df
      .filter(col(pivotCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .pivot(pivotCol, vals.toSeq)
      .agg(valueAgg)
      .na.fill(0L, vals.map(v => s"$v"))
    pivoted.select(
      (groupCols.map(col) ++
        vals.map(v => col(s"`$v`").as(s"$prefix$v"))): _*)
  }
}
