package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tier

/** Linear-interpolation gap-fill over tier series (north_star:
  * "linear-interpolation gap-fill via lag/lead window functions").
  *
  * The reference's own wiki names as-of/gap alignment as the design it
  * wished it had (/root/reference/meta/wiki/old/insights-experience.md:5);
  * at fixed tier granularity, window frames are cheaper than an as-of
  * join: one `sequence()` explode densifies each conversation's bucket
  * grid, then two frame-bounded window passes recover the previous and
  * next observed points. No shuffle beyond the two window sorts on
  * (conv_id) — both reuse one hash partitioning of conv_id.
  *
  * Semantics (matches graft.oracle.Oracle.gapFillLinear):
  *   - observed buckets keep their value, `filled=false`
  *   - interior gaps get linear interpolation between nearest observed
  *     neighbors, `filled=true`
  *   - leading/trailing positions cannot exist (the grid spans
  *     min..max observed bucket per conversation), so no nulls remain.
  */
object GapFill {

  /** Densify + interpolate one metric column of a tier table.
    *
    * @param tierRows (conv_id, bucket_ts, <valueCol>, ...) rows
    * @param valueCol  numeric column to interpolate (read as double)
    * @return (conv_id, bucket_ts, value double, filled boolean)
    */
  def linear(tierRows: DataFrame, valueCol: String, tier: Tier): DataFrame = {
    val step = expr(s"INTERVAL ${tier.millis / 1000} SECONDS")
    // dense per-conversation grid: sequence() is codegen'd, no UDF
    val grid = tierRows
      .groupBy(col("conv_id"))
      .agg(min(col("bucket_ts")).as("lo"), max(col("bucket_ts")).as("hi"))
      .select(col("conv_id"),
        explode(sequence(col("lo"), col("hi"), step)).as("bucket_ts"))

    val joined = grid.join(
      tierRows.select(col("conv_id"), col("bucket_ts"),
        col(valueCol).cast("double").as("_v")),
      Seq("conv_id", "bucket_ts"), "left")

    val byConv = Window.partitionBy(col("conv_id")).orderBy(col("bucket_ts"))
    val back = byConv.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = byConv.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val prevV = last(col("_v"), ignoreNulls = true).over(back)
    val nextV = first(col("_v"), ignoreNulls = true).over(fwd)
    val obsTs = when(col("_v").isNotNull, col("bucket_ts"))
    val prevT = last(obsTs, ignoreNulls = true).over(back).cast("long")
    val nextT = first(obsTs, ignoreNulls = true).over(fwd).cast("long")

    joined.select(
      col("conv_id"), col("bucket_ts"),
      when(col("_v").isNotNull, col("_v"))
        .otherwise(prevV + (nextV - prevV) *
          ((col("bucket_ts").cast("long") - prevT) / (nextT - prevT)))
        .as("value"),
      col("_v").isNull.as("filled"))
  }

  /** Last-observation-carried-forward fill: gaps take the previous
    * observed value (the standard monitoring-dashboard mode). Same
    * grid/window machinery as [[linear]], one window pass.
    */
  def locf(tierRows: DataFrame, valueCol: String, tier: Tier): DataFrame = {
    val step = expr(s"INTERVAL ${tier.millis / 1000} SECONDS")
    val grid = tierRows
      .groupBy(col("conv_id"))
      .agg(min(col("bucket_ts")).as("lo"), max(col("bucket_ts")).as("hi"))
      .select(col("conv_id"),
        explode(sequence(col("lo"), col("hi"), step)).as("bucket_ts"))
    val joined = grid.join(
      tierRows.select(col("conv_id"), col("bucket_ts"),
        col(valueCol).cast("double").as("_v")),
      Seq("conv_id", "bucket_ts"), "left")
    val back = Window.partitionBy(col("conv_id")).orderBy(col("bucket_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(
      col("conv_id"), col("bucket_ts"),
      last(col("_v"), ignoreNulls = true).over(back).as("value"),
      col("_v").isNull.as("filled"))
  }

  /** Zero fill: gaps become 0 — correct for additive count metrics
    * (a bucket with no turns has zero turns, not "unknown turns").
    */
  def zero(tierRows: DataFrame, valueCol: String, tier: Tier): DataFrame = {
    val step = expr(s"INTERVAL ${tier.millis / 1000} SECONDS")
    val grid = tierRows
      .groupBy(col("conv_id"))
      .agg(min(col("bucket_ts")).as("lo"), max(col("bucket_ts")).as("hi"))
      .select(col("conv_id"),
        explode(sequence(col("lo"), col("hi"), step)).as("bucket_ts"))
    grid.join(
        tierRows.select(col("conv_id"), col("bucket_ts"),
          col(valueCol).cast("double").as("_v")),
        Seq("conv_id", "bucket_ts"), "left")
      .select(
        col("conv_id"), col("bucket_ts"),
        coalesce(col("_v"), lit(0.0d)).as("value"),
        col("_v").isNull.as("filled"))
  }
}
