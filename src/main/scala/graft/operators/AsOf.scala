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
  * Two directions, both inclusive at ties and both matching DuckDB's
  * native `ASOF LEFT JOIN` (which is what makes the operator
  * oracle-checkable):
  *
  *  - [[Direction.Backward]] (default): each left row matches the
  *    LATEST right row of the same key with `right.ts <= left.ts`;
  *  - [[Direction.Forward]]: the EARLIEST right row with
  *    `right.ts >= left.ts` — the natural dual for the reference's
  *    symmetric clock-offset problem (a span may need the NEXT metric
  *    sample when feeds skew the other way).
  *
  * Implementation is the union+window trick, not a range join:
  * tag rows by side, union by key, and carry the nearest right
  * payload across with a running window (scan ascending for
  * backward, descending for forward). ONE shuffle on (key),
  * O(n log n) per key for the sort — a range-condition join would be
  * a cartesian-per-key under Spark (BroadcastNestedLoop), the
  * classic as-of scale trap.
  */
object AsOf {

  sealed trait Direction
  object Direction {
    case object Backward extends Direction
    case object Forward extends Direction
  }

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
      toleranceUs: Long = Long.MaxValue,
      direction: Direction = Direction.Backward): DataFrame = {
    val rightVals =
      right.columns.toSeq.filterNot(c => keyCols.contains(c) || c == rightTs)
    val payload = struct(
      (col(rightTs).cast("timestamp").as("_rts") +: rightVals.map(col)): _*)
    // right sorts BEFORE left at equal ts (side 0 < 1) in BOTH scan
    // directions: INCLUSIVE — a right row at exactly left.ts is
    // visible to it
    val l2 = left.select(
      (left.columns.toSeq.map(col) :+ col(leftTs).cast("timestamp").as("_ts")
        :+ lit(1).as("_side")): _*)
    val r2 = right.select(
      (keyCols.map(col) :+ col(rightTs).cast("timestamp").as("_ts")
        :+ lit(0).as("_side") :+ payload.as("_rp")): _*)
    val u = l2.unionByName(r2, allowMissingColumns = true)
    // backward: ascending scan → last right seen = latest at-or-before;
    // forward: descending scan → last right seen = earliest at-or-after
    val order = direction match {
      case Direction.Backward => Seq(col("_ts").asc, col("_side").asc)
      case Direction.Forward => Seq(col("_ts").desc, col("_side").asc)
    }
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("_m", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val gapUs = direction match {
      case Direction.Backward =>
        unix_micros(col("_ts")) - unix_micros(col("_m._rts"))
      case Direction.Forward =>
        unix_micros(col("_m._rts")) - unix_micros(col("_ts"))
    }
    val ok: Column = col("_m").isNotNull && (gapUs <= toleranceUs)
    matched.select(
      (left.columns.toSeq.map(col) ++
        rightVals.map(v => when(ok, col(s"_m.$v")).as(v)) :+
        when(ok, col("_m._rts")).as("matched_ts")): _*)
  }
}
