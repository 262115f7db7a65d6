package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-harmonization helpers around ragged feeds — the reference's
  * P13 (`TraceInOneRowExploder.py` drops the all-null columns its
  * dynamic pivot produces for services absent from a trace batch).
  */
object Harmonize {

  /** Drop every column that is null on ALL rows — in ONE aggregate
    * pass (count per column), never a per-column scan. The decision
    * is driver-side schema surgery on |columns| counters, so the
    * data pass is a single map-side-combined job regardless of how
    * wide the frame is (the reference's shape is >1000 pivot
    * columns).
    *
    * Returns the input unchanged when nothing qualifies (no-op plan,
    * no extra scan at execution time). An empty frame keeps its
    * schema — "all null" means observed nulls, not absence of rows.
    */
  def dropAllNullColumns(df: DataFrame): DataFrame = {
    if (df.columns.isEmpty) return df
    val counts = df.select(
      df.columns.map(c => count(col(s"`$c`")).as(c)).toSeq: _*)
      .head()
    val total = df.columns.indices.map(counts.getLong)
    if (total.forall(_ > 0L)) df
    else {
      val keep = df.columns.zip(total).collect { case (c, n) if n > 0L => c }
      // count() == 0 for every column ⟺ zero rows: keep the schema
      if (keep.isEmpty) df
      else df.select(keep.map(c => col(s"`$c`")).toSeq: _*)
    }
  }
}
