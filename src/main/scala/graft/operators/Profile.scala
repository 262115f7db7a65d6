package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass data-quality profiling: per-column row/null/distinct
  * counts plus type-appropriate extremes — the "what actually landed
  * in this table" check every ingest pipeline runs before trusting a
  * batch (schema drift, null floods, constant columns, truncated
  * strings all surface here first).
  *
  * Scale shape: ONE aggregate job over the table; every per-column
  * statistic is an algebraic partial (map-side combined). The exact
  * `countDistinct` set expands the scan `k`× for `k` profiled columns
  * (Catalyst's Expand) — profile the columns you care about, or flip
  * `approxDistinct = true` to profile wide tables in a single
  * non-expanded pass with HLL cardinalities (±~2%). Output is one row
  * per column — metadata-sized regardless of table size.
  *
  * Determinism/oracle: all emitted metrics are integral — counts,
  * floor-millis for numerics (exact ×1000 for integer types),
  * epoch-millis for timestamps, lexicographic min/max for strings,
  * exact floor average string length via non-negative-remainder
  * division.
  */
object Profile {

  /** Profile `cols` (default: every column). Output columns:
    * `col_name`, `n_rows`, `n_nulls`, `n_distinct`, `min_num_milli`,
    * `max_num_milli` (numeric ×1000 / timestamp epoch-millis; null
    * for strings), `min_str`, `max_str`, `avg_len_milli` (strings
    * only; null otherwise).
    */
  def profile(df: DataFrame, cols: Seq[String] = Seq.empty,
      approxDistinct: Boolean = false): DataFrame = {
    val names = if (cols.isEmpty) df.columns.toSeq else cols
    val missing = names.filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such columns: ${missing.mkString(",")}")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap

    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")
    def distinctOf(c: String): Column =
      if (approxDistinct) approx_count_distinct(col(c))
      else countDistinct(col(c))
    def numMilli(c: String, agg: Column => Column): Column = types(c) match {
      case ByteType | ShortType | IntegerType | LongType =>
        agg(col(c)).cast("long") * lit(1000L)
      case FloatType | DoubleType | _: DecimalType =>
        floor(agg(col(c)) * lit(1000.0)).cast("long")
      // NTZ (parquet without UTC adjustment) and DATE go through a
      // cast; the session timezone is pinned UTC so epoch is exact
      case TimestampType | TimestampNTZType | DateType =>
        unix_millis(agg(col(c)).cast("timestamp"))
      case _ => nullL
    }
    def strOf(c: String, agg: Column => Column): Column = types(c) match {
      case StringType => agg(col(c))
      case _ => nullS
    }
    // exact floor(1000·Σlen/n) via non-negative-remainder division
    def avgLen(c: String): Column = types(c) match {
      case StringType =>
        val s = sum(length(col(c))) * lit(1000L)
        val n = count(col(c))
        ((s - pmod(s, n)) / n).cast("long")
      case _ => nullL
    }

    val aggs = names.flatMap { c =>
      Seq(count(lit(1)).as(s"_n_$c"),
        (count(lit(1)) - count(col(c))).as(s"_nn_$c"),
        distinctOf(c).as(s"_nd_$c"),
        numMilli(c, min).as(s"_mn_$c"),
        numMilli(c, max).as(s"_mx_$c"),
        strOf(c, min).as(s"_ms_$c"),
        strOf(c, max).as(s"_xs_$c"),
        avgLen(c).as(s"_al_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCol = names.map { c =>
      struct(lit(c).as("col_name"),
        col(s"_n_$c").as("n_rows"), col(s"_nn_$c").as("n_nulls"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_mn_$c").as("min_num_milli"), col(s"_mx_$c").as("max_num_milli"),
        col(s"_ms_$c").as("min_str"), col(s"_xs_$c").as("max_str"),
        col(s"_al_$c").as("avg_len_milli"))
    }
    row.select(explode(array(perCol: _*)).as("_p")).select(col("_p.*"))
  }
}
