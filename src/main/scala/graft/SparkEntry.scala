package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.compress.ChunkCodec
import graft.datagen.TranscriptGen
import graft.functions.GapFill
import graft.model.Tier
import graft.rollup.Rollup

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query's input is either a driver-provided parquet table under
  * `sfDir` or the transcript table derived *relationally* from
  * `events.parquet` (see [[TranscriptGen.fromEvents]]) so the DuckDB
  * oracle can reproduce it from the same parquet via a CTE.
  */
object SparkEntry {

  private def turns(s: SparkSession, dir: String): DataFrame =
    TranscriptGen.fromEvents(s, dir)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Rollup.rollupRaw(turns(spark, "/root/testdata/sf0.001"), Tier.Minute)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- transcript derivation itself (per-turn text equality, W5) ---
    "q_turns" -> ((s, dir) => turns(s, dir)),

    // --- rollup tiers raw→1m/1h/1d (A4 generalized, W1 floor buckets) ---
    "q_rollup_1m" -> ((s, dir) => Rollup.rollupRaw(turns(s, dir), Tier.Minute)),
    "q_rollup_1h" -> ((s, dir) => Rollup.rollupRaw(turns(s, dir), Tier.Hour)),
    "q_rollup_1d" -> ((s, dir) => Rollup.rollupRaw(turns(s, dir), Tier.Day)),

    // --- cascade consistency: fold(fold(1m)→1h)→1d ≡ raw→1d ---
    "q_rollup_cascade_1d" -> ((s, dir) =>
      Rollup.foldTier(
        Rollup.foldTier(
          Rollup.rollupRaw(turns(s, dir), Tier.Minute), Tier.Hour), Tier.Day)),

    // --- salted two-phase agg ≡ plain agg (skew handling, §4.1) ---
    "q_rollup_salted_1m" -> ((s, dir) =>
      Rollup.rollupRawSalted(turns(s, dir), Tier.Minute, saltBuckets = 16)),

    // --- cumulative counts over buckets (J3/A5 as window, not loops) ---
    "q_cumulative_1d" -> ((s, dir) => {
      val t1d = Rollup.rollupRaw(turns(s, dir), Tier.Day)
      val w = Window.partitionBy(col("conv_id")).orderBy(col("bucket_ts"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t1d.select(
        col("conv_id"), col("bucket_ts"),
        sum(col("turn_cnt")).over(w).as("cum_turns"),
        sum(col("tool_cnt")).over(w).as("cum_tools"),
        sum(col("text_len_sum")).over(w).as("cum_text_len"))
    }),

    // --- gap-fill: densify 1h series + linear interpolation (§2.5).
    // 1h tier: the dense grid is |convs|×span/1h — at 1m granularity a
    // month-spanning conversation would densify to 43k buckets, which
    // is the wrong tier for sparse series (grid explosion) ---
    "q_gapfill_1h" -> ((s, dir) =>
      GapFill.linear(Rollup.rollupRaw(turns(s, dir), Tier.Hour),
        "text_len_sum", Tier.Hour)),

    // --- Gorilla chunk encode→decode round-trip, distributed (§2.9) ---
    "q_chunk_roundtrip" -> ((s, dir) => {
      val m1 = Rollup.rollupRaw(turns(s, dir), Tier.Minute)
      val chunks = m1
        .groupBy(col("conv_id"), date_trunc("day", col("bucket_ts")).as("day"))
        .agg(ChunkCodec.chunkEncode(
          unix_micros(col("bucket_ts")),
          col("text_len_sum").cast("double")).as("chunk"))
      chunks
        .select(col("conv_id"), explode(ChunkCodec.chunkDecode(col("chunk"))).as("p"))
        .select(col("conv_id"),
          timestamp_micros(col("p.ts")).as("bucket_ts"),
          col("p.v").as("text_len"))
    }),

    // --- TPC-H-ish baseline agg (A1-family hash aggregate) ---
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
    }))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = {
    import TranscriptGen.withTurns
    Map(
      "q_turns" -> withTurns("SELECT * FROM turns"),
      "q_rollup_1m" -> withTurns(Rollup.oracleSql(Tier.Minute)),
      "q_rollup_1h" -> withTurns(Rollup.oracleSql(Tier.Hour)),
      "q_rollup_1d" -> withTurns(Rollup.oracleSql(Tier.Day)),
      "q_rollup_cascade_1d" -> withTurns(Rollup.oracleSql(Tier.Day)),
      "q_rollup_salted_1m" -> withTurns(Rollup.oracleSql(Tier.Minute)),
      "q_cumulative_1d" -> withTurns(
        s"""SELECT conv_id, bucket_ts,
           |  CAST(sum(turn_cnt) OVER w AS BIGINT) AS cum_turns,
           |  CAST(sum(tool_cnt) OVER w AS BIGINT) AS cum_tools,
           |  CAST(sum(text_len_sum) OVER w AS BIGINT) AS cum_text_len
           |FROM (${Rollup.oracleSql(Tier.Day)}) t
           |WINDOW w AS (PARTITION BY conv_id ORDER BY bucket_ts
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin),
      "q_gapfill_1h" -> withTurns(
        s"""WITH t AS (${Rollup.oracleSql(Tier.Hour)}),
           |grid AS (
           |  SELECT conv_id,
           |    unnest(generate_series(min(bucket_ts), max(bucket_ts),
           |      INTERVAL 1 HOUR)) AS bucket_ts
           |  FROM t GROUP BY conv_id),
           |j AS (
           |  SELECT g.conv_id, g.bucket_ts, CAST(t.text_len_sum AS DOUBLE) AS v
           |  FROM grid g LEFT JOIN t
           |    ON t.conv_id = g.conv_id AND t.bucket_ts = g.bucket_ts),
           |w AS (
           |  SELECT conv_id, bucket_ts, v,
           |    last_value(v IGNORE NULLS) OVER wb AS pv,
           |    first_value(v IGNORE NULLS) OVER wf AS nv,
           |    last_value(CASE WHEN v IS NOT NULL THEN bucket_ts END IGNORE NULLS)
           |      OVER wb AS pt,
           |    first_value(CASE WHEN v IS NOT NULL THEN bucket_ts END IGNORE NULLS)
           |      OVER wf AS nt
           |  FROM j
           |  WINDOW
           |    wb AS (PARTITION BY conv_id ORDER BY bucket_ts
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           |    wf AS (PARTITION BY conv_id ORDER BY bucket_ts
           |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
           |SELECT conv_id, bucket_ts,
           |  CASE WHEN v IS NOT NULL THEN v
           |       ELSE pv + (nv - pv) *
           |         (CAST(epoch(bucket_ts) AS DOUBLE) - CAST(epoch(pt) AS DOUBLE)) /
           |         (CAST(epoch(nt) AS DOUBLE) - CAST(epoch(pt) AS DOUBLE)) END AS value,
           |  (v IS NULL) AS filled
           |FROM w""".stripMargin),
      "q_chunk_roundtrip" -> withTurns(
        s"""SELECT conv_id, bucket_ts, CAST(text_len_sum AS DOUBLE) AS text_len
           |FROM (${Rollup.oracleSql(Tier.Minute)}) t""".stripMargin),
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
          |  sum(l_quantity) AS sum_qty,
          |  count(*) AS cnt,
          |  min(l_extendedprice) AS min_price,
          |  max(l_extendedprice) AS max_price
          |FROM lineitem GROUP BY 1, 2""".stripMargin)
  }
}
