package graft.model

import org.apache.spark.sql.types._

/** Core data model of the transcript time-series engine.
  *
  * Input shape is mandated by BASELINE.json `input_hint`:
  * `(conv_id:string, turn_idx:int32, role:string, text:string,
  * tool:string, ts:timestamp)`. It is the Spark-native analog of the
  * reference's flat span/log/metric tables (see
  * /root/reference/jaeger_prometheus_joining/transformationscripts/
  * TracesParser.py:147-156 — span rows keyed by pod + bucketed time).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: java.sql.Timestamp)

/** One rolled-up point of a tier table. Means are *derived* from
  * (sum, count) — never stored — so tier folds compose exactly
  * (algebraic partial-aggregate discipline, SURVEY.md §2.4/§7).
  */
final case class TierRow(
    conv_id: String,
    bucket_ts: java.sql.Timestamp,
    turn_cnt: Long,
    tool_cnt: Long,
    text_cnt: Long,
    text_len_sum: Long,
    text_len_min: Long,
    text_len_max: Long,
    role_user_cnt: Long,
    role_assistant_cnt: Long,
    role_tool_cnt: Long)

/** Rollup tiers of the continuous-aggregate cascade raw→1m→1h→1d.
  *
  * Bucketing is FLOOR (`date_trunc`) end-to-end — both engine and
  * oracle — a documented deviation from the reference's
  * round-half-up `dt.round` (ParseSettings.py:17-19); see SURVEY.md
  * §2.5 W1.
  */
sealed abstract class Tier(
    val name: String,
    /** Spark/DuckDB `date_trunc` unit. */
    val truncUnit: String,
    val millis: Long) extends Serializable

object Tier {
  case object Minute extends Tier("1m", "minute", 60L * 1000)
  case object Hour extends Tier("1h", "hour", 3600L * 1000)
  case object Day extends Tier("1d", "day", 86400L * 1000)

  val cascade: Seq[Tier] = Seq(Minute, Hour, Day)

  def apply(name: String): Tier = name match {
    case "1m" => Minute
    case "1h" => Hour
    case "1d" => Day
    case other => throw new IllegalArgumentException(s"unknown tier $other")
  }
}

object Schemas {
  /** Exact `input_hint` schema. */
  val turns: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = false)))

  val tier: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("bucket_ts", TimestampType, nullable = false),
    StructField("turn_cnt", LongType, nullable = false),
    StructField("tool_cnt", LongType, nullable = false),
    StructField("text_cnt", LongType, nullable = false),
    StructField("text_len_sum", LongType, nullable = false),
    StructField("text_len_min", LongType, nullable = false),
    StructField("text_len_max", LongType, nullable = false),
    StructField("role_user_cnt", LongType, nullable = false),
    StructField("role_assistant_cnt", LongType, nullable = false),
    StructField("role_tool_cnt", LongType, nullable = false)))
}
