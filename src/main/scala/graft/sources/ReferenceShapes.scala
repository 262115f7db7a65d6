package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven readers for the reference's three source shapes,
  * re-expressed Spark-first. These prove the engine can ingest the
  * reference's actual feeds (observability JSON) — the transcript
  * domain is the primary input, but the parse/flatten operators are
  * the same family (SURVEY.md §2.1-§2.2).
  *
  * Shapes follow:
  *  - Prometheus matrix JSON: /root/reference/jaeger_prometheus_joining/
  *    transformationscripts/MetricsParser.py:36-81 (S2, P1-P6)
  *  - Jaeger trace JSON: TracesParser.py:55-101 (S3, S4, P7-P11)
  *  - structured log CSV: LogsParser.py:39-52 (S6, P12)
  *
  * The declared `StructType`s do "90% of parsing" exactly as the
  * reference's schema'd readers do — only declared fields are
  * extracted, the JSON reader prunes the rest.
  */
object ReferenceShapes {

  // ---------------------------------------------------------------
  // Prometheus (metrics)
  // ---------------------------------------------------------------

  /** data.result[].metric labels the reference declares (subset
    * sufficient for the flatten semantics; extras prune away).
    */
  val promSchema: StructType = StructType(Seq(
    StructField("status", StringType),
    StructField("data", StructType(Seq(
      StructField("resultType", StringType),
      StructField("result", ArrayType(StructType(Seq(
        StructField("metric", StructType(Seq(
          StructField("__name__", StringType),
          StructField("container", StringType),
          StructField("pod", StringType),
          StructField("job", StringType),
          StructField("device", StringType)))),
        StructField("values", ArrayType(ArrayType(StringType))))))))))))

  /** P1 explode chain: unnest(data) → explode(result) → unnest →
    * explode(values) — one row per (series, sample); then P3-P6:
    * epoch-seconds cast, value cast, pause-container repair, null/zero
    * filter, join-key sanity filter.
    */
  def parsePromJson(spark: SparkSession, path: String, dropNullZero: Boolean = true): DataFrame = {
    val raw = spark.read.schema(promSchema).json(path)
    val exploded = raw
      .select(explode(col("data.result")).as("r"))
      .select(col("r.metric.*"), explode(col("r.values")).as("v"))
      .select(
        col("__name__").as("metric_name"),
        col("container"), col("pod"), col("job"), col("device"),
        timestamp_seconds(element_at(col("v"), 1).cast("double")).as("ts"),
        element_at(col("v"), 2).cast("double").as("value"))
    // P4 pause-container repair: strip the 2 hash suffixes off the pod
    // name when container=="POD" (MetricsParser.py:134-137)
    val repaired = exploded.withColumn("container",
      when(col("container") === "POD",
        array_join(slice(split(col("pod"), "-"), lit(1),
          greatest(size(split(col("pod"), "-")) - 2, lit(1))), "-"))
        .otherwise(col("container")))
    val filtered =
      if (dropNullZero)
        // P5; null container (node-level series) is NOT a pause
        // container — keep it (three-valued logic would drop it)
        repaired.filter(
          (col("container").isNull || col("container") =!= "POD") &&
            col("value") =!= 0.0)
      else repaired
    // P6 join-key sanity
    filtered.filter(
      (col("pod").isNotNull && col("pod") =!= "") || col("device").isNotNull)
  }

  // ---------------------------------------------------------------
  // Jaeger (traces)
  // ---------------------------------------------------------------

  val jaegerSchema: StructType = StructType(Seq(
    StructField("data", ArrayType(StructType(Seq(
      StructField("traceID", StringType),
      StructField("spans", ArrayType(StructType(Seq(
        StructField("spanID", StringType),
        StructField("operationName", StringType),
        StructField("startTime", LongType),
        StructField("duration", LongType),
        StructField("processID", StringType),
        StructField("tags", ArrayType(StructType(Seq(
          StructField("key", StringType),
          StructField("value", StringType))))),
        StructField("references", ArrayType(StructType(Seq(
          StructField("traceID", StringType),
          StructField("spanID", StringType))))))))),
      StructField("processes", MapType(StringType, StructType(Seq(
        StructField("serviceName", StringType),
        StructField("tags", ArrayType(StructType(Seq(
          StructField("key", StringType),
          StructField("value", StringType)))))))))))))))

  /** P7 span explode + P8 tag extraction done right: instead of the
    * reference's explode-tags-then-dedup-keep-first (which multiplies
    * span rows, TracesParser.py:111-129 + Joiner.py:104), extract the
    * status tag with one `filter()` HOF — no row blowup, no
    * order-dependent dedup. P9 parent-reference rename; P10 process
    * lookup as a broadcast join (replacing map_dict, S4); P11
    * timestamp normalize, keeping original_timestamp.
    */
  def parseJaegerJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.schema(jaegerSchema).json(path)
    val traces = raw.select(explode(col("data")).as("t"))
    // S4/P10: processID → (servicename, podname='hostname' tag) lookup,
    // exploded from the processes map and broadcast-joined
    val lookup = traces.select(col("t.traceID").as("traceID"),
        explode(col("t.processes")).as(Seq("processID", "p")))
      .select(col("traceID"), col("processID"),
        col("p.serviceName").as("servicename"),
        try_element_at(filter(col("p.tags"), t => t.getField("key") === "hostname"),
          lit(1)).getField("value").as("podname"))
    val spans = traces
      .select(col("t.traceID").as("traceID"), explode(col("t.spans")).as("s"))
      .select(
        col("traceID"),
        col("s.spanID").as("spanID"),
        col("s.operationName").as("operationName"),
        col("s.processID").as("processID"),
        col("s.duration").as("duration"),
        timestamp_micros(col("s.startTime")).as("original_timestamp"),
        // P8 without blowup: first matching status tag per span
        // (try_element_at: empty tag lists → null, not an ANSI error)
        try_element_at(filter(col("s.tags"),
          t => t.getField("key").isin("http.status_code", "otel.status_code")),
          lit(1)).getField("value").as("http_status_code"),
        // P9: Jaeger CHILD_OF references point at the PARENT span —
        // the reference misleadingly renames them child* (TracesParser
        // .py:131-137); we name them parent* and keep one per span
        try_element_at(col("s.references"), lit(1))
          .getField("spanID").as("parentSpanID"))
    spans.join(broadcast(lookup), Seq("traceID", "processID"), "left")
  }

  // ---------------------------------------------------------------
  // Structured logs (post-template-mining CSV)
  // ---------------------------------------------------------------

  val logSchema: StructType = StructType(Seq(
    StructField("LineId", LongType),
    StructField("Date", StringType),
    StructField("Time", StringType),
    StructField("Level", StringType),
    StructField("Number", LongType),
    StructField("LoggingReporter", StringType),
    StructField("Content", StringType),
    StructField("EventId", StringType),
    StructField("EventTemplate", StringType)))

  /** S6 + P12: CSV scan, `Date + " " + Time` timestamp build, clock
    * offset as native interval arithmetic (the reference's row-lambda
    * `.apply(+timedelta)` becomes a column op — no UDF).
    */
  def parseStructuredLogs(spark: SparkSession, path: String,
      serviceName: String, hourOffset: Int = 0): DataFrame =
    spark.read.schema(logSchema).option("header", "true").csv(path)
      .select(
        col("Level"), col("EventId"), col("EventTemplate"), col("Content"),
        lit(serviceName).as("source_servicename"),
        (to_timestamp(concat_ws(" ", col("Date"), col("Time")))
          + expr(s"INTERVAL $hourOffset HOURS")).as("original_timestamp"))

  /** S5: RAW `.log` text → the structured shape, replacing the
    * reference's AEL mining stage (LogsParser.py:21-37) with the
    * relational template miner. One regexp parses the reference's own
    * log_format `<Date> <Time> <Level> <Number>---<LoggingReporter>:
    * <Content>` (LogsParser.py:26); [[graft.functions.LogTemplates]]
    * then masks Content's variables into (EventId, EventTemplate,
    * params). Output columns match [[parseStructuredLogs]], so the
    * result feeds [[joinThreeFeeds]] unchanged — a user pointing the
    * engine at raw agent/tool logs gets the full pipeline.
    */
  def parseRawLogs(spark: SparkSession, path: String,
      serviceName: String, hourOffset: Int = 0): DataFrame = {
    val lineRe = "^(\\S+) (\\S+) (\\S+) (\\d+)---([^:]*): (.*)$"
    val parsed = spark.read.text(path)
      .select(
        regexp_extract(col("value"), lineRe, 1).as("Date"),
        regexp_extract(col("value"), lineRe, 2).as("Time"),
        regexp_extract(col("value"), lineRe, 3).as("Level"),
        regexp_extract(col("value"), lineRe, 6).as("Content"))
      .filter(col("Date") =!= "") // unparseable lines drop, as in AEL
    graft.functions.LogTemplates.mine(parsed, "Content")
      .select(
        col("Level"),
        concat(lit("E"), col("event_id").cast("string")).as("EventId"),
        col("template").as("EventTemplate"),
        col("Content"),
        lit(serviceName).as("source_servicename"),
        (to_timestamp(concat_ws(" ", col("Date"), col("Time")))
          + expr(s"INTERVAL $hourOffset HOURS")).as("original_timestamp"))
  }

  // ---------------------------------------------------------------
  // composed three-feed pipeline
  // ---------------------------------------------------------------

  /** The reference's END-TO-END join (controlflow/Joiner.py:18-46):
    * spans, metric samples, and log events — each on its own clock —
    * aligned on a rounded time bucket (default 30s, the reference's
    * `rounding_acc`):
    *
    *  1. metric samples → per-(pod, bucket) means, then a
    *     data-dependent pivot into `metric_<name>` columns
    *     (MetricsParser.py:111-123 shape via [[graft.operators.DynamicPivot]]);
    *  2. spans LEFT-join the wide metrics on (podname, bucket) — the
    *     J1 align-join;
    *  3. log events → cumulative count ≤ t per service (J3), attached
    *     with a backward as-of join ([[graft.operators.AsOf]]) so a
    *     span sees the log volume up to its own bucket even when no
    *     log landed in that exact bucket.
    *
    * Returns one row per span (cardinality preserved — the P7/P8
    * no-blowup discipline holds through the whole pipeline).
    */
  def joinThreeFeeds(spans: DataFrame, metrics: DataFrame, logs: DataFrame,
      widthSpec: String = "30s"): DataFrame = {
    import graft.operators.{AsOf, DynamicPivot}
    import graft.rollup.Rollup
    val sb = spans.withColumn("bucket_ts",
      Rollup.bucketWidth(col("original_timestamp"), widthSpec, nearest = true))
    val mBuckets = metrics
      .filter(col("pod").isNotNull && col("pod") =!= "")
      .groupBy(col("pod").as("podname"),
        Rollup.bucketWidth(col("ts"), widthSpec, nearest = true).as("bucket_ts"),
        col("metric_name"))
      .agg(avg(col("value")).as("value"))
    val mWide = DynamicPivot.pivotWide(mBuckets, Seq("podname", "bucket_ts"),
      "metric_name", first(col("value")), prefix = "metric_")
    val withMetrics = sb.join(mWide, Seq("podname", "bucket_ts"), "left")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("servicename")).orderBy(col("bucket_ts"))
      .rowsBetween(Long.MinValue, 0)
    val logCum = logs
      .groupBy(col("source_servicename").as("servicename"),
        Rollup.bucketWidth(col("original_timestamp"), widthSpec, nearest = true)
          .as("bucket_ts"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("log_cnt", sum(col("cnt")).over(w))
      .select(col("servicename"), col("bucket_ts"), col("log_cnt"))
    AsOf.join(withMetrics, logCum, Seq("servicename"),
      leftTs = "bucket_ts", rightTs = "bucket_ts")
  }
}
