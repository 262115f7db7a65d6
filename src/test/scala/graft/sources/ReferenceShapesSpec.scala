package graft.sources

import java.sql.Timestamp

import graft.SparkSuite

class ReferenceShapesSpec extends SparkSuite {
  import spark.implicits._

  private def res(name: String): String =
    getClass.getResource(s"/$name").getPath

  test("Prometheus parse: explode chain, pause repair, null/zero + sanity filters") {
    val df = ReferenceShapes.parsePromJson(spark, res("prom_sample.json")).cache()
    val rows = df.select($"metric_name", $"container", $"pod", $"device", $"value")
      .as[(String, String, String, String, Double)].collect().toSet
    // series 1: 3 samples, one is value=0 → dropped (P5)
    assert(rows.count(_._1 == "container_cpu_usage_seconds_total") == 3)
    // pause container: container=="POD" rows are repaired THEN dropped
    // by P5's container filter (reference does the same: repair at
    // MetricsParser.py:134-137, drop at :126-129)
    assert(!rows.exists(_._2 == "POD"))
    // device-only series survives the sanity filter via device branch
    assert(rows.exists(r => r._1 == "node_network_transmit_packets_total" && r._4 == "eth0"))
    // empty-pod + null-device series dropped (P6)
    assert(!rows.exists(_._5 == 3.5))
    // epoch-seconds → timestamp
    val ts = df.filter($"value" === 0.75).select($"ts").as[Timestamp].head()
    assert(ts.getTime == 1657266510000L)
    df.unpersist()
  }

  test("pause-container repair strips exactly the 2 hash suffixes") {
    val df = ReferenceShapes.parsePromJson(spark, res("prom_sample.json"),
      dropNullZero = false)
    val repaired = df.filter($"pod" === "pod-b-8a1c2e-y2")
      .select($"container").as[String].head()
    assert(repaired == "pod-b", s"got $repaired")
  }

  test("Jaeger parse: spans flat, status extracted without row blowup, broadcast lookup") {
    val df = ReferenceShapes.parseJaegerJson(spark, res("jaeger_sample.json")).cache()
    assert(df.count() == 3, "one row per span — tags must NOT multiply rows")
    val byId = df.collect().map(r => r.getAs[String]("spanID") -> r).toMap
    assert(byId("s1").getAs[String]("http_status_code") == "200")
    assert(byId("s2").getAs[String]("http_status_code") == null)
    assert(byId("s3").getAs[String]("http_status_code") == "500")
    // P9: references point at the PARENT
    assert(byId("s2").getAs[String]("parentSpanID") == "s1")
    assert(byId("s3").getAs[String]("parentSpanID") == "s2")
    assert(byId("s1").getAs[String]("parentSpanID") == null)
    // S4/P10 lookup join
    assert(byId("s1").getAs[String]("servicename") == "ts-order-service")
    assert(byId("s1").getAs[String]("podname") == "pod-a-7f9c4d-x1")
    assert(byId("s3").getAs[String]("servicename") == "ts-db-service")
    // P11: µs timestamp
    assert(byId("s1").getAs[Timestamp]("original_timestamp").getTime == 1657266481934L)
    df.unpersist()
  }

  test("Jaeger lookup join is planned as a broadcast join") {
    val plan = ReferenceShapes.parseJaegerJson(spark, res("jaeger_sample.json"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("three-feed e2e: spans ⋈ pivoted metrics ⋈ cumulative log counts") {
    val spans = ReferenceShapes.parseJaegerJson(spark, res("jaeger_sample.json"))
    val metrics = ReferenceShapes.parsePromJson(spark, res("prom_sample.json"))
    // the log feed's wall clock (09:15) runs ~1.5h ahead of the span
    // clock (07:48 UTC) — the reference's observed trace↔feed offset
    // problem; correct it feed-side like LogsParser does
    val logs = ReferenceShapes.parseStructuredLogs(spark, res("logs_sample.csv"),
      serviceName = "ts-order-service", hourOffset = -2)
    val out = ReferenceShapes.joinThreeFeeds(spans, metrics, logs).cache()
    // cardinality preserved: one row per span through the whole chain
    assert(out.count() == 3)
    val byId = out.collect().map(r => r.getAs[String]("spanID") -> r).toMap
    // spans s1/s2 (pod-a, bucket 09:08:00) see the 09:08:00 cpu sample
    val cpuCol = "metric_container_cpu_usage_seconds_total"
    assert(byId("s1").getAs[Double](cpuCol) == 0.5)
    assert(byId("s2").getAs[Double](cpuCol) == 0.5)
    // s3's pod-b series was pause-REPAIRED (container "POD" → "pod-b")
    // and therefore kept: its 09:08:00 sample joins through
    assert(byId("s3").getAs[Double](cpuCol) == 1.25)
    // cumulative log count ≤ span bucket: all 4 shifted events precede
    // the spans for ts-order-service; ts-db-service has no log feed
    assert(byId("s1").getAs[Long]("log_cnt") == 4L)
    assert(byId("s2").getAs[Long]("log_cnt") == 4L)
    assert(byId("s3").getAs[java.lang.Long]("log_cnt") == null)
    out.unpersist()
  }

  test("structured log parse: timestamp build + clock offset, no UDF") {
    val df = ReferenceShapes.parseStructuredLogs(spark, res("logs_sample.csv"),
      serviceName = "svc-a", hourOffset = 2)
    val rows = df.select($"Level", $"original_timestamp", $"source_servicename")
      .as[(String, Timestamp, String)].collect()
    assert(rows.length == 4)
    assert(rows.forall(_._3 == "svc-a"))
    val first = rows.map(_._2.getTime).min
    // 2022-07-08 09:15:01 UTC + 2h
    assert(first == java.time.Instant.parse("2022-07-08T11:15:01Z").toEpochMilli)
    assert(rows.map(_._1).toSet == Set("INFO", "WARN", "ERROR"))
  }
}
