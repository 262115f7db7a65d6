package graft.functions

import java.sql.Timestamp

import graft.SparkSuite

class SeriesFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("counterRate: increase, rate, and the Prometheus reset rule") {
    val df = Seq(
      ("m1", ts("2024-01-01 00:00:00"), 100.0, 1L),
      ("m1", ts("2024-01-01 00:00:10"), 160.0, 2L), // +60 over 10 s
      ("m1", ts("2024-01-01 00:00:30"), 40.0, 3L),  // reset: increase = 40
      ("m1", ts("2024-01-01 00:00:40"), 40.5, 4L),  // +0.5 over 10 s
      ("m2", ts("2024-01-01 00:00:00"), 7.0, 5L)    // lone sample: nulls
    ).toDF("series", "ts", "value", "sample_id")
    val out = SeriesFunctions
      .counterRate(df, "series", "ts", "value", Seq("sample_id"))
      .select("sample_id", "increase_millis", "rate_millis")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, None, None),
      (2L, Some(60000L), Some(6000L)),
      (3L, Some(40000L), Some(2000L)),
      (4L, Some(500L), Some(50L)),
      (5L, None, None)))
  }

  test("counterRate: zero time delta yields null rate but keeps the increase") {
    val df = Seq(
      ("m", ts("2024-01-01 00:00:00"), 1.0, 1L),
      ("m", ts("2024-01-01 00:00:00"), 3.0, 2L)
    ).toDF("series", "ts", "value", "sample_id")
    val out = SeriesFunctions
      .counterRate(df, "series", "ts", "value", Seq("sample_id"))
      .filter($"sample_id" === 2L)
      .select("increase_millis", "rate_millis").collect().head
    assert(out.getLong(0) === 2000L)
    assert(out.isNullAt(1))
  }

  test("rollingDistinctActives: trailing window, gap days, end-of-range cutoff") {
    val df = Seq(
      (ts("2024-01-01 10:00:00"), "a"),
      (ts("2024-01-01 11:00:00"), "a"), // same (day, id): dedup'd
      (ts("2024-01-01 12:00:00"), "b"),
      (ts("2024-01-03 09:00:00"), "a") // Jan 2 has no activity of its own
    ).toDF("ts", "conv_id")
    val out = SeriesFunctions.rollingDistinctActives(df, "ts", "conv_id", 3)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    // Jan 1 window = {Jan 1} → {a,b}; Jan 3 window = {Jan 1..3} → {a,b};
    // Jan 2 is not an OBSERVED day → dropped; Jan 4/5 past range → dropped
    assert(out === Map("2024-01-01" -> 2L, "2024-01-03" -> 2L))
  }

  test("downsampleMaxDev: keeps the extreme per bucket, ties pin on earliest ts") {
    val df = Seq(
      // one 1h bucket: values 0, 10, 5 → devs 15, 15, 0 → tie between
      // the 0-sample and the 10-sample; earliest ts must win
      ("u1", ts("2024-01-01 10:00:00"), 0.0, 1L),
      ("u1", ts("2024-01-01 10:10:00"), 10.0, 2L),
      ("u1", ts("2024-01-01 10:20:00"), 5.0, 3L),
      // single-sample bucket passes through
      ("u1", ts("2024-01-01 11:30:00"), 7.25, 4L),
      // other series, same hour: independent pick
      ("u2", ts("2024-01-01 10:05:00"), 1.0, 5L),
      ("u2", ts("2024-01-01 10:06:00"), 9.0, 6L)
    ).toDF("series", "ts", "value", "sample_id")
    val out = SeriesFunctions
      .downsampleMaxDev(df, "series", "ts", "value", "1h", Seq("sample_id"))
      .select("sample_id", "v_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // u2: mean 5 → devs 8, 8 → tie → earlier (sample 5) wins
    assert(out.toSeq === Seq((1L, 0L), (4L, 7250L), (5L, 1000L)))
  }

  test("rollingDistinctActives: windowDays=1 equals plain daily distinct") {
    val df = Seq(
      (ts("2024-01-01 10:00:00"), "a"),
      (ts("2024-01-01 12:00:00"), "b"),
      (ts("2024-01-02 10:00:00"), "b")
    ).toDF("ts", "conv_id")
    val out = SeriesFunctions.rollingDistinctActives(df, "ts", "conv_id", 1)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(out === Map("2024-01-01" -> 2L, "2024-01-02" -> 1L))
  }

  test("counterRateBucketed: last-per-bucket, reset across buckets, real Δt") {
    val df = Seq(
      // hour 10: samples 5 then 9 (last = 9 @ 10:40)
      ("u1", ts("2024-01-01 10:10:00"), 5.0, 1L),
      ("u1", ts("2024-01-01 10:40:00"), 9.0, 2L),
      // hour 11: last = 3609 @ 11:40 → increase 3600 over Δt = 1h real
      ("u1", ts("2024-01-01 11:05:00"), 10.0, 3L),
      ("u1", ts("2024-01-01 11:40:00"), 3609.0, 4L),
      // hour 13 (gap hour 12): counter RESET to 2 → increase = 2,
      // Δt = 2h real → 2000/7200 floors to 0
      ("u1", ts("2024-01-01 13:40:00"), 2.0, 5L)
    ).toDF("series", "ts", "value", "sample_id")
    val out = SeriesFunctions
      .counterRateBucketed(df, "series", "ts", "value", "1h", Seq("sample_id"))
      .collect().map(r => (r.getTimestamp(1).toString,
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sortBy(_._1)
    assert(out.toSeq === Seq(
      ("2024-01-01 10:00:00.0", -1L, -1L),        // first bucket: no prior
      ("2024-01-01 11:00:00.0", 3600000L, 1000L), // 3600 over 3600 s
      ("2024-01-01 13:00:00.0", 2000L, 0L)))      // reset; Δt = 2h real
  }

  test("sketch rolling actives within 5% of exact at a 30-day window") {
    // the >~2-week scale path: per-day HLL partials merge across the
    // window, so the shuffle never multiplies by windowDays. Realistic
    // cardinalities from the transcript fixture (events → conv/day
    // pairs over a month of activity).
    val events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    val df = events.select($"ts", $"user_id")
    val exact = SeriesFunctions.rollingDistinctActives(df, "ts", "user_id", 30)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val approx = SeriesFunctions
      .rollingDistinctActivesSketch(df, "ts", "user_id", 30)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(approx.keySet === exact.keySet,
      "sketch path must report exactly the observed days")
    exact.foreach { case (day, n) =>
      val a = approx(day)
      assert(math.abs(a - n) <= math.max(1L, (0.05 * n).toLong),
        s"day $day: sketch $a vs exact $n drifts past 5%")
    }
  }

  test("sketch rolling actives agrees on the toy window fixture semantics") {
    // tiny cardinalities: HLL is exact; the windowing semantics
    // (trailing window, unobserved-day drop) must match the exact op
    val df = Seq(
      (ts("2024-01-01 10:00:00"), "a"),
      (ts("2024-01-01 11:00:00"), "a"),
      (ts("2024-01-01 12:00:00"), "b"),
      (ts("2024-01-03 09:00:00"), "a")
    ).toDF("ts", "conv_id")
    val out = SeriesFunctions.rollingDistinctActivesSketch(df, "ts", "conv_id", 3)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(out === Map("2024-01-01" -> 2L, "2024-01-03" -> 2L))
  }
}
