package graft.functions

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSuite {
  import spark.implicits._

  private def ts(i: Int): Timestamp =
    new Timestamp(1700000000000L + i * 60000L)

  test("cusum accumulates sustained drift, decays after spikes, flags at threshold") {
    // target 100, slack 10 (millis: 100000/10000): values in units
    // of 1.0 -> v_milli = v*1000
    // chain (dev = v*1000 - 110000):
    //  v=100 -> max(0, -10000) = 0
    //  v=150 -> max(0, 0 + 40000) = 40000   (isolated spike)
    //  v=80  -> max(0, 40000 - 30000*? ... dev = -30000) = 10000
    //  v=90  -> max(0, 10000 - 20000) = 0   (decayed)
    //  v=130, 130, 130 -> 20000, 40000, 60000 (sustained drift)
    val vals = Seq(100.0, 150.0, 80.0, 90.0, 130.0, 130.0, 130.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("m", ts(i), i.toLong, v) }
      .toDF("k", "t", "id", "v")
    val got = SeriesFunctions.cusumDrift(df, Seq("k"), "t", "v",
        targetMilli = 100000L, slackMilli = 10000L, thresholdMilli = 50000L,
        orderCols = Seq("id"))
      .orderBy("id").select("cusum_milli", "drifting")
      .as[(Long, Boolean)].collect().toSeq
    assert(got.map(_._1) === Seq(0L, 40000L, 10000L, 0L, 20000L, 40000L, 60000L))
    assert(got.map(_._2) === Seq(false, false, false, false, false, false, true))
  }

  test("series are independent and fold order is pinned") {
    val df = Seq(("a", ts(1), 1L, 120.0), ("a", ts(0), 0L, 120.0),
      ("b", ts(0), 2L, 100.0)).toDF("k", "t", "id", "v")
    val got = SeriesFunctions.cusumDrift(df, Seq("k"), "t", "v",
        100000L, 0L, 30000L, Seq("id"))
      .select("k", "id", "cusum_milli").as[(String, Long, Long)]
      .collect().toSet
    // a: 20000 then 40000 in TS order regardless of input order
    assert(got === Set(("a", 0L, 20000L), ("a", 1L, 40000L), ("b", 2L, 0L)))
  }

  test("parameter rails") {
    val df = Seq(("a", ts(0), 0L, 1.0)).toDF("k", "t", "id", "v")
    assertThrows[IllegalArgumentException] {
      SeriesFunctions.cusumDrift(df, Seq("k"), "t", "v", 0L, -1L, 1L, Seq("id"))
    }
    assertThrows[IllegalArgumentException] {
      SeriesFunctions.cusumDrift(df, Seq("k"), "t", "v", 0L, 0L, 0L, Seq("id"))
    }
  }

  test("seasonal baseline compares each sample to its own hour-of-week slot") {
    // two Mondays 09:00 UTC (2026-01-05, 2026-01-12 are Mondays) and
    // one Monday 03:00: the 09:00 slot baseline must ignore 03:00
    def t(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      ("m", t("2026-01-05 09:00:00"), 100.0),
      ("m", t("2026-01-12 09:00:00"), 200.0),
      ("m", t("2026-01-05 03:00:00"), 7.0))
      .toDF("k", "t", "v")
    val got = SeriesFunctions.seasonalBaseline(df, Seq("k"), "t", "v")
      .select("how", "v_milli", "baseline_milli", "dev_milli")
      .as[(Long, Long, Long, Long)].collect().toSet
    // dayofweek(Monday)=2 -> how = 24+9 = 33 and 24+3 = 27
    assert(got === Set(
      (33L, 100000L, 150000L, -50000L),
      (33L, 200000L, 150000L, 50000L),
      (27L, 7000L, 7000L, 0L)))
  }

  test("seasonal baseline floor-division is exact for negative sums") {
    def t(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      ("m", t("2026-01-05 09:00:00"), -1.0),
      ("m", t("2026-01-12 09:00:00"), -2.0))
      .toDF("k", "t", "v")
    val got = SeriesFunctions.seasonalBaseline(df, Seq("k"), "t", "v")
      .select("baseline_milli").as[Long].collect().toSet
    // floor((-1000 + -2000)/2) = floor(-1500) = -1500
    assert(got === Set(-1500L))
  }
}
