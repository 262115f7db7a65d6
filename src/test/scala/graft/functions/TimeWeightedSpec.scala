package graft.functions

import java.sql.Timestamp

import graft.SparkSuite

class TimeWeightedSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  test("LOCF integral weights by held time, splits across buckets, clips at staleness") {
    // 60s buckets, staleness 2 buckets. Series m:
    //   [0,30)v=10  [30,90)v=20  [90,400)v=30 clipped to [90,180); last
    //   sample (t=400) holds nothing.
    // b0: 30s@10 + 30s@20 -> twa 15000, covered 60s
    // b1: 30s@20 + 30s@30 -> twa 25000
    // b2: 60s@30 -> 30000; b3+ absent (staleness)
    val df = Seq((0L, 10.0), (30L, 20.0), (90L, 30.0), (400L, 40.0))
      .zipWithIndex.map { case ((t, v), i) => ("m", ts(t), i.toLong, v) }
      .toDF("k", "t", "id", "v")
    val got = SeriesFunctions.timeWeightedAvg(df, Seq("k"), "t", "v",
        bucketSecs = 60, maxGapBuckets = 2, orderCols = Seq("id"))
      .orderBy("bucket_ts")
      .select("bucket_ts", "twa_milli", "covered_us")
      .as[(Timestamp, Long, Long)].collect().toSeq
    assert(got === Seq(
      (ts(0), 15000L, 60000000L),
      (ts(60), 25000L, 60000000L),
      (ts(120), 30000L, 60000000L)))
  }

  test("partial coverage is reported, plain avg would differ") {
    // one 10s hold inside b1: twa = the held value, covered = 10s
    val df = Seq(("p", ts(90), 0L, 50.0), ("p", ts(100), 1L, 60.0))
      .toDF("k", "t", "id", "v")
    val got = SeriesFunctions.timeWeightedAvg(df, Seq("k"), "t", "v",
        60, 2, Seq("id"))
      .select("twa_milli", "covered_us").as[(Long, Long)].collect().toSeq
    assert(got === Seq((50000L, 10000000L)))
  }

  test("chatty periods do not over-count (vs sample-count average)") {
    // 50s@100 then 10 quick samples of 0 in the last 10s: twa is
    // time-dominated by the 100, sample-avg would be ~9
    val df = (Seq(("c", ts(0), 0L, 100.0)) ++
      (1 to 10).map(i => ("c", ts(49 + i), i.toLong, 0.0)))
      .toDF("k", "t", "id", "v")
    val got = SeriesFunctions.timeWeightedAvg(df, Seq("k"), "t", "v",
        60, 2, Seq("id"))
      .select("twa_milli").as[Long].collect().toSeq
    // [0,50)@100000 + [50,59) 9s@0 -> floor(100000*50/59) = 84745
    assert(got === Seq(84745L))
  }

  test("duplicate timestamps contribute no zero-length segments") {
    val df = Seq(("d", ts(0), 0L, 1.0), ("d", ts(0), 1L, 2.0),
      ("d", ts(30), 2L, 3.0)).toDF("k", "t", "id", "v")
    val got = SeriesFunctions.timeWeightedAvg(df, Seq("k"), "t", "v",
        60, 2, Seq("id"))
      .select("twa_milli", "covered_us").as[(Long, Long)].collect().toSeq
    // only [0,30) from the id=1 copy (lead order pinned by id)
    assert(got === Seq((2000L, 30000000L)))
  }

  test("parameter rails") {
    val df = Seq(("a", ts(0), 0L, 1.0)).toDF("k", "t", "id", "v")
    assertThrows[IllegalArgumentException] {
      SeriesFunctions.timeWeightedAvg(df, Seq("k"), "t", "v", 0, 2, Seq("id"))
    }
    assertThrows[IllegalArgumentException] {
      SeriesFunctions.timeWeightedAvg(df, Seq("k"), "t", "v", 60, 0, Seq("id"))
    }
  }
}
