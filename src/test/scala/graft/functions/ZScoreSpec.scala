package graft.functions

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ZScoreSpec extends SparkSuite {
  import spark.implicits._

  private def ts(i: Int): Timestamp =
    new Timestamp(1700000000000L + i * 60000L)

  // flat series at 100.0 with one planted spike and one planted dip
  private def series: DataFrame =
    (0 until 40).map { i =>
      // spike and dip sit > lookback apart: a baseline contaminated
      // by one outlier rightly widens tolerance for the next
      val v = i match {
        case 10 => 400.0  // spike
        case 32 => 2.0    // dip (window 12..31 is spike-free)
        case _  => 100.0 + (i % 3) * 0.5 // mild jitter
      }
      ("m1", ts(i), i.toLong, v)
    }.toDF("key", "t", "id", "v")

  private def flags(df: DataFrame, lookback: Int = 20, minPoints: Int = 5) =
    SeriesFunctions.rollingZScoreFlags(df, "key", "t", "v",
      lookback, kNum = 3, kDen = 1, minPoints, Seq("id"))

  test("planted spike and dip flag, steady samples do not") {
    val got = flags(series)
      .select(col("id"), col("is_anomaly")).as[(Long, Option[Boolean])]
      .collect().toMap
    assert(got(10L).contains(true))
    assert(got(32L).contains(true))
    // steady neighbors with a full baseline stay unflagged
    Seq(20L, 24L, 30L, 39L).foreach(i => assert(got(i).contains(false), s"id $i"))
  }

  test("warm-up rows below minPoints yield null, not false") {
    val got = flags(series, minPoints = 5)
      .select(col("id"), col("is_anomaly")).as[(Long, Option[Boolean])]
      .collect().toMap
    (0L until 5L).foreach(i => assert(got(i).isEmpty, s"id $i"))
    assert(got(5L).isDefined)
  }

  test("the current sample never enters its own baseline") {
    // constant-value series: variance 0, every deviation 0 -> no flag;
    // if the current sample leaked into the frame a spike would
    // deflate its own z-score but ALSO shift mu - pin exact semantics
    // by brute-force recomputation of the planted series
    val rows = series.select("key", "t", "id", "v")
      .as[(String, Timestamp, Long, Double)].collect().sortBy(_._3)
    val vm = rows.map(r => math.floor(r._4 * 1000.0).toLong)
    val got = flags(series)
      .select(col("id"), col("n_baseline"), col("is_anomaly"))
      .as[(Long, Long, Option[Boolean])].collect()
      .map { case (k, n, f) => (k, (n, f)) }.toMap
    rows.foreach { case (_, _, id, _) =>
      val lo = math.max(0, id.toInt - 20)
      val win = vm.slice(lo, id.toInt) // excludes the current sample
      val n = win.length.toLong
      assert(got(id)._1 === n)
      if (n >= 5) {
        val s1 = win.sum
        val s2 = win.map(x => x * x).sum
        val dev = n * vm(id.toInt) - s1
        val expect = dev * dev > 9L * (n * s2 - s1 * s1)
        assert(got(id)._2.contains(expect), s"id $id")
      }
    }
  }

  test("series are independent across keys") {
    val two = series.unionByName(
      series.withColumn("key", lit("m2")).withColumn("v", col("v") + 1000.0))
    val got = flags(two).filter(col("key") === "m2")
      .select(col("id"), col("is_anomaly")).as[(Long, Option[Boolean])]
      .collect().toMap
    assert(got(10L).contains(true)) // m2's own spike still flags
    assert(got(24L).contains(false))
  }

  test("parameter rails reject degenerate configs") {
    assertThrows[IllegalArgumentException](flags(series, lookback = 0))
    assertThrows[IllegalArgumentException](flags(series, minPoints = 1))
    assertThrows[IllegalArgumentException](flags(series, lookback = 5, minPoints = 10))
  }
}
