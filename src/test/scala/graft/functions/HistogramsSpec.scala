package graft.functions

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class HistogramsSpec extends SparkSuite {
  import spark.implicits._

  private val ladder = Seq(1.0, 5.0, 10.0, 50.0)

  private def ts(i: Int): Timestamp =
    new Timestamp(1700000000000L + i * 1000L)

  // one series, one hour bucket: 10 samples with known placement
  // rungs: (0,1]: 2 samples; (1,5]: 3; (5,10]: 4; (10,50]: 1
  private def samples: DataFrame =
    Seq(0.5, 1.0, 2.0, 3.0, 4.9, 6.0, 7.0, 8.0, 9.5, 20.0)
      .zipWithIndex.map { case (v, i) => ("svc", ts(i), v) }
      .toDF("k", "t", "v")

  test("bucket counts are cumulative over touched rungs") {
    val b = Histograms.bucketCounts(samples, Seq("k"), "t", "v", "1h", ladder)
      .orderBy("le").select("le", "cnt", "cum_cnt")
      .as[(Double, Long, Long)].collect().toSeq
    assert(b === Seq((1.0, 2L, 2L), (5.0, 3L, 5L), (10.0, 4L, 9L), (50.0, 1L, 10L)))
  }

  test("median interpolates inside the chosen rung (Prometheus rule)") {
    // rank = 0.5*10 = 5 -> rung le=5 (cum 5, cumPrev 2):
    // est = 1 + (5-1)*(5-2)/3 = 5.0
    val q = Histograms.quantile(samples, Seq("k"), "t", "v", "1h",
      ladder, qNum = 1, qDen = 2)
    assert(q.select("q_millis").as[Long].head() === 5000L)
  }

  test("p90 lands in the (5,10] rung") {
    // rank = 9 -> rung le=10 (cum 9, cumPrev 5):
    // est = 5 + 5*(9-5)/4 = 10.0
    val q = Histograms.quantile(samples, Seq("k"), "t", "v", "1h",
      ladder, qNum = 9, qDen = 10)
    assert(q.select("q_millis").as[Long].head() === 10000L)
  }

  test("overflow samples clamp the estimate to the highest finite rung") {
    val wild = samples.unionByName(Seq(("svc", ts(99), 1e6)).toDF("k", "t", "v"))
    val q = Histograms.quantile(wild, Seq("k"), "t", "v", "1h",
      ladder, qNum = 1, qDen = 1) // max -> +Inf rung
    assert(q.select("q_millis").as[Long].head() === 50000L)
  }

  test("interpolation uses the ladder-adjacent lower edge even when rungs are empty") {
    // only rung (5,10] touched: 2 samples; median rank=1:
    // lo must be the LADDER prev (5.0), not 0 —
    // est = 5 + (10-5)*(1-0)/2 = 7.5
    val sparse = Seq(("svc", ts(0), 6.0), ("svc", ts(1), 9.0)).toDF("k", "t", "v")
    val q = Histograms.quantile(sparse, Seq("k"), "t", "v", "1h",
      ladder, qNum = 1, qDen = 2)
    assert(q.select("q_millis").as[Long].head() === 7500L)
  }

  test("series and time buckets stay independent") {
    val two = samples.unionByName(
      samples.withColumn("k", lit("other")).withColumn("v", col("v") * 2))
    val q = Histograms.quantile(two, Seq("k"), "t", "v", "1h",
      ladder, qNum = 1, qDen = 2)
    assert(q.count() === 2)
    val bySvc = q.select("k", "q_millis").as[(String, Long)].collect().toMap
    assert(bySvc("svc") === 5000L)
    // doubled values: rank 5 -> rung (5,10] cum 2+3=... placement:
    // 1,2,4,6,9.8,12,14,16,19,40 -> (0,1]:1 (1,5]:2 (5,10]:2 (10,50]:5
    // rank=5 -> rung le=50 (cum 10, cumPrev 5): 10+40*(5-5)/5 = 10.0
    assert(bySvc("other") === 10000L)
  }

  test("ladder rails reject unsorted or duplicate rungs") {
    assertThrows[IllegalArgumentException] {
      Histograms.bucketCounts(samples, Seq("k"), "t", "v", "1h", Seq(5.0, 1.0))
    }
    assertThrows[IllegalArgumentException] {
      Histograms.quantile(samples, Seq("k"), "t", "v", "1h", ladder, 0, 2)
    }
  }
}
