package graft.functions

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class EwmaSpec extends SparkSuite {
  import spark.implicits._

  private def ts(i: Int): Timestamp =
    new Timestamp(1700000000000L + i * 60000L)

  private def series: DataFrame =
    Seq(
      ("a", ts(0), 0L, 10.0), ("a", ts(1), 1L, 20.0),
      ("a", ts(2), 2L, 20.0), ("a", ts(3), 3L, 0.0),
      ("b", ts(0), 4L, 100.0))
      .toDF("k", "t", "id", "v")

  private def run(df: DataFrame, aNum: Int = 2, aDen: Int = 10) =
    SeriesFunctions.ewmaSmooth(df, Seq("k"), "t", "v", aNum, aDen, Seq("id"))

  test("recurrence matches the hand-computed integer chain") {
    // v_milli: 10000, 20000, 20000, 0 at alpha=0.2
    // s0=10000; s1=floor((2*20000+8*10000)/10)=12000
    // s2=floor((2*20000+8*12000)/10)=13600; s3=floor((8*13600)/10)=10880
    val got = run(series).filter(col("k") === "a")
      .orderBy("id").select("ewma_milli").as[Long].collect().toSeq
    assert(got === Seq(10000L, 12000L, 13600L, 10880L))
  }

  test("series are independent; singleton series passes through") {
    val got = run(series).filter(col("k") === "b")
      .select("v_milli", "ewma_milli").as[(Long, Long)].collect().toSeq
    assert(got === Seq((100000L, 100000L)))
  }

  test("alpha = 1 reproduces the raw series") {
    val got = run(series, aNum = 10, aDen = 10)
      .select(col("v_milli") === col("ewma_milli")).as[Boolean].collect()
    assert(got.forall(identity))
  }

  test("fold order is pinned by (ts, tiebreak), not input order") {
    val shuffled = series.orderBy(rand(42))
    val a = run(series).orderBy("k", "id").collect().toSeq
    val b = run(shuffled).orderBy("k", "id").collect().toSeq
    assert(a === b)
  }

  test("parameter rails") {
    assertThrows[IllegalArgumentException](run(series, aNum = 0))
    assertThrows[IllegalArgumentException](run(series, aNum = 11, aDen = 10))
    assertThrows[IllegalArgumentException](run(series, aNum = 1, aDen = 2000))
  }
}
