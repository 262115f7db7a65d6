package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  // deterministic fixture: 60 points over 2 hours on two keys, and
  // 8 intervals including overlapping pairs, an empty range, a
  // sub-bucket sliver, and a multi-bucket span
  private def points: DataFrame =
    spark.range(60).select(
      col("id").as("point_id"),
      (col("id") % 2).cast("string").as("k"),
      timestamp_seconds(lit(1700000000L) + col("id") * 120).as("ts"),
      (col("id") * 10).as("v"))

  private def intervals: DataFrame = Seq(
    // (iid, k, startOffsetSec, endOffsetSec)
    (100L, "0", 0L, 600L),      // spans several 5m buckets
    (101L, "0", 300L, 900L),    // overlaps 100
    (102L, "1", 0L, 90L),       // sub-bucket sliver
    (103L, "1", 3600L, 3600L),  // empty range: matches nothing
    (104L, "0", 3000L, 3300L),
    (105L, "1", 2995L, 3305L),  // crosses bucket boundaries off-grid
    (106L, "0", 7100L, 7200L),  // tail
    (107L, "1", -600L, 120L))   // starts before the first point
    .toDF("iid", "k", "so", "eo")
    .select(col("iid"), col("k"),
      timestamp_seconds(lit(1700000000L) + col("so")).as("start_ts"),
      timestamp_seconds(lit(1700000000L) + col("eo")).as("end_ts"))

  private def bruteForce: DataFrame =
    points.as("p").crossJoin(intervals.as("i"))
      .filter(col("p.k") === col("i.k")
        && col("p.ts") >= col("i.start_ts") && col("p.ts") < col("i.end_ts"))
      .select(col("point_id"), col("iid"))

  test("pointInInterval matches brute-force range join on keys + boundaries") {
    val got = IntervalJoin.pointInInterval(
        points, intervals, "ts", "start_ts", "end_ts", Seq("k"), "5m")
      .select(col("point_id"), col("iid"))
    val expected = bruteForce
    assert(got.count() > 0)
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("bucket width tuning never changes the result set") {
    val wide = IntervalJoin.pointInInterval(
        points, intervals, "ts", "start_ts", "end_ts", Seq("k"), "1h")
      .select(col("point_id"), col("iid"))
    val narrow = IntervalJoin.pointInInterval(
        points, intervals, "ts", "start_ts", "end_ts", Seq("k"), "30s")
      .select(col("point_id"), col("iid"))
    assert(wide.exceptAll(narrow).count() === 0)
    assert(narrow.exceptAll(wide).count() === 0)
  }

  test("a point inside two overlapping intervals emits two rows") {
    val got = IntervalJoin.pointInInterval(
      points, intervals, "ts", "start_ts", "end_ts", Seq("k"), "5m")
    // point at +480s, key 0 sits inside both [0,600) and [300,900)
    val p3 = got.filter(col("point_id") === 4).select("iid")
      .as[Long].collect().sorted
    assert(p3.toSeq === Seq(100L, 101L))
  }

  test("half-open semantics: start inclusive, end exclusive, empty dropped") {
    val got = IntervalJoin.pointInInterval(
        points, intervals, "ts", "start_ts", "end_ts", Seq("k"), "5m")
      .select("point_id", "iid")
    // point_id 0 is exactly at interval 100's start → included
    assert(got.filter(col("iid") === 100 && col("point_id") === 0).count() === 1)
    // interval 100 ends at +600s = point_id 5's exact ts → excluded
    assert(got.filter(col("iid") === 100 && col("point_id") === 5).count() === 0)
    // empty range 103 matches nothing
    assert(got.filter(col("iid") === 103).count() === 0)
  }

  test("non-key column name clash is rejected") {
    val bad = intervals.withColumnRenamed("iid", "point_id")
    assertThrows[IllegalArgumentException] {
      IntervalJoin.pointInInterval(
        points, bad, "ts", "start_ts", "end_ts", Seq("k"), "5m")
    }
  }

  test("intervalOverlap matches brute-force and dedups shared buckets") {
    val left = intervals.select(col("iid").as("lid"), col("k"),
      col("start_ts").as("ls"), col("end_ts").as("le"))
    val right = intervals.select(col("iid").as("rid"), col("k"),
      col("start_ts").as("rs"), col("end_ts").as("re"))
    val got = IntervalJoin.intervalOverlap(
        left, right, "lid", "ls", "le", "rid", "rs", "re", Seq("k"), "5m")
      .select(col("lid"), col("rid"))
    val expected = left.as("a").crossJoin(right.as("b"))
      .filter(col("a.k") === col("b.k")
        && col("ls") < col("re") && col("rs") < col("le"))
      .select(col("lid"), col("rid"))
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
    // multi-bucket self-overlap (100×100 share 2 buckets) appears ONCE
    assert(got.filter(col("lid") === 100 && col("rid") === 100).count() === 1)
  }
}
