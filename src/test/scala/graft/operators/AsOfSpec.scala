package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val left = Seq(
    ("k1", 1, ts("2024-01-01 10:00:00")), // before any right row
    ("k1", 2, ts("2024-01-01 10:05:00")), // exactly at a right row (inclusive)
    ("k1", 3, ts("2024-01-01 10:07:00")), // 2 min after
    ("k1", 4, ts("2024-01-01 11:30:00")), // 85 min after → out of 1h tolerance
    ("k2", 5, ts("2024-01-01 10:06:00"))  // other key: no right rows at all
  ).toDF("key", "idx", "ts")

  private val right = Seq(
    ("k1", ts("2024-01-01 10:05:00"), 100L),
    ("k1", ts("2024-01-01 10:06:30"), 200L)
  ).toDF("key", "ts", "v")

  test("backward-inclusive as-of with tolerance") {
    val got = AsOf.join(left, right, Seq("key"), toleranceUs = 3600L * 1000000L)
      .select($"idx", $"v", $"matched_ts")
      .as[(Int, Option[Long], Option[Timestamp])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1) == ((None, None)))                                 // nothing before
    assert(got(2) == ((Some(100L), Some(ts("2024-01-01 10:05:00"))))) // tie: inclusive
    assert(got(3) == ((Some(200L), Some(ts("2024-01-01 10:06:30"))))) // latest ≤
    assert(got(4) == ((None, None)))                                 // out of tolerance
    assert(got(5) == ((None, None)))                                 // key unmatched
  }

  test("every left row survives exactly once (left-join cardinality)") {
    val out = AsOf.join(left, right, Seq("key"))
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("key", "idx", "ts", "v", "matched_ts"))
  }

  test("the plan is a window over one union, not a nested-loop range join") {
    val p = AsOf.join(left, right, Seq("key")).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
  }
}
