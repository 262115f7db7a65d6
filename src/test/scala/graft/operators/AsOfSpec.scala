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

  test("forward-inclusive as-of: earliest right at-or-after, with tolerance") {
    val got = AsOf.join(left, right, Seq("key"), toleranceUs = 3600L * 1000000L,
        direction = AsOf.Direction.Forward)
      .select($"idx", $"v", $"matched_ts")
      .as[(Int, Option[Long], Option[Timestamp])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1) == ((Some(100L), Some(ts("2024-01-01 10:05:00"))))) // earliest ≥
    assert(got(2) == ((Some(100L), Some(ts("2024-01-01 10:05:00"))))) // tie: inclusive
    assert(got(3) == ((None, None)))                                 // nothing after
    assert(got(4) == ((None, None)))                                 // nothing after
    assert(got(5) == ((None, None)))                                 // key unmatched
  }

  test("forward tolerance edge: a match exactly AT the tolerance bound is kept") {
    // right row 30m after the left row; tolerance exactly 30m keeps
    // it, one microsecond less drops it
    val l = Seq(("k", 1, ts("2024-01-01 10:00:00"))).toDF("key", "idx", "ts")
    val r = Seq(("k", ts("2024-01-01 10:30:00"), 9L)).toDF("key", "ts", "v")
    val tol = 1800L * 1000000L
    val kept = AsOf.join(l, r, Seq("key"), toleranceUs = tol,
        direction = AsOf.Direction.Forward)
      .select($"v").as[Option[Long]].head()
    assert(kept.contains(9L))
    val dropped = AsOf.join(l, r, Seq("key"), toleranceUs = tol - 1,
        direction = AsOf.Direction.Forward)
      .select($"v").as[Option[Long]].head()
    assert(dropped.isEmpty)
  }

  test("forward equals backward on a time-reversed axis (duality)") {
    // negate timestamps: forward(t) ≡ backward(-t). Build by mapping
    // both tables through (epoch of 2024-01-02) - ts.
    import org.apache.spark.sql.functions._
    val pivotMs = ts("2024-01-02 00:00:00").getTime
    def reversed(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_millis(lit(pivotMs) -
        unix_millis($"ts".cast("timestamp"))))
    val fwd = AsOf.join(this.left, this.right, Seq("key"),
        direction = AsOf.Direction.Forward)
      .select($"idx", $"v").as[(Int, Option[Long])].collect().toMap
    val bwdRev = AsOf.join(reversed(this.left), reversed(this.right), Seq("key"))
      .select($"idx", $"v").as[(Int, Option[Long])].collect().toMap
    assert(fwd == bwdRev)
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
