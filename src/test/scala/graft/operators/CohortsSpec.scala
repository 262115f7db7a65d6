package graft.operators

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CohortsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 9): Timestamp =
    Timestamp.valueOf(f"2026-01-${day + 1}%02d $hour%02d:00:00")

  // cohort d0 = {u1, u2, u3}; cohort d1 = {u4}
  // u1 active d0,d1,d2; u2 active d0,d2; u3 only d0; u4 active d1,d3
  private def events: DataFrame = Seq(
    (1L, ts(0)), (1L, ts(0, 15)), (1L, ts(1)), (1L, ts(2)),
    (2L, ts(0)), (2L, ts(2)),
    (3L, ts(0)),
    (4L, ts(1)), (4L, ts(3)))
    .toDF("uid", "t")

  private def matrix: Map[(String, Long), (Long, Long, Long)] =
    Cohorts.retention(events, "t", "uid", maxOffsetDays = 30)
      .select(col("cohort_day").cast("string"), col("day_offset"),
        col("active_users"), col("cohort_size"), col("retained_permille"))
      .as[(String, Long, Long, Long, Long)]
      .collect().map { case (d, o, a, s, r) => ((d, o), (a, s, r)) }.toMap

  test("cells, sizes, and rates match the hand-built matrix") {
    val m = matrix
    assert(m(("2026-01-01", 0L)) === ((3L, 3L, 1000L)))
    assert(m(("2026-01-01", 1L)) === ((1L, 3L, 333L))) // u1
    assert(m(("2026-01-01", 2L)) === ((2L, 3L, 666L))) // u1, u2
    assert(m(("2026-01-02", 0L)) === ((1L, 1L, 1000L))) // u4 cohort
    assert(m(("2026-01-02", 2L)) === ((1L, 1L, 1000L))) // u4 on d3
    assert(m.size === 5) // no empty cells fabricated
  }

  test("same-day duplicate events collapse before counting") {
    // u1 has two events on d0; cohort size must still be 3
    assert(matrix(("2026-01-01", 0L))._2 === 3L)
  }

  test("offset cap trims the matrix") {
    val capped = Cohorts.retention(events, "t", "uid", maxOffsetDays = 1)
    assert(capped.agg(max("day_offset")).as[Long].head() === 1L)
  }
}
