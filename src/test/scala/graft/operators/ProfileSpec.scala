package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("aa"), Some(1.5), Some(new Timestamp(1000L))),
    (2L, Some("b"), Some(-2.25), None),
    (3L, None, Some(1.5), Some(new Timestamp(3000L))),
    (3L, Some("aa"), None, Some(new Timestamp(2000L))))
    .toDF("id", "tag", "v", "t")

  test("per-column counts, nulls, distincts, typed extremes in one pass") {
    val got = Profile.profile(df)
      .select("col_name", "n_rows", "n_nulls", "n_distinct",
        "min_num_milli", "max_num_milli", "min_str", "max_str",
        "avg_len_milli")
      .as[(String, Long, Long, Long, Option[Long], Option[Long],
        Option[String], Option[String], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") === ("id", 4L, 0L, 3L, Some(1000L), Some(3000L),
      None, None, None))
    // strings: lexicographic extremes + exact floor avg length
    // (len 2,1,2 -> floor(5000/3) = 1666)
    assert(got("tag") === ("tag", 4L, 1L, 2L, None, None,
      Some("aa"), Some("b"), Some(1666L)))
    // doubles: floor millis (floor(-2.25*1000) = -2250)
    assert(got("v") === ("v", 4L, 1L, 2L, Some(-2250L), Some(1500L),
      None, None, None))
    // timestamps: epoch millis
    assert(got("t") === ("t", 4L, 1L, 3L, Some(1000L), Some(3000L),
      None, None, None))
  }

  test("column subset and rails") {
    assert(Profile.profile(df, Seq("id")).count() === 1)
    assertThrows[IllegalArgumentException] {
      Profile.profile(df, Seq("nope"))
    }
  }

  test("approx mode stays within a few percent on a wider domain") {
    val wide = (1 to 5000).map(i => (i.toLong, s"s$i")).toDF("id", "s")
    val got = Profile.profile(wide, approxDistinct = true)
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    // default rsd 5% -> allow 3 sigma
    assert(math.abs(got("id") - 5000L) <= 750, s"approx too far: $got")
    assert(math.abs(got("s") - 5000L) <= 750, s"approx too far: $got")
  }
}
