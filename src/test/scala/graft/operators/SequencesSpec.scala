package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class SequencesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(i: Int): Timestamp = new Timestamp(1700000000000L + i * 1000L)

  test("funnel requires strictly-later timestamps through the steps") {
    val df = Seq(
      // u1 completes the funnel in order
      (1L, ts(0), "a"), (1L, ts(1), "b"), (1L, ts(2), "c"),
      // u2 does b BEFORE a: reaches a only
      (2L, ts(5), "b"), (2L, ts(6), "a"),
      // u3 ties a and b at the same instant: strict > rejects b
      (3L, ts(0), "a"), (3L, ts(0), "b"),
      // u4 never does a: contributes nothing
      (4L, ts(0), "b"), (4L, ts(1), "c"))
      .toDF("uid", "t", "step")
    val got = Sequences.funnel(df, "t", "uid", "step", Seq("a", "b", "c"))
      .orderBy("step_idx")
      .select("step_idx", "step", "users_reached", "conversion_permille")
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(got === Seq((0, "a", 3L, 1000L), (1, "b", 1L, 333L),
      (2, "c", 1L, 333L)))
  }

  test("funnel picks the earliest qualifying event per step") {
    // u1 has two b events after a: the EARLIER one gates c, so a c
    // between them still counts
    val df = Seq(
      (1L, ts(0), "a"), (1L, ts(1), "b"), (1L, ts(2), "c"), (1L, ts(9), "b"))
      .toDF("uid", "t", "step")
    val got = Sequences.funnel(df, "t", "uid", "step", Seq("a", "b", "c"))
      .orderBy("step_idx").select("users_reached")
      .as[Long].collect().toSeq
    assert(got === Seq(1L, 1L, 1L))
  }

  test("funnel rails") {
    val df = Seq((1L, ts(0), "a")).toDF("uid", "t", "step")
    assertThrows[IllegalArgumentException] {
      Sequences.funnel(df, "t", "uid", "step", Seq.empty)
    }
    assertThrows[IllegalArgumentException] {
      Sequences.funnel(df, "t", "uid", "step", Seq("a", "a"))
    }
  }

  test("transition matrix counts consecutive pairs per id with per-source shares") {
    val df = Seq(
      (1L, ts(0), 0L, "a"), (1L, ts(1), 1L, "b"), (1L, ts(2), 2L, "a"),
      (2L, ts(0), 3L, "a"), (2L, ts(1), 4L, "b"),
      (3L, ts(0), 5L, "b")) // single event: no transition
      .toDF("uid", "t", "eid", "step")
    val got = Sequences.transitionMatrix(df, "t", "uid", "step", Seq("eid"))
      .select("from_step", "to_step", "n_transitions", "prob_permille")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(("a", "b", 2L, 1000L), ("b", "a", 1L, 1000L)))
  }

  test("transition order pins on (ts, orderCols), not input order") {
    val df = Seq(
      (1L, ts(1), 1L, "c"), (1L, ts(0), 0L, "a"), (1L, ts(1), 2L, "b"))
      .toDF("uid", "t", "eid", "step")
    // ts order with eid tiebreak: a -> c -> b
    val got = Sequences.transitionMatrix(df, "t", "uid", "step", Seq("eid"))
      .select("from_step", "to_step").as[(String, String)].collect().toSet
    assert(got === Set(("a", "c"), ("c", "b")))
  }
}
