package graft.functions

import java.sql.Timestamp

import graft.SparkSuite
import graft.datagen.TranscriptGen
import graft.model.Tier
import graft.oracle.Oracle
import graft.rollup.Rollup

class GapFillSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("hand-built gappy series matches closed-form interpolation") {
    // buckets 0,1,4,5 observed; 2,3 missing → interpolate 10→40
    val rows = Seq(
      ("c1", ts(0), 10L), ("c1", ts(1), 20L), ("c1", ts(4), 50L), ("c1", ts(5), 60L),
      ("c2", ts(100), 7L)) // single-point series: no gaps, survives alone
      .toDF("conv_id", "bucket_ts", "text_len_sum")
    val got = GapFill.linear(rows, "text_len_sum", Tier.Minute)
      .orderBy("conv_id", "bucket_ts")
      .select($"conv_id", $"bucket_ts", $"value", $"filled")
      .as[(String, Timestamp, Double, Boolean)].collect().toSeq
    val want = Seq(
      ("c1", ts(0), 10.0, false), ("c1", ts(1), 20.0, false),
      ("c1", ts(2), 30.0, true), ("c1", ts(3), 40.0, true),
      ("c1", ts(4), 50.0, false), ("c1", ts(5), 60.0, false),
      ("c2", ts(100), 7.0, false))
    assert(got == want)
  }

  test("generated gappy data matches the naive oracle") {
    val turns = TranscriptGen.generate(spark, 12, 30, seed = 17L, gapEvery = 4)
    val m1 = Rollup.rollupRaw(turns.toDF(), Tier.Minute).cache()
    val got = GapFill.linear(m1, "text_len_sum", Tier.Minute)
      .select($"conv_id", $"bucket_ts", $"value")
      .as[(String, Timestamp, Double)].collect()
      .groupBy(_._1)

    val local = m1.as[graft.model.TierRow].collect()
    local.groupBy(_.conv_id).foreach { case (conv, rs) =>
      val byBucket = rs.map(r => r.bucket_ts.getTime -> r.text_len_sum.toDouble).toMap
      val lo = rs.map(_.bucket_ts.getTime).min
      val hi = rs.map(_.bucket_ts.getTime).max
      val grid = (lo to hi by 60000L).map(b => (b, byBucket.get(b)))
      val want = Oracle.gapFillLinear(grid)
      val gotConv = got(conv).map(x => (x._2.getTime, x._3)).sortBy(_._1).toSeq
      val wantFlat = want.map { case (b, v) => (b, v.get) } // interior-only gaps ⇒ all defined
      assert(gotConv == wantFlat, s"conv $conv gap-fill mismatch")
    }
    assert(got.nonEmpty)
    m1.unpersist()
  }

  test("gap-fill marks at least some buckets filled on gappy input") {
    val turns = TranscriptGen.generate(spark, 6, 30, seed = 23L, gapEvery = 3)
    val m1 = Rollup.rollupRaw(turns.toDF(), Tier.Minute)
    val filled = GapFill.linear(m1, "text_len_sum", Tier.Minute)
      .filter($"filled").count()
    assert(filled > 0, "fixture produced no gaps")
  }

  test("span guard: a grid beyond maxBucketsPerConv fails loudly with the conv_id") {
    // a 1m-tier series spanning ~8 days = 11520 buckets; cap at 1000
    val rows = Seq(
      ("c-runaway", ts(0), 1L), ("c-runaway", ts(8L * 24 * 60), 2L),
      ("c-ok", ts(0), 3L), ("c-ok", ts(10), 4L))
      .toDF("conv_id", "bucket_ts", "text_len_sum")
    val e = intercept[Exception] {
      GapFill.linear(rows, "text_len_sum", Tier.Minute,
        maxBucketsPerConv = 1000L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val all = msgs(e).mkString(" | ")
    assert(all.contains("gap-fill grid exceeds 1000"), all)
    assert(all.contains("c-runaway"), all)
    // same data passes with the default ceiling, all modes
    assert(GapFill.linear(rows, "text_len_sum", Tier.Minute).count() > 0)
    assert(GapFill.locf(rows, "text_len_sum", Tier.Minute).count() > 0)
    assert(GapFill.zero(rows, "text_len_sum", Tier.Minute).count() > 0)
  }

  test("locf carries the previous observation; zero fills additive gaps with 0") {
    val rows = Seq(
      ("c1", ts(0), 10L), ("c1", ts(1), 20L), ("c1", ts(4), 50L))
      .toDF("conv_id", "bucket_ts", "text_len_sum")
    val locf = GapFill.locf(rows, "text_len_sum", Tier.Minute)
      .orderBy("bucket_ts")
      .as[(String, Timestamp, Double, Boolean)].collect().toSeq
    assert(locf == Seq(
      ("c1", ts(0), 10.0, false), ("c1", ts(1), 20.0, false),
      ("c1", ts(2), 20.0, true), ("c1", ts(3), 20.0, true),
      ("c1", ts(4), 50.0, false)))
    val zero = GapFill.zero(rows, "text_len_sum", Tier.Minute)
      .orderBy("bucket_ts")
      .as[(String, Timestamp, Double, Boolean)].collect().toSeq
    assert(zero.map(_._3) == Seq(10.0, 20.0, 0.0, 0.0, 50.0))
  }
}
