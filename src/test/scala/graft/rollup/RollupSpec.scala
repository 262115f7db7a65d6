package graft.rollup

import org.apache.spark.sql.DataFrame

import graft.SparkSuite
import graft.datagen.TranscriptGen
import graft.model.{Tier, TierRow, Turn}
import graft.oracle.Oracle

class RollupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val turnsDs =
    TranscriptGen.generate(spark, nConvs = 60, avgTurns = 30, seed = 42L,
      hotShare = 0.0, gapEvery = 7).cache()

  private lazy val turnsLocal: Seq[Turn] = turnsDs.collect().toSeq

  private def collectTier(df: DataFrame): Seq[TierRow] =
    df.as[TierRow].collect().toSeq.sortBy(r => (r.conv_id, r.bucket_ts.getTime))

  test("datagen is deterministic") {
    val a = TranscriptGen.generate(spark, 10, 20, seed = 7L).collect()
      .sortBy(t => (t.conv_id, t.turn_idx))
    val b = TranscriptGen.generate(spark, 10, 20, seed = 7L).collect()
      .sortBy(t => (t.conv_id, t.turn_idx))
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }

  test("raw→tier matches the naive oracle exactly, every tier") {
    Tier.cascade.foreach { tier =>
      val engine = collectTier(Rollup.rollupRaw(turnsDs.toDF(), tier))
      val oracle = Oracle.rollup(turnsLocal, tier)
      assert(engine.size == oracle.size, s"row count mismatch at ${tier.name}")
      engine.zip(oracle).foreach { case (e, o) =>
        assert(e == o, s"tier ${tier.name}: $e != $o")
      }
    }
  }

  test("cascade consistency: fold(1m)→1h→1d equals raw→1h / raw→1d") {
    val m1 = Rollup.rollupRaw(turnsDs.toDF(), Tier.Minute)
    val h1folded = collectTier(Rollup.foldTier(m1, Tier.Hour))
    val h1direct = collectTier(Rollup.rollupRaw(turnsDs.toDF(), Tier.Hour))
    assert(h1folded == h1direct)
    val d1folded = collectTier(Rollup.foldTier(Rollup.foldTier(m1, Tier.Hour), Tier.Day))
    val d1direct = collectTier(Rollup.rollupRaw(turnsDs.toDF(), Tier.Day))
    assert(d1folded == d1direct)
  }

  test("salted two-phase agg is exact under heavy skew") {
    val skewed = TranscriptGen.generate(spark, nConvs = 20, avgTurns = 30,
      seed = 99L, hotShare = 0.5).cache()
    // verify the skew actually exists: conv 0 holds ≥40% of rows
    val total = skewed.count()
    val hot = skewed.filter(_.conv_id == "conv-000000").count()
    assert(hot.toDouble / total >= 0.4, s"fixture not skewed: $hot/$total")
    val plain = collectTier(Rollup.rollupRaw(skewed.toDF(), Tier.Minute))
    val salted = collectTier(Rollup.rollupRawSalted(skewed.toDF(), Tier.Minute, 16))
    assert(plain == salted)
    skewed.unpersist()
  }

  test("rollup plan has one shuffle and partial aggregation") {
    val plan = Rollup.rollupRaw(turnsDs.toDF(), Tier.Minute)
      .queryExecution.executedPlan.toString
    // exactly one exchange (the groupBy shuffle); partial agg map-side
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("partial_"), plan)
  }
}
