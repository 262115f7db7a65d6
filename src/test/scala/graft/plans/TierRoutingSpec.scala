package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.datagen.TranscriptGen
import graft.model.Tier
import graft.rollup.TranscriptStore

class TierRoutingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val setup: (String, String) = {
    val wh = Files.createTempDirectory("graft-route-").toString
    val rawDir = Files.createTempDirectory("graft-route-raw-").toString + "/turns"
    val turns = TranscriptGen.generate(spark, 15, 30, seed = 61L).toDF()
    turns.write.mode("overwrite").parquet(rawDir)
    val store = new TranscriptStore(spark, wh, convBuckets = 2)
    store.ingest(turns)
    store.rollupIncremental()
    store.publishServing()
    TierRouting.install(spark)
    TierRouting.registerWarehouse(rawDir, wh)
    (rawDir, wh)
  }

  private def rawQuery(tier: Tier) = {
    val (rawDir, _) = setup
    spark.read.parquet(rawDir)
      .groupBy($"conv_id", TierRouting.tierBucket($"ts", tier).as("bucket_ts"))
      .agg(
        count(lit(1)).as("turn_cnt"),
        count($"tool").as("tool_cnt"),
        sum(length($"text").cast("long")).as("text_len_sum"),
        min(length($"text").cast("long")).as("text_len_min"),
        max(length($"text").cast("long")).as("text_len_max"))
  }

  test("tier_bucket expression alone is correct (rule-independent arithmetic)") {
    val (rawDir, _) = setup
    val direct = spark.read.parquet(rawDir)
      .select(TierRouting.tierBucket($"ts", Tier.Hour).as("b"))
    val viaRollup = spark.read.parquet(rawDir)
      .select(graft.rollup.Rollup.bucket($"ts", Tier.Hour).as("b"))
    assert(direct.exceptAll(viaRollup).isEmpty && viaRollup.exceptAll(direct).isEmpty)
  }

  test("aggregate over raw turns is routed to the tier table scan") {
    val df = rawQuery(Tier.Hour)
    val optimized = df.queryExecution.optimizedPlan.toString
    // routed: aggregates fold tier partials, raw text/length gone
    assert(optimized.contains("sum(turn_cnt"),
      s"plan not routed to tier table:\n$optimized")
    assert(!optimized.contains("length("),
      s"raw-side expressions still present:\n$optimized")
    val files = df.queryExecution.optimizedPlan.collect {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }.flatten
    assert(files.exists(_.contains("serve/tier_1h")), files.toString)
  }

  test("routed results equal the unrouted computation, every tier") {
    Tier.cascade.foreach { tier =>
      val routed = rawQuery(tier)
        .as[(String, java.sql.Timestamp, Long, Long, Long, Long, Long)]
        .collect().toSet
      // force the unrouted plan by clearing the registry
      TierRouting.clearRegistry()
      val unrouted = rawQuery(tier)
        .as[(String, java.sql.Timestamp, Long, Long, Long, Long, Long)]
        .collect().toSet
      TierRouting.registerWarehouse(setup._1, setup._2)
      assert(routed == unrouted, s"tier ${tier.name} routed != raw")
      assert(routed.nonEmpty)
    }
  }

  test("non-routable aggregates fall through to the raw scan unchanged") {
    val (rawDir, _) = setup
    // avg(length) is not in the mapped algebra → must NOT route
    val df = spark.read.parquet(rawDir)
      .groupBy($"conv_id", TierRouting.tierBucket($"ts", Tier.Hour).as("b"))
      .agg(avg(length($"text")).as("avg_len"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("tier_1h"), optimized)
    assert(df.count() > 0)
  }
}
