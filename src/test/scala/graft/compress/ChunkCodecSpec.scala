package graft.compress

import graft.SparkSuite
import graft.datagen.TranscriptGen
import graft.model.Tier
import graft.rollup.Rollup
import org.apache.spark.sql.functions._

class ChunkCodecSpec extends SparkSuite {
  import spark.implicits._

  test("distributed encode → decode round-trips the 1m series exactly") {
    val turns = TranscriptGen.generate(spark, 16, 25, seed = 13L)
    val m1 = Rollup.rollupRaw(turns.toDF(), Tier.Minute).cache()
    val chunks = m1
      .groupBy($"conv_id", date_trunc("day", $"bucket_ts").as("day"))
      .agg(ChunkCodec.chunkEncode(
        unix_micros($"bucket_ts"), $"text_len_sum".cast("double")).as("chunk"))
      .cache()
    val decoded = chunks
      .select($"conv_id", explode(ChunkCodec.chunkDecode($"chunk")).as("p"))
      .select($"conv_id", $"p.ts".as("ts"), $"p.v".as("v"))
      .as[(String, Long, Double)].collect().toSet
    val want = m1
      .select($"conv_id", unix_micros($"bucket_ts"), $"text_len_sum".cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(decoded == want)
    // compression: chunks much smaller than 16 bytes/point
    val chunkBytes = chunks.select(sum(length($"chunk"))).as[Long].head()
    val points = m1.count()
    assert(chunkBytes < points * 16,
      s"no compression: $chunkBytes bytes for $points points")
    m1.unpersist(); chunks.unpersist()
  }

  test("chunk is deterministic under repartitioning (order-free merge)") {
    val turns = TranscriptGen.generate(spark, 6, 40, seed = 29L)
    val m1 = Rollup.rollupRaw(turns.toDF(), Tier.Minute).cache()
    def chunksOf(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"conv_id")
      .agg(ChunkCodec.chunkEncode(
        unix_micros($"bucket_ts"), $"text_len_sum".cast("double")).as("chunk"))
      .select($"conv_id", hex($"chunk"))
      .as[(String, String)].collect().toMap
    val a = chunksOf(m1.repartition(1))
    val b = chunksOf(m1.repartition(7, $"bucket_ts"))
    assert(a == b, "chunk bytes depend on partitioning")
    m1.unpersist()
  }
}
