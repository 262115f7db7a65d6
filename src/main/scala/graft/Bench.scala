package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.datagen.TranscriptGen
import graft.model.Tier
import graft.rollup.Rollup

/** Driver-run per-round benchmark: one JSON line with per-query wall
  * times on SPARK_GRAFT_SF_DIR plus the headline BASELINE metric —
  * rolled-up turns/sec through the production-shaped 1m→1h→1d
  * cascade on a deterministic generated input (seed 42, salted
  * (conv, hour) file layout like real ingest). Full two-parallelism
  * scaling evidence lives in graft.ScalingBench / BENCH/BASELINE.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a crashed query must not look fast: its time is reported as -1
    // AND its error surfaces in the "errors" object of the JSON line
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          errors(name) = (e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("")).take(160)
            .replaceAll("""[\\"\n\r\t]""", " ")
          false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

    // headline: rolled-up turns/sec across the cascade (write-path
    // shape, matching the pipeline's tier commits)
    val throughput = try {
      import org.apache.spark.sql.functions.col
      val base = Files.createTempDirectory("graft-bench-").toString
      val input = s"$base/turns"
      // ~9M turns: large enough that the cascade measures engine
      // throughput, not fixed job overhead (the 93M-turn evidence
      // lives in ScalingBench / BENCH/BASELINE.md)
      TranscriptGen.generate(spark, 8000, 800, seed = 42L, hotShare = 0.1,
          maxDeltaSecs = 15, partitions = 64)
        .toDF()
        .repartition(64, col("conv_id"), Rollup.bucket(col("ts"), Tier.Hour))
        .write.mode("overwrite").parquet(input)
      val turns = spark.read.parquet(input)
      val n = turns.count()
      def cascade(): Double = {
        val t0 = System.nanoTime()
        Rollup.rollupRaw(turns, Tier.Minute)
          .write.mode("overwrite").parquet(s"$base/m1")
        Rollup.foldTier(spark.read.parquet(s"$base/m1"), Tier.Hour)
          .write.mode("overwrite").parquet(s"$base/h1")
        Rollup.foldTier(spark.read.parquet(s"$base/h1"), Tier.Day)
          .write.mode("overwrite").parquet(s"$base/d1")
        (System.nanoTime() - t0) / 1e9
      }
      cascade() // warm-up
      n / cascade()
    } catch {
      case e: Throwable =>
        errors("rollup_throughput") = (e.getClass.getSimpleName + ": " +
          Option(e.getMessage).getOrElse("")).take(160)
          .replaceAll("""[\\"\n\r\t]""", " ")
        -1.0
    }

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":$errs,"error_count":${errors.size},""" +
      s""""rollup_throughput_turns_per_sec":$throughput,"sf":"$sfDir"}""")
    spark.stop()
  }
}
