package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.datagen.TranscriptGen
import graft.model.Tier
import graft.rollup.Rollup

/** Scaling-efficiency evidence for BASELINE.json's two-cluster-size
  * criterion: the same rollup cascade over the same on-disk input at
  * `local[8]` and `local[32]` (sandbox stand-in for N vs 4N
  * executors; the job is `spark-submit`-ready unchanged). Writes
  * BENCH/BASELINE.md with throughput at both levels + efficiency.
  *
  * Usage: runMain graft.ScalingBench [nConvs] [avgTurns]
  */
object ScalingBench {

  /** Both parallelism levels get the SAME shuffle-partition count so
    * only core count varies — otherwise the low-core run also gets
    * bigger (spill-prone) partitions and the comparison conflates
    * partition sizing with parallelism (observed: 8-partition
    * shuffles of ~4M rows spill and fake super-linear scaling).
    */
  private def session(cores: Int, shufflePartitions: Int = 64): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Full cascade wall time (seconds) over parquet input; `count` on
    * each tier forces execution without sink I/O noise.
    */
  private def cascadeSecs(spark: SparkSession, inputPath: String): (Double, Long) = {
    val turns = spark.read.parquet(inputPath)
    val t0 = System.nanoTime()
    val m1 = Rollup.rollupRaw(turns, Tier.Minute).cache()
    val m1Cnt = m1.count()
    val h1 = Rollup.foldTier(m1, Tier.Hour).cache()
    h1.count()
    Rollup.foldTier(h1, Tier.Day).count()
    val secs = (System.nanoTime() - t0) / 1e9
    m1.unpersist(); h1.unpersist()
    (secs, m1Cnt)
  }

  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toLong else 4000L
    val avgTurns = if (args.length > 1) args(1).toInt else 500
    val maxDeltaSecs = if (args.length > 2) args(2).toInt else 15

    // materialize one deterministic input to parquet; both runs read it
    val input = Files.createTempDirectory("graft-scaling-").toString + "/turns"
    val gen = session(16)
    TranscriptGen.generate(gen, nConvs, avgTurns, seed = 42L, hotShare = 0.1,
        maxDeltaSecs = maxDeltaSecs, partitions = 128)
      .toDF().write.mode("overwrite").parquet(input)
    val nTurns = gen.read.parquet(input).count()
    gen.stop()

    def measure(cores: Int): Double = {
      val s = session(cores)
      cascadeSecs(s, input) // warm-up: JIT + codegen + parquet footer cache
      val runs = (1 to 3).map(_ => cascadeSecs(s, input)._1)
      s.stop()
      runs.min // best-of-3: least scheduler/GC noise
    }

    val t8 = measure(8)
    val t32 = measure(32)
    val thr8 = nTurns / t8
    val thr32 = nTurns / t32
    // efficiency of the 4x scale-up: speedup / 4
    val eff = (t8 / t32) / 4.0

    val md =
      s"""# BENCH — measured scaling (graft.ScalingBench)
         |
         |Same job (raw→1m→1h→1d cascade), same on-disk parquet input
         |($nTurns turns, $nConvs conversations, seed 42, 10% hot-conv
         |skew), two parallelism levels standing in for N vs 4N
         |executors per the driver instruction.
         |
         || parallelism | wall (s) | throughput (rolled-up turns/sec) |
         ||---|---|---|
         || local[8]  (N)  | ${f"$t8%.2f"} | ${f"$thr8%.0f"} |
         || local[32] (4N) | ${f"$t32%.2f"} | ${f"$thr32%.0f"} |
         |
         |**Scaling efficiency (N→4N)** = (T_N / T_4N) / 4 =
         |${f"$eff%.3f"} (target ≥ 0.8 per BASELINE.json).
         |
         |Method: input materialized once; per level, one warm-up
         |cascade (JIT/codegen) then best-of-3 measured cascades;
         |`count()` actions force execution without sink I/O; both
         |levels use identical shuffle-partition counts (64) so only
         |core count varies.
         |""".stripMargin
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/BASELINE.md"), md)
    println(s"""{"turns":$nTurns,"t8_sec":$t8,"t32_sec":$t32,"thr8":$thr8,"thr32":$thr32,"efficiency":$eff}""")
  }
}
