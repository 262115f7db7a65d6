package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale spot-check (r3 verdict ask #10): run the headline query
  * set at the bench SF and at 10× that SF, and report the per-query
  * time ratio — a superlinear surprise sf0.1 cannot show reads as a
  * ratio well above the replication factor.
  *
  * The 10× corpus is built the way the real corpus grows: 10 id-
  * shifted copies of events (new user ranges → 10× conversations of
  * unchanged length), documents, and embeddings. Brute-force O(n²)
  * oracle-baseline queries (q_embed_cosine_topk, q_embed_neardup,
  * q_ngram_jaccard's sampled all-pairs) are superlinear BY DESIGN and
  * excluded — their LSH/IVF scale twins are what's measured.
  *
  * Output: one JSON line {"sf_dir":…, "factor":10, "queries":
  * {name: {"t1":s, "t10":s, "ratio":r}}} recorded in BENCH/BASELINE.md.
  */
object ScaleSpot {

  /** Queries measured at both scales — every family's scale path. */
  private val headline = Seq(
    "q_rollup_1m", "q_rollup_1h", "q_rollup_1d", "q_rollup_cascade_1d",
    "q_rollup_30s", "q_align_join", "q_gapfill_1h", "q_cumulative_1d",
    "q_sessionize", "q_window_lag", "q_tree_depth_doubling",
    "q_head_per_conv", "q_chunk_roundtrip", "q_dedup_exact",
    "q_semi_join", "q_anti_join", "q_mode_tool",
    "q_text_stats", "q_lang_id", "q_tokenize", "q_log_templates",
    "q_minhash_lsh", "q_ngram_jaccard_lsh", "q_simhash",
    "q_neardup_components", "q_stratified_sample", "q_pack_shards",
    "q_decontaminate",
    "q_embed_lsh_topk", "q_embed_ivf_topk", "q_embed_neardup_lsh")

  private def replicate(spark: SparkSession, src: String, dst: String,
      factor: Int): Unit = {
    def copies(df: DataFrame, f: DataFrame => Int => DataFrame): DataFrame =
      (0 until factor).map(f(df)).reduce(_ unionByName _)

    // events: shift user_id (new conversations) and event_id (keeps
    // id-derived tool assignment distributions identical per copy)
    copies(spark.read.parquet(s"$src/events.parquet"), ev => i =>
      ev.withColumn("user_id", col("user_id") + lit(i * 10000000L))
        .withColumn("event_id", col("event_id") + lit(i * 1000000000L)))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    copies(spark.read.parquet(s"$src/documents.parquet"), d => i =>
      d.withColumn("doc_id", col("doc_id") + lit(i * 100000000L)))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    copies(spark.read.parquet(s"$src/embeddings.parquet"), e => i =>
      e.withColumn("vec_id", col("vec_id") + lit(i * 100000000L)))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
  }

  private def timeAll(spark: SparkSession, dir: String): Map[String, Double] = {
    // untimed warm-up (same hygiene as Bench)
    try {
      spark.read.parquet(s"$dir/events.parquet")
        .groupBy(col("event_type")).count().count()
    } catch { case _: Throwable => () }
    headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        name -> (System.nanoTime() - t0) / 1e9
      }
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val big = Files.createTempDirectory("graft-scalespot-").toString
    replicate(spark, sfDir, big, factor)

    val t1 = timeAll(spark, sfDir)
    val tN = timeAll(spark, big)
    val entries = headline.filter(t1.contains).map { q =>
      val ratio = tN(q) / math.max(t1(q), 1e-9)
      f""""$q":{"t1":${t1(q)}%.2f,"t10":${tN(q)}%.2f,"ratio":$ratio%.1f}"""
    }
    println(s"""{"sf_dir":"$sfDir","factor":$factor,"queries":{${entries.mkString(",")}}}""")
    spark.stop()
  }
}
