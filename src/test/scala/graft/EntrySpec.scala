package graft

import graft.datagen.TranscriptGen

class EntrySpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle or a documented omission") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // non-SQL-expressible ops may be omitted; keep the list explicit
    assert(missing == SparkEntry.oracleOmissions,
      s"queries missing oracle SQL: $missing vs declared ${SparkEntry.oracleOmissions}")
  }

  test("oracle keys all refer to real queries") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
  }

  test("the 4x auto near-dup entry really exercises a DIFFERENT plane count") {
    // guard on the guard: q_embed_neardup_lsh_auto_4x exists so the
    // auto-sizing formula is hash-checked at a value other than the
    // base query's — if dataset growth ever collapses the two onto
    // the same plane count, this spec flags the entry as vacuous
    import graft.operators.Similarity
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val duped = n + n / 10 // dupedVecs plants a copy of every 10th id
    assert(Similarity.autoPlanes(4 * duped, 16) >
      Similarity.autoPlanes(duped, 16),
      s"4x replication no longer changes autoPlanes at n=$duped")
    // and the sf0.01 gate corpus (same embeddings table size) too
    assert(Similarity.autoPlanes(2200, 16) === 8)
    assert(Similarity.autoPlanes(550, 16) === 6)
  }

  test("derived transcript table: stable (conv_id, turn_idx) order, unique keys") {
    val t = TranscriptGen.fromEvents(spark, sfDir).cache()
    val n = t.count()
    val ev = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(n == ev, "one turn per event")
    val dupes = t.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
    assert(dupes == 0, "(conv_id, turn_idx) must be unique")
    // turn_idx is 0..n-1 dense per conversation
    val bad = t.groupBy("conv_id")
      .agg(org.apache.spark.sql.functions.expr("max(turn_idx) + 1 as mx"),
        org.apache.spark.sql.functions.expr("count(*) as cnt"))
      .filter("mx != cnt").count()
    assert(bad == 0, "turn_idx must be dense per conversation")
    t.unpersist()
  }

  test("HLL sketch (approx_count_distinct) tracks the exact daily-active counts") {
    import org.apache.spark.sql.functions._
    val t = TranscriptGen.fromEvents(spark, sfDir)
    val both = t.groupBy(graft.rollup.Rollup.bucket(col("ts"), graft.model.Tier.Day).as("d"))
      .agg(count_distinct(col("conv_id")).as("exact"),
        approx_count_distinct(col("conv_id"), 0.02).as("approx"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val exact = r.getLong(1)
      val approx = r.getLong(2)
      val err = math.abs(approx - exact).toDouble / math.max(exact, 1L)
      assert(err <= 0.05, s"${r.get(0)}: sketch err $err (exact=$exact approx=$approx)")
    }
  }

  test("percentile_approx(0.5) tracks the exact rank-median per conversation") {
    // the 100-TB percentile path is the t-digest-style sketch
    // (percentile_approx, one pass, mergeable partials); this pins it
    // to the exact rank-based q_median_text_len within 10% relative
    // error — the HLL-vs-exact pattern for the percentile family
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val exact = SparkEntry.queries("q_median_text_len")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val approx = TranscriptGen.fromEvents(spark, sfDir)
      .groupBy(col("conv_id"))
      .agg(percentile_approx(length(col("text")).cast("long"), lit(0.5),
        lit(1000)).as("m"))
      .as[(String, Long)].collect().toMap
    assert(exact.nonEmpty && exact.keySet == approx.keySet)
    exact.foreach { case (conv, ex) =>
      val ap = approx(conv)
      val err = math.abs(ap - ex).toDouble / math.max(ex, 1L)
      assert(err <= 0.10, s"$conv: percentile sketch err $err (exact=$ex approx=$ap)")
    }
  }
}
