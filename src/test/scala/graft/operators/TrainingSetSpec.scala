package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TrainingSetSpec extends SparkSuite {
  import spark.implicits._

  test("stratifiedSample: per-stratum quota, deterministic, repartition-stable") {
    val docs = (0L until 300L).map(i =>
      (i, s"lang${i % 3}", s"src${i % 2}", s"text $i")).toDF("doc_id", "lang", "source", "text")
    val out = TrainingSet.stratifiedSample(docs, Seq("lang", "source"), "doc_id", 10)
    val bySt = out.groupBy("lang", "source").count().collect()
    assert(bySt.length === 6)
    assert(bySt.forall(_.getLong(2) === 10L))
    // deterministic: same ids regardless of physical partitioning
    val again = TrainingSet.stratifiedSample(docs.repartition(13), Seq("lang", "source"), "doc_id", 10)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("stratifiedSample: quota above stratum size keeps the whole stratum") {
    val docs = (0L until 5L).map(i => (i, "en")).toDF("doc_id", "lang")
    val out = TrainingSet.stratifiedSample(docs, Seq("lang"), "doc_id", 100)
    assert(out.count() === 5L)
  }

  test("packByTokenBudget: scale path equals the one-window reference semantics") {
    // irregular token counts, two groups, ids with gaps so buckets
    // are uneven; bucketWidth small enough for many buckets per group
    val rows = (0L until 200L).map { i =>
      (i * 3 + (i % 2), s"g${i % 2}", 50L + (i * 37) % 400)
    }
    val df = rows.toDF("doc_id", "grp", "tok_cnt").repartition(7)
    val scaled = TrainingSet.packByTokenBudget(df, Seq("grp"), "doc_id", "tok_cnt",
      budget = 1000L, bucketWidth = 40L)
    val naive = TrainingSet.packByTokenBudgetNaive(df, Seq("grp"), "doc_id", "tok_cnt",
      budget = 1000L)
    val s = scaled.select("doc_id", "grp", "shard_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val n = naive.select("doc_id", "grp", "shard_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(s.toSeq === n.toSeq)
    // sanity on the semantics themselves: first row of each group is shard 0
    assert(s.filter(_._2 == "g0").head._3 === 0L)
  }

  test("packByTokenBudget: a row lands in floor(tokens_before / budget)") {
    val df = Seq((1L, 600L), (2L, 600L), (3L, 600L), (4L, 600L))
      .toDF("doc_id", "tok_cnt").withColumn("grp", lit("g"))
    val out = TrainingSet.packByTokenBudget(df, Seq("grp"), "doc_id", "tok_cnt",
        budget = 1000L, bucketWidth = 2L)
      .select("doc_id", "shard_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // before: 0, 600, 1200, 1800 → shards 0, 0, 1, 1
    assert(out.toSeq === Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
  }

  test("wordNgrams: positions, joining, distinct, short-text cutoff") {
    val df = Seq((1L, "  a b c d  "), (2L, "a b"), (3L, "x x x x")).toDF("id", "text")
    val out = TrainingSet.wordNgrams(df, "id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.filter(_._1 == 1L).map(_._2).toSet === Set("a b c", "b c d"))
    assert(!out.exists(_._1 == 2L)) // 2 tokens < n=3
    assert(out.filter(_._1 == 3L).map(_._2).toSeq === Seq("x x x")) // distinct
  }

  test("decontaminate: shared n-grams counted, clean rows absent") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over"),
      (2L, "completely unrelated content here now"),
      (3L, "quick brown fox somewhere else entirely")).toDF("id", "text")
    val eval = Seq((100L, "a quick brown fox jumps today")).toDF("id", "text")
    val out = TrainingSet.decontaminate(corpus, eval, "id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares "quick brown fox", "brown fox jumps"; doc 3 shares
    // "quick brown fox"; doc 2 is clean (no row at all)
    assert(out === Map(1L -> 2L, 3L -> 1L))
  }
}
