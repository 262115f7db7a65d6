package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{MirrorHash, TextFunctions}

/** Training-set assembly operators: the stages a large-scale pipeline
  * runs between "deduplicated corpus" and "tokenizer input" —
  * stratified subsampling for mixture control, token-budget sharding
  * for context-window packing, and benchmark decontamination. The
  * reference has no counterpart (its output is one CSV per service,
  * /root/reference/jaeger_prometheus_joining/controlflow/
  * JoinManager.py:166-176); these extend the engine toward the
  * 100 TB training-data use the brief names as first-class.
  *
  * Determinism discipline: sampling uses the [[MirrorHash]] affine
  * family over [[TextFunctions.fingerprint]] — no `rand()`, so every
  * run, every engine, and the DuckDB oracle rank rows identically.
  */
object TrainingSet {

  /** Deterministic pseudo-random rank for a row key: affine transform
    * of the key's fingerprint. Uniform over [0, P) per the
    * Carter–Wegman family; reproducible anywhere the fingerprint is.
    */
  def sampleRank(key: Column): Column =
    MirrorHash.affine(TextFunctions.fingerprint(key.cast("string")),
      MirrorHash.a(MirrorHash.SampleSalt, 0),
      MirrorHash.b(MirrorHash.SampleSalt, 0))

  /** Per-stratum fixed quota: the k rows of each stratum with the
    * smallest deterministic rank (ties broken by the key itself).
    * This is how a mixture spec ("≤ k docs per (lang, source) cell")
    * is enforced reproducibly: re-running over a grown corpus keeps
    * previously sampled rows sampled unless displaced by rank, and
    * the shuffle is one hash partition + per-stratum top-k (window
    * rank with a pushed filter — Spark plans rank-≤-k as a running
    * TopK per key, no full sort of the stratum).
    */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], keyCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(sampleRank(col(keyCol)), col(keyCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Token-budget packing: assign rows to shards of ~`budget` tokens,
    * scanning each group in `orderCol` order; a row lands in shard
    * `floor(tokens_before / budget)`. Groups are the parallel unit.
    *
    * This is the SCALE form: a single group's running sum is computed
    * without a one-partition global window, by range-bucketing the
    * order key (`bucketWidth` key units per bucket) and composing
    *  - pass 1: per-(group, bucket) token sums — map-side combined,
    *  - pass 2: running offsets over the tiny bucket table,
    *  - pass 3: intra-bucket running sums, shifted by the offsets.
    * Buckets are the classic two-level scan: every window partition is
    * bounded by bucket width, never by group size, so a trillion-turn
    * group never serializes through one task.
    */
  def packByTokenBudget(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tokCol: String, budget: Long, bucketWidth: Long): DataFrame = {
    require(budget > 0 && bucketWidth > 0, "budget and bucketWidth must be positive")
    val g = groupCols.map(col)
    val bucketed = df.withColumn("_bkt", floor(col(orderCol) / bucketWidth))
    // pass 1+2: running offset per bucket = sum of all earlier buckets
    val offsets = bucketed
      .groupBy((g :+ col("_bkt")): _*)
      .agg(sum(col(tokCol)).as("_bktSum"))
      .withColumn("_off",
        coalesce(sum(col("_bktSum")).over(
          Window.partitionBy(g: _*).orderBy(col("_bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_bktSum")
    // pass 3: intra-bucket running sum EXCLUSIVE of the current row —
    // "tokens before this row" is what the shard index keys on
    val wIntra = Window.partitionBy((g :+ col("_bkt")): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(offsets, groupCols :+ "_bkt")
      .withColumn("_before", col("_off") + coalesce(sum(col(tokCol)).over(wIntra), lit(0L)))
      .withColumn("shard_idx", floor(col("_before") / budget).cast("long"))
      .drop("_bkt", "_off", "_before")
  }

  /** Reference semantics for [[packByTokenBudget]] (test oracle and
    * the shape the DuckDB SQL mirror uses): one window per group.
    * Correct, but a group is a single window partition — only for
    * fixtures and small groups.
    */
  def packByTokenBudgetNaive(df: DataFrame, groupCols: Seq[String],
      orderCol: String, tokCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard_idx",
      floor(coalesce(sum(col(tokCol)).over(w), lit(0L)) / budget).cast("long"))
  }

  /** Distinct word n-grams per row: (id, ngram), whitespace tokens
    * joined by single spaces. Codegen'd HOF projection, no UDF.
    */
  def wordNgrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n-gram width must be >= 1, got $n")
    // repartition before the explode: sub-128MB inputs are one scan
    // split, so the per-row heavy map work would run single-task
    // (EXPLICIT session-conf width — see [[Dedup.shuffleWidth]])
    // per-document distinct via array_distinct BEFORE the explode
    // (the dedup key includes the id, so no cross-row work exists) —
    // identical row set, one full exchange of the exploded n-gram
    // stream removed (same rewrite as [[Dedup.charShingles]])
    df.repartition(Dedup.shuffleWidth(df), col(idCol))
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("_t"))
      .filter(size(col("_t")) >= n)
      .select(col(idCol), explode(array_distinct(transform(
        sequence(lit(1), size(col("_t")) - (n - 1)),
        i => array_join(slice(col("_t"), i, lit(n)), " ")))).as("ngram"))
  }

  /** Benchmark decontamination: for each corpus row, the number of
    * distinct word n-grams it shares with ANY eval row. Rows with
    * n_hits = 0 are clean. Plan shape: two n-gram explosions, the
    * eval side `distinct` (eval sets are small — benchmark suites,
    * not corpora), an equi-join on the n-gram string, and a grouped
    * count — shuffle keyed by n-gram, never all-pairs. The distinct
    * eval n-gram set is explicitly broadcast (the hint goes on the
    * join input itself — a hint under the distinct aggregate would
    * not survive): eval sets are benchmark suites, not corpora, so
    * the broadcast is bounded by contract; pass `broadcastEval =
    * false` for the shuffled equi-join if an eval set ever isn't.
    */
  def decontaminate(corpus: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int, broadcastEval: Boolean = true): DataFrame = {
    val corpusNg = wordNgrams(corpus, idCol, textCol, n)
    val evalNg = wordNgrams(eval, idCol, textCol, n)
      .select(col("ngram")).distinct()
    corpusNg.join(if (broadcastEval) broadcast(evalNg) else evalNg, "ngram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }
}
