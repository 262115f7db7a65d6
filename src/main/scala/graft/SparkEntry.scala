package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.compress.ChunkCodec
import graft.datagen.TranscriptGen
import graft.functions.{GapFill, TextFunctions}
import graft.model.Tier
import graft.operators.{AsOf, Components, Dedup, DynamicPivot, IntervalJoin, Multimodal, Sequences, Similarity, Sketches, TrainingSet, TreeDepth}
import graft.rollup.Rollup

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query's input is either a driver-provided parquet table under
  * `sfDir` or the transcript table derived *relationally* from
  * `events.parquet` (see [[TranscriptGen.fromEvents]]) so the DuckDB
  * oracle can reproduce it from the same parquet via a CTE.
  */
object SparkEntry {

  private def turns(s: SparkSession, dir: String): DataFrame =
    TranscriptGen.fromEvents(s, dir)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Rollup.rollupRaw(turns(spark, "/root/testdata/sf0.001"), Tier.Minute)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- transcript derivation itself (per-turn text equality, W5) ---
    "q_turns" -> ((s, dir) => turns(s, dir)),

    // --- rollup tiers raw→1m/1h/1d (A4 generalized, W1 floor buckets) ---
    "q_rollup_1m" -> ((s, dir) => Rollup.rollupRaw(turns(s, dir), Tier.Minute)),
    "q_rollup_1h" -> ((s, dir) => Rollup.rollupRaw(turns(s, dir), Tier.Hour)),
    "q_rollup_1d" -> ((s, dir) => Rollup.rollupRaw(turns(s, dir), Tier.Day)),

    // --- cascade consistency: fold(fold(1m)→1h)→1d ≡ raw→1d ---
    "q_rollup_cascade_1d" -> ((s, dir) =>
      Rollup.foldTier(
        Rollup.foldTier(
          Rollup.rollupRaw(turns(s, dir), Tier.Minute), Tier.Hour), Tier.Day)),

    // --- arbitrary-width bucketing (reference ParseSettings "1s…1y"
    // grammar; default 30s) — floor mode ---
    "q_rollup_30s" -> ((s, dir) => Rollup.rollupRawWidth(turns(s, dir), "30s")),

    // --- round-to-NEAREST mode (the reference's Polars dt.round
    // semantics, rounding-identifiers.md: half-up ties) at 5m — the
    // bucket width its own test uses (test_joinmanager.py:12) ---
    "q_rollup_round_5m" -> ((s, dir) =>
      Rollup.rollupRawWidth(turns(s, dir), "5m", nearest = true)),

    // --- salted two-phase agg ≡ plain agg (skew handling, §4.1) ---
    "q_rollup_salted_1m" -> ((s, dir) =>
      Rollup.rollupRawSalted(turns(s, dir), Tier.Minute, saltBuckets = 16)),

    // --- CALENDAR bucket width (the "1s…1y" grammar's month tail):
    // months-since-epoch floor ≡ date_trunc('month') — the bread-and-
    // butter monthly report the fixed-width path can't express ---
    "q_rollup_1mo" -> ((s, dir) => Rollup.rollupRawWidth(turns(s, dir), "1mo")),
    // calendar NEAREST: round to whichever month boundary is closer
    // (midpoint → up), completing the reference's dt.round grammar
    "q_rollup_round_1mo" -> ((s, dir) =>
      Rollup.rollupRawWidth(turns(s, dir), "1mo", nearest = true)),

    // --- cumulative counts over buckets (J3/A5 as window, not loops) ---
    "q_cumulative_1d" -> ((s, dir) => {
      val t1d = Rollup.rollupRaw(turns(s, dir), Tier.Day)
      val w = Window.partitionBy(col("conv_id")).orderBy(col("bucket_ts"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t1d.select(
        col("conv_id"), col("bucket_ts"),
        sum(col("turn_cnt")).over(w).as("cum_turns"),
        sum(col("tool_cnt")).over(w).as("cum_tools"),
        sum(col("text_len_sum")).over(w).as("cum_text_len"))
    }),

    // --- gap-fill: densify 1h series + linear interpolation (§2.5).
    // 1h tier: the dense grid is |convs|×span/1h — at 1m granularity a
    // month-spanning conversation would densify to 43k buckets, which
    // is the wrong tier for sparse series (grid explosion) ---
    "q_gapfill_1h" -> ((s, dir) =>
      GapFill.linear(Rollup.rollupRaw(turns(s, dir), Tier.Hour),
        "text_len_sum", Tier.Hour)),

    // --- gap-fill mode family: LOCF (dashboard mode) and zero (the
    // correct fill for additive counts) over the same dense grid ---
    "q_gapfill_locf_1h" -> ((s, dir) =>
      GapFill.locf(Rollup.rollupRaw(turns(s, dir), Tier.Hour),
        "text_len_sum", Tier.Hour)),
    "q_gapfill_zero_1h" -> ((s, dir) =>
      GapFill.zero(Rollup.rollupRaw(turns(s, dir), Tier.Hour),
        "turn_cnt", Tier.Hour)),

    // --- gap-fill at the FINEST tier: the dense 1m grid is the shape
    // the span guard exists for — conversations here span hours, so
    // the grid stays well under the ceiling and the guard is a no-op
    // predicate on the hot path ---
    "q_gapfill_zero_1m" -> ((s, dir) =>
      GapFill.zero(Rollup.rollupRaw(turns(s, dir), Tier.Minute),
        "turn_cnt", Tier.Minute)),

    // --- Gorilla chunk encode→decode round-trip, distributed (§2.9) ---
    "q_chunk_roundtrip" -> ((s, dir) => {
      val m1 = Rollup.rollupRaw(turns(s, dir), Tier.Minute)
      val chunks = m1
        .groupBy(col("conv_id"), date_trunc("day", col("bucket_ts")).as("day"))
        .agg(ChunkCodec.chunkEncode(
          unix_micros(col("bucket_ts")),
          col("text_len_sum").cast("double")).as("chunk"))
      chunks
        .select(col("conv_id"), explode(ChunkCodec.chunkDecode(col("chunk"))).as("p"))
        .select(col("conv_id"),
          timestamp_micros(col("p.ts")).as("bucket_ts"),
          col("p.v").as("text_len"))
    }),

    // --- TPC-H-ish baseline agg (A1-family hash aggregate) ---
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
    }),

    // --- align-join (J1): tier 1m left-joined with a second feed on
    // (conv, bucket) — the reference's traces⋈metrics cascade as ONE
    // equi join on the rounded time key ---
    "q_align_join" -> ((s, dir) => {
      val m1 = Rollup.rollupRaw(turns(s, dir), Tier.Minute)
      val purchases = s.read.parquet(s"$dir/events.parquet")
        .filter(col("event_type") === "purchase")
        .groupBy(
          concat(lit("conv-"), lpad(col("user_id").cast("string"), 6, "0")).as("conv_id"),
          Rollup.bucket(col("ts"), Tier.Minute).as("bucket_ts"))
        .agg(sum(round(col("value") * 100).cast("long")).as("purchase_cents"))
      m1.join(purchases, Seq("conv_id", "bucket_ts"), "left")
        .select(col("conv_id"), col("bucket_ts"), col("turn_cnt"),
          col("purchase_cents"))
    }),

    // --- pivot (U3): fixed-vocabulary role pivot per (conv, day).
    // Explicit value list keeps the pivot a single pass (no extra
    // distinct-values job) — mandatory at scale ---
    "q_role_pivot" -> ((s, dir) =>
      turns(s, dir)
        .groupBy(col("conv_id"), Rollup.bucket(col("ts"), Tier.Day).as("bucket_ts"))
        .pivot("role", Seq("user", "assistant", "tool")).count()
        .na.fill(0L, Seq("user", "assistant", "tool"))
        .select(col("conv_id"), col("bucket_ts"),
          col("user").as("user_cnt"), col("assistant").as("assistant_cnt"),
          col("tool").as("tool_cnt"))),

    // --- dynamic pivot (reference TraceInOneRowExploder.py:383-389:
    // data-dependent column set, prefixed): one wide row per
    // conversation, a `tool_<name>` count column per DISTINCT tool
    // discovered at runtime (two-pass distinct → explicit pivot) ---
    "q_conv_wide" -> ((s, dir) =>
      DynamicPivot.pivotWide(
        turns(s, dir).select(col("conv_id"), col("tool")),
        groupCols = Seq("conv_id"), pivotCol = "tool",
        valueAgg = count(lit(1)), prefix = "tool_")),

    // --- window lag (W): inter-turn gap in micros per conversation ---
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      turns(s, dir).select(col("conv_id"), col("turn_idx"),
        (unix_micros(col("ts").cast("timestamp")) -
          lag(unix_micros(col("ts").cast("timestamp")), 1).over(w)).as("gap_us"))
    }),

    // --- as-of lookup: most recent prior user-turn ts for tool turns
    // (the reference wished for an as-of join, insights-experience.md:5;
    // at fixed order a frame-bounded window is cheaper) ---
    "q_asof_prev_user" -> ((s, dir) => {
      val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
        .rowsBetween(Window.unboundedPreceding, -1)
      turns(s, dir)
        .withColumn("prev_user_ts",
          last(when(col("role") === "user", col("ts")), ignoreNulls = true).over(w))
        .filter(col("role") === "tool")
        .select(col("conv_id"), col("turn_idx"), col("prev_user_ts"))
    }),

    // --- deterministic input truncation (W4: the reference's
    // truncate-for-experiments knob, done as a pinned per-key head-N
    // instead of a nondeterministic limit) ---
    "q_head_per_conv" -> ((s, dir) => {
      val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      turns(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("conv_id"), col("turn_idx"), col("role"), col("text"))
    }),

    // --- cross-table as-of align (insights-experience.md:5): every
    // turn matched with the latest purchase at-or-before it, 1h
    // tolerance — union+window, oracled by DuckDB's native ASOF JOIN ---
    "q_asof_align" -> ((s, dir) => {
      val t = turns(s, dir).select(col("conv_id"), col("turn_idx"), col("ts"))
      val purchases = s.read.parquet(s"$dir/events.parquet")
        .filter(col("event_type") === "purchase")
        .groupBy(
          concat(lit("conv-"), lpad(col("user_id").cast("string"), 6, "0")).as("conv_id"),
          col("ts"))
        .agg(sum(round(col("value") * 100).cast("long")).as("purchase_cents"))
      AsOf.join(t, purchases, Seq("conv_id"), toleranceUs = 3600L * 1000000L)
        .select(col("conv_id"), col("turn_idx"), col("purchase_cents"),
          col("matched_ts"))
    }),

    // --- FORWARD as-of: every turn matched with the EARLIEST purchase
    // at-or-after it (the symmetric dual — feeds can skew either way),
    // 1h tolerance; oracled by DuckDB's native forward ASOF JOIN ---
    "q_asof_align_fwd" -> ((s, dir) => {
      val t = turns(s, dir).select(col("conv_id"), col("turn_idx"), col("ts"))
      val purchases = s.read.parquet(s"$dir/events.parquet")
        .filter(col("event_type") === "purchase")
        .groupBy(
          concat(lit("conv-"), lpad(col("user_id").cast("string"), 6, "0")).as("conv_id"),
          col("ts"))
        .agg(sum(round(col("value") * 100).cast("long")).as("purchase_cents"))
      AsOf.join(t, purchases, Seq("conv_id"), toleranceUs = 3600L * 1000000L,
          direction = AsOf.Direction.Forward)
        .select(col("conv_id"), col("turn_idx"), col("purchase_cents"),
          col("matched_ts"))
    }),

    // --- sessionization: 30-min-gap session split + per-session agg ---
    "q_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      val flagged = turns(s, dir).withColumn("new_session",
        when(unix_micros(col("ts").cast("timestamp")) -
          lag(unix_micros(col("ts").cast("timestamp")), 1).over(w) > 1800000000L, 1L)
          .otherwise(lit(0L)))
      flagged
        .withColumn("session_id",
          sum(col("new_session")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("conv_id"), col("session_id"))
        .agg(count(lit(1)).as("turn_cnt"),
          min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
    }),

    // --- cumulative DISTINCT count over time (A5's distinct-EventId
    // analog): count(distinct tool) up to each day-bucket per conv.
    // Window distinct isn't supported by either engine — the
    // first-occurrence trick (flag each tool's first bucket, then a
    // cumulative sum of flags) is exact and shuffle-friendly ---
    "q_cumulative_distinct_tools" -> ((s, dir) => {
      val withBucket = turns(s, dir)
        .filter(col("tool").isNotNull)
        .select(col("conv_id"), col("tool"),
          Rollup.bucket(col("ts"), Tier.Day).as("bucket_ts"))
      val firstSeen = Window.partitionBy(col("conv_id"), col("tool"))
        .orderBy(col("bucket_ts"))
      val flagged = withBucket
        .withColumn("rn", row_number().over(firstSeen))
        .groupBy(col("conv_id"), col("bucket_ts"))
        .agg(sum(when(col("rn") === 1, 1L).otherwise(0L)).as("new_tools"))
      val cum = Window.partitionBy(col("conv_id")).orderBy(col("bucket_ts"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      flagged.select(col("conv_id"), col("bucket_ts"),
        sum(col("new_tools")).over(cum).as("distinct_tools_so_far"))
    }),

    // --- daily-active distinct counting (A5/A6 family): exact
    // count(distinct conv_id) per day — the scale path swaps in the
    // HLL sketch (approx_count_distinct), whose ±2% parity with this
    // exact query is asserted in EntrySpec (sketches can't be
    // hash-oracled) ---
    "q_daily_active" -> ((s, dir) =>
      turns(s, dir)
        .groupBy(Rollup.bucket(col("ts"), Tier.Day).as("bucket_ts"))
        .agg(count_distinct(col("conv_id")).as("active_convs"),
          count(lit(1)).as("turn_cnt"))),

    // --- exact lower-median per conversation (percentile family):
    // rank-based selection with a pinned tiebreak — identical integer
    // logic in both engines, unlike interpolating percentile
    // functions whose semantics differ ---
    "q_median_text_len" -> ((s, dir) => {
      val t = turns(s, dir).select(col("conv_id"),
        length(col("text")).cast("long").as("len"), col("turn_idx"))
      val w = Window.partitionBy(col("conv_id")).orderBy(col("len"), col("turn_idx"))
      t.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("conv_id"))))
        .filter(col("rn") === ((col("cnt") + 1) / 2).cast("long"))
        .select(col("conv_id"), col("len").as("median_text_len"))
    }),

    // --- collect + ordered string-join (A3, determinism pinned) ---
    "q_collect_tools" -> ((s, dir) =>
      turns(s, dir)
        .groupBy(col("conv_id"), Rollup.bucket(col("ts"), Tier.Day).as("bucket_ts"))
        .agg(array_join(sort_array(collect_list(col("tool"))), " - ").as("tools_joined"))),

    // --- posexplode tokenization (P7 generator family) ---
    "q_tokenize" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "token")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))),

    // --- broadcast dim join chain (S4 scaled up: star-schema rollup) ---
    "q_region_rollup" -> ((s, dir) => {
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val customer = s.read.parquet(s"$dir/customer.parquet")
      val nation = broadcast(s.read.parquet(s"$dir/nation.parquet"))
      val region = broadcast(s.read.parquet(s"$dir/region.parquet"))
      orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("order_cnt"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
    }),

    // --- two-dim broadcast join + grouped agg over the remaining
    // TPC-H-ish tables (part, supplier): revenue cents by brand and
    // supplier nation — J7-family star join, both dims broadcast ---
    "q_brand_revenue" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val part = broadcast(s.read.parquet(s"$dir/part.parquet"))
      val supp = broadcast(s.read.parquet(s"$dir/supplier.parquet"))
      li.join(part, col("l_partkey") === col("p_partkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_brand"), col("s_nationkey"))
        .agg(
          count(lit(1)).as("line_cnt"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long")).as("revenue_cents"),
          sum(col("l_quantity").cast("long")).as("qty_sum"))
    }),

    // --- mode with deterministic tiebreak (A1's mode(); Spark/DuckDB
    // built-in mode() breaks ties arbitrarily — pin with (count desc,
    // value asc) ranking instead, per SURVEY §7 hard parts) ---
    "q_mode_tool" -> ((s, dir) => {
      val counts = turns(s, dir)
        .filter(col("tool").isNotNull)
        .groupBy(col("conv_id"), col("tool"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("conv_id"))
        .orderBy(col("cnt").desc, col("tool"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("conv_id"), col("tool").as("mode_tool"), col("cnt").as("mode_cnt"))
    }),

    // --- the reference's ACTUAL multi-mode semantics
    // (TraceInOneRowExploder.py:126-158): mode() returns EVERY tied
    // mode, joined " - ". Polars emits ties in arbitrary order; this
    // engine pins alphabetical (the only deviation, documented in
    // SURVEY §7) so the output is deterministic and oracle-checkable.
    // q_mode_tool above stays as the single-winner variant ---
    "q_mode_tool_all" -> ((s, dir) => {
      val counts = turns(s, dir)
        .filter(col("tool").isNotNull)
        .groupBy(col("conv_id"), col("tool"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("conv_id"))
      counts.withColumn("mx", max(col("cnt")).over(w))
        .filter(col("cnt") === col("mx"))
        .groupBy(col("conv_id"))
        .agg(
          concat_ws(" - ", array_sort(collect_list(col("tool")))).as("mode_tools"),
          max(col("cnt")).as("mode_cnt"))
    }),

    // --- semi join: conversations that used a given tool family ---
    "q_semi_join" -> ((s, dir) => {
      val t = turns(s, dir)
      val searchers = t.filter(col("tool").isin("search", "browse"))
        .select("conv_id")
      t.select("conv_id").distinct()
        .join(searchers, Seq("conv_id"), "left_semi")
    }),

    // --- anti join: conversations that never used the translate tool
    // (any-tool would be vacuously empty on this data, and the driver
    // smoke-checks rows > 0) ---
    "q_anti_join" -> ((s, dir) => {
      val t = turns(s, dir)
      val translators = t.filter(col("tool") === "translate").select("conv_id")
      t.select("conv_id").distinct()
        .join(translators, Seq("conv_id"), "left_anti")
    }),

    // --- tree/hierarchy depth features (reference TreeBuilder.py:29-64):
    // iterative BFS self-join over a per-conversation edge table
    // (parent = (turn_idx-1)//2, a binary tree), per-tree depth stats
    // joined back per node — oracled by a DuckDB recursive CTE ---
    "q_tree_depth" -> ((s, dir) =>
      treeDepthQuery(s, dir, TreeDepth.depths(_, "conv_id", "node", "parent"))),

    // --- same semantics via pointer doubling: O(log height) rounds of
    // full self-joins — the shape that survives chain-deep hierarchies
    // where BFS's height-many rounds would not. Shares q_tree_depth's
    // recursive-CTE oracle: both algorithms must hash-match it ---
    "q_tree_depth_doubling" -> ((s, dir) =>
      treeDepthQuery(s, dir,
        TreeDepth.depthsByDoubling(_, "conv_id", "node", "parent"))),

    // ================= training-data pipeline operators =================

    // --- text analysis: token/quality stats + codegen'd fingerprint ---
    "q_text_stats" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val comps = TextFunctions.qualityComponents(col("text"))
        .map { case (n, c) => c.as(n) }
      docs.select(
        (col("doc_id") +:
          comps :+
          TextFunctions.subwordCount(col("text")).as("n_subwords") :+
          TextFunctions.fingerprint(col("text")).as("fingerprint")): _*)
    }),

    // --- language-ID heuristic (marker stopword argmax) ---
    "q_lang_id" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val scores = TextFunctions.langScores(col("text")).map { case (n, c) => c.as(n) }
      docs.select((col("doc_id") +: scores :+
        TextFunctions.langId(col("text")).as("lang_pred")): _*)
    }),

    // --- exact dedup keep-first (pinned by doc_id; A7 done right) ---
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exactKeepFirst(dupedDocs(s, dir), Seq("text"), "doc_id")
        .select("doc_id", "text")
    }),

    // --- drop-all-duplicates (reference A8 keep='none') ---
    "q_dedup_drop_all" -> ((s, dir) => {
      Dedup.dropAllDuplicates(dupedDocs(s, dir), Seq("text"))
        .select("doc_id", "text")
    }),

    // --- exact n-gram Jaccard: tiny-SF ORACLE CROSS-CHECK of the
    // jaccardCounts kernel. Pair generation here is all-pairs within
    // (lang, source) over a 10% doc_id subsample — deliberately
    // bounded and DuckDB-reproducible; it is NOT the scale path
    // (that's q_ngram_jaccard_lsh below, whose candidates come from
    // the LSH band join) ---
    "q_ngram_jaccard" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val sample = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      val pairs = sample.select(col("lang"), col("source"), col("doc_id").as("id1"))
        .join(sample.select(col("lang"), col("source"), col("doc_id").as("id2")),
          Seq("lang", "source"))
        .filter(col("id1") < col("id2"))
        .select("id1", "id2")
      val shingles = Dedup.charShingles(docs, "doc_id", "text", 3)
      Dedup.jaccardCounts(pairs, shingles, "doc_id")
    }),

    // --- the SCALE path: LSH band-join candidates → exact Jaccard
    // verify. Shuffle ∝ band-key cardinality, never O(n²) within a
    // group. MirrorHash-based minhash → the whole chain (candidates
    // AND counts) is hash-checked against the DuckDB oracle ---
    "q_ngram_jaccard_lsh" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      // raw (non-distinct) shingles: the minhash minima are duplicate-
      // insensitive, so the distinct's exchange would be pure cost
      val shingles5 = Dedup.charShinglesRaw(docs, "doc_id", "text", 5)
      val pairs = Dedup.lshCandidates(
        Dedup.lshBands(
          Dedup.minHashSignatures(shingles5, "doc_id", k = 16),
          "doc_id", k = 16, bands = 4), "doc_id")
      val shingles3 = Dedup.charShingles(docs, "doc_id", "text", 3)
      Dedup.jaccardCounts(pairs, shingles3, "doc_id")
    }),

    // --- MinHash+LSH near-dup candidates (MirrorHash affine family:
    // hash-checked against the DuckDB band-join mirror) ---
    "q_minhash_lsh" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      // raw shingles: min aggregates are duplicate-insensitive
      val shingles = Dedup.charShinglesRaw(docs, "doc_id", "text", 5)
      val sigs = Dedup.minHashSignatures(shingles, "doc_id", k = 16)
      Dedup.lshCandidates(Dedup.lshBands(sigs, "doc_id", k = 16, bands = 4), "doc_id")
    }),

    // --- SimHash fingerprints (64 MirrorHash sign hashes over token
    // fingerprints: hash-checked against the DuckDB oracle) ---
    "q_simhash" -> ((s, dir) =>
      Dedup.simHash(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),

    // --- brute-force cosine top-k over embeddings (integral output) ---
    "q_embed_cosine_topk" -> ((s, dir) =>
      Similarity.cosineTopK(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding", k = 5)),

    // --- LSH-bucketed ANN (deterministic splitmix64 planes, embedded
    // verbatim in the oracle SQL: hash-checked, bit-identical dots) ---
    "q_embed_lsh_topk" -> ((s, dir) =>
      Similarity.lshTopK(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        k = 5, planes = 6, rotations = 4)),

    // --- embedding-cosine near-dup: exact verify of planted duplicate
    // vectors at cos ≥ 0.95. Brute all-pairs variant = the labeled
    // oracle baseline; the LSH variant feeds bucket-join candidates
    // and (because identical vectors share every bucket) provably
    // recovers the same pairs — so BOTH are oracle-checked ---
    "q_embed_neardup" -> ((s, dir) => {
      val dv = dupedVecs(s, dir)
      val pairs = dv.select(col("vec_id").as("id1"))
        .join(dv.select(col("vec_id").as("id2")), col("id1") < col("id2"))
      Similarity.cosineNearDup(dv, "vec_id", "embedding", pairs, 0.95)
    }),
    "q_embed_neardup_lsh" -> ((s, dir) => {
      val dv = dupedVecs(s, dir)
      Similarity.cosineNearDup(dv, "vec_id", "embedding",
        Similarity.lshPairs(dv, "vec_id", "embedding", planes = 6, rotations = 4),
        0.95)
    }),

    // --- the AUTO-scaled LSH variant (planes sized from the corpus —
    // the 100 TB parameterization): identical vectors share every
    // bucket under ANY plane family, so the planted-copies argument
    // holds unchanged and this FOURTH variant hash-matches the same
    // near-dup oracle ---
    "q_embed_neardup_lsh_auto" -> ((s, dir) => {
      val dv = dupedVecs(s, dir)
      Similarity.cosineNearDup(dv, "vec_id", "embedding",
        Similarity.lshPairsAuto(dv, "vec_id", "embedding"), 0.95)
    }),

    // --- the auto-sizing MATH inside a hash-checked entry (r4 verdict
    // ask #10): the same auto near-dup over a 4×-replicated corpus at
    // occupancy 16, where autoPlanes picks a DIFFERENT value than the
    // unreplicated form (6 → 8 at sf0.01's n=550 → 2200; asserted in
    // EntrySpec) — the oracle recomputes planes from ITS OWN count(*),
    // so a wrong rounding in either engine's sizing breaks the hash ---
    "q_embed_neardup_lsh_auto_4x" -> ((s, dir) => {
      val dv = dupedVecs(s, dir)
      val big = (0 until 4).map(i =>
        dv.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          col("embedding"))).reduce(_ unionByName _)
      Similarity.cosineNearDup(big, "vec_id", "embedding",
        Similarity.lshPairsAuto(big, "vec_id", "embedding",
          targetOccupancy = 16), 0.95)
    }),

    // --- auto-sized LSH top-k, hash-checked (r4 verdict ask #7): the
    // plane count is a pure INTEGER function of n (autoPlanes), so the
    // DuckDB mirror computes the same planes from the same fixture
    // count(*) and gates the whole auto path, not just its pinned twin ---
    "q_embed_lsh_topk_auto" -> ((s, dir) =>
      Similarity.lshTopKAuto(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        k = 5)),

    // --- the IVF scale path for the same planted-duplicate fixture:
    // exact copies share every centroid similarity → same inverted
    // list → ivfPairs provably recovers them, so this THIRD variant
    // also hash-matches the one near-dup oracle ---
    "q_embed_neardup_ivf" -> ((s, dir) => {
      val dv = dupedVecs(s, dir)
      Similarity.cosineNearDup(dv, "vec_id", "embedding",
        Similarity.ivfPairs(dv, "vec_id", "embedding", nlist = 8, iters = 2),
        0.95)
    }),

    // --- IVF-Flat ANN top-k (k-means inverted lists, nprobe probing;
    // fixed-point Lloyd training makes the centroids order-free and
    // DuckDB-mirrorable — hash-checked INCLUDING training since r5) ---
    "q_embed_ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 3, iters = 2)),

    // --- multimodal: REAL header decode (PNG/WAV/MP4 chunk+box walk,
    // CRC-checked) of the binary payload column; the oracle recomputes
    // what the generator encoded into the headers ---
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.metaOnly(Multimodal.synthesize(s, dir))),

    // --- multimodal: frame sampling generator ---
    "q_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.synthesize(s, dir), stepS = 5)),

    // --- multimodal CONTENT decode: extract the container's payload
    // (IDAT/mdat, CRC-checked) and compute integral content stats.
    // PNG/MP4 bodies are exactly the text bytes, so the oracle
    // recomputes every column from `text` — a full encode→decode
    // content round-trip through real container structure. (WAV is
    // excluded here: its data chunk is text CYCLED to the duration;
    // covered in MultimodalSpec.) ---
    "q_media_features" -> ((s, dir) =>
      Multimodal.contentStatsOf(
        Multimodal.synthesize(s, dir).filter(col("modality") =!= "audio"))),

    // --- log template mining (reference S5, LogsParser.py:21-37):
    // deterministic log lines built from events, variables masked to
    // <VAR>, event_id = oracle-checkable template fingerprint ---
    "q_log_templates" -> ((s, dir) =>
      graft.functions.LogTemplates.mine(logLines(s, dir), "line")
        .select(col("line_id"), col("event_id"), col("template"),
          col("n_params"), array_join(col("params"), "|").as("params_joined"))),

    // --- the mined template vocabulary with per-template counts ---
    "q_log_template_counts" -> ((s, dir) =>
      graft.functions.LogTemplates.templateCounts(logLines(s, dir), "line")),

    // --- near-dup CLUSTERS: connected components over the LSH
    // candidate pairs (the transitive closure pairwise dedup misses),
    // with cluster size + canonical survivor per component ---
    "q_neardup_components" -> ((s, dir) => {
      val docs = dupedDocs(s, dir)
      // raw shingles: min aggregates are duplicate-insensitive
      val shingles = Dedup.charShinglesRaw(docs, "doc_id", "text", 5)
      val pairs = Dedup.lshCandidates(
        Dedup.lshBands(Dedup.minHashSignatures(shingles, "doc_id", k = 16),
          "doc_id", k = 16, bands = 4), "doc_id")
      Components.withClusterStats(
        Components.connectedComponents(docs.select("doc_id"), "doc_id", pairs),
        "doc_id")
    }),

    // --- stratified sampling: deterministic per-(lang, source) quota
    // ranked by the MirrorHash of the doc id — mixture control with a
    // bit-exact DuckDB mirror, zero rand() ---
    "q_stratified_sample" -> ((s, dir) =>
      TrainingSet.stratifiedSample(
        s.read.parquet(s"$dir/documents.parquet").select("doc_id", "lang", "source"),
        Seq("lang", "source"), "doc_id", k = 12)
        .select(col("doc_id"), col("lang"), col("source"),
          col("sample_rank").cast("long").as("sample_rank"))),

    // --- token-budget packing (context-window sharding). The SCALE
    // path (range-bucketed two-level prefix sum — no one-partition
    // window) is what runs AND what the one-window oracle checks ---
    "q_pack_shards" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"),
          TextFunctions.tokenCount(col("text")).as("tok_cnt"))
      TrainingSet.packByTokenBudget(docs, Seq("lang"), "doc_id", "tok_cnt",
          budget = 2000L, bucketWidth = 64L)
        .select("doc_id", "lang", "tok_cnt", "shard_idx")
    }),

    // --- PromQL-shaped counter rate over the events value column:
    // per-user series, reset rule (sample below predecessor restarts
    // the counter), fixed-point outputs ---
    "q_counter_rate" -> ((s, dir) =>
      graft.functions.SeriesFunctions.counterRate(
        s.read.parquet(s"$dir/events.parquet")
          .select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "value", Seq("event_id"))
        .select("event_id", "user_id", "increase_millis", "rate_millis")),

    // --- DOWNSAMPLED counter rate: last sample per (user, hour),
    // reset-aware diff across consecutive bucket lasts — the serving-
    // resolution rate query (output ∝ buckets, not samples) ---
    "q_counter_rate_1h" -> ((s, dir) =>
      graft.functions.SeriesFunctions.counterRateBucketed(
        s.read.parquet(s"$dir/events.parquet")
          .select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "value", "1h", Seq("event_id"))),

    // --- per-conversation turn RATE per hour — the tier-ROUTABLE
    // series derivative: its aggregate is the exact rollup shape, so
    // under a registered warehouse it scans tier_1h partials instead
    // of raw turns (TierRoutingSpec pins the routed scan + equality;
    // here it computes from raw and hash-checks the semantics) ---
    "q_turn_rate_1h" -> ((s, dir) =>
      graft.functions.SeriesFunctions.turnRate(
        turns(s, dir), "conv_id", "ts", "1h")),

    // --- rolling 7-day distinct active conversations (retention
    // family; exact, single shuffle on the report day) ---
    "q_rolling_actives_7d" -> ((s, dir) =>
      graft.functions.SeriesFunctions.rollingDistinctActives(
        turns(s, dir), "ts", "conv_id", windowDays = 7)),

    // --- point-select downsampling for serving (max-deviation
    // survivor per (user, hour); fixed-point → exact tie order) ---
    "q_downsample_1h" -> ((s, dir) =>
      graft.functions.SeriesFunctions.downsampleMaxDev(
        s.read.parquet(s"$dir/events.parquet")
          .select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "value", "1h", Seq("event_id"))
        .select("user_id", "bucket_ts", "event_id", "v_milli")),

    // --- point-in-interval overlap join: every event inside each
    // incident's [start, start + (user%7+1)·10m) window, same
    // event_type — bucket-grid equi-join, never a nested loop
    // (PlanAuditSpec); incidents are every 97th event ---
    "q_interval_join" -> ((s, dir) => {
      val events = s.read.parquet(s"$dir/events.parquet")
        .select("event_id", "ts", "user_id", "event_type")
      IntervalJoin.pointInInterval(
          events, incidents(s, dir), "ts", "start_ts", "end_ts",
          Seq("event_type"), "10m")
        .groupBy("incident_id", "event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    // --- interval×interval overlap join: deploy windows (every 89th
    // event, (user%5+1)·15m) intersecting incident windows on the
    // same event_type; overlap_us is exact integer micros ---
    "q_interval_overlap" -> ((s, dir) =>
      IntervalJoin.intervalOverlap(
          deploys(s, dir), incidents(s, dir),
          "deploy_id", "d_start", "d_end",
          "incident_id", "start_ts", "end_ts",
          Seq("event_type"), "10m")
        .select(col("deploy_id"), col("incident_id"),
          (unix_micros(least(col("d_end"), col("end_ts"))) -
            unix_micros(greatest(col("d_start"), col("start_ts"))))
            .as("overlap_us"))),

    // --- count-min heavy hitters: document tokens clearing 1% of
    // the stream, estimated from a 4x512 sketch (exact integer
    // counters, MirrorHash rows — DuckDB builds the bit-identical
    // sketch, so estimates hash-match including collision slack) ---
    "q_cms_heavy_hitters" -> ((s, dir) => {
      val toks = s.read.parquet(s"$dir/documents.parquet")
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      Sketches.cmsHeavyHitters(toks,
        TextFunctions.fingerprint(col("tok")), Seq("tok"),
        depth = 4, width = 512, minSupportPermille = 10)
    }),

    // --- rolling z-score anomalies: event values > 3 sigma from
    // their own trailing-50 baseline per event_type series — the
    // cross-multiplied integer inequality, so flags hash-match ---
    "q_anomaly_zscore" -> ((s, dir) =>
      graft.functions.SeriesFunctions.rollingZScoreFlags(
          s.read.parquet(s"$dir/events.parquet"),
          "event_type", "ts", "value",
          lookback = 50, kNum = 3, kDen = 1, minPoints = 20,
          orderCols = Seq("event_id"))
        .filter(col("is_anomaly"))
        .select("event_id", "event_type", "v_milli", "n_baseline")),

    // --- PII scrub: planted emails/phones/SSNs/cards/IPs redact to
    // category tokens with per-category audit counts; patterns live
    // in TextFunctions.piiPatterns (one authority, RE2-compatible,
    // so the oracle applies the identical regexes) ---
    "q_pii_redact" -> ((s, dir) => {
      val pd = piiDocs(s, dir)
      pd.select(col("doc_id") +:
        TextFunctions.redactPii(col("text")).as("redacted") +:
        TextFunctions.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
    }),

    // --- Prometheus-style bucketed p90 per (event_type, day): a
    // fixed le-ladder grouped count (ladder is a codegen'd when-
    // chain, never a join) then interpolation over the reduced
    // frame — the latency question tier rollups don't answer ---
    "q_histogram_p90" -> ((s, dir) =>
      graft.functions.Histograms.quantile(
        s.read.parquet(s"$dir/events.parquet"),
        Seq("event_type"), "ts", "value", "1d",
        HistLadder, qNum = 9, qDen = 10)),

    // --- cohort retention matrix: users bucketed by first-activity
    // day, cells = distinct actives at each day offset + per-mille
    // rate vs the day-0 cohort size ---
    "q_cohort_retention" -> ((s, dir) =>
      graft.operators.Cohorts.retention(
        s.read.parquet(s"$dir/events.parquet"),
        "ts", "user_id", maxOffsetDays = 30)),

    // --- exact fixed-point EWMA smoothing per (event_type, user)
    // series, alpha = 0.2 — the sequential recurrence folded inside
    // one aggregate() per series (bounded-series contract); the
    // oracle replays the identical integer chain recursively ---
    "q_ewma" -> ((s, dir) =>
      graft.functions.SeriesFunctions.ewmaSmooth(
          s.read.parquet(s"$dir/events.parquet"),
          Seq("event_type", "user_id"), "ts", "value",
          aNum = 2, aDen = 10, orderCols = Seq("event_id"))
        .select("event_type", "user_id", "event_id", "v_milli", "ewma_milli")),

    // --- seasonal hour-of-week baseline: each event value compared
    // to the mean of ITS OWN (event_type, hour-of-week) slot —
    // Monday-9am judged against Monday-9am history; baseline is an
    // exact floor-division over fixed-point millis ---
    "q_seasonal_baseline" -> ((s, dir) =>
      graft.functions.SeriesFunctions.seasonalBaseline(
          s.read.parquet(s"$dir/events.parquet"),
          Seq("event_type"), "ts", "value")
        .select("event_id", "event_type", "how", "v_milli",
          "baseline_milli", "dev_milli")),

    // --- one-sided CUSUM drift per (event_type, user) series:
    // max(0, c + v - target - slack) accumulated in exact integer
    // millis (bounded-series fold, like q_ewma); the oracle replays
    // the identical chain recursively ---
    "q_cusum_drift" -> ((s, dir) =>
      graft.functions.SeriesFunctions.cusumDrift(
          s.read.parquet(s"$dir/events.parquet"),
          Seq("event_type", "user_id"), "ts", "value",
          targetMilli = 50000L, slackMilli = 10000L,
          thresholdMilli = 200000L, orderCols = Seq("event_id"))
        .select("event_type", "user_id", "event_id", "v_milli",
          "cusum_milli", "drifting")),

    // --- Holt linear-trend smoothing per (event_type, user) series,
    // alpha = 0.2, beta = 0.3 — level + trend + one-step forecast,
    // same bounded-series fold as q_ewma; the oracle replays the
    // identical integer double-recurrence recursively ---
    "q_holt_forecast" -> ((s, dir) =>
      graft.functions.SeriesFunctions.holtSmooth(
          s.read.parquet(s"$dir/events.parquet"),
          Seq("event_type", "user_id"), "ts", "value",
          aNum = 2, aDen = 10, bNum = 3, bDen = 10,
          orderCols = Seq("event_id"))
        .select("event_type", "user_id", "event_id", "v_milli",
          "level_milli", "trend_milli", "forecast_milli")),

    // --- Holt-Winters additive-seasonal smoothing per (event_type,
    // user) series, alpha = 0.2, beta = 0.3, gamma = 0.4, period 4 —
    // level + trend + seasonal + one-step forecast; the oracle
    // replays the identical integer triple-recurrence recursively,
    // carrying the last m seasonals as a list ---
    "q_holtwinters" -> ((s, dir) =>
      graft.functions.SeriesFunctions.holtWintersSmooth(
          s.read.parquet(s"$dir/events.parquet"),
          Seq("event_type", "user_id"), "ts", "value",
          aNum = 2, aDen = 10, bNum = 3, bDen = 10, gNum = 4, gDen = 10,
          m = 4, orderCols = Seq("event_id"))
        .select("event_type", "user_id", "event_id", "v_milli",
          "level_milli", "trend_milli", "seasonal_milli", "forecast_milli")),

    // --- time-weighted average (LOCF integral) per (event_type,
    // user) at 1h buckets, 48-bucket staleness horizon — irregular
    // samples weighted by held time, not sample count ---
    "q_twa_1h" -> ((s, dir) =>
      graft.functions.SeriesFunctions.timeWeightedAvg(
        s.read.parquet(s"$dir/events.parquet"),
        Seq("event_type", "user_id"), "ts", "value",
        bucketSecs = 3600, maxGapBuckets = 48,
        orderCols = Seq("event_id"))),

    // --- row-level CDC between two derived table versions: old drops
    // event_id%11==0 and perturbs value for %7==0, new drops %13==0 —
    // the diff must report exactly the planted I/D/U set with the
    // changed column named ---
    "q_snapshot_diff" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select("event_id", "user_id", "event_type", "value")
      val oldT = ev
        .filter(pmod(col("event_id"), lit(11)) =!= 0)
        .withColumn("value",
          when(pmod(col("event_id"), lit(7)) === 0, col("value") + lit(1.0))
            .otherwise(col("value")))
      val newT = ev.filter(pmod(col("event_id"), lit(13)) =!= 0)
      graft.operators.SnapshotDiff.diff(oldT, newT, Seq("event_id"))
        .select(col("event_id"), col("op"), col("changed_cols"),
          floor(col("value_old") * lit(1000.0)).cast("long").as("v_old_milli"),
          floor(col("value_new") * lit(1000.0)).cast("long").as("v_new_milli"))
    }),

    // --- one-pass per-column data-quality profile of the events
    // table: counts, nulls, exact distincts, typed extremes ---
    "q_profile" -> ((s, dir) =>
      graft.operators.Profile.profile(
        s.read.parquet(s"$dir/events.parquet"))),

    // --- funnel conversion signup → view → purchase per user:
    // strictly-increasing timestamps through the steps, k grouped
    // mins equi-joined on the user id (never a stream-wide window) ---
    "q_funnel" -> ((s, dir) =>
      Sequences.funnel(
        s.read.parquet(s"$dir/events.parquet"),
        "ts", "user_id", "event_type", Seq("signup", "view", "purchase"))),

    // --- first-order event-type transition matrix: consecutive pairs
    // per user (one lag window), counted globally with per-source
    // per-mille shares over the vocabulary²-sized reduced frame ---
    "q_transition_matrix" -> ((s, dir) =>
      Sequences.transitionMatrix(
        s.read.parquet(s"$dir/events.parquet"),
        "ts", "user_id", "event_type", Seq("event_id"))),

    // --- Gopher-style repetition quality signals: duplicate-token /
    // top-token / top-bigram fractions per doc, pure per-row array
    // algebra (no shuffle) — catches boilerplate and generation
    // loops that exact dedup can't ---
    "q_repetition_stats" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id") +:
          TextFunctions.repetitionStats(col("text"))
            .map { case (n, c) => c.as(n) }: _*)),

    // --- benchmark decontamination: train docs sharing a word-5-gram
    // with the planted eval split (doc_id % 13); dupedDocs plants
    // contaminated copies (ids % 91 + 1000000) the anti join keeps ---
    "q_decontaminate" -> ((s, dir) => {
      val evalDocs = s.read.parquet(s"$dir/documents.parquet")
        .filter(pmod(col("doc_id"), lit(13)) === 0).select("doc_id", "text")
      val train = dupedDocs(s, dir)
        .join(evalDocs.select("doc_id"), Seq("doc_id"), "left_anti")
      TrainingSet.decontaminate(train, evalDocs, "doc_id", "text", n = 5)
    }),

    // --- EXACT set-similarity join via prefix filtering (AllPairs/
    // PPJoin family): ALL same-(lang, source) pairs with 5-gram
    // Jaccard ≥ 0.25, found through a per-stratum prefix-token
    // equi-join (complete by the prefix lemma), never all-pairs. The
    // stratum scoping is the density rail: this fixture's 30-word
    // vocabulary gives every shingle df ≈ n/2000, where UNSCOPED
    // exact set-sim is near-quadratic for any algorithm. The oracle
    // is SEMANTIC — DuckDB computes the full within-stratum all-pairs
    // Jaccard with no knowledge of the prefix trick, so it checks the
    // filter's completeness too ---
    "q_setsim_join" -> ((s, dir) =>
      graft.operators.SetSim.similarityJoin(
        Dedup.charShingles(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", 5,
          keepCols = Seq("lang", "source")),
        "doc_id", tNum = 1, tDen = 4, groupCols = Seq("lang", "source"))),

    // --- edit-distance near-dup: stratum-scoped LSH band-join
    // candidates (the q_minhash_lsh chain restricted within
    // (lang, source), DuckDB-mirrored) verified by exact Levenshtein
    // ≤ 30% of the longer text; the |len1−len2| prefilter kills most
    // candidates before the O(len²) DP runs. Stratum scoping is the
    // density rail: this fixture's tiny shingle vocabulary makes
    // UNSCOPED band collisions between dissimilar docs grow with the
    // square of the corpus (measured 65x pair volume at a 10x corpus) ---
    "q_editdist_neardup" -> ((s, dir) => {
      val docs = editedDocs(s, dir)
      // raw shingles: min aggregates are duplicate-insensitive
      val shingles = Dedup.charShinglesRaw(docs, "doc_id", "text", 5)
      val cands = Dedup.lshCandidatesGrouped(
        Dedup.lshBands(
          Dedup.minHashSignatures(shingles, "doc_id", k = 16),
          "doc_id", k = 16, bands = 4),
        "doc_id", docs.select("doc_id", "lang", "source"),
        Seq("lang", "source"))
      graft.operators.SetSim.editDistanceNearDup(
        docs, "doc_id", "text", cands,
        maxDistPctNum = 30, maxDistPctDen = 100)
    }),

    // --- lead/lag coupling between two series of one key: Pearson
    // corr between user-turn counts at hour t and assistant-turn
    // counts at t+1h, per conversation — exact integer sufficient
    // statistics, IEEE-deterministic final division ---
    "q_lag_corr" -> ((s, dir) => {
      val series = turns(s, dir)
        .groupBy(col("conv_id"),
          Rollup.bucketWidth(col("ts"), "1h").as("bucket_ts"))
        .agg(sum(when(col("role") === "user", 1L).otherwise(0L)).as("user_cnt"),
          sum(when(col("role") === "assistant", 1L).otherwise(0L)).as("asst_cnt"))
      graft.functions.SeriesFunctions.laggedCorrelation(
        series, Seq("conv_id"), "bucket_ts", "user_cnt", "asst_cnt",
        lagBuckets = 1, bucketSecs = 3600, minPairs = 3)
    }),

    // --- per-doc keyword extraction: top-5 distinctive terms by the
    // rational tf/df score (floor micros; ln-idf deliberately avoided
    // — cross-engine libm is not bit-stable, rank is what matters) ---
    "q_keywords" -> ((s, dir) =>
      graft.operators.TextRetrieval.keywordsOf(s, dir, k = 5)),

    // --- conjunctive term search over the relational inverted index:
    // docs containing ALL of {spark, window, merge}, scored by Σtf ---
    "q_search" -> ((s, dir) =>
      graft.operators.TextRetrieval.conjunctiveSearch(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        Seq("spark", "window", "merge"))),

    // --- multi-window SLO burn rate per event_type: hourly bad-rate
    // (value >= 200) vs the trailing 6h rate, alert when BOTH burn
    // >= 2x the 10% budget — the SRE-workbook alerting rule as one
    // agg + one RANGE window over bucket-sized data ---
    "q_burn_rate" -> ((s, dir) =>
      graft.functions.SeriesFunctions.burnRate(
        s.read.parquet(s"$dir/events.parquet"),
        Seq("event_type"), "ts", col("value") >= 200.0,
        longHours = 6, budgetNum = 1, budgetDen = 10, burnFactor = 2)))

  /** Deterministic raw-log-line fixture: one line per event, digits
    * from user ids and the props payload — shared by the template
    * queries and their oracle SQL (which rebuilds the same lines with
    * string concatenation).
    */
  private def logLines(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id").as("line_id"),
        concat(col("event_type"), lit(" user "), col("user_id").cast("string"),
          lit(" props "), col("props")).as("line"))

  /** Incident-window fixture: every 97th event opens an incident on
    * its event_type lasting (user_id % 7 + 1) × 10 minutes — shared
    * by the interval-join queries and their oracle SQL.
    */
  private def incidents(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
      .filter(pmod(col("event_id"), lit(97)) === 0)
      .select(col("event_id").as("incident_id"), col("event_type"),
        col("ts").cast("timestamp").as("start_ts"),
        timestamp_micros(unix_micros(col("ts").cast("timestamp")) +
          (pmod(col("user_id"), lit(7)) + 1) * lit(600000000L)).as("end_ts"))

  /** Deploy-window fixture: every 89th event, (user_id % 5 + 1) × 15
    * minutes, same derivation discipline as [[incidents]].
    */
  private def deploys(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
      .filter(pmod(col("event_id"), lit(89)) === 0)
      .select(col("event_id").as("deploy_id"), col("event_type"),
        col("ts").cast("timestamp").as("d_start"),
        timestamp_micros(unix_micros(col("ts").cast("timestamp")) +
          (pmod(col("user_id"), lit(5)) + 1) * lit(900000000L)).as("d_end"))

  /** Documents with deterministically planted PII appended (emails
    * every 3rd doc, phones every 5th, SSNs every 11th, cards every
    * 13th, IPs every 17th — all derived from doc_id), shared by the
    * redaction query and its oracle SQL. The driver corpus itself is
    * PII-free, so the scrub needs planted targets to prove anything.
    */
  private def piiDocs(s: SparkSession, dir: String): DataFrame = {
    val last4 = lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), concat(col("text"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" mail u"), col("doc_id").cast("string"), lit("@host"),
            pmod(col("doc_id"), lit(7)).cast("string"), lit(".net")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" call 202-555-"), last4)).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(11)) === 0,
          concat(lit(" ssn 987-65-"), last4)).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(13)) === 0,
          concat(lit(" card 4111-1111-1111-"), last4)).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(17)) === 0,
          concat(lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"),
            lit(".0."), (pmod(col("doc_id"), lit(200)) + 1).cast("string")))
          .otherwise(lit(""))).as("text"))
  }

  /** documents ∪ re-id'd copies of every 7th doc — the duplicate
    * fixture shared by the dedup queries and their oracle SQL.
    */
  private def dupedDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    docs.unionByName(
      docs.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
  }

  /** Shared body of the two tree-depth queries: binary-tree edges per
    * conversation (parent = (turn_idx-1)//2), per-node depth by the
    * given algorithm, per-tree stats joined back.
    */
  private def treeDepthQuery(s: SparkSession, dir: String,
      algo: DataFrame => DataFrame): DataFrame = {
    val edges = turns(s, dir).select(
      col("conv_id"),
      col("turn_idx").as("node"),
      when(col("turn_idx") === 0, lit(null).cast("int"))
        .otherwise(floor((col("turn_idx") - 1) / 2).cast("int")).as("parent"))
    TreeDepth.withDepthStats(algo(edges), "conv_id")
      .select(col("conv_id"), col("node").cast("int").as("turn_idx"),
        col("depth"), col("depth_max"), col("depth_sum"), col("node_cnt"))
  }

  /** embeddings ∪ exact copies of every 10th vector (re-id'd) — the
    * planted near-duplicate fixture for the cosine near-dup queries.
    */
  private def dupedVecs(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")
    emb.unionByName(
      emb.filter(pmod(col("vec_id"), lit(10)) === 0)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
  }

  /** Shared DuckDB CTE mirroring [[dupedVecs]] (doubles pre-cast). */
  private val dupedVecsSql: String =
    """SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |FROM embeddings
      |UNION ALL
      |SELECT vec_id + 1000000, list_transform(embedding, x -> CAST(x AS DOUBLE))
      |FROM embeddings WHERE vec_id % 10 = 0""".stripMargin

  /** Shared DuckDB CTE mirroring [[dupedDocs]]. */
  private val dupedDocsSql: String =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0""".stripMargin

  /** Documents plus NEAR-duplicate planted copies (every 7th doc with
    * a 3-char deterministic suffix edit, stratum preserved) — the
    * edit-distance analog of [[dupedDocs]]: the planted pair's
    * distance is exactly 3, well under the relative bound, and its
    * shingle Jaccard is ≈1 so the LSH chain recovers it.
    */
  private def editedDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "source", "text")
    docs.unionByName(
      docs.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          col("lang"), col("source"),
          concat(col("text"), lit(" v"),
            pmod(col("doc_id"), lit(10)).cast("string")).as("text")))
  }

  /** Shared DuckDB CTE mirroring [[editedDocs]]. */
  private val editedDocsSql: String =
    """SELECT doc_id, lang, source, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id, lang, source,
      |  text || ' v' || CAST(doc_id % 10 AS VARCHAR) AS text
      |FROM documents WHERE doc_id % 7 = 0""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = {
    import TranscriptGen.withTurns
    Map(
      "q_turns" -> withTurns("SELECT * FROM turns"),
      "q_rollup_1m" -> withTurns(Rollup.oracleSql(Tier.Minute)),
      "q_rollup_1h" -> withTurns(Rollup.oracleSql(Tier.Hour)),
      "q_rollup_1d" -> withTurns(Rollup.oracleSql(Tier.Day)),
      "q_rollup_cascade_1d" -> withTurns(Rollup.oracleSql(Tier.Day)),
      // floor to 30s: epoch-micros truncation (== bucketWidth("30s"))
      "q_rollup_30s" -> withTurns(Rollup.oracleSqlExpr(
        "make_timestamp(epoch_us(ts) - epoch_us(ts) % 30000000)")),
      // round-half-up to 5m: shift by half a width, then floor
      "q_rollup_round_5m" -> withTurns(Rollup.oracleSqlExpr(
        "make_timestamp((epoch_us(ts) + 150000000) - " +
          "(epoch_us(ts) + 150000000) % 300000000)")),
      "q_conv_wide" -> withTurns(
        """SELECT conv_id,
          |  count(CASE WHEN tool = 'browse' THEN 1 END) AS tool_browse,
          |  count(CASE WHEN tool = 'calc' THEN 1 END) AS tool_calc,
          |  count(CASE WHEN tool = 'code_run' THEN 1 END) AS tool_code_run,
          |  count(CASE WHEN tool = 'db_query' THEN 1 END) AS tool_db_query,
          |  count(CASE WHEN tool = 'fetch' THEN 1 END) AS tool_fetch,
          |  count(CASE WHEN tool = 'search' THEN 1 END) AS tool_search,
          |  count(CASE WHEN tool = 'summarize' THEN 1 END) AS tool_summarize,
          |  count(CASE WHEN tool = 'translate' THEN 1 END) AS tool_translate
          |FROM turns WHERE tool IS NOT NULL GROUP BY conv_id""".stripMargin),
      "q_rollup_salted_1m" -> withTurns(Rollup.oracleSql(Tier.Minute)),
      // calendar month bucket ≡ date_trunc('month') — the oracle
      // proves the months-since-epoch arithmetic IS calendar flooring
      "q_rollup_1mo" -> withTurns(Rollup.oracleSqlExpr("date_trunc('month', ts)")),
      // nearest month boundary, midpoint up: 2·ts ≥ t0 + t1 picks t1 —
      // the same no-division comparison as Rollup.bucketWidth
      "q_rollup_round_1mo" -> withTurns(Rollup.oracleSqlExpr(
        "CASE WHEN epoch_us(ts) * 2 >= " +
          "epoch_us(date_trunc('month', ts)) + " +
          "epoch_us(date_trunc('month', ts) + INTERVAL 1 MONTH) " +
          "THEN date_trunc('month', ts) + INTERVAL 1 MONTH " +
          "ELSE date_trunc('month', ts) END")),
      "q_cumulative_1d" -> withTurns(
        s"""SELECT conv_id, bucket_ts,
           |  CAST(sum(turn_cnt) OVER w AS BIGINT) AS cum_turns,
           |  CAST(sum(tool_cnt) OVER w AS BIGINT) AS cum_tools,
           |  CAST(sum(text_len_sum) OVER w AS BIGINT) AS cum_text_len
           |FROM (${Rollup.oracleSql(Tier.Day)}) t
           |WINDOW w AS (PARTITION BY conv_id ORDER BY bucket_ts
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin),
      "q_gapfill_1h" -> withTurns(
        s"""WITH t AS (${Rollup.oracleSql(Tier.Hour)}),
           |grid AS (
           |  SELECT conv_id,
           |    unnest(generate_series(min(bucket_ts), max(bucket_ts),
           |      INTERVAL 1 HOUR)) AS bucket_ts
           |  FROM t GROUP BY conv_id),
           |j AS (
           |  SELECT g.conv_id, g.bucket_ts, CAST(t.text_len_sum AS DOUBLE) AS v
           |  FROM grid g LEFT JOIN t
           |    ON t.conv_id = g.conv_id AND t.bucket_ts = g.bucket_ts),
           |w AS (
           |  SELECT conv_id, bucket_ts, v,
           |    last_value(v IGNORE NULLS) OVER wb AS pv,
           |    first_value(v IGNORE NULLS) OVER wf AS nv,
           |    last_value(CASE WHEN v IS NOT NULL THEN bucket_ts END IGNORE NULLS)
           |      OVER wb AS pt,
           |    first_value(CASE WHEN v IS NOT NULL THEN bucket_ts END IGNORE NULLS)
           |      OVER wf AS nt
           |  FROM j
           |  WINDOW
           |    wb AS (PARTITION BY conv_id ORDER BY bucket_ts
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           |    wf AS (PARTITION BY conv_id ORDER BY bucket_ts
           |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
           |SELECT conv_id, bucket_ts,
           |  CASE WHEN v IS NOT NULL THEN v
           |       ELSE pv + (nv - pv) *
           |         (CAST(epoch(bucket_ts) AS DOUBLE) - CAST(epoch(pt) AS DOUBLE)) /
           |         (CAST(epoch(nt) AS DOUBLE) - CAST(epoch(pt) AS DOUBLE)) END AS value,
           |  (v IS NULL) AS filled
           |FROM w""".stripMargin),
      "q_gapfill_locf_1h" -> withTurns(
        s"""WITH t AS (${Rollup.oracleSql(Tier.Hour)}),
           |grid AS (
           |  SELECT conv_id,
           |    unnest(generate_series(min(bucket_ts), max(bucket_ts),
           |      INTERVAL 1 HOUR)) AS bucket_ts
           |  FROM t GROUP BY conv_id),
           |j AS (
           |  SELECT g.conv_id, g.bucket_ts, CAST(t.text_len_sum AS DOUBLE) AS v
           |  FROM grid g LEFT JOIN t
           |    ON t.conv_id = g.conv_id AND t.bucket_ts = g.bucket_ts)
           |SELECT conv_id, bucket_ts,
           |  last_value(v IGNORE NULLS) OVER (PARTITION BY conv_id
           |    ORDER BY bucket_ts
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           |  (v IS NULL) AS filled
           |FROM j""".stripMargin),
      "q_gapfill_zero_1h" -> withTurns(
        s"""WITH t AS (${Rollup.oracleSql(Tier.Hour)}),
           |grid AS (
           |  SELECT conv_id,
           |    unnest(generate_series(min(bucket_ts), max(bucket_ts),
           |      INTERVAL 1 HOUR)) AS bucket_ts
           |  FROM t GROUP BY conv_id),
           |j AS (
           |  SELECT g.conv_id, g.bucket_ts, CAST(t.turn_cnt AS DOUBLE) AS v
           |  FROM grid g LEFT JOIN t
           |    ON t.conv_id = g.conv_id AND t.bucket_ts = g.bucket_ts)
           |SELECT conv_id, bucket_ts,
           |  coalesce(v, 0.0) AS value,
           |  (v IS NULL) AS filled
           |FROM j""".stripMargin),
      "q_gapfill_zero_1m" -> withTurns(
        s"""WITH t AS (${Rollup.oracleSql(Tier.Minute)}),
           |grid AS (
           |  SELECT conv_id,
           |    unnest(generate_series(min(bucket_ts), max(bucket_ts),
           |      INTERVAL 1 MINUTE)) AS bucket_ts
           |  FROM t GROUP BY conv_id),
           |j AS (
           |  SELECT g.conv_id, g.bucket_ts, CAST(t.turn_cnt AS DOUBLE) AS v
           |  FROM grid g LEFT JOIN t
           |    ON t.conv_id = g.conv_id AND t.bucket_ts = g.bucket_ts)
           |SELECT conv_id, bucket_ts,
           |  coalesce(v, 0.0) AS value,
           |  (v IS NULL) AS filled
           |FROM j""".stripMargin),
      "q_chunk_roundtrip" -> withTurns(
        s"""SELECT conv_id, bucket_ts, CAST(text_len_sum AS DOUBLE) AS text_len
           |FROM (${Rollup.oracleSql(Tier.Minute)}) t""".stripMargin),
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
          |  sum(l_quantity) AS sum_qty,
          |  count(*) AS cnt,
          |  min(l_extendedprice) AS min_price,
          |  max(l_extendedprice) AS max_price
          |FROM lineitem GROUP BY 1, 2""".stripMargin,
      "q_align_join" -> withTurns(
        s"""WITH t AS (${Rollup.oracleSql(Tier.Minute)}),
           |p AS (
           |  SELECT 'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
           |    date_trunc('minute', ts) AS bucket_ts,
           |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS purchase_cents
           |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
           |SELECT t.conv_id, t.bucket_ts, t.turn_cnt, p.purchase_cents
           |FROM t LEFT JOIN p
           |  ON p.conv_id = t.conv_id AND p.bucket_ts = t.bucket_ts""".stripMargin),
      "q_role_pivot" -> withTurns(
        """SELECT conv_id, date_trunc('day', ts) AS bucket_ts,
          |  count(CASE WHEN role = 'user' THEN 1 END) AS user_cnt,
          |  count(CASE WHEN role = 'assistant' THEN 1 END) AS assistant_cnt,
          |  count(CASE WHEN role = 'tool' THEN 1 END) AS tool_cnt
          |FROM turns GROUP BY 1, 2""".stripMargin),
      "q_window_lag" -> withTurns(
        """SELECT conv_id, turn_idx,
          |  CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER
          |    (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT) AS gap_us
          |FROM turns""".stripMargin),
      "q_asof_prev_user" -> withTurns(
        """SELECT conv_id, turn_idx, prev_user_ts FROM (
          |  SELECT conv_id, turn_idx, role,
          |    last_value(CASE WHEN role = 'user' THEN ts END IGNORE NULLS) OVER
          |      (PARTITION BY conv_id ORDER BY turn_idx
          |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_user_ts
          |  FROM turns) WHERE role = 'tool'""".stripMargin),
      "q_head_per_conv" -> withTurns(
        """SELECT conv_id, turn_idx, role, text FROM turns
          |QUALIFY row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) <= 5""".stripMargin),
      "q_asof_align" -> withTurns(
        """WITH p AS (
          |  SELECT 'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
          |    ts,
          |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
          |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
          |SELECT t.conv_id, t.turn_idx,
          |  CASE WHEN p.ts IS NOT NULL
          |        AND epoch_us(t.ts) - epoch_us(p.ts) <= 3600000000
          |       THEN p.cents END AS purchase_cents,
          |  CASE WHEN p.ts IS NOT NULL
          |        AND epoch_us(t.ts) - epoch_us(p.ts) <= 3600000000
          |       THEN p.ts END AS matched_ts
          |FROM turns t ASOF LEFT JOIN p
          |  ON t.conv_id = p.conv_id AND t.ts >= p.ts""".stripMargin),
      // forward direction: DuckDB ASOF also supports t.ts <= p.ts
      // (earliest at-or-after, inclusive ties — verified semantics)
      "q_asof_align_fwd" -> withTurns(
        """WITH p AS (
          |  SELECT 'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
          |    ts,
          |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
          |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
          |SELECT t.conv_id, t.turn_idx,
          |  CASE WHEN p.ts IS NOT NULL
          |        AND epoch_us(p.ts) - epoch_us(t.ts) <= 3600000000
          |       THEN p.cents END AS purchase_cents,
          |  CASE WHEN p.ts IS NOT NULL
          |        AND epoch_us(p.ts) - epoch_us(t.ts) <= 3600000000
          |       THEN p.ts END AS matched_ts
          |FROM turns t ASOF LEFT JOIN p
          |  ON t.conv_id = p.conv_id AND t.ts <= p.ts""".stripMargin),
      "q_sessionize" -> withTurns(
        """WITH g AS (
          |  SELECT conv_id, turn_idx, ts,
          |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
          |      (PARTITION BY conv_id ORDER BY turn_idx) > 1800000000
          |      THEN 1 ELSE 0 END AS new_session
          |  FROM turns),
          |s AS (
          |  SELECT conv_id, ts,
          |    CAST(sum(new_session) OVER (PARTITION BY conv_id ORDER BY turn_idx
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |      AS session_id
          |  FROM g)
          |SELECT conv_id, session_id, count(*) AS turn_cnt,
          |  min(ts) AS session_start, max(ts) AS session_end
          |FROM s GROUP BY 1, 2""".stripMargin),
      "q_mode_tool" -> withTurns(
        """SELECT conv_id, tool AS mode_tool, cnt AS mode_cnt FROM (
          |  SELECT conv_id, tool, count(*) AS cnt,
          |    row_number() OVER (PARTITION BY conv_id
          |      ORDER BY count(*) DESC, tool) AS rn
          |  FROM turns WHERE tool IS NOT NULL
          |  GROUP BY conv_id, tool)
          |WHERE rn = 1""".stripMargin),
      "q_mode_tool_all" -> withTurns(
        """SELECT conv_id,
          |  array_to_string(list_sort(list(tool)), ' - ') AS mode_tools,
          |  CAST(max(cnt) AS BIGINT) AS mode_cnt
          |FROM (
          |  SELECT conv_id, tool, count(*) AS cnt,
          |    max(count(*)) OVER (PARTITION BY conv_id) AS mx
          |  FROM turns WHERE tool IS NOT NULL
          |  GROUP BY conv_id, tool)
          |WHERE cnt = mx
          |GROUP BY conv_id""".stripMargin),
      "q_tree_depth" -> treeDepthOracleSql,
      "q_tree_depth_doubling" -> treeDepthOracleSql,
      "q_semi_join" -> withTurns(
        """SELECT DISTINCT conv_id FROM turns t1
          |WHERE EXISTS (SELECT 1 FROM turns t2
          |  WHERE t2.conv_id = t1.conv_id
          |    AND t2.tool IN ('search', 'browse'))""".stripMargin),
      "q_anti_join" -> withTurns(
        """SELECT DISTINCT conv_id FROM turns t1
          |WHERE NOT EXISTS (SELECT 1 FROM turns t2
          |  WHERE t2.conv_id = t1.conv_id AND t2.tool = 'translate')""".stripMargin),
      "q_cumulative_distinct_tools" -> withTurns(
        """WITH wb AS (
          |  SELECT conv_id, tool, date_trunc('day', ts) AS bucket_ts
          |  FROM turns WHERE tool IS NOT NULL),
          |f AS (
          |  SELECT conv_id, bucket_ts,
          |    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS new_tools
          |  FROM (SELECT conv_id, tool, bucket_ts,
          |          row_number() OVER (PARTITION BY conv_id, tool
          |            ORDER BY bucket_ts) AS rn
          |        FROM wb)
          |  GROUP BY 1, 2)
          |SELECT conv_id, bucket_ts,
          |  CAST(sum(new_tools) OVER (PARTITION BY conv_id ORDER BY bucket_ts
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |    AS distinct_tools_so_far
          |FROM f""".stripMargin),
      "q_median_text_len" -> withTurns(
        """WITH t AS (
          |  SELECT conv_id, CAST(length(text) AS BIGINT) AS len, turn_idx
          |  FROM turns),
          |r AS (
          |  SELECT conv_id, len,
          |    row_number() OVER (PARTITION BY conv_id ORDER BY len, turn_idx) AS rn,
          |    count(*) OVER (PARTITION BY conv_id) AS cnt
          |  FROM t)
          |SELECT conv_id, len AS median_text_len FROM r
          |WHERE rn = (cnt + 1) // 2""".stripMargin),
      "q_daily_active" -> withTurns(
        """SELECT date_trunc('day', ts) AS bucket_ts,
          |  count(DISTINCT conv_id) AS active_convs,
          |  count(*) AS turn_cnt
          |FROM turns GROUP BY 1""".stripMargin),
      "q_collect_tools" -> withTurns(
        """SELECT conv_id, date_trunc('day', ts) AS bucket_ts,
          |  coalesce(string_agg(tool, ' - ' ORDER BY tool), '') AS tools_joined
          |FROM turns GROUP BY 1, 2""".stripMargin),
      "q_tokenize" ->
        """SELECT doc_id,
          |  CAST(unnest(generate_series(1, len(l))) - 1 AS BIGINT) AS pos,
          |  unnest(l) AS token
          |FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS l
          |      FROM documents)""".stripMargin,
      "q_brand_revenue" ->
        """SELECT p_brand, s_nationkey,
          |  count(*) AS line_cnt,
          |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
          |    AS BIGINT)) AS BIGINT) AS revenue_cents,
          |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |GROUP BY 1, 2""".stripMargin,
      "q_region_rollup" ->
        """SELECT r_name, count(*) AS order_cnt,
          |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
          |FROM orders
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY 1""".stripMargin,
      "q_text_stats" ->
        """SELECT doc_id,
          |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
          |  CAST(length(text) AS BIGINT) AS n_chars,
          |  CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_distinct_tokens,
          |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
          |    t -> t IN ('the','a','of','and','to'))) AS BIGINT) AS stopword_hits,
          |  CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS punct_cnt,
          |  CAST(floor(1000.0 * len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
          |    / len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS ttr_millis,
          |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_subwords,
          |  list_reduce(list_concat([CAST(0 AS BIGINT)],
          |    list_transform(generate_series(1, length(text)),
          |      i -> CAST(ord(substr(text, i, 1)) AS BIGINT))),
          |    (h, c) -> (h * 31 + c) % 2147483647) AS fingerprint
          |FROM documents""".stripMargin,
      "q_lang_id" ->
        """WITH h AS (
          |  SELECT doc_id,
          |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
          |      t -> t IN ('der','die','das','und','ist'))) AS BIGINT) AS hits_de,
          |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
          |      t -> t IN ('the','and','of','to','is'))) AS BIGINT) AS hits_en,
          |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
          |      t -> t IN ('el','los','las','es','y'))) AS BIGINT) AS hits_es,
          |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
          |      t -> t IN ('le','la','les','et','est'))) AS BIGINT) AS hits_fr
          |  FROM documents)
          |SELECT doc_id, hits_de, hits_en, hits_es, hits_fr,
          |  CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr) = 0 THEN 'und'
          |       WHEN hits_de = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'de'
          |       WHEN hits_en = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
          |       WHEN hits_es = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
          |       ELSE 'fr' END AS lang_pred
          |FROM h""".stripMargin,
      "q_dedup_exact" ->
        s"""WITH duped AS ($dupedDocsSql)
           |SELECT doc_id, text FROM duped
           |QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1""".stripMargin,
      "q_dedup_drop_all" ->
        s"""WITH duped AS ($dupedDocsSql)
           |SELECT doc_id, text FROM duped
           |QUALIFY count(*) OVER (PARTITION BY text) = 1""".stripMargin,
      "q_ngram_jaccard" ->
        """WITH sh AS (
          |  SELECT doc_id, unnest(list_distinct(list_transform(
          |    generate_series(1, greatest(length(text) - 2, 1)),
          |    i -> substr(text, i, 3)))) AS shingle
          |  FROM documents),
          |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
          |pairs AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2 FROM documents a
          |  JOIN documents b ON a.lang = b.lang AND a.source = b.source
          |    AND a.doc_id < b.doc_id
          |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 = 0),
          |inter AS (
          |  SELECT p.id1, p.id2, count(*) AS inter_sz FROM pairs p
          |  JOIN sh s1 ON s1.doc_id = p.id1
          |  JOIN sh s2 ON s2.doc_id = p.id2 AND s2.shingle = s1.shingle
          |  GROUP BY 1, 2)
          |SELECT p.id1, p.id2,
          |  COALESCE(i.inter_sz, 0) AS inter_sz,
          |  z1.sz + z2.sz - COALESCE(i.inter_sz, 0) AS union_sz
          |FROM pairs p
          |LEFT JOIN inter i ON i.id1 = p.id1 AND i.id2 = p.id2
          |JOIN sz z1 ON z1.doc_id = p.id1
          |JOIN sz z2 ON z2.doc_id = p.id2""".stripMargin,
      "q_embed_cosine_topk" ->
        """WITH v AS (
          |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          |  FROM embeddings),
          |pairs AS (
          |  SELECT a.vec_id AS qid, b.vec_id AS nid,
          |    list_reduce(list_concat([0.0::DOUBLE],
          |      list_transform(generate_series(1, len(a.e)), i -> a.e[i] * b.e[i])),
          |      (x, y) -> x + y)
          |    / (sqrt(list_reduce(list_concat([0.0::DOUBLE],
          |        list_transform(generate_series(1, len(a.e)), i -> a.e[i] * a.e[i])),
          |        (x, y) -> x + y))
          |     * sqrt(list_reduce(list_concat([0.0::DOUBLE],
          |        list_transform(generate_series(1, len(b.e)), i -> b.e[i] * b.e[i])),
          |        (x, y) -> x + y))) AS cos
          |  FROM v a JOIN v b ON a.vec_id != b.vec_id)
          |SELECT qid, CAST(rank AS BIGINT) AS rank, nid FROM (
          |  SELECT qid, nid,
          |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
          |  FROM pairs) WHERE rank <= 5""".stripMargin,
      "q_embed_neardup" -> neardupOracleSql,
      "q_embed_neardup_lsh" -> neardupOracleSql,
      "q_embed_neardup_lsh_auto" -> neardupOracleSql,
      "q_embed_neardup_ivf" -> neardupOracleSql,
      "q_multimodal_meta" ->
        """SELECT doc_id,
          |  (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
          |  CAST(CASE doc_id % 3
          |    WHEN 0 THEN 57 + strlen(text)
          |    WHEN 1 THEN 44 + (doc_id % 30 + 1) * 100
          |    ELSE 240 + strlen(text) END AS INT) AS byte_len,
          |  CAST(CASE WHEN doc_id % 3 != 1
          |    THEN doc_id % 4 * 160 + 320 END AS INT) AS width,
          |  CAST(CASE WHEN doc_id % 3 != 1
          |    THEN doc_id % 3 * 120 + 240 END AS INT) AS height,
          |  CAST(CASE WHEN doc_id % 3 != 0
          |    THEN doc_id % 30 + 1 END AS INT) AS duration_s
          |FROM documents""".stripMargin,
      "q_frame_sample" ->
        """SELECT doc_id,
          |  CAST(unnest(generate_series(0, CAST(doc_id % 30 AS INT), 5)) AS INT) AS frame_ts_s
          |FROM documents WHERE doc_id % 3 = 2""".stripMargin,
      // PNG (doc_id%3=0) and MP4 (doc_id%3=2) bodies are the text
      // bytes verbatim; ASCII fixture → ord(ch) == byte, bins 0-3
      "q_media_features" ->
        """WITH c AS (
          |  SELECT doc_id, text,
          |    list_transform(generate_series(1, strlen(text)),
          |      i -> ord(substr(text, i, 1))) AS codes
          |  FROM documents WHERE doc_id % 3 != 1)
          |SELECT doc_id,
          |  CAST(strlen(text) AS BIGINT) AS body_len,
          |  CAST(len(list_filter(codes, c -> c // 32 = 0)) AS BIGINT) AS hist_0,
          |  CAST(len(list_filter(codes, c -> c // 32 = 1)) AS BIGINT) AS hist_1,
          |  CAST(len(list_filter(codes, c -> c // 32 = 2)) AS BIGINT) AS hist_2,
          |  CAST(len(list_filter(codes, c -> c // 32 = 3)) AS BIGINT) AS hist_3,
          |  CAST(len(list_filter(generate_series(2, strlen(text)),
          |    i -> substr(text, i, 1) != substr(text, i - 1, 1))) AS BIGINT)
          |    AS transitions
          |FROM c""".stripMargin,
      "q_log_templates" ->
        s"""WITH $logLinesSql,
           |t AS (
           |  SELECT line_id,
           |    ${templateSql("line")} AS template,
           |    regexp_extract_all(line, '$logVarPat') AS params
           |  FROM m)
           |SELECT line_id,
           |  ${fingerprintSql("template")} AS event_id,
           |  template,
           |  CAST(len(params) AS BIGINT) AS n_params,
           |  array_to_string(params, '|') AS params_joined
           |FROM t""".stripMargin,
      "q_log_template_counts" ->
        s"""WITH $logLinesSql,
           |t AS (
           |  SELECT line_id,
           |    ${templateSql("line")} AS template,
           |    regexp_extract_all(line, '$logVarPat') AS params
           |  FROM m)
           |SELECT ${fingerprintSql("template")} AS event_id,
           |  template,
           |  count(*) AS line_cnt,
           |  CAST(sum(CAST(len(params) AS BIGINT)) AS BIGINT) AS param_cnt
           |FROM t GROUP BY template""".stripMargin,
      // --- the MirrorHash family (r3 verdict ask #1): minhash/simhash/
      // LSH re-based on the fingerprint polynomial, so the WHOLE chain
      // (shingle → fingerprint → affine minima → band combine → band
      // join → Jaccard verify) is reproduced in DuckDB and hash-checked
      "q_minhash_lsh" ->
        s"""WITH ${minhashCandidatesSql(n = 5, k = 16, bands = 4)}
           |SELECT id1, id2 FROM cand""".stripMargin,
      "q_ngram_jaccard_lsh" ->
        s"""WITH ${minhashCandidatesSql(n = 5, k = 16, bands = 4)},
           |sh3 AS (
           |  SELECT doc_id, unnest(list_distinct(list_transform(
           |    generate_series(1, greatest(length(text) - 2, 1)),
           |    i -> substr(text, i, 3)))) AS shingle
           |  FROM documents),
           |sz AS (SELECT doc_id, count(*) AS sz FROM sh3 GROUP BY 1),
           |inter AS (
           |  SELECT p.id1, p.id2, count(*) AS inter_sz FROM cand p
           |  JOIN sh3 s1 ON s1.doc_id = p.id1
           |  JOIN sh3 s2 ON s2.doc_id = p.id2 AND s2.shingle = s1.shingle
           |  GROUP BY 1, 2)
           |SELECT p.id1, p.id2,
           |  COALESCE(i.inter_sz, 0) AS inter_sz,
           |  z1.sz + z2.sz - COALESCE(i.inter_sz, 0) AS union_sz
           |FROM cand p
           |LEFT JOIN inter i ON i.id1 = p.id1 AND i.id2 = p.id2
           |JOIN sz z1 ON z1.doc_id = p.id1
           |JOIN sz z2 ON z2.doc_id = p.id2""".stripMargin,
      "q_simhash" -> simhashOracleSql,
      "q_embed_lsh_topk" ->
        lshTopkOracleSql(dim = 64, planes = 6, rotations = 4, k = 5),
      // the LAST formerly-no-oracle entry, closed by r5's fixed-point
      // Lloyd: training itself is now mirrored, 66/66 hash-checked
      "q_embed_ivf_topk" ->
        ivfTopkOracleSql(dim = 64, nlist = 8, nprobe = 3, iters = 2, k = 5),
      "q_embed_lsh_topk_auto" ->
        lshTopkAutoOracleSql(dim = 64, rotations = 4, k = 5, occupancy = 256),
      "q_embed_neardup_lsh_auto_4x" ->
        neardupLshAuto4xOracleSql(dim = 64, rotations = 4, occupancy = 16),

      // --- near-dup clustering: the same LSH candidate chain over the
      // duped corpus, closed transitively by a recursive reachability
      // CTE (reach(id) = every node with a path to id; min = the
      // component label the engine's label propagation converges to)
      "q_neardup_components" ->
        s"""WITH RECURSIVE duped AS ($dupedDocsSql),
           |${minhashCandidatesSql(n = 5, k = 16, bands = 4, src = "duped")},
           |edges AS (
           |  SELECT id1 AS a, id2 AS b FROM cand
           |  UNION ALL
           |  SELECT id2, id1 FROM cand),
           |reach(id, r) AS (
           |  SELECT doc_id, doc_id FROM duped
           |  UNION
           |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b),
           |comp AS (
           |  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
           |cs AS (
           |  SELECT component, count(*) AS cluster_sz FROM comp GROUP BY component)
           |SELECT c.doc_id, c.component, cs.cluster_sz,
           |  CAST(CASE WHEN c.doc_id = c.component THEN 1 ELSE 0 END AS INT)
           |    AS is_canonical
           |FROM comp c JOIN cs ON cs.component = c.component""".stripMargin,

      "q_stratified_sample" -> {
        import graft.functions.MirrorHash
        val rank = MirrorHash.affineSql(
          fingerprintSql("CAST(doc_id AS VARCHAR)"),
          MirrorHash.a(MirrorHash.SampleSalt, 0),
          MirrorHash.b(MirrorHash.SampleSalt, 0))
        s"""SELECT doc_id, lang, source, sample_rank FROM (
           |  SELECT doc_id, lang, source,
           |    row_number() OVER (PARTITION BY lang, source
           |      ORDER BY $rank, doc_id) AS sample_rank
           |  FROM documents)
           |WHERE sample_rank <= 12""".stripMargin
      },

      "q_counter_rate" ->
        """WITH w AS (
          |  SELECT event_id, user_id, value,
          |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv,
          |    epoch_us(ts) - lag(epoch_us(ts))
          |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dus
          |  FROM events),
          |c AS (
          |  SELECT event_id, user_id,
          |    CASE WHEN pv IS NULL THEN NULL
          |         WHEN value < pv THEN value
          |         ELSE value - pv END AS inc,
          |    CAST(dus AS DOUBLE) / 1000000.0 AS secs
          |  FROM w)
          |SELECT event_id, user_id,
          |  CAST(floor(inc * 1000.0) AS BIGINT) AS increase_millis,
          |  CASE WHEN secs > 0
          |    THEN CAST(floor(inc * 1000.0 / secs) AS BIGINT) END AS rate_millis
          |FROM c""".stripMargin,

      "q_counter_rate_1h" ->
        """WITH b AS (
          |  SELECT user_id, value, ts, event_id,
          |    make_timestamp(epoch_us(ts) - epoch_us(ts) % 3600000000)
          |      AS bucket_ts
          |  FROM events),
          |l AS (
          |  SELECT user_id, bucket_ts, ts, value FROM (
          |    SELECT user_id, bucket_ts, ts, value,
          |      row_number() OVER (PARTITION BY user_id, bucket_ts
          |        ORDER BY ts DESC, event_id DESC) AS rn
          |    FROM b) WHERE rn = 1),
          |w AS (
          |  SELECT user_id, bucket_ts, value,
          |    lag(value) OVER (PARTITION BY user_id ORDER BY bucket_ts) AS pv,
          |    epoch_us(ts) - lag(epoch_us(ts))
          |      OVER (PARTITION BY user_id ORDER BY bucket_ts) AS dus
          |  FROM l),
          |c AS (
          |  SELECT user_id, bucket_ts,
          |    CASE WHEN pv IS NULL THEN NULL
          |         WHEN value < pv THEN value
          |         ELSE value - pv END AS inc,
          |    CAST(dus AS DOUBLE) / 1000000.0 AS secs
          |  FROM w)
          |SELECT user_id, bucket_ts,
          |  CAST(floor(inc * 1000.0) AS BIGINT) AS increase_millis,
          |  CASE WHEN secs > 0
          |    THEN CAST(floor(inc * 1000.0 / secs) AS BIGINT) END AS rate_millis
          |FROM c""".stripMargin,

      "q_turn_rate_1h" -> withTurns(
        """SELECT conv_id,
          |  make_timestamp(epoch_us(ts) - epoch_us(ts) % 3600000000)
          |    AS bucket_ts,
          |  count(*) AS increase,
          |  CAST(floor(count(*) * 1000.0 / 3600.0) AS BIGINT) AS rate_millis
          |FROM turns GROUP BY 1, 2""".stripMargin),

      "q_downsample_1h" ->
        """WITH b AS (
          |  SELECT user_id, event_id, ts,
          |    make_timestamp(epoch_us(ts) - epoch_us(ts) % 3600000000)
          |      AS bucket_ts,
          |    CAST(floor(value * 1000.0) AS BIGINT) AS v_milli
          |  FROM events),
          |d AS (
          |  SELECT user_id, bucket_ts, event_id, ts, v_milli,
          |    abs(count(*) OVER (PARTITION BY user_id, bucket_ts) * v_milli -
          |        sum(v_milli) OVER (PARTITION BY user_id, bucket_ts)) AS dev
          |  FROM b)
          |SELECT user_id, bucket_ts, event_id, v_milli FROM (
          |  SELECT user_id, bucket_ts, event_id, v_milli,
          |    row_number() OVER (PARTITION BY user_id, bucket_ts
          |      ORDER BY dev DESC, ts, event_id) AS rn
          |  FROM d)
          |WHERE rn = 1""".stripMargin,

      "q_rolling_actives_7d" -> withTurns(
        """SELECT v.day, count(DISTINCT v.conv_id) AS active_7d
          |FROM (SELECT conv_id, d + CAST(i AS INTEGER) AS day
          |      FROM (SELECT conv_id, d, unnest(generate_series(0, 6)) AS i
          |            FROM (SELECT DISTINCT CAST(ts AS DATE) AS d, conv_id
          |                  FROM turns))) v
          |JOIN (SELECT DISTINCT CAST(ts AS DATE) AS day FROM turns) o
          |  ON o.day = v.day
          |GROUP BY 1""".stripMargin),

      // the engine runs the bucket-grid equi-join; DuckDB's native
      // range join checks the same point-in-interval semantics
      "q_interval_join" ->
        """WITH inc AS (
          |  SELECT event_id AS incident_id, event_type, ts AS start_ts,
          |    ts + to_minutes(CAST((user_id % 7 + 1) * 10 AS BIGINT)) AS end_ts
          |  FROM events WHERE event_id % 97 = 0)
          |SELECT i.incident_id, i.event_type,
          |  count(*) AS n_events, count(DISTINCT e.user_id) AS n_users
          |FROM inc i JOIN events e
          |  ON e.event_type = i.event_type
          |  AND e.ts >= i.start_ts AND e.ts < i.end_ts
          |GROUP BY 1, 2""".stripMargin,

      "q_interval_overlap" ->
        """WITH inc AS (
          |  SELECT event_id AS incident_id, event_type, ts AS start_ts,
          |    ts + to_minutes(CAST((user_id % 7 + 1) * 10 AS BIGINT)) AS end_ts
          |  FROM events WHERE event_id % 97 = 0),
          |dep AS (
          |  SELECT event_id AS deploy_id, event_type, ts AS d_start,
          |    ts + to_minutes(CAST((user_id % 5 + 1) * 15 AS BIGINT)) AS d_end
          |  FROM events WHERE event_id % 89 = 0)
          |SELECT d.deploy_id, i.incident_id,
          |  epoch_us(least(d.d_end, i.end_ts)) -
          |    epoch_us(greatest(d.d_start, i.start_ts)) AS overlap_us
          |FROM dep d JOIN inc i
          |  ON d.event_type = i.event_type
          |  AND d.d_start < i.end_ts AND i.start_ts < d.d_end""".stripMargin,

      // one-window reference semantics; the engine runs (and this
      // thereby hash-checks) the bucketed two-level scale plan
      "q_pack_shards" ->
        """WITH t AS (
          |  SELECT doc_id, lang,
          |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
          |      AS tok_cnt
          |  FROM documents)
          |SELECT doc_id, lang, tok_cnt,
          |  CAST(floor(COALESCE(sum(tok_cnt) OVER (PARTITION BY lang
          |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          |    0) / 2000) AS BIGINT) AS shard_idx
          |FROM t""".stripMargin,

      "q_decontaminate" ->
        s"""WITH duped AS ($dupedDocsSql),
           |ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 = 0),
           |train AS (
           |  SELECT d.doc_id, d.text FROM duped d
           |  WHERE NOT EXISTS (SELECT 1 FROM ev e WHERE e.doc_id = d.doc_id)),
           |tng AS (
           |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS ngram
           |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
           |        FROM (SELECT doc_id,
           |                regexp_split_to_array(trim(text), '\\s+') AS t
           |              FROM train)
           |        WHERE len(t) >= 5)),
           |eng AS (
           |  SELECT DISTINCT array_to_string(t[i:i+4], ' ') AS ngram
           |  FROM (SELECT t, unnest(generate_series(1, len(t) - 4)) AS i
           |        FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS t
           |              FROM ev)
           |        WHERE len(t) >= 5))
           |SELECT t.doc_id, count(*) AS n_hits
           |FROM tng t JOIN eng e ON e.ngram = t.ngram
           |GROUP BY 1""".stripMargin,

      "q_cms_heavy_hitters" -> cmsOracleSql(depth = 4, width = 512,
        permille = 10),

      // the engine's cross-multiplied integer z-score rule verbatim:
      // kDen^2 (n x - S1)^2 > kNum^2 (n S2 - S1^2), trailing frame
      "q_anomaly_zscore" ->
        """WITH base AS (
          |  SELECT event_id, event_type, ts,
          |    CAST(floor(value * 1000) AS BIGINT) AS v_milli
          |  FROM events),
          |win AS (
          |  SELECT event_id, event_type, v_milli,
          |    count(v_milli) OVER w AS n,
          |    sum(v_milli) OVER w AS s1,
          |    sum(v_milli * v_milli) OVER w AS s2
          |  FROM base
          |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
          |               ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING))
          |SELECT event_id, event_type, v_milli, n AS n_baseline
          |FROM win
          |WHERE n >= 20
          |  AND (n * v_milli - s1) * (n * v_milli - s1)
          |      > 9 * (n * s2 - s1 * s1)""".stripMargin,

      "q_pii_redact" -> piiOracleSql,

      "q_histogram_p90" -> histogramOracleSql(HistLadder, 9, 10),

      "q_cohort_retention" ->
        """WITH acts AS (
          |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
          |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
          |f AS (SELECT user_id, min(day) AS cohort_day FROM acts GROUP BY 1),
          |cells AS (
          |  SELECT f.cohort_day,
          |    CAST(datediff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
          |    count(DISTINCT a.user_id) AS active_users
          |  FROM acts a JOIN f ON a.user_id = f.user_id
          |  WHERE datediff('day', f.cohort_day, a.day) <= 30
          |  GROUP BY 1, 2)
          |SELECT cohort_day, day_offset, active_users, cohort_size,
          |  CAST(floor(1000.0 * active_users / cohort_size) AS BIGINT)
          |    AS retained_permille
          |FROM (SELECT *,
          |        max(CASE WHEN day_offset = 0 THEN active_users END)
          |          OVER (PARTITION BY cohort_day) AS cohort_size
          |      FROM cells)""".stripMargin,

      // hand-built recursive oracle (WITH RECURSIVE must lead the CTE
      // list): replays the engine's exact integer EWMA chain — same
      // fixed-point values, same floor(double/aDen) step
      "q_ewma" ->
        """WITH RECURSIVE pts AS (
          |  SELECT event_type, user_id, event_id,
          |    CAST(floor(value * 1000) AS BIGINT) AS v_milli,
          |    row_number() OVER (PARTITION BY event_type, user_id
          |                       ORDER BY ts, event_id) AS rn
          |  FROM events),
          |r AS (
          |  SELECT event_type, user_id, event_id, v_milli, rn,
          |    v_milli AS ewma_milli
          |  FROM pts WHERE rn = 1
          |  UNION ALL
          |  SELECT p.event_type, p.user_id, p.event_id, p.v_milli, p.rn,
          |    CAST(floor((2 * p.v_milli + 8 * r.ewma_milli) / 10.0) AS BIGINT)
          |  FROM pts p JOIN r ON p.event_type = r.event_type
          |    AND p.user_id = r.user_id AND p.rn = r.rn + 1)
          |SELECT event_type, user_id, event_id, v_milli, ewma_milli
          |FROM r""".stripMargin,

      // hour-of-week slot mean as the engine computes it: DuckDB's
      // dayofweek is 0=Sunday (Spark's is 1=Sunday, engine subtracts
      // 1), baseline via the same non-negative-remainder integer
      // division — exact for negative sums too
      "q_seasonal_baseline" ->
        """WITH base AS (
          |  SELECT event_id, event_type,
          |    CAST(dayofweek(ts) * 24 + hour(ts) AS BIGINT) AS how,
          |    CAST(floor(value * 1000) AS BIGINT) AS v_milli
          |  FROM events),
          |b AS (
          |  SELECT event_type, how, sum(v_milli) AS s, count(*) AS n
          |  FROM base GROUP BY 1, 2)
          |SELECT base.event_id, base.event_type, base.how, base.v_milli,
          |  CAST((b.s - (((b.s % b.n) + b.n) % b.n)) // b.n
          |    AS BIGINT) AS baseline_milli,
          |  base.v_milli - CAST((b.s - (((b.s % b.n) + b.n) % b.n)) // b.n
          |    AS BIGINT) AS dev_milli
          |FROM base JOIN b
          |  ON base.event_type = b.event_type AND base.how = b.how""".stripMargin,

      // recursive replay of the engine's exact CUSUM chain:
      // c1 = max(0, v1 - 60000), cn = max(0, c + vn - 60000)
      "q_cusum_drift" ->
        """WITH RECURSIVE pts AS (
          |  SELECT event_type, user_id, event_id,
          |    CAST(floor(value * 1000) AS BIGINT) AS v_milli,
          |    row_number() OVER (PARTITION BY event_type, user_id
          |                       ORDER BY ts, event_id) AS rn
          |  FROM events),
          |r AS (
          |  SELECT event_type, user_id, event_id, v_milli, rn,
          |    greatest(0, v_milli - 60000) AS cusum_milli
          |  FROM pts WHERE rn = 1
          |  UNION ALL
          |  SELECT p.event_type, p.user_id, p.event_id, p.v_milli, p.rn,
          |    greatest(0, r.cusum_milli + p.v_milli - 60000)
          |  FROM pts p JOIN r ON p.event_type = r.event_type
          |    AND p.user_id = r.user_id AND p.rn = r.rn + 1)
          |SELECT event_type, user_id, event_id, v_milli, cusum_milli,
          |  cusum_milli >= 200000 AS drifting
          |FROM r""".stripMargin,

      // recursive replay of the engine's exact Holt chain: the level
      // is computed in a nested select so the trend step can read it
      "q_holt_forecast" ->
        """WITH RECURSIVE pts AS (
          |  SELECT event_type, user_id, event_id,
          |    CAST(floor(value * 1000) AS BIGINT) AS v_milli,
          |    row_number() OVER (PARTITION BY event_type, user_id
          |                       ORDER BY ts, event_id) AS rn
          |  FROM events),
          |r AS (
          |  SELECT event_type, user_id, event_id, v_milli, rn,
          |    v_milli AS level_milli, CAST(0 AS BIGINT) AS trend_milli
          |  FROM pts WHERE rn = 1
          |  UNION ALL
          |  SELECT event_type, user_id, event_id, v_milli, rn,
          |    l AS level_milli,
          |    CAST(floor((3 * (l - pl) + 7 * pb) / 10.0) AS BIGINT)
          |      AS trend_milli
          |  FROM (
          |    SELECT p.event_type, p.user_id, p.event_id, p.v_milli, p.rn,
          |      CAST(floor((2 * p.v_milli
          |        + 8 * (r.level_milli + r.trend_milli)) / 10.0) AS BIGINT)
          |        AS l,
          |      r.level_milli AS pl, r.trend_milli AS pb
          |    FROM pts p JOIN r ON p.event_type = r.event_type
          |      AND p.user_id = r.user_id AND p.rn = r.rn + 1))
          |SELECT event_type, user_id, event_id, v_milli, level_milli,
          |  trend_milli, level_milli + trend_milli AS forecast_milli
          |FROM r""".stripMargin,

      // recursive replay of the engine's exact Holt-Winters chain:
      // level and seasonal-lookup are computed in nested selects so
      // later terms can read them; the recursion carries the last
      // m = 4 seasonals as a list (slist[1] IS s_{t-m} once full)
      "q_holtwinters" ->
        """WITH RECURSIVE pts AS (
          |  SELECT event_type, user_id, event_id,
          |    CAST(floor(value * 1000) AS BIGINT) AS v_milli,
          |    row_number() OVER (PARTITION BY event_type, user_id
          |                       ORDER BY ts, event_id) AS rn
          |  FROM events),
          |r AS (
          |  SELECT event_type, user_id, event_id, v_milli, rn,
          |    v_milli AS level_milli, CAST(0 AS BIGINT) AS trend_milli,
          |    CAST(0 AS BIGINT) AS seasonal_milli,
          |    [CAST(0 AS BIGINT)] AS slist
          |  FROM pts WHERE rn = 1
          |  UNION ALL
          |  SELECT event_type, user_id, event_id, v_milli, rn,
          |    l AS level_milli,
          |    CAST(floor((3 * (l - pl) + 7 * pb) / 10.0) AS BIGINT)
          |      AS trend_milli,
          |    s AS seasonal_milli,
          |    CASE WHEN len(slist) < 4 THEN list_append(slist, s)
          |         ELSE list_append(slist[2:], s) END AS slist
          |  FROM (
          |    SELECT *,
          |      CAST(floor((4 * (v_milli - l) + 6 * sm) / 10.0) AS BIGINT)
          |        AS s
          |    FROM (
          |      SELECT *,
          |        CAST(floor((2 * (v_milli - sm) + 8 * (pl + pb)) / 10.0)
          |          AS BIGINT) AS l
          |      FROM (
          |        SELECT p.event_type, p.user_id, p.event_id, p.v_milli,
          |          p.rn, r.level_milli AS pl, r.trend_milli AS pb,
          |          r.slist,
          |          CASE WHEN len(r.slist) < 4 THEN CAST(0 AS BIGINT)
          |               ELSE r.slist[1] END AS sm
          |        FROM pts p JOIN r ON p.event_type = r.event_type
          |          AND p.user_id = r.user_id AND p.rn = r.rn + 1))))
          |SELECT event_type, user_id, event_id, v_milli, level_milli,
          |  trend_milli, seasonal_milli,
          |  level_milli + trend_milli +
          |    (CASE WHEN len(slist) < 4 THEN CAST(0 AS BIGINT)
          |          ELSE slist[1] END) AS forecast_milli
          |FROM r""".stripMargin,

      // the engine's LOCF integral in epoch-micros integers: lead
      // window, staleness clip, bucket explode via generate_series,
      // identical floor(double-division) at the end (sums < 2^52)
      "q_twa_1h" ->
        """WITH base AS (
          |  SELECT event_type, user_id, epoch_us(ts) AS s,
          |    CAST(floor(value * 1000) AS BIGINT) AS v_milli,
          |    lead(epoch_us(ts)) OVER (PARTITION BY event_type, user_id
          |      ORDER BY ts, event_id) AS nxt
          |  FROM events),
          |clip AS (
          |  SELECT event_type, user_id, s, v_milli,
          |    least(nxt, (CAST(floor(s / 3600000000.0) AS BIGINT) + 48)
          |      * 3600000000) AS e
          |  FROM base WHERE nxt IS NOT NULL AND nxt > s),
          |segs AS (
          |  SELECT event_type, user_id, v_milli, s, e,
          |    unnest(generate_series(
          |      CAST(floor(s / 3600000000.0) AS BIGINT),
          |      CAST(floor((e - 1) / 3600000000.0) AS BIGINT))) AS b
          |  FROM clip WHERE e > s),
          |ov AS (
          |  SELECT *, least(e, (b + 1) * 3600000000)
          |    - greatest(s, b * 3600000000) AS o
          |  FROM segs)
          |SELECT event_type, user_id, epoch_ms(b * 3600000) AS bucket_ts,
          |  CAST(floor(CAST(sum(v_milli * o) AS DOUBLE)
          |    / CAST(sum(o) AS DOUBLE)) AS BIGINT) AS twa_milli,
          |  CAST(sum(o) AS BIGINT) AS covered_us
          |FROM ov GROUP BY 1, 2, 3""".stripMargin,

      // same planted old/new derivation, FULL OUTER JOIN + null-safe
      // IS DISTINCT FROM comparisons mirroring SnapshotDiff
      "q_snapshot_diff" ->
        """WITH ev AS (
          |  SELECT event_id, user_id, event_type, value FROM events),
          |oldt AS (
          |  SELECT event_id, user_id, event_type,
          |    CASE WHEN event_id % 7 = 0 THEN value + 1.0 ELSE value END
          |      AS value
          |  FROM ev WHERE event_id % 11 <> 0),
          |newt AS (
          |  SELECT event_id, user_id, event_type, value
          |  FROM ev WHERE event_id % 13 <> 0),
          |j AS (
          |  SELECT coalesce(o.event_id, n.event_id) AS event_id,
          |    o.event_id IS NULL AS no_old, n.event_id IS NULL AS no_new,
          |    o.user_id AS u_old, n.user_id AS u_new,
          |    o.event_type AS t_old, n.event_type AS t_new,
          |    o.value AS v_old, n.value AS v_new
          |  FROM oldt o FULL OUTER JOIN newt n ON o.event_id = n.event_id)
          |SELECT event_id,
          |  CASE WHEN no_old THEN 'I' WHEN no_new THEN 'D' ELSE 'U' END AS op,
          |  CASE WHEN no_old OR no_new THEN []
          |    ELSE list_filter([
          |      CASE WHEN u_old IS DISTINCT FROM u_new THEN 'user_id' END,
          |      CASE WHEN t_old IS DISTINCT FROM t_new THEN 'event_type' END,
          |      CASE WHEN v_old IS DISTINCT FROM v_new THEN 'value' END],
          |      x -> x IS NOT NULL) END AS changed_cols,
          |  CAST(floor(v_old * 1000) AS BIGINT) AS v_old_milli,
          |  CAST(floor(v_new * 1000) AS BIGINT) AS v_new_milli
          |FROM j
          |WHERE no_old OR no_new
          |  OR u_old IS DISTINCT FROM u_new
          |  OR t_old IS DISTINCT FROM t_new
          |  OR v_old IS DISTINCT FROM v_new""".stripMargin,

      "q_profile" -> profileOracleSql,

      // the engine's fold unrolled: each step CTE is the grouped min
      // of strictly-later step events joined to the previous reach
      "q_funnel" ->
        """WITH s0 AS (
          |  SELECT user_id, min(ts) AS t FROM events
          |  WHERE event_type = 'signup' GROUP BY 1),
          |s1 AS (
          |  SELECT e.user_id, min(e.ts) AS t FROM events e
          |  JOIN s0 ON e.user_id = s0.user_id
          |  WHERE e.event_type = 'view' AND e.ts > s0.t GROUP BY 1),
          |s2 AS (
          |  SELECT e.user_id, min(e.ts) AS t FROM events e
          |  JOIN s1 ON e.user_id = s1.user_id
          |  WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY 1),
          |c AS (
          |  SELECT 0 AS step_idx, 'signup' AS step, count(*) AS users_reached
          |  FROM s0
          |  UNION ALL SELECT 1, 'view', count(*) FROM s1
          |  UNION ALL SELECT 2, 'purchase', count(*) FROM s2)
          |SELECT step_idx, step, users_reached,
          |  CAST(floor(1000.0 * users_reached /
          |    max(CASE WHEN step_idx = 0 THEN users_reached END) OVER ())
          |    AS BIGINT) AS conversion_permille
          |FROM c""".stripMargin,

      "q_transition_matrix" ->
        """WITH p AS (
          |  SELECT lag(event_type) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS from_step,
          |    event_type AS to_step
          |  FROM events),
          |c AS (
          |  SELECT from_step, to_step, count(*) AS n_transitions FROM p
          |  WHERE from_step IS NOT NULL GROUP BY 1, 2)
          |SELECT from_step, to_step, n_transitions,
          |  CAST(floor(1000.0 * n_transitions /
          |    sum(n_transitions) OVER (PARTITION BY from_step))
          |    AS BIGINT) AS prob_permille
          |FROM c""".stripMargin,

      // list-lambda mirror of TextFunctions.repetitionStats: same
      // nested count-per-distinct folds, same floor-millis ratios
      "q_repetition_stats" ->
        """WITH t AS (
          |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS l
          |  FROM documents),
          |b AS (
          |  SELECT doc_id, l, len(l) AS n,
          |    CASE WHEN len(l) > 1 THEN
          |      list_transform(generate_series(1, len(l) - 1),
          |        i -> l[i] || ' ' || l[i + 1])
          |    ELSE [] END AS bg
          |  FROM t)
          |SELECT doc_id,
          |  CASE WHEN n > 0 THEN CAST(floor(1000.0 * (n - len(list_distinct(l))) / n) AS BIGINT)
          |    ELSE 0 END AS dup_tok_frac_millis,
          |  CASE WHEN n > 0 THEN CAST(floor(1000.0 * list_max(
          |      list_transform(list_distinct(l),
          |        t -> len(list_filter(l, x -> x = t)))) / n) AS BIGINT)
          |    ELSE 0 END AS top_tok_frac_millis,
          |  CASE WHEN n > 1 THEN CAST(floor(1000.0 * list_max(
          |      list_transform(list_distinct(bg),
          |        t -> len(list_filter(bg, x -> x = t)))) / (n - 1)) AS BIGINT)
          |    ELSE 0 END AS top_bigram_frac_millis
          |FROM b""".stripMargin,

      // SEMANTIC oracle for the prefix-filtering join: DuckDB computes
      // the full all-pairs 5-gram Jaccard with NO prefix logic, so a
      // hash match proves the candidate filter is complete (no pair
      // with J >= 0.25 escaped the prefix join), not just that the
      // verify arithmetic agrees
      "q_setsim_join" ->
        """WITH sh AS (
          |  SELECT lang, source, doc_id, unnest(list_distinct(list_transform(
          |    generate_series(1, greatest(length(text) - 4, 1)),
          |    i -> substr(text, i, 5)))) AS shingle
          |  FROM documents),
          |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
          |inter AS (
          |  SELECT s1.doc_id AS id1, s2.doc_id AS id2, count(*) AS inter_sz
          |  FROM sh s1 JOIN sh s2
          |    ON s1.lang = s2.lang AND s1.source = s2.source
          |    AND s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
          |  GROUP BY 1, 2)
          |SELECT i.id1, i.id2, i.inter_sz,
          |  z1.sz + z2.sz - i.inter_sz AS union_sz
          |FROM inter i
          |JOIN sz z1 ON z1.doc_id = i.id1
          |JOIN sz z2 ON z2.doc_id = i.id2
          |WHERE i.inter_sz * 4 >= 1 * (z1.sz + z2.sz - i.inter_sz)""".stripMargin,

      // the q_minhash_lsh candidate chain + exact levenshtein verify
      // (both engines implement the identical unit-cost DP; the
      // fixture is pure ASCII so char-vs-codepoint length agrees)
      "q_editdist_neardup" ->
        s"""WITH edited AS ($editedDocsSql),
           |${minhashCandidatesSql(n = 5, k = 16, bands = 4,
               src = "edited", sameGroupOn = Seq("lang", "source"))}
           |SELECT c.id1, c.id2,
           |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
           |FROM cand c
           |JOIN edited a ON a.doc_id = c.id1
           |JOIN edited b ON b.doc_id = c.id2
           |WHERE abs(length(a.text) - length(b.text)) * 100
           |    <= 30 * greatest(length(a.text), length(b.text))
           |  AND levenshtein(a.text, b.text) * 100
           |    <= 30 * greatest(length(a.text), length(b.text))""".stripMargin,

      // identical expression tree for the final corr division (int
      // sums exact; *1e6, sqrt, mul, div all correctly rounded IEEE)
      "q_lag_corr" -> withTurns(
        """WITH s AS (
          |  SELECT conv_id,
          |    make_timestamp(epoch_us(ts) - epoch_us(ts) % 3600000000)
          |      AS bucket_ts,
          |    sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS x,
          |    sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS y
          |  FROM turns GROUP BY 1, 2),
          |j AS (
          |  SELECT a.conv_id, a.x, b.y
          |  FROM s a JOIN s b ON a.conv_id = b.conv_id
          |    AND epoch_us(b.bucket_ts) - 3600000000 = epoch_us(a.bucket_ts)),
          |g AS (
          |  SELECT conv_id, count(*) AS n_pairs,
          |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
          |    sum(x * x) AS sxx, sum(y * y) AS syy
          |  FROM j GROUP BY 1)
          |SELECT conv_id, n_pairs,
          |  CAST(floor(CAST(n_pairs * sxy - sx * sy AS DOUBLE) * 1000000.0
          |    / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
          |     * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)))) AS BIGINT)
          |    AS corr_micro
          |FROM g
          |WHERE n_pairs >= 3 AND n_pairs * sxx - sx * sx > 0
          |  AND n_pairs * syy - sy * sy > 0""".stripMargin),

      "q_keywords" ->
        """WITH tc AS (
          |  SELECT doc_id, term, count(*) AS tf FROM (
          |    SELECT doc_id,
          |      unnest(regexp_split_to_array(trim(text), '\s+')) AS term
          |    FROM documents)
          |  WHERE term != '' GROUP BY 1, 2),
          |dfreq AS (
          |  SELECT term, count(DISTINCT doc_id) AS df FROM tc GROUP BY 1),
          |s AS (
          |  SELECT tc.doc_id, tc.term, tc.tf, dfreq.df,
          |    CAST(floor(tc.tf * 1000000.0 / dfreq.df) AS BIGINT)
          |      AS score_micro
          |  FROM tc JOIN dfreq USING (term))
          |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df,
          |  score_micro
          |FROM (
          |  SELECT *, row_number() OVER (PARTITION BY doc_id
          |    ORDER BY score_micro DESC, term) AS rank
          |  FROM s)
          |WHERE rank <= 5""".stripMargin,

      "q_search" ->
        """WITH tc AS (
          |  SELECT doc_id, term, count(*) AS tf FROM (
          |    SELECT doc_id,
          |      unnest(regexp_split_to_array(trim(text), '\s+')) AS term
          |    FROM documents)
          |  WHERE term != '' GROUP BY 1, 2)
          |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score
          |FROM tc WHERE term IN ('spark', 'window', 'merge')
          |GROUP BY 1 HAVING count(DISTINCT term) = 3""".stripMargin,

      "q_burn_rate" ->
        """WITH h AS (
          |  SELECT event_type,
          |    CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hidx,
          |    count(*) AS total,
          |    CAST(sum(CASE WHEN value >= 200.0 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS bad
          |  FROM events GROUP BY 1, 2),
          |w AS (
          |  SELECT event_type, hidx, total, bad,
          |    CAST(sum(total) OVER (PARTITION BY event_type ORDER BY hidx
          |      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT)
          |      AS total_6h,
          |    CAST(sum(bad) OVER (PARTITION BY event_type ORDER BY hidx
          |      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT)
          |      AS bad_6h
          |  FROM h)
          |SELECT event_type, make_timestamp(hidx * 3600000000) AS bucket_ts,
          |  total, bad, total_6h, bad_6h,
          |  CAST(floor(bad * 1000.0 / total) AS BIGINT) AS burn_short_milli,
          |  CAST(floor(bad_6h * 1000.0 / total_6h) AS BIGINT)
          |    AS burn_long_milli,
          |  bad * 10 >= 2 * total AND bad_6h * 10 >= 2 * total_6h AS alert
          |FROM w""".stripMargin)
  }

  /** DuckDB mirror of [[piiDocs]] + the TextFunctions scrub: the
    * regexes come from the SAME `piiPatterns` list the engine
    * applies (RE2-compatible subset by construction), the planted
    * fixture is rebuilt with string concatenation, and counts use
    * regexp_extract_all length (same non-overlapping successive-match
    * rule as Java's find loop / Spark's regexp_count).
    */
  private def piiOracleSql: String = {
    val pats = graft.functions.TextFunctions.piiPatterns
    val redacted = pats.foldLeft("text") { case (acc, (_, pat, token)) =>
      s"regexp_replace($acc, '$pat', '$token', 'g')"
    }
    val countCols = pats.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS pii_$name"
    }.mkString(",\n  ")
    s"""WITH pd AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 3 = 0 THEN ' mail u' || CAST(doc_id AS VARCHAR)
       |         || '@host' || CAST(doc_id % 7 AS VARCHAR) || '.net' ELSE '' END
       |    || CASE WHEN doc_id % 5 = 0 THEN ' call 202-555-'
       |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
       |    || CASE WHEN doc_id % 11 = 0 THEN ' ssn 987-65-'
       |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
       |    || CASE WHEN doc_id % 13 = 0 THEN ' card 4111-1111-1111-'
       |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
       |    || CASE WHEN doc_id % 17 = 0 THEN ' from 10.'
       |         || CAST(doc_id % 256 AS VARCHAR) || '.0.'
       |         || CAST(doc_id % 200 + 1 AS VARCHAR) ELSE '' END
       |    AS text
       |  FROM documents)
       |SELECT doc_id,
       |  $redacted AS redacted,
       |  $countCols
       |FROM pd""".stripMargin
  }

  /** DuckDB mirror of [[graft.operators.Profile]] over the events
    * schema: one UNION ALL branch per column, the same typed-extreme
    * rules (integers ×1000, doubles floor-millis, timestamps
    * epoch-millis, strings lexicographic + exact floor avg length).
    */
  private def profileOracleSql: String = {
    val nullStr = "CAST(NULL AS VARCHAR)"
    val nullLong = "CAST(NULL AS BIGINT)"
    def branch(c: String, mn: String, mx: String, ms: String, xs: String,
        al: String): String =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  $mn AS min_num_milli, $mx AS max_num_milli,
         |  $ms AS min_str, $xs AS max_str, $al AS avg_len_milli
         |FROM events""".stripMargin
    def intB(c: String) = branch(c, s"min($c) * 1000", s"max($c) * 1000",
      nullStr, nullStr, nullLong)
    def dblB(c: String) = branch(c,
      s"CAST(floor(min($c) * 1000) AS BIGINT)",
      s"CAST(floor(max($c) * 1000) AS BIGINT)", nullStr, nullStr, nullLong)
    def tsB(c: String) = branch(c, s"epoch_ms(min($c))", s"epoch_ms(max($c))",
      nullStr, nullStr, nullLong)
    def strB(c: String) = {
      val s = s"1000 * sum(length($c))"
      val n = s"count($c)"
      branch(c, nullLong, nullLong, s"min($c)", s"max($c)",
        s"CAST(($s - ((($s % $n) + $n) % $n)) // $n AS BIGINT)")
    }
    Seq(intB("event_id"), tsB("ts"), intB("user_id"), strB("event_type"),
      dblB("value"), strB("props")).mkString("\nUNION ALL\n")
  }

  /** The le ladder shared by q_histogram_p90 and its oracle (events
    * values are ≤ ~490, so the top rung covers; the overflow branch
    * still exists on both sides).
    */
  private val HistLadder: Seq[Double] = Seq(1.0, 5.0, 10.0, 50.0, 100.0, 500.0)

  /** DuckDB mirror of [[graft.functions.Histograms]]: identical
    * ladder CASE chain, identical cumulative/total windows, and the
    * SAME float op sequence — rank is `(qNum·total)/qDen`, the
    * interpolation `lo + (le−lo)·(rank−cumPrev)/cnt` — so
    * floor-millis estimates hash-match.
    */
  private def histogramOracleSql(ladder: Seq[Double], qNum: Int, qDen: Int): String = {
    val leCase = ladder.map(le => s"WHEN value <= $le THEN CAST($le AS DOUBLE)")
      .mkString("\n      ", "\n      ", "\n      ") +
      "ELSE CAST('infinity' AS DOUBLE)"
    val loCase = ladder.zip(0.0 +: ladder.init)
      .map { case (le, prev) => s"WHEN le = $le THEN CAST($prev AS DOUBLE)" }
      .mkString("\n        ", "\n        ", "\n        ") +
      s"ELSE CAST(${ladder.last} AS DOUBLE)"
    s"""WITH s AS (
       |  SELECT event_type, date_trunc('day', ts) AS bucket_ts,
       |    CASE $leCase END AS le
       |  FROM events WHERE value IS NOT NULL),
       |b AS (
       |  SELECT event_type, bucket_ts, le, count(*) AS cnt
       |  FROM s GROUP BY 1, 2, 3),
       |c AS (
       |  SELECT *,
       |    sum(cnt) OVER (PARTITION BY event_type, bucket_ts ORDER BY le
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt
       |  FROM b),
       |t AS (
       |  SELECT *,
       |    max(cum_cnt) OVER (PARTITION BY event_type, bucket_ts) AS total,
       |    CASE $loCase END AS lo
       |  FROM c)
       |SELECT event_type, bucket_ts,
       |  CAST(floor(1000.0 * (CASE WHEN le = CAST('infinity' AS DOUBLE)
       |    THEN CAST(${ladder.last} AS DOUBLE)
       |    ELSE lo + (le - lo) * (($qNum.0 * total) / $qDen.0 - (cum_cnt - cnt)) / cnt
       |    END)) AS BIGINT) AS q_millis
       |FROM t
       |WHERE cum_cnt >= ($qNum.0 * total) / $qDen.0
       |  AND (cum_cnt - cnt) < ($qNum.0 * total) / $qDen.0""".stripMargin
  }

  /** Bit-exact DuckDB mirror of [[graft.operators.Sketches]] heavy
    * hitters over document tokens: builds the identical 4x512 sketch
    * (same affine row constants from the same splitmix64 stream),
    * probes it with the same min-of-rows rule, and applies the same
    * integer support threshold — estimates INCLUDING collision slack
    * hash-match, which is what makes a sketch oracle-checkable.
    */
  private def cmsOracleSql(depth: Int, width: Int, permille: Int): String = {
    import graft.functions.MirrorHash
    def rowSelects(src: String, extra: String): String =
      (0 until depth).map { i =>
        val aa = MirrorHash.a(MirrorHash.CmsSalt, i)
        val bb = MirrorHash.b(MirrorHash.CmsSalt, i)
        s"SELECT $extra$i AS cms_row, " +
          s"${MirrorHash.affineSql("fp", aa, bb)} % $width AS cms_bucket " +
          s"FROM $src"
      }.mkString("\n  UNION ALL\n  ")
    s"""WITH toks AS (
       |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |fp AS (SELECT tok, ${fingerprintSql("tok")} AS fp FROM toks),
       |sketch AS (
       |  SELECT cms_row, cms_bucket, count(*) AS cnt FROM (
       |  ${rowSelects("fp", "")}) GROUP BY 1, 2),
       |keys AS (SELECT DISTINCT tok, fp FROM fp),
       |probes AS (
       |  ${rowSelects("keys", "tok, ")}),
       |est AS (
       |  SELECT p.tok, min(coalesce(s.cnt, 0)) AS cms_est
       |  FROM probes p LEFT JOIN sketch s USING (cms_row, cms_bucket)
       |  GROUP BY 1),
       |total AS (SELECT count(*) AS t FROM toks)
       |SELECT tok, cms_est FROM est, total
       |WHERE cms_est * 1000 >= t * $permille""".stripMargin
  }

  /** The shared pattern + line fixture the template oracles splice. */
  private def logVarPat: String = graft.functions.LogTemplates.varPattern

  /** DuckDB (RE2) mirror of LogTemplates' escape-then-mask template:
    * pre-existing `<\*VAR>` tokens gain one backslash, THEN variables
    * mask to `<VAR>` — RE2 rewrite syntax (`\\` literal, `\1` group)
    * vs the engine's Java Matcher syntax (`\\$1`), same semantics.
    */
  private def templateSql(expr: String): String =
    "regexp_replace(regexp_replace(" + expr +
      """, '<(\\*)VAR>', '<\\\1VAR>', 'g'), '""" + logVarPat +
      """', '<VAR>', 'g')"""

  // NOTE: spliced into outer .stripMargin strings — no continuation
  // line here may START with '|' (a leading '||' would lose one pipe
  // to the second stripMargin pass)
  private val logLinesSql: String =
    """m AS (
      |  SELECT event_id AS line_id,
      |    event_type || ' user ' || CAST(user_id AS VARCHAR) ||
      |      ' props ' || props AS line
      |  FROM events)""".stripMargin

  /** DuckDB mirror of [[TextFunctions.Fingerprint]] over a string
    * SQL expression (the q_text_stats parity fold, factored out).
    */
  private def fingerprintSql(colExpr: String): String =
    s"""list_reduce(list_concat([CAST(0 AS BIGINT)],
       |    list_transform(generate_series(1, length($colExpr)),
       |      i -> CAST(ord(substr($colExpr, i, 1)) AS BIGINT))),
       |    (h, c) -> (h * 31 + c) % 2147483647)""".stripMargin

  /** CTE chain producing LSH candidate pairs over `documents` with the
    * engine's exact MinHash parameters — a bit-exact DuckDB mirror of
    * [[Dedup.charShingles]] → [[Dedup.minHashSignatures]] →
    * [[Dedup.lshBands]] → [[Dedup.lshCandidates]], every hash drawn
    * from [[graft.functions.MirrorHash]] (same affine constants on
    * both sides, generated here from the same splitmix64 stream).
    * Terminal CTE is `cand(id1, id2)`.
    */
  /** @param sameGroupOn when non-empty, candidates are restricted to
    *        pairs agreeing on these `src` columns (the engine's
    *        [[graft.operators.Dedup.lshCandidatesGrouped]] scoping)
    */
  private def minhashCandidatesSql(n: Int, k: Int, bands: Int,
      src: String = "documents", sameGroupOn: Seq[String] = Nil): String = {
    import graft.functions.MirrorHash
    val minExprs = (0 until k).map { i =>
      val aa = MirrorHash.a(MirrorHash.MinHashSalt, i)
      val bb = MirrorHash.b(MirrorHash.MinHashSalt, i)
      s"min(${MirrorHash.affineSql("fp", aa, bb)}) AS mh_$i"
    }.mkString(",\n    ")
    val rows = k / bands
    val bandSelects = (0 until bands).map { bnd =>
      val combine = MirrorHash.bandCombineSql(
        (bnd * rows until (bnd + 1) * rows).map(i => s"mh_$i"))
      s"SELECT doc_id, $bnd AS band_idx, $combine AS band_hash FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""sh AS (
       |  SELECT DISTINCT doc_id, substr(text, i, $n) AS shingle
       |  FROM (SELECT doc_id, text,
       |          unnest(generate_series(1, greatest(length(text) - ${n - 1}, 1))) AS i
       |        FROM $src)),
       |fp AS (
       |  SELECT doc_id, ${fingerprintSql("shingle")} AS fp FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |    $minExprs
       |  FROM fp GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       |    AND a.doc_id < b.doc_id${groupRestrict(src, sameGroupOn)})""".stripMargin
  }

  /** Extra joins restricting a band-candidate pair to one stratum. */
  private def groupRestrict(src: String, groupCols: Seq[String]): String =
    if (groupCols.isEmpty) ""
    else {
      val eqs = groupCols.map(c => s"ga.$c = gb.$c").mkString(" AND ")
      s"""
         |  JOIN $src ga ON ga.doc_id = a.doc_id
         |  JOIN $src gb ON gb.doc_id = b.doc_id AND $eqs""".stripMargin
    }

  /** DuckDB mirror of [[Dedup.simHash]]: 64 Carter–Wegman sign sums
    * over token fingerprints, packed with precomputed bit literals
    * (`1L << b` embedded as a constant — no SQL shift semantics to
    * trust, including the sign bit at b=63).
    */
  private def simhashOracleSql: String = {
    import graft.functions.MirrorHash
    val sums = (0 until 64).map { b =>
      val aa = MirrorHash.a(MirrorHash.SimHashSalt, b)
      val bb = MirrorHash.b(MirrorHash.SimHashSalt, b)
      s"sum(CASE WHEN ${MirrorHash.affineSql("fp", aa, bb)} % 2 = 1 " +
        s"THEN 1 ELSE -1 END) AS bs_$b"
    }.mkString(",\n    ")
    val pack = (0 until 64).map { b =>
      s"(CASE WHEN bs_$b > 0 THEN CAST(${1L << b} AS BIGINT) " +
        s"ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" |\n    ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |fps AS (
       |  SELECT doc_id, ${fingerprintSql("tok")} AS fp FROM toks),
       |sums AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM fps GROUP BY doc_id)
       |SELECT doc_id,
       |  $pack AS simhash
       |FROM sums""".stripMargin
  }

  /** Left-to-right double fold Σ a·b over `dim` positions — the exact
    * DuckDB counterpart of the engine's codegen'd DotProduct (same
    * summation order ⇒ bit-identical doubles).
    */
  private def sqlDot(dim: Int, a: String, b: String): String =
    s"""list_reduce(list_concat([0.0::DOUBLE],
       |      list_transform(generate_series(1, $dim), i -> $a[i] * $b[i])),
       |      (x, y) -> x + y)""".stripMargin

  /** [[sqlDot]] against an embedded hyperplane literal (round-tripped
    * through `Double.toString`: shortest-representation parsing is
    * correctly rounded, so both engines see identical IEEE doubles).
    */
  private def sqlPlaneDot(dim: Int, vec: String, plane: Array[Double]): String = {
    val lit = plane.map(java.lang.Double.toString).mkString("[", ", ", "]")
    s"""list_reduce(list_concat([0.0::DOUBLE],
       |        list_transform(generate_series(1, $dim),
       |          i -> $vec[i] * ($lit::DOUBLE[])[i])),
       |        (x, y) -> x + y)""".stripMargin
  }

  /** DuckDB mirror of [[Similarity.autoPlanes]] over `src`'s row
    * count: smallest p in [0,24] with 2^p·occupancy ≥ n (24 when
    * none), floored at 4 — INTEGER arithmetic end to end, exactly the
    * engine's loop, so both engines derive the same plane count from
    * the same corpus (ask #7: the auto-sizing math itself sits inside
    * the hash gate).
    */
  private def autoPlanesSql(src: String, occupancy: Int): String =
    s"""GREATEST(4, COALESCE((
       |    SELECT min(p) FROM generate_series(0, 24) t(p)
       |    WHERE (CAST(1 AS BIGINT) << p) * $occupancy >=
       |      (SELECT count(*) FROM $src)), 24))""".stripMargin

  /** Per-rotation bucket selects with the plane count a RUNTIME value
    * (`pl.planes` from a cross-joined `params` CTE): all 24 potential
    * plane-bit terms are emitted, each gated on `p < planes`. Bits
    * are disjoint so the `|`-combine equals the engine's foldLeft
    * bitwiseOR over its first `planes` hyperplanes — which depend
    * only on (rotation, p), never on the total count, so literals
    * stay valid for every chosen size. Expects CTEs `nn(vec_id, e,
    * nrm)` and `params(planes)`.
    */
  private def lshAutoBucketSelects(dim: Int, rotations: Int): String =
    (0 until rotations).map { r =>
      val terms = (0 until 24).map { p =>
        s"""(CASE WHEN $p < pl.planes
           |      AND ${sqlPlaneDot(dim, "e", Similarity.hyperplane(dim, r * 1024 + p))} > 0
           |      THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)""".stripMargin
      }.mkString(" |\n    ")
      s"""SELECT vec_id, e, nrm, $r AS rot,
         |    $terms AS bucket
         |  FROM nn, params pl""".stripMargin
    }.mkString("\n  UNION ALL\n  ")

  /** DuckDB mirror of [[Similarity.lshTopKAuto]]: like the pinned
    * mirror but the plane count is computed IN SQL from count(*)
    * ([[autoPlanesSql]]) — the whole auto path, sizing included, is
    * hash-gated.
    */
  private def lshTopkAutoOracleSql(dim: Int, rotations: Int, k: Int,
      occupancy: Int): String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |params AS (SELECT ${autoPlanesSql("v", occupancy)} AS planes),
       |nn AS (SELECT vec_id, e, sqrt(${sqlDot(dim, "e", "e")}) AS nrm FROM v),
       |b AS (
       |  ${lshAutoBucketSelects(dim, rotations)}),
       |scored AS (
       |  SELECT a.vec_id AS qid, c.vec_id AS nid,
       |    max(${sqlDot(dim, "a.e", "c.e")} / (a.nrm * c.nrm)) AS cos
       |  FROM b a JOIN b c ON a.rot = c.rot AND a.bucket = c.bucket
       |    AND a.vec_id != c.vec_id
       |  GROUP BY 1, 2)
       |SELECT qid, CAST(rank AS BIGINT) AS rank, nid FROM (
       |  SELECT qid, nid,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored) WHERE rank <= $k""".stripMargin

  /** DuckDB mirror of the 4×-replicated auto near-dup: the corpus is
    * the duped fixture × 4 id-shifted copies, planes recomputed from
    * the bigger count — at sf0.01 the formula picks 8 where the
    * unreplicated form picks 6, so the SIZING step itself is what
    * this entry hash-checks.
    */
  private def neardupLshAuto4xOracleSql(dim: Int, rotations: Int,
      occupancy: Int): String =
    s"""WITH duped AS ($dupedVecsSql),
       |v AS (
       |  SELECT vec_id + i * 10000000 AS vec_id, e
       |  FROM duped, generate_series(0, 3) t(i)),
       |params AS (SELECT ${autoPlanesSql("v", occupancy)} AS planes),
       |nn AS (SELECT vec_id, e, sqrt(${sqlDot(dim, "e", "e")}) AS nrm FROM v),
       |b AS (
       |  ${lshAutoBucketSelects(dim, rotations)}),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id1, c.vec_id AS id2
       |  FROM b a JOIN b c ON a.rot = c.rot AND a.bucket = c.bucket
       |    AND a.vec_id < c.vec_id),
       |pairs AS (
       |  SELECT p.id1, p.id2,
       |    ${sqlDot(dim, "x1.e", "x2.e")} / (x1.nrm * x2.nrm) AS cos
       |  FROM cand p
       |  JOIN nn x1 ON x1.vec_id = p.id1
       |  JOIN nn x2 ON x2.vec_id = p.id2)
       |SELECT id1, id2, CAST(floor(cos * 1000) AS BIGINT) AS cos_millis
       |FROM pairs WHERE cos >= 0.95""".stripMargin

  /** DuckDB mirror of [[Similarity.lshTopK]]: the deterministic
    * splitmix64 hyperplanes are query constants, so the oracle embeds
    * the SAME plane literals ([[Similarity.hyperplane]], round-tripped
    * through `Double.toString` — shortest-representation parsing is
    * correctly rounded, so both engines see identical IEEE doubles and
    * every dot/sign/cosine is bit-identical). `dim` is the embeddings
    * fixture's vector width (64 at every SF, TESTDATA.md).
    */
  private def lshTopkOracleSql(dim: Int, planes: Int, rotations: Int, k: Int): String = {
    def dotSql(a: String, b: String): String =
      s"""list_reduce(list_concat([0.0::DOUBLE],
         |      list_transform(generate_series(1, $dim), i -> $a[i] * $b[i])),
         |      (x, y) -> x + y)""".stripMargin
    def planeDotSql(vec: String, plane: Array[Double]): String = {
      val lit = plane.map(java.lang.Double.toString).mkString("[", ", ", "]")
      s"""list_reduce(list_concat([0.0::DOUBLE],
         |        list_transform(generate_series(1, $dim),
         |          i -> $vec[i] * ($lit::DOUBLE[])[i])),
         |        (x, y) -> x + y)""".stripMargin
    }
    val bucketSelects = (0 until rotations).map { r =>
      val bucket = (0 until planes).map { p =>
        s"""(CASE WHEN ${planeDotSql("e", Similarity.hyperplane(dim, r * 1024 + p))} > 0
           |      THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)""".stripMargin
      }.mkString(" |\n    ")
      s"""SELECT vec_id, e, nrm, $r AS rot,
         |    $bucket AS bucket
         |  FROM n""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS nrm FROM v),
       |b AS (
       |  $bucketSelects),
       |scored AS (
       |  SELECT a.vec_id AS qid, c.vec_id AS nid,
       |    max(${dotSql("a.e", "c.e")} / (a.nrm * c.nrm)) AS cos
       |  FROM b a JOIN b c ON a.rot = c.rot AND a.bucket = c.bucket
       |    AND a.vec_id != c.vec_id
       |  GROUP BY 1, 2)
       |SELECT qid, CAST(rank AS BIGINT) AS rank, nid FROM (
       |  SELECT qid, nid,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored) WHERE rank <= $k""".stripMargin
  }

  /** DuckDB mirror of [[Similarity.ivfTopK]] INCLUDING its k-means
    * training — possible since r5's fixed-point Lloyd
    * ([[Similarity.LloydScale]]): per-round centroid sums accumulate
    * as floor(x·2²⁰) BIGINTs (order-free in both engines), init picks
    * the nlist smallest MirrorHash ranks (exact SQL counterpart,
    * unlike the old xxhash64), and every dot product is the same
    * left-to-right double fold as the engine's DotProduct — so the
    * trained centroids, assignments, probes, and final ranking are
    * all bit-identical. Unrolls `iters` Lloyd rounds as CTE pairs
    * (assignment → fixed-point means), carrying empty clusters'
    * previous centroids via LEFT JOIN + COALESCE exactly like the
    * engine's `next = cents.clone` loop.
    */
  private def ivfTopkOracleSql(dim: Int, nlist: Int, nprobe: Int,
      iters: Int, k: Int): String = {
    import graft.functions.MirrorHash
    def dotSql(a: String, b: String): String =
      s"""list_reduce(list_concat([0.0::DOUBLE],
         |      list_transform(generate_series(1, $dim), i -> $a[i] * $b[i])),
         |      (x, y) -> x + y)""".stripMargin
    val rank = MirrorHash.affineSql(fingerprintSql("CAST(vec_id AS VARCHAR)"),
      MirrorHash.a(MirrorHash.IvfSalt, 0), MirrorHash.b(MirrorHash.IvfSalt, 0))
    val scale = "1048576.0" // LloydScale = 2^20, spelled exactly
    val iterCtes = (1 to iters).map { it =>
      val prev = s"cent${it - 1}"
      s"""asg$it AS (
         |  SELECT vec_id, e, cid FROM (
         |    SELECT v.vec_id, v.e, c.cid,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${dotSql("v.e", "c.ce")} DESC, c.cid DESC) AS rn
         |    FROM v CROSS JOIN ${prev}l c)
         |  WHERE rn = 1),
         |m$it AS (
         |  SELECT cid, i AS pos,
         |    CAST(sum(CAST(floor(e[i] * $scale) AS BIGINT)) AS DOUBLE)
         |      / ($scale * CAST(count(*) AS DOUBLE)) AS val
         |  FROM asg$it, generate_series(1, $dim) t(i)
         |  GROUP BY cid, i),
         |cent$it AS (
         |  SELECT c.cid, c.pos, COALESCE(m.val, c.val) AS val
         |  FROM $prev c LEFT JOIN m$it m ON m.cid = c.cid AND m.pos = c.pos),
         |cent${it}l AS (
         |  SELECT cid, list(val ORDER BY pos) AS ce FROM cent$it GROUP BY cid)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |cent0 AS (
       |  SELECT cid, i AS pos, e[i] AS val
       |  FROM (SELECT e, row_number() OVER (ORDER BY $rank, vec_id) - 1 AS cid
       |        FROM v) s, generate_series(1, $dim) t(i)
       |  WHERE cid < $nlist),
       |cent0l AS (SELECT cid, list(val ORDER BY pos) AS ce FROM cent0 GROUP BY cid),
       |$iterCtes,
       |n AS (SELECT vec_id, sqrt(${dotSql("e", "e")}) AS nrm FROM v),
       |fin AS (
       |  SELECT v.vec_id, v.e, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${dotSql("v.e", "c.ce")} DESC, c.cid DESC) AS rn
       |  FROM v CROSS JOIN cent${iters}l c),
       |lists AS (
       |  SELECT f.cid, f.vec_id AS nid, f.e AS nv, n.nrm AS nn
       |  FROM fin f JOIN n ON n.vec_id = f.vec_id WHERE f.rn = 1),
       |probes AS (
       |  SELECT f.cid, f.vec_id AS qid, f.e AS qv, n.nrm AS qn
       |  FROM fin f JOIN n ON n.vec_id = f.vec_id WHERE f.rn <= $nprobe),
       |scored AS (
       |  SELECT p.qid, l.nid, max(${dotSql("p.qv", "l.nv")} / (p.qn * l.nn)) AS cos
       |  FROM probes p JOIN lists l ON l.cid = p.cid AND l.nid != p.qid
       |  GROUP BY 1, 2)
       |SELECT qid, CAST(rank AS BIGINT) AS rank, nid FROM (
       |  SELECT qid, nid,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored) WHERE rank <= $k""".stripMargin
  }

  /** One oracle for BOTH tree-depth algorithms (BFS and pointer
    * doubling): a manual WITH RECURSIVE — withTurns can't splice the
    * keyword, RECURSIVE must lead the CTE list and then covers all.
    */
  private def treeDepthOracleSql: String =
    s"""WITH RECURSIVE turns AS (
       |${TranscriptGen.eventsToTurnsSql}
       |),
       |edges AS (
       |  SELECT conv_id, turn_idx AS node,
       |    CASE WHEN turn_idx = 0 THEN NULL
       |         ELSE CAST((turn_idx - 1) // 2 AS INT) END AS parent
       |  FROM turns),
       |d AS (
       |  SELECT conv_id, node, CAST(0 AS BIGINT) AS depth
       |  FROM edges WHERE parent IS NULL
       |  UNION ALL
       |  SELECT e.conv_id, e.node, d.depth + 1
       |  FROM edges e JOIN d ON e.conv_id = d.conv_id AND e.parent = d.node),
       |stats AS (
       |  SELECT conv_id, CAST(max(depth) AS BIGINT) AS depth_max,
       |    CAST(sum(depth) AS BIGINT) AS depth_sum,
       |    count(*) AS node_cnt
       |  FROM d GROUP BY conv_id)
       |SELECT d.conv_id, CAST(d.node AS INT) AS turn_idx, d.depth,
       |  s.depth_max, s.depth_sum, s.node_cnt
       |FROM d JOIN stats s ON s.conv_id = d.conv_id""".stripMargin

  /** One oracle for BOTH near-dup variants: the same left-to-right
    * double summation as the engine's DotProduct (bit-identical), so
    * brute and LSH-candidate paths must return identical pairs.
    */
  private def neardupOracleSql: String =
    s"""WITH base AS ($dupedVecsSql),
       |n AS (
       |  SELECT vec_id, e,
       |    sqrt(list_reduce(list_concat([0.0::DOUBLE],
       |      list_transform(generate_series(1, len(e)), i -> e[i] * e[i])),
       |      (x, y) -> x + y)) AS nn
       |  FROM base),
       |pairs AS (
       |  SELECT a.vec_id AS id1, b.vec_id AS id2,
       |    list_reduce(list_concat([0.0::DOUBLE],
       |      list_transform(generate_series(1, len(a.e)), i -> a.e[i] * b.e[i])),
       |      (x, y) -> x + y) / (a.nn * b.nn) AS cos
       |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
       |SELECT id1, id2, CAST(floor(cos * 1000) AS BIGINT) AS cos_millis
       |FROM pairs WHERE cos >= 0.95""".stripMargin

  /** Queries intentionally without oracle SQL: NONE since r5. The
    * last omission (q_embed_ivf_topk — float Lloyd means were not
    * bit-reproducible externally) was closed by fixed-point Lloyd
    * training ([[Similarity.LloydScale]]): centroid sums accumulate
    * as floor(x·2²⁰) longs, which are order-free, so
    * [[ivfTopkOracleSql]] now mirrors the TRAINING too and every
    * query entry is hash-checked.
    */
  val oracleOmissions: Set[String] = Set.empty
}
