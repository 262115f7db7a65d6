package graft.rollup

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tier
import graft.table.ChronoTable

/** The batch-incremental ingest → rollup → retention pipeline over
  * [[ChronoTable]]s (north_rule: "every batch is resumable from an
  * Iceberg-snapshot checkpoint with per-partition lineage rows and
  * rollup-count metrics emitted to a metrics table").
  *
  * Tables (under one warehouse root):
  *   - `raw_turns`   partitioned `ts_day` / `conv_bucket` — the
  *     miniature of Iceberg `days(ts)` + `bucket(N, conv_id)`.
  *   - `tier_1m/1h/1d` partitioned `ts_day` (of the bucket).
  *   - `metrics`     unpartitioned lineage + rollup-count rows.
  *
  * Exactly-once resume: each tier commit stamps the source-snapshot
  * watermark it consumed into the snapshot summary (`consumed_src`),
  * so watermark and data change atomically — a crash between commits
  * re-runs only the uncommitted step and can never double-count
  * (SURVEY.md §7 hard parts, "resumable exactly-once"). The 1m merge
  * folds delta partials into existing buckets in one copy-on-write
  * commit; 1h/1d recompute their affected day partitions from the
  * full (already-merged) finer tier, which is idempotent by
  * construction.
  */
final class TranscriptStore(
    val spark: SparkSession,
    val warehouse: String,
    val convBuckets: Int = 8) {

  // conv_id is every table's cluster key: per-file key bounds are
  // recorded at commit time, and clusterAll/compactSorted makes
  // single-conversation reads prune to ~one file per partition
  val raw: ChronoTable = ChronoTable(
    spark, s"$warehouse/raw_turns", Seq("ts_day", "conv_bucket"), Some("ts"),
    clusterCol = Some("conv_id"))
  val tier1m: ChronoTable =
    ChronoTable(spark, s"$warehouse/tier_1m", Seq("ts_day"), Some("bucket_ts"),
      clusterCol = Some("conv_id"))
  val tier1h: ChronoTable =
    ChronoTable(spark, s"$warehouse/tier_1h", Seq("ts_day"), Some("bucket_ts"),
      clusterCol = Some("conv_id"))
  val tier1d: ChronoTable =
    ChronoTable(spark, s"$warehouse/tier_1d", Seq("ts_day"), Some("bucket_ts"),
      clusterCol = Some("conv_id"))
  val metrics: ChronoTable = ChronoTable(spark, s"$warehouse/metrics", Seq.empty)

  def tier(t: Tier): ChronoTable = t match {
    case Tier.Minute => tier1m
    case Tier.Hour => tier1h
    case Tier.Day => tier1d
  }

  private val turnCols = Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")

  // ------------------------------------------------------------------
  // ingest
  // ------------------------------------------------------------------

  /** Append one batch of turns; returns the raw snapshot id.
    *
    * @param dedupe idempotent re-ingest (the engine analog of the
    *   reference's FileConcat dedup, SURVEY.md domain table): rows
    *   whose (conv_id, turn_idx) already exist in the raw table are
    *   dropped with a LEFT ANTI join, so replaying a batch (at-least-
    *   once upstream delivery) cannot double-count. The anti join is
    *   day-partition-pruned: only the batch's own ts_day partitions
    *   are read back, not the whole table — O(batch) at any scale.
    *   Duplicates WITHIN the incoming batch (a retried upstream
    *   producer duplicates inside one delivery most of all) are
    *   removed first by a keep-first window pinned on ts — the anti
    *   join alone only screens against already-committed rows.
    */
  def ingest(turns: DataFrame, dedupe: Boolean = false): Long = {
    val base = turns.select(turnCols.map(col): _*)
    val deduped = if (!dedupe) base else {
      // tiebreak: duplicate keys with EQUAL ts but different payloads
      // must keep a deterministic survivor across runs/partitionings —
      // a hash over the payload columns pins one (ADVICE r3). xxhash64,
      // not 32-bit murmur3: at trillions of tied duplicate groups a
      // 32-bit tiebreak collides (birthday bound ~77k groups), and a
      // collision re-opens the exact nondeterminism this pins shut.
      val inBatch = graft.operators.Dedup.exactKeepFirst(
        base, Seq("conv_id", "turn_idx"), "ts",
        xxhash64(col("role"), col("text"), col("tool")))
      if (raw.currentSnapshotId == 0L) inBatch else {
        val days = inBatch.select(date_format(col("ts"), "yyyy-MM-dd"))
          .distinct().collect().map(_.getString(0)).toSet
        val existingKeys = raw.read()
          .filter(col("ts_day").isin(days.toSeq: _*))
          .select(col("conv_id"), col("turn_idx"))
        inBatch.join(existingKeys, Seq("conv_id", "turn_idx"), "left_anti")
      }
    }
    val partitioned = deduped
      .withColumn("ts_day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("conv_bucket", pmod(hash(col("conv_id")), lit(convBuckets)))
    val sid = raw.append(partitioned, Map("op_detail" -> "ingest"))
    logMetrics("ingest", "raw", sid,
      partitioned.groupBy("ts_day").agg(
        count(lit(1)).as("rows"), lit(0L).as("rollup_rows")))
    sid
  }

  /** Read raw turns at the current snapshot with the stable
    * (conv_id, turn_idx) ordering contract available to callers.
    */
  def readTurns(): DataFrame =
    raw.read().select(turnCols.map(col): _*)

  /** Serve one conversation's turns: file-prune on the per-file
    * conv_id bounds first ([[graft.table.ChronoTable.readKeyRange]]),
    * then row-filter. After [[clusterAll]] this touches ~one file per
    * partition; before it (scattered ingest) it degrades gracefully
    * to the full-scan filter — stats prune files, never rows.
    */
  def readConversation(convId: String): DataFrame =
    raw.readKeyRange(convId, convId)
      .filter(col("conv_id") === convId)
      .select(turnCols.map(col): _*)

  // ------------------------------------------------------------------
  // incremental rollup cascade
  // ------------------------------------------------------------------

  private def consumedSrc(t: ChronoTable): Long =
    t.currentSnapshot.flatMap(_.summary.get("consumed_src")).map(_.toLong).getOrElse(0L)

  private def withDay(df: DataFrame): DataFrame =
    df.withColumn("ts_day", date_format(col("bucket_ts"), "yyyy-MM-dd"))

  private val tierCols = Seq("conv_id", "bucket_ts") ++ Rollup.metricCols

  /** Run the incremental cascade; returns per-tier merged-row counts.
    * No-op (returns empty) when every tier is already caught up.
    * Safe to re-run after a crash at ANY point.
    */
  def rollupIncremental(): Map[String, Long] = {
    var report = Map.empty[String, Long]

    // --- raw → 1m: fold delta partials into existing buckets ---
    val rawCur = raw.currentSnapshotId
    val c1m = consumedSrc(tier1m)
    if (c1m < rawCur) {
      val inc = raw.readIncremental(c1m, rawCur)
      if (!inc.isEmpty) {
        val partials = Rollup.rollupRaw(inc, Tier.Minute)
        val days = partials.select(date_format(col("bucket_ts"), "yyyy-MM-dd"))
          .distinct().collect().map(_.getString(0)).toSet
        val existing = tier1m.read()
        val base =
          if (existing.isEmpty) partials
          else existing
            .filter(col("ts_day").isin(days.toSeq: _*))
            .select(tierCols.map(col): _*)
            .unionByName(partials)
        val merged = withDay(Rollup.foldTier(base, Tier.Minute)).cache()
        val mergedCnt = merged.count()
        tier1m.overwritePartitions(
          p => days.contains(p.getOrElse("ts_day", "")),
          Some(merged), op = "merge",
          summary = Map("consumed_src" -> rawCur.toString,
            "affected_days" -> days.toSeq.sorted.mkString(",")))
        logTierMetrics("rollup_1m", "tier_1m", tier1m.currentSnapshotId, merged)
        merged.unpersist()
        report += ("1m" -> mergedCnt)
      } else {
        // empty increment: just advance the watermark atomically
        tier1m.overwritePartitions(_ => false, None, op = "noop",
          summary = Map("consumed_src" -> rawCur.toString))
      }
    }

    // --- finer tier → coarser tier: recompute affected day partitions.
    // Besides the algebraic metric folds, each coarser bucket stores a
    // Gorilla chunk of the finer tier's (bucket_ts, text_len_sum)
    // series — the north-star "compressed rolled points as binary
    // chunk columns". Recomputing whole partitions keeps the chunk
    // deterministic (ChunkAgg sorts in finish) and idempotent. ---
    def foldStep(src: ChronoTable, dst: ChronoTable, to: Tier, label: String): Unit = {
      val srcCur = src.currentSnapshotId
      val cDst = consumedSrc(dst)
      if (cDst < srcCur) {
        val newFiles = src.readIncremental(cDst, srcCur)
        if (!newFiles.isEmpty) {
          val days = newFiles.select(col("ts_day").cast("string"))
            .distinct().collect().map(_.getString(0)).toSet
          // source partitions are fully merged → recompute, don't merge
          val srcRows = src.read()
            .filter(col("ts_day").isin(days.toSeq: _*))
            .select(tierCols.map(col): _*)
          val aggs = Rollup.foldAggs :+
            graft.compress.ChunkCodec.chunkEncode(
              unix_micros(col("bucket_ts")),
              col("text_len_sum").cast("double")).as("chunk")
          val folded = withDay(
            srcRows
              .groupBy(col("conv_id"), Rollup.bucket(col("bucket_ts"), to).as("bucket_ts"))
              .agg(aggs.head, aggs.tail: _*)).cache()
          val cnt = folded.count()
          dst.overwritePartitions(
            p => days.contains(p.getOrElse("ts_day", "")),
            Some(folded), op = "merge",
            summary = Map("consumed_src" -> srcCur.toString,
              "affected_days" -> days.toSeq.sorted.mkString(",")))
          logTierMetrics(s"rollup_$label", s"tier_$label", dst.currentSnapshotId, folded)
          folded.unpersist()
          report += (label -> cnt)
        } else {
          dst.overwritePartitions(_ => false, None, op = "noop",
            summary = Map("consumed_src" -> srcCur.toString))
        }
      }
    }

    foldStep(tier1m, tier1h, Tier.Hour, "1h")
    foldStep(tier1h, tier1d, Tier.Day, "1d")
    report
  }

  /** Read a tier at its current snapshot (metric columns only). */
  def readTier(t: Tier): DataFrame = {
    val df = tier(t).read()
    if (df.isEmpty) df else df.select(tierCols.map(col): _*)
  }

  /** 1h/1d tiers also carry the Gorilla chunk of the finer tier's
    * (bucket_ts, text_len_sum) points within each coarse bucket.
    */
  def readTierWithChunks(t: Tier): DataFrame = {
    require(t != Tier.Minute, "1m is the finest tier — no chunk column")
    val df = tier(t).read()
    if (df.isEmpty) df else df.select((tierCols :+ "chunk").map(col): _*)
  }

  /** SERVE the finer tier's (bucket_ts, text_len_sum) series decoded
    * straight out of tier `t`'s compressed chunks — the north-star
    * read path for cold history: one coarse tier row expands to its
    * finer points without touching the finer tier's files at all.
    * Bit-exact with the finer tier (Gorilla round-trip, asserted in
    * PipelineSpec).
    */
  def readDecodedPoints(t: Tier): DataFrame =
    readTierWithChunks(t)
      .select(col("conv_id"),
        explode(graft.compress.ChunkCodec.chunkDecode(col("chunk"))).as("p"))
      .select(col("conv_id"),
        timestamp_micros(col("p.ts")).as("bucket_ts"),
        col("p.v").as("value"))

  // ------------------------------------------------------------------
  // retention
  // ------------------------------------------------------------------

  /** TTL retention relative to an explicit `today` (no wall-clock —
    * determinism per FIXTURES.md). Raw keeps `ttlDays("raw")` days,
    * tiers their own budgets; expired `ts_day` partitions are
    * metadata-dropped.
    */
  def retain(ttlDays: Map[String, Int], today: LocalDate): Map[String, Long] = {
    def drop(t: ChronoTable, name: String): Option[(String, Long)] =
      ttlDays.get(name).map { ttl =>
        val cutoff = today.minusDays(ttl.toLong).toString
        val before = t.livePartitions.size
        val sid = t.dropPartitions(
          p => p.get("ts_day").exists(_ < cutoff),
          summary = Map("cutoff" -> cutoff))
        val after = t.livePartitions.size
        logMetrics("retention", name, sid,
          spark.createDataFrame(Seq((cutoff, (before - after).toLong, 0L)))
            .toDF("ts_day", "rows", "rollup_rows"))
        name -> (before - after).toLong
      }
    Seq(drop(raw, "raw"), drop(tier1m, "1m"), drop(tier1h, "1h"),
      drop(tier1d, "1d")).flatten.toMap
  }

  /** Compact multi-file partitions across every table (S11's
    * compaction as a first-class maintenance op); pair with
    * [[vacuum]] to actually reclaim the superseded bytes.
    */
  def compactAll(minFiles: Int = 2): Map[String, Long] =
    Seq("raw" -> raw, "1m" -> tier1m, "1h" -> tier1h, "1d" -> tier1d,
      "metrics" -> metrics)
      .map { case (n, t) => n -> t.compact(minFiles = minFiles) }.toMap

  /** Sort-cluster every conv_id-keyed table on its cluster key
    * (Iceberg `rewrite_data_files` with a sort order): after this,
    * per-conversation serving reads prune on the per-file key bounds
    * instead of scanning every file of the partition. The metrics
    * table has no cluster key and is skipped.
    */
  def clusterAll(filesPerPartition: Int = 1): Map[String, Long] =
    Seq("raw" -> raw, "1m" -> tier1m, "1h" -> tier1h, "1d" -> tier1d)
      .map { case (n, t) =>
        n -> t.compactSorted(filesPerPartition = filesPerPartition) }.toMap

  /** Reclaim bytes across every table: delete data files referenced
    * by no retained snapshot (run after [[retain]], whose partition
    * drops are metadata-only). Returns table → (files, bytes) freed.
    */
  def vacuum(retainSnapshots: Int = 1): Map[String, (Long, Long)] =
    Seq("raw" -> raw, "1m" -> tier1m, "1h" -> tier1h, "1d" -> tier1d,
      "metrics" -> metrics)
      .map { case (n, t) => n -> t.vacuum(retainSnapshots) }.toMap

  // ------------------------------------------------------------------
  // lineage + metrics
  // ------------------------------------------------------------------

  private def logTierMetrics(job: String, table: String, sid: Long, tierRows: DataFrame): Unit =
    logMetrics(job, table, sid,
      tierRows.groupBy("ts_day").agg(
        count(lit(1)).as("rows"), sum("turn_cnt").as("rollup_rows")))

  /** One lineage row per affected partition: (job, table, snapshot,
    * partition day, row count, rolled-up turn count).
    */
  private def logMetrics(job: String, table: String, sid: Long, perDay: DataFrame): Unit = {
    val rows = perDay.select(
      lit(job).as("job"), lit(table).as("table_name"), lit(sid).as("snapshot_id"),
      col("ts_day").cast("string").as("partition_day"),
      col("rows").cast("long").as("row_cnt"),
      col("rollup_rows").cast("long").as("rolled_turn_cnt"))
    metrics.append(rows, Map("job" -> job))
    ()
  }

  def readMetrics(): DataFrame = metrics.read()

  /** Publish the current tier snapshots as plain-parquet serving
    * directories (`<warehouse>/serve/tier_*`) for consumers that read
    * bare parquet — notably the TierRouting optimizer rule. Kept
    * OUTSIDE the ChronoTable roots so a publish never clobbers the
    * snapshot log it reads from.
    *
    * Also stamps `serve/WATERMARKS`: per tier, the raw-table snapshot
    * id it fully reflects (0 when a fold in the cascade chain lags).
    * TierRouting refuses to route to a tier whose stamp is behind the
    * raw table's CURRENT — serving data can lag, but a routed query
    * can never silently return stale aggregates.
    */
  def publishServing(): Unit = {
    graft.model.Tier.cascade.foreach { t =>
      readTier(t).write.mode("overwrite")
        .parquet(s"$warehouse/serve/tier_${t.name}")
    }
    val fresh1m = consumedSrc(tier1m)
    val fresh1h = if (consumedSrc(tier1h) >= tier1m.currentSnapshotId) fresh1m else 0L
    val fresh1d = if (consumedSrc(tier1d) >= tier1h.currentSnapshotId) fresh1h else 0L
    val p = graft.plans.TierRouting.watermarksPath(warehouse)
    java.nio.file.Files.createDirectories(p.getParent)
    // write-temp + ATOMIC_MOVE (same discipline as ChronoTable.commit):
    // a concurrent reader must see either the old stamps or the new
    // ones — never a truncated file that parses as watermark 0 and
    // silently disables routing for the whole publish window
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp, s"1m=$fresh1m\n1h=$fresh1h\n1d=$fresh1d\n")
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
