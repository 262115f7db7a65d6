package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.ChronoTable.{FileEntry, Snapshot}

/** A snapshot/manifest table layer with Iceberg mechanics at miniature
  * scale (SURVEY.md §7): partitioned Parquet data files + an atomic
  * JSON snapshot log giving
  *
  *   - snapshot isolation (readers pin a snapshot id),
  *   - atomic commits (write-temp + `ATOMIC_MOVE` rename, both for the
  *     batch data directory and the snapshot json, then the CURRENT
  *     pointer),
  *   - incremental scans between snapshot ids (the rollup job's
  *     checkpoint watermark),
  *   - partition-level retention deletes (metadata-only: a new
  *     snapshot without the expired partitions' files — never
  *     `rm -rf`, unlike the reference's `clear_output`,
  *     /root/reference/jaeger_prometheus_joining/controlflow/
  *     JoinManager.py:189-195),
  *   - rollback (repoint CURRENT at an earlier snapshot),
  *   - named consumer checkpoints.
  *
  * Physical layout under `root`:
  * {{{
  *   data/batch_id=<sid>/<p1>=<v>/.../part-*.parquet
  *   snapshots/v<sid>.json
  *   CURRENT                      // latest committed snapshot id
  *   checkpoints/<name>.json      // consumer watermarks
  * }}}
  *
  * `batch_id` is written as a partition-style directory so one
  * `spark.read.option("basePath", data/)` over any file subset
  * recovers both the user partition columns and the lineage column
  * `batch_id` — per-row provenance for free.
  *
  * Single-writer per table is assumed (the driver's batch jobs are
  * sequential); on a real cluster the same call sites bind to an
  * `org.apache.iceberg.spark` catalog with the equivalent partition
  * spec (`days(ts)`, `bucket(conv_id)`), which provides optimistic
  * multi-writer commits.
  */
final class ChronoTable private (
    val spark: SparkSession,
    val root: String,
    val partitionCols: Seq[String],
    /** Timestamp column to record per-file min/max stats for (Iceberg
      * manifest-stats analog). Written at commit time, used by
      * [[scanFiles]]/[[readRange]] to prune files a time-range query
      * can never match — at 100 TB the difference between reading a
      * partition and reading a file.
      */
    val statsTsCol: Option[String],
    /** Declared cluster column (Iceberg sort-order analog): per-file
      * lexicographic min/max bounds are recorded at commit time, and
      * [[compactSorted]] rewrites partitions range-clustered on it so
      * the bounds become DISJOINT — after which [[readKeyRange]]
      * point/range lookups on the key read one file per partition
      * instead of all of them. Ingest order rarely correlates with
      * the key, so freshly appended files all span the whole key
      * domain; clustering is what makes the recorded stats bite.
      */
    val clusterCol: Option[String] = None) {

  private val mapper = new ObjectMapper()
  private def dataRoot = s"$root/data"
  private def snapDir = Paths.get(root, "snapshots")
  private def currentPtr = Paths.get(root, "CURRENT")

  // ------------------------------------------------------------------
  // snapshot log
  // ------------------------------------------------------------------

  def currentSnapshotId: Long =
    if (Files.exists(currentPtr)) Files.readString(currentPtr).trim.toLong else 0L

  def snapshot(id: Long): Option[Snapshot] = {
    val p = snapDir.resolve(s"v$id.json")
    if (!Files.exists(p)) None
    else {
      val n = mapper.readTree(Files.readString(p))
      val files = n.get("files").elements().asScala.map { f =>
        FileEntry(f.get("path").asText, f.get("partition").asText,
          f.get("addedBy").asLong,
          Option(f.get("minTsUs")).map(_.asLong),
          Option(f.get("maxTsUs")).map(_.asLong),
          Option(f.get("rows")).map(_.asLong),
          Option(f.get("minKey")).map(_.asText),
          Option(f.get("maxKey")).map(_.asText))
      }.toSeq
      val summary = n.get("summary").properties().asScala
        .map(e => e.getKey -> e.getValue.asText).toMap
      Some(Snapshot(n.get("id").asLong, n.get("parentId").asLong,
        n.get("op").asText, files, summary))
    }
  }

  def currentSnapshot: Option[Snapshot] = {
    val id = currentSnapshotId
    if (id == 0) None else snapshot(id)
  }

  def snapshotIds: Seq[Long] =
    if (!Files.exists(snapDir)) Seq.empty
    else {
      val stream = Files.list(snapDir)
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
          s.stripPrefix("v").stripSuffix(".json").toLong }
        .toSeq.sorted
      finally stream.close()
    }

  private def writeSnapshot(s: Snapshot): Unit = {
    Files.createDirectories(snapDir)
    val node = mapper.createObjectNode()
    node.put("id", s.id); node.put("parentId", s.parentId); node.put("op", s.op)
    val arr = node.putArray("files")
    s.files.foreach { f =>
      val fn = arr.addObject()
      fn.put("path", f.path); fn.put("partition", f.partition)
      fn.put("addedBy", f.addedBy)
      f.minTsUs.foreach(fn.put("minTsUs", _))
      f.maxTsUs.foreach(fn.put("maxTsUs", _))
      f.rows.foreach(fn.put("rows", _))
      f.minKey.foreach(fn.put("minKey", _))
      f.maxKey.foreach(fn.put("maxKey", _))
    }
    val sm = node.putObject("summary")
    s.summary.foreach { case (k, v) => sm.put(k, v) }
    atomicWrite(snapDir.resolve(s"v${s.id}.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node))
    atomicWrite(currentPtr, s.id.toString)
  }

  private def atomicWrite(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // ------------------------------------------------------------------
  // commits
  // ------------------------------------------------------------------

  /** Stage `df` under `_tmp` and atomically rename the batch dir into
    * `data/`. If a previous crashed attempt left an orphaned
    * `batch_id=<sid>` dir (rename done, snapshot json never
    * committed — so nothing references it), it is removed first.
    */
  private def stageBatch(df: DataFrame, sid: Long): Seq[FileEntry] = {
    val staging = Paths.get(root, "_tmp", s"batch_id=$sid")
    Files.createDirectories(staging.getParent)
    deleteRecursively(staging)
    val writer = if (partitionCols.nonEmpty)
      df.write.partitionBy(partitionCols: _*) else df.write
    writer.mode("overwrite").parquet(staging.toString)
    val target = Paths.get(dataRoot, s"batch_id=$sid")
    Files.createDirectories(target.getParent)
    deleteRecursively(target) // orphan from a crashed commit of this sid
    Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
    val parquetFiles = listParquet(target)
    // per-file stats: one scan of the NEW batch only (Iceberg computes
    // the same bounds at write time). Keyed by the BATCH-RELATIVE path
    // (partition dirs + filename), NOT the bare filename: Spark's
    // dynamic-partition writer reuses the same part-NNNNN-<uuid>.c000
    // name in every partition dir a task writes, so bare names collide
    // within a batch and one file would silently inherit another's
    // bounds — and stats-pruned reads could then drop in-range rows.
    // resolve symlinks ONCE so the relativize below cannot miss when
    // the warehouse sits behind a symlinked root (e.g. /tmp →
    // /private/tmp) — a silent key miss would record no bounds and
    // quietly disable stats pruning for the whole batch
    val realTarget = scala.util.Try(target.toRealPath()).getOrElse(
      target.toAbsolutePath)
    // ONE stats scan of the new batch covers both the ts bounds and
    // the cluster-key bounds (adding a second scan per configured
    // stats column would double write-amplification for nothing)
    case class FileStats(minTs: Option[Long], maxTs: Option[Long],
      minKey: Option[String], maxKey: Option[String])
    val statAggs =
      statsTsCol.toSeq.flatMap(c => Seq(
        min(unix_micros(col(c).cast("timestamp"))).as("_mn_ts"),
        max(unix_micros(col(c).cast("timestamp"))).as("_mx_ts"))) ++
      clusterCol.toSeq.flatMap(c => Seq(
        min(col(c).cast("string")).as("_mn_key"),
        max(col(c).cast("string")).as("_mx_key")))
    val stats: Map[String, FileStats] =
      if (statAggs.isEmpty || parquetFiles.isEmpty) Map.empty
      else spark.read.option("basePath", dataRoot).parquet(target.toString)
        .groupBy(input_file_name().as("f"))
        .agg(statAggs.head, statAggs.tail: _*)
        .collect()
        .map { r =>
          // input_file_name is a URI (file:/...; %-escaped) — decode
          // to a filesystem path before relativizing against target
          val raw = r.getString(0)
          val fsPath = scala.util.Try(Paths.get(new java.net.URI(raw)))
            .getOrElse(Paths.get(raw))
          val realFs = scala.util.Try(fsPath.toRealPath()).getOrElse(fsPath)
          val rel = scala.util.Try(realTarget.relativize(realFs).toString)
            .getOrElse(realFs.toString
              .stripPrefix(realTarget.toString).stripPrefix("/"))
          def longAt(n: String): Option[Long] =
            if (!r.schema.fieldNames.contains(n) || r.isNullAt(r.fieldIndex(n)))
              None else Some(r.getLong(r.fieldIndex(n)))
          def strAt(n: String): Option[String] =
            if (!r.schema.fieldNames.contains(n) || r.isNullAt(r.fieldIndex(n)))
              None else Some(r.getString(r.fieldIndex(n)))
          rel -> FileStats(longAt("_mn_ts"), longAt("_mx_ts"),
            strAt("_mn_key"), strAt("_mx_key"))
        }.toMap
    parquetFiles.map { p =>
      val rel = target.relativize(p).toString
      val partition = Option(Paths.get(rel).getParent).map(_.toString).getOrElse("")
      val st = stats.get(rel)
      FileEntry(s"batch_id=$sid/$rel", partition, sid,
        st.flatMap(_.minTs), st.flatMap(_.maxTs),
        footerRowCount(p),
        st.flatMap(_.minKey), st.flatMap(_.maxKey))
    }
  }

  /** Row count from the parquet FOOTER — driver-side metadata (one
    * footer read per new file, like Iceberg's manifest record counts),
    * NO Spark job. Feeds [[rowCount]], which lets parameter-sizing
    * consumers (the auto-ANN paths) skip a full `count()` scan of the
    * corpus. None if the footer is unreadable — the entry simply
    * carries no count rather than failing the commit.
    */
  private def footerRowCount(p: Path): Option[Long] =
    scala.util.Try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri),
        spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.toOption

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try {
        val it = stream.sorted(java.util.Comparator.reverseOrder()).iterator()
        while (it.hasNext) Files.delete(it.next())
      } finally stream.close()
    }

  /** Append `df` as a new snapshot; returns the snapshot id. A crash
    * at any point leaves the table readable at its previous snapshot.
    */
  def append(df: DataFrame, summary: Map[String, String] = Map.empty): Long = {
    val sid = currentSnapshotId + 1
    val added = stageBatch(df, sid)
    val prev = currentSnapshot.map(_.files).getOrElse(Seq.empty)
    writeSnapshot(Snapshot(sid, sid - 1, "append", prev ++ added,
      summary + ("added_files" -> added.size.toString)))
    sid
  }

  /** Copy-on-write overwrite of the partitions matching `drop`:
    * removes their files from the live set and appends `replacement`
    * (may be empty) in ONE commit — the MERGE primitive of the tier
    * tables.
    */
  def overwritePartitions(
      drop: Map[String, String] => Boolean,
      replacement: Option[DataFrame],
      op: String = "overwrite",
      summary: Map[String, String] = Map.empty): Long = {
    val sid = currentSnapshotId + 1
    val prev = currentSnapshot.map(_.files).getOrElse(Seq.empty)
    val (dropped, kept) = prev.partition(f => drop(parsePartition(f.partition)))
    val added: Seq[FileEntry] = replacement match {
      case Some(df) => stageBatch(df, sid)
      case None => Seq.empty
    }
    writeSnapshot(Snapshot(sid, sid - 1, op, kept ++ added,
      summary ++ Map("dropped_files" -> dropped.size.toString,
        "added_files" -> added.size.toString)))
    sid
  }

  /** Retention: metadata-drop every partition whose values satisfy
    * `expired`. Data files stay on disk until [[vacuum]] reclaims
    * whatever the retained snapshots no longer reference.
    */
  def dropPartitions(expired: Map[String, String] => Boolean,
      summary: Map[String, String] = Map.empty): Long =
    overwritePartitions(expired, None, op = "retention-drop", summary = summary)

  /** Small-file compaction (the third Iceberg maintenance op next to
    * retention and [[vacuum]]): rewrite every partition matching
    * `select` whose live file count exceeds `minFiles` into one file
    * per partition, in a single copy-on-write commit. Rows are
    * byte-identical; only the file layout (and per-row `batch_id`
    * lineage, which coarsens to the compaction's own snapshot id, as
    * in Iceberg's rewrite_data_files) changes. Returns the snapshot
    * id, or the current one when nothing qualifies.
    */
  def compact(select: Map[String, String] => Boolean = _ => true,
      minFiles: Int = 2): Long = {
    val live = currentSnapshot.map(_.files).getOrElse(Seq.empty)
    val byPartition = live.groupBy(_.partition)
    val targets = byPartition.filter { case (p, fs) =>
      fs.size >= minFiles && select(parsePartition(p))
    }
    if (targets.isEmpty) return currentSnapshotId
    val base = readFiles(targets.values.flatten.toSeq).drop("batch_id")
    val rewritten =
      if (partitionCols.isEmpty) base.coalesce(1)
      else base.repartition(partitionCols.map(col): _*)
    overwritePartitions(
      p => targets.keys.exists(k => parsePartition(k) == p),
      Some(rewritten), op = "compact",
      summary = Map("compacted_partitions" -> targets.size.toString))
  }

  /** Sort-clustered compaction (Iceberg `rewrite_data_files` with a
    * sort order): rewrite the selected partitions with rows RANGE-
    * clustered on [[clusterCol]] — `filesPerPartition` range splits,
    * each sorted — so per-file cluster-key bounds become (near-)
    * disjoint and [[readKeyRange]] prunes to ~one file per partition
    * instead of scanning them all. Plain [[compact]] fixes the
    * small-file problem; this one fixes key-scatter: freshly ingested
    * files each span the whole key domain, so key-stats pruning
    * cannot bite until a clustering rewrite concentrates each key's
    * rows. Rows are byte-identical; only layout (and `batch_id`
    * lineage, as in compact) changes.
    *
    * At 100 TB this is the standard scheduled maintenance pass: the
    * range-exchange shuffle is confined to the selected partitions
    * (run it per freshly-sealed day, not over the table's history).
    */
  def compactSorted(select: Map[String, String] => Boolean = _ => true,
      filesPerPartition: Int = 1): Long = {
    val c = clusterCol.getOrElse(
      throw new IllegalStateException("compactSorted needs a clusterCol"))
    require(filesPerPartition >= 1, s"filesPerPartition: $filesPerPartition")
    val live = currentSnapshot.map(_.files).getOrElse(Seq.empty)
    val targets = live.groupBy(_.partition)
      .filter { case (p, _) => select(parsePartition(p)) }
    if (targets.isEmpty) return currentSnapshotId
    val base = readFiles(targets.values.flatten.toSeq).drop("batch_id")
    // range-partition on (dir-partition cols, key): each output file
    // covers one key range WITHIN one partition dir; the in-file sort
    // additionally gives parquet page-level locality on the key
    val rangeCols = (partitionCols :+ c).map(col)
    val nOut = math.max(1, targets.size * filesPerPartition)
    val rewritten = base
      .repartitionByRange(nOut, rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
    overwritePartitions(
      p => targets.keys.exists(k => parsePartition(k) == p),
      Some(rewritten), op = "compact-sorted",
      summary = Map("clustered_partitions" -> targets.size.toString,
        "cluster_col" -> c))
  }

  /** Live files whose cluster-key bounds overlap [loKey, hiKey]
    * (lexicographic, inclusive). Files without key stats are
    * conservatively kept — pruning may under-prune, never drop data.
    */
  def scanFilesByKey(loKey: String, hiKey: String,
      snapshotId: Long = currentSnapshotId): Seq[FileEntry] =
    snapshot(snapshotId).map(_.files).getOrElse(Seq.empty).filter { f =>
      (f.minKey, f.maxKey) match {
        case (Some(mn), Some(mx)) => mn <= hiKey && mx >= loKey
        case _ => true
      }
    }

  /** Cluster-key range read using per-file key-stats pruning: reads
    * ONLY the files [[scanFilesByKey]] keeps. Callers still apply
    * their own row filter (stats bound files, not rows).
    */
  def readKeyRange(loKey: String, hiKey: String): DataFrame =
    readFiles(scanFilesByKey(loKey, hiKey))

  /** Repoint CURRENT at an earlier snapshot (time travel / rollback). */
  def rollback(toSnapshotId: Long): Unit = {
    require(snapshot(toSnapshotId).isDefined, s"no snapshot $toSnapshotId")
    atomicWrite(currentPtr, toSnapshotId.toString)
  }

  // ------------------------------------------------------------------
  // reads
  // ------------------------------------------------------------------

  private def listParquet(dir: Path): Seq[Path] = {
    val stream = Files.walk(dir)
    try stream.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq.sortBy(_.toString)
    finally stream.close()
  }

  def parsePartition(partition: String): Map[String, String] =
    partition.split('/').filter(_.nonEmpty).flatMap { seg =>
      seg.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      }
    }.toMap

  private def readFiles(files: Seq[FileEntry]): DataFrame =
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read
      .option("basePath", dataRoot)
      .parquet(files.map(f => s"$dataRoot/${f.path}"): _*)

  /** Read the table at `snapshotId` (default: current). Includes the
    * lineage column `batch_id`.
    */
  def read(snapshotId: Long = currentSnapshotId): DataFrame =
    readFiles(snapshot(snapshotId).map(_.files).getOrElse(Seq.empty))

  /** Incremental scan: rows added by snapshots in (`afterSnapshotId`,
    * `untilSnapshotId`]. This is the rollup checkpoint watermark —
    * snapshot-id is the streaming analog per SURVEY.md §2.8.
    */
  def readIncremental(afterSnapshotId: Long,
      untilSnapshotId: Long = currentSnapshotId): DataFrame = {
    val files = snapshot(untilSnapshotId).map(_.files).getOrElse(Seq.empty)
      .filter(f => f.addedBy > afterSnapshotId && f.addedBy <= untilSnapshotId)
    readFiles(files)
  }

  /** Live files whose stats range overlaps [loUs, hiUs] (epoch
    * micros, inclusive). Files without stats are conservatively kept
    * — pruning may under-prune, never drop data.
    */
  def scanFiles(loUs: Long, hiUs: Long,
      snapshotId: Long = currentSnapshotId): Seq[FileEntry] =
    snapshot(snapshotId).map(_.files).getOrElse(Seq.empty).filter { f =>
      (f.minTsUs, f.maxTsUs) match {
        case (Some(mn), Some(mx)) => mn <= hiUs && mx >= loUs
        case _ => true
      }
    }

  /** Time-range read using per-file min/max stats pruning: reads ONLY
    * the files [[scanFiles]] keeps. Callers still apply their own row
    * filter (stats bound files, not rows).
    */
  def readRange(loUs: Long, hiUs: Long): DataFrame =
    readFiles(scanFiles(loUs, hiUs))

  /** Delete data files referenced by NO retained snapshot plus the
    * expired snapshot jsons — the byte-reclaim companion of
    * [[dropPartitions]] (which is metadata-only so time travel keeps
    * working until vacuum). Retains the `retainSnapshots` most recent
    * snapshots up to CURRENT; snapshots "after" CURRENT (undone by a
    * rollback) are vacuumed too. Returns (files deleted, bytes
    * reclaimed).
    */
  def vacuum(retainSnapshots: Int = 1): (Long, Long) = {
    require(retainSnapshots >= 1, "must retain at least the current snapshot")
    val cur = currentSnapshotId
    if (cur == 0L) return (0L, 0L)
    val keepIds = snapshotIds
      .filter(id => id <= cur && id > cur - retainSnapshots).toSet
    val referenced = keepIds.flatMap(id =>
      snapshot(id).map(_.files.map(_.path)).getOrElse(Seq.empty))
    var nFiles = 0L
    var nBytes = 0L
    val dataPath = Paths.get(dataRoot)
    if (Files.exists(dataPath)) {
      val stream = Files.walk(dataPath)
      val all = try stream.iterator().asScala
        .filter(Files.isRegularFile(_)).toSeq finally stream.close()
      all.foreach { p =>
        val rel = dataPath.relativize(p).toString
        if (!referenced.contains(rel)) {
          nBytes += Files.size(p)
          Files.delete(p)
          nFiles += 1
        }
      }
      // sweep now-empty batch/partition dirs
      val dirs = Files.walk(dataPath)
      try dirs.sorted(java.util.Comparator.reverseOrder()).iterator().asScala
        .foreach { p =>
          if (p != dataPath && Files.isDirectory(p)) {
            val ls = Files.list(p)
            val empty = try !ls.findFirst().isPresent finally ls.close()
            if (empty) Files.delete(p)
          }
        }
      finally dirs.close()
    }
    snapshotIds.filterNot(keepIds).foreach { id =>
      Files.deleteIfExists(snapDir.resolve(s"v$id.json"))
    }
    (nFiles, nBytes)
  }

  /** Live partitions (as parsed key→value maps) at the current snapshot. */
  def livePartitions: Seq[Map[String, String]] =
    currentSnapshot.map(_.files).getOrElse(Seq.empty)
      .map(f => parsePartition(f.partition)).distinct

  // ------------------------------------------------------------------
  // consumer checkpoints
  // ------------------------------------------------------------------

  private def ckptPath(name: String) = Paths.get(root, "checkpoints", s"$name.json")

  def checkpoint(name: String): Long = {
    val p = ckptPath(name)
    if (!Files.exists(p)) 0L
    else mapper.readTree(Files.readString(p)).get("lastSnapshotId").asLong
  }

  /** Total live rows at `snapshotId` from manifest-recorded footer
    * counts — O(files) driver-side metadata, NO data scan. None when
    * any live file predates row-count recording (conservative: a
    * partial sum must not masquerade as the corpus size).
    */
  def rowCountAt(snapshotId: Long): Option[Long] =
    snapshot(snapshotId).flatMap { s =>
      if (s.files.exists(_.rows.isEmpty)) None
      else Some(s.files.flatMap(_.rows).sum)
    }

  /** [[rowCountAt]] the current snapshot — what parameter-sizing
    * consumers (e.g. the auto-ANN paths' `nHint`) should pass instead
    * of paying a full `count()` scan of the corpus.
    */
  def rowCount: Option[Long] = rowCountAt(currentSnapshotId)

  def setCheckpoint(name: String, lastSnapshotId: Long): Unit = {
    Files.createDirectories(ckptPath(name).getParent)
    atomicWrite(ckptPath(name), s"""{"lastSnapshotId": $lastSnapshotId}""")
  }
}

object ChronoTable {
  /** One live data file. `partition` is the relative key=value path
    * (excluding batch_id), e.g. "ts_day=2024-01-03/conv_bucket=2".
    * `minTsUs`/`maxTsUs` are the file's stats-column bounds in epoch
    * micros (None when the table has no stats column or the file's
    * column is all-null — such files are never pruned).
    * Companion-level (not class-nested) so pattern matches need no
    * unverifiable outer-instance check.
    */
  final case class FileEntry(path: String, partition: String, addedBy: Long,
      minTsUs: Option[Long] = None, maxTsUs: Option[Long] = None,
      /** Footer-recorded row count (None in pre-r5 manifests). */
      rows: Option[Long] = None,
      /** Lexicographic cluster-key bounds (None when the table has no
        * cluster column or the file's key is all-null).
        */
      minKey: Option[String] = None, maxKey: Option[String] = None)

  final case class Snapshot(
      id: Long,
      parentId: Long,
      op: String,
      files: Seq[FileEntry],
      summary: Map[String, String])

  /** Open (or initialize) a table rooted at `root`. */
  def apply(spark: SparkSession, root: String, partitionCols: Seq[String],
      statsTsCol: Option[String] = None,
      clusterCol: Option[String] = None): ChronoTable = {
    Files.createDirectories(Paths.get(root))
    new ChronoTable(spark, root, partitionCols, statsTsCol, clusterCol)
  }
}
