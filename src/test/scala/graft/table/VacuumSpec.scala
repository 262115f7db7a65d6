package graft.table

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.datagen.TranscriptGen

class VacuumSpec extends SparkSuite {
  import spark.implicits._

  private def mkTable(statsCol: Option[String] = Some("ts")): ChronoTable =
    ChronoTable(spark,
      Files.createTempDirectory("graft-vacuum-").toString,
      Seq("ts_day"), statsCol)

  private def dayTurns(nConvs: Int, seed: Long) =
    TranscriptGen.generate(spark, nConvs, 10, seed = seed).toDF()
      .withColumn("ts_day", date_format(col("ts"), "yyyy-MM-dd"))

  private def parquetOnDisk(t: ChronoTable): Seq[String] = {
    val data = Paths.get(t.root, "data")
    if (!Files.exists(data)) Seq.empty
    else {
      val s = Files.walk(data)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(data.relativize(_).toString).toSeq
      finally s.close()
    }
  }

  test("vacuum reclaims files no retained snapshot references") {
    val t = mkTable()
    t.append(dayTurns(4, 1L))
    t.append(dayTurns(4, 2L))
    // rewrite everything: snapshots 1-2's files become garbage
    t.overwritePartitions(_ => true, Some(dayTurns(6, 3L)))
    val rowsBefore = t.read().count()
    val diskBefore = parquetOnDisk(t).size
    val (nFiles, nBytes) = t.vacuum(retainSnapshots = 1)
    assert(nFiles > 0 && nBytes > 0, "vacuum reclaimed nothing")
    // survivors byte-identical: same rows, and disk == live set exactly
    assert(t.read().count() == rowsBefore)
    val live = t.currentSnapshot.get.files.map(_.path).toSet
    assert(parquetOnDisk(t).toSet == live)
    assert(parquetOnDisk(t).size < diskBefore)
    // expired snapshot jsons are gone too
    assert(t.snapshotIds == Seq(t.currentSnapshotId))
  }

  test("retention drop + vacuum reclaims expired bytes, survivors byte-identical") {
    val t = mkTable()
    val shifted = dayTurns(3, 10L)
      .withColumn("ts", col("ts") + expr("INTERVAL 3 DAYS"))
      .withColumn("ts_day", date_format(col("ts"), "yyyy-MM-dd"))
    t.append(dayTurns(3, 9L).unionByName(shifted))
    val days = t.livePartitions.flatMap(_.get("ts_day")).distinct.sorted
    assert(days.size >= 2, s"fixture spans too few days: $days")
    val cutoff = days(days.size / 2)
    t.dropPartitions(p => p.get("ts_day").exists(_ < cutoff))
    val survivors = t.read().select($"conv_id", $"turn_idx", $"text")
      .collect().map(_.toString).sorted.toSeq
    val (nFiles, _) = t.vacuum(retainSnapshots = 1)
    assert(nFiles > 0, "expired partition files not reclaimed")
    val after = t.read().select($"conv_id", $"turn_idx", $"text")
      .collect().map(_.toString).sorted.toSeq
    assert(after == survivors)
    assert(parquetOnDisk(t).toSet == t.currentSnapshot.get.files.map(_.path).toSet)
  }

  test("vacuum with retainSnapshots=2 keeps the previous snapshot readable") {
    val t = mkTable()
    t.append(dayTurns(3, 4L))
    val sid1 = t.currentSnapshotId
    t.overwritePartitions(_ => true, Some(dayTurns(3, 5L)))
    t.vacuum(retainSnapshots = 2)
    assert(t.snapshot(sid1).isDefined)
    assert(t.read(sid1).count() > 0) // time travel still works
  }

  test("per-file min/max stats are recorded and prune range scans") {
    val t = mkTable()
    // two batches with disjoint time ranges (shift the second by 30d)
    val early = dayTurns(4, 6L)
    val late = dayTurns(4, 7L)
      .withColumn("ts", col("ts") + expr("INTERVAL 30 DAYS"))
      .withColumn("ts_day", date_format(col("ts"), "yyyy-MM-dd"))
    t.append(early)
    t.append(late)
    val all = t.currentSnapshot.get.files
    assert(all.forall(f => f.minTsUs.isDefined && f.maxTsUs.isDefined),
      "stats missing on committed files")
    // a range covering only the early batch prunes every late file
    val earlyBounds = early.agg(
      min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .as[(Long, Long)].head()
    val pruned = t.scanFiles(earlyBounds._1, earlyBounds._2)
    assert(pruned.nonEmpty && pruned.size < all.size,
      s"no pruning: ${pruned.size} of ${all.size}")
    assert(pruned.forall(_.addedBy == 1L), "late files not pruned")
    // readRange returns exactly the early rows
    assert(t.readRange(earlyBounds._1, earlyBounds._2).count() == early.count())
  }

  test("compaction rewrites multi-file partitions to one file each, rows identical") {
    val t = mkTable()
    t.append(dayTurns(3, 11L))
    t.append(dayTurns(3, 12L))
    t.append(dayTurns(3, 13L))
    val before = t.read().select($"conv_id", $"turn_idx", $"text")
      .collect().map(_.toString).sorted.toSeq
    val filesPerPartBefore = t.currentSnapshot.get.files
      .groupBy(_.partition).values.map(_.size).max
    assert(filesPerPartBefore >= 2, "fixture produced single-file partitions")
    t.compact()
    val byPart = t.currentSnapshot.get.files.groupBy(_.partition)
    assert(byPart.values.forall(_.size == 1),
      s"partitions still multi-file: ${byPart.view.mapValues(_.size).toMap}")
    val after = t.read().select($"conv_id", $"turn_idx", $"text")
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
    // compaction + vacuum = bytes actually reclaimed
    val (nFiles, _) = t.vacuum()
    assert(nFiles > 0)
    assert(t.read().count() == before.size)
    // stats survive the rewrite (compacted files carry fresh min/max)
    assert(t.currentSnapshot.get.files.forall(_.minTsUs.isDefined))
  }

  test("per-file stats are correct when one task writes colliding filenames across partitions") {
    // Spark's dynamic-partition writer reuses part-00000-<uuid>.c000 in
    // EVERY partition dir a task writes: coalesce(1) forces one task
    // over two disjoint-range days, so the two files share a basename.
    // A stats map keyed by bare filename collides and one file inherits
    // the other's bounds → silent pruning data loss.
    val t = mkTable()
    val early = dayTurns(2, 20L)
    val late = dayTurns(2, 21L)
      .withColumn("ts", col("ts") + expr("INTERVAL 30 DAYS"))
      .withColumn("ts_day", date_format(col("ts"), "yyyy-MM-dd"))
    t.append(early.unionByName(late).coalesce(1))
    val files = t.currentSnapshot.get.files
    val basenames = files.map(_.path.split('/').last)
    assert(basenames.distinct.size < basenames.size,
      s"fixture failed to produce colliding basenames: $basenames")
    // every file's recorded bounds must equal the file's ACTUAL bounds
    files.foreach { f =>
      val actual = spark.read.parquet(s"${t.root}/data/${f.path}")
        .agg(min(unix_micros(col("ts").cast("timestamp"))),
          max(unix_micros(col("ts").cast("timestamp"))))
        .as[(Long, Long)].head()
      assert(f.minTsUs.contains(actual._1) && f.maxTsUs.contains(actual._2),
        s"stats mismatch for ${f.path}: recorded (${f.minTsUs}, ${f.maxTsUs}) " +
          s"actual $actual")
    }
    // and a range read over only the late window returns every late row
    val lateBounds = late.agg(
      min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .as[(Long, Long)].head()
    assert(t.readRange(lateBounds._1, lateBounds._2)
      .filter(unix_micros(col("ts").cast("timestamp")).between(lateBounds._1, lateBounds._2))
      .count() == late.count())
  }

  test("tables without a stats column never prune") {
    val t = mkTable(statsCol = None)
    t.append(dayTurns(2, 8L))
    val all = t.currentSnapshot.get.files
    assert(all.forall(f => f.minTsUs.isEmpty && f.maxTsUs.isEmpty))
    assert(t.scanFiles(0L, 1L).size == all.size) // conservative keep-all
  }
}
