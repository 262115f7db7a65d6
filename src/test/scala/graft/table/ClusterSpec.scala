package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Sort-clustered compaction (Iceberg sort-order analog): per-file
  * cluster-key bounds + a range-clustering rewrite must turn
  * key-range reads from all-files scans into ~one-file-per-partition
  * scans, without changing table contents.
  */
class ClusterSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(tag: String): ChronoTable =
    ChronoTable(spark, Files.createTempDirectory(s"graft-$tag-").toString,
      partitionCols = Seq.empty, statsTsCol = None,
      clusterCol = Some("conv_id"))

  /** 400 rows over 40 conv ids, ingested in 4 appends each SHUFFLED
    * across the key domain — the realistic arrival order where every
    * file spans nearly the whole key range.
    */
  private def ingestScattered(t: ChronoTable): Unit =
    (0 until 4).foreach { b =>
      val rows = (0 until 100).map { i =>
        val conv = f"conv-${(i * 7 + b) % 40}%03d"
        (conv, b * 100 + i, s"text-$b-$i")
      }
      t.append(rows.toDF("conv_id", "seq", "text")
        .repartition(4, col("seq"))) // several files per batch
    }

  test("key bounds are recorded per file and key reads are conservative pre-clustering") {
    val t = freshTable("cluster-pre")
    ingestScattered(t)
    val files = t.currentSnapshot.get.files
    assert(files.size > 4, s"expected several files, got ${files.size}")
    assert(files.forall(f => f.minKey.isDefined && f.maxKey.isDefined))
    // scattered ingest: every file spans ~the whole domain, so a
    // single-key read prunes (almost) nothing — the problem statement
    val hit = t.scanFilesByKey("conv-007", "conv-007")
    assert(hit.size == files.size,
      s"scattered files should all overlap one key: ${hit.size}/${files.size}")
    // correctness regardless: the pruned read equals the filtered scan
    val viaRange = t.readKeyRange("conv-007", "conv-007")
      .filter($"conv_id" === "conv-007").count()
    val viaFull = t.read().filter($"conv_id" === "conv-007").count()
    assert(viaRange === viaFull)
  }

  test("compactSorted makes single-key reads touch a small fraction of files") {
    val t = freshTable("cluster-post")
    ingestScattered(t)
    val before = t.read().select("conv_id", "seq", "text")
      .orderBy("conv_id", "seq")
      .as[(String, Int, String)].collect().toSeq
    t.compactSorted(filesPerPartition = 8)
    val files = t.currentSnapshot.get.files
    assert(files.size >= 4, s"expected >= 4 range files, got ${files.size}")
    // disjoint (or near-disjoint) bounds: one key hits few files
    val hit = t.scanFilesByKey("conv-007", "conv-007")
    assert(hit.size * 3 <= files.size,
      s"clustered single-key read should prune >2/3 of files: " +
        s"${hit.size}/${files.size}")
    // contents are byte-identical
    val after = t.read().select("conv_id", "seq", "text")
      .orderBy("conv_id", "seq")
      .as[(String, Int, String)].collect().toSeq
    assert(after === before)
    // and the pruned read returns exactly the right rows
    val got = t.readKeyRange("conv-007", "conv-007")
      .filter($"conv_id" === "conv-007").count()
    val want = before.count(_._1 == "conv-007")
    assert(got === want.toLong)
  }

  test("key-range scan never drops data for boundary-straddling ranges") {
    val t = freshTable("cluster-range")
    ingestScattered(t)
    t.compactSorted(filesPerPartition = 8)
    val want = t.read()
      .filter($"conv_id" >= "conv-010" && $"conv_id" <= "conv-025")
      .count()
    val got = t.readKeyRange("conv-010", "conv-025")
      .filter($"conv_id" >= "conv-010" && $"conv_id" <= "conv-025")
      .count()
    assert(got === want)
    assert(got > 0L)
  }

  test("compactSorted requires a declared cluster column") {
    val t = ChronoTable(spark,
      Files.createTempDirectory("graft-nocluster-").toString,
      partitionCols = Seq.empty)
    t.append(Seq(("a", 1)).toDF("conv_id", "seq"))
    assertThrows[IllegalStateException] { t.compactSorted() }
  }

  test("legacy manifests without key bounds stay readable and unpruned") {
    val t = freshTable("cluster-legacy")
    t.append(Seq(("a", 1), ("b", 2)).toDF("conv_id", "seq"))
    val snap = java.nio.file.Paths.get(t.root, "snapshots", "v1.json")
    val txt = Files.readString(snap)
    Files.writeString(snap,
      txt.replaceAll(""",\s*"(minKey|maxKey)"\s*:\s*"[^"]*"""", ""))
    val files = t.currentSnapshot.get.files
    assert(files.forall(f => f.minKey.isEmpty && f.maxKey.isEmpty))
    // conservative: no stats → file kept for any range
    assert(t.scanFilesByKey("zzz", "zzz").size == files.size)
    assert(t.readKeyRange("a", "b").count() === 2L)
  }
}
