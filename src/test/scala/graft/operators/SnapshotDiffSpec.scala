package graft.operators

import java.nio.file.Files

import graft.SparkSuite
import graft.table.ChronoTable
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSuite {
  import spark.implicits._

  test("classifies inserts, deletes, updates; drops unchanged; names changed columns") {
    val oldDf = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "tag", "v")
    val newDf = Seq((2L, "b", 20.0), (3L, "C", 31.0), (4L, "d", 40.0))
      .toDF("id", "tag", "v")
    val got = SnapshotDiff.diff(oldDf, newDf, Seq("id"))
      .select($"id", $"op", $"changed_cols",
        $"tag_old", $"tag_new", $"v_old", $"v_new")
      .as[(Long, String, Seq[String], Option[String], Option[String],
        Option[Double], Option[Double])]
      .collect().toSet
    assert(got === Set(
      (1L, "D", Seq.empty, Some("a"), None, Some(10.0), None),
      (3L, "U", Seq("tag", "v"), Some("c"), Some("C"), Some(30.0), Some(31.0)),
      (4L, "I", Seq.empty, None, Some("d"), None, Some(40.0))))
  }

  test("null-safe comparison: null == null is unchanged, null vs value is a change") {
    val oldDf = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "tag")
    val newDf = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "tag")
    val got = SnapshotDiff.diff(oldDf, newDf, Seq("id"))
      .select("id", "op").as[(Long, String)].collect().toSet
    assert(got === Set((2L, "U")))
  }

  test("schema and key rails") {
    val a = Seq((1L, "x")).toDF("id", "tag")
    val b = Seq((1L, 2.0)).toDF("id", "v")
    assertThrows[IllegalArgumentException] {
      SnapshotDiff.diff(a, b, Seq("id"))
    }
    assertThrows[IllegalArgumentException] {
      SnapshotDiff.diff(a, a, Seq.empty)
    }
    assertThrows[IllegalArgumentException] {
      SnapshotDiff.diff(a, a, Seq("nope"))
    }
  }

  test("diffSnapshots ignores the table's batch_id lineage and sees through compaction") {
    val t = ChronoTable(spark,
      Files.createTempDirectory("graft-snapdiff-").toString, Seq("day"))
    val s1 = t.append(Seq((1L, "d1", 10.0), (2L, "d1", 20.0))
      .toDF("id", "day", "v"))
    t.append(Seq((3L, "d2", 30.0)).toDF("id", "day", "v"))
    // overwrite d1: id 1 changes, id 2 is rewritten UNCHANGED (new
    // batch_id, same content — must NOT read as an update)
    val s3 = t.overwritePartitions(
      p => p("day") == "d1",
      Some(Seq((1L, "d1", 11.0), (2L, "d1", 20.0)).toDF("id", "day", "v")))
    val got = SnapshotDiff.diffSnapshots(t, s1, s3, Seq("id"))
      .select("id", "op").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "U"), (3L, "I")))
  }
}
