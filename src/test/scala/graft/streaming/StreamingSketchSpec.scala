package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import graft.functions.TextFunctions
import graft.operators.Sketches
import org.apache.spark.sql.functions._

class StreamingSketchSpec extends SparkSuite {
  import spark.implicits._

  private val (depth, width) = (4, 64)
  private val fp = TextFunctions.fingerprint(col("tok"))

  test("streamed partials merge to the batch sketch; compaction preserves it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val words = (0 until 300).map(i => s"w_${i % 37}")
    val root = Files.createTempDirectory("graft-cms-").toString
    val ckpt = Files.createTempDirectory("graft-cms-ckpt-").toString
    val t = StreamingSketch.table(spark, root)

    val ms = MemoryStream[String]
    // two separate drains (AvailableNow folds queued addData into one
    // micro-batch) so the table really accumulates multiple partials
    ms.addData(words.slice(0, 100))
    StreamingSketch.runOnce(ms.toDF().withColumnRenamed("value", "tok"),
      fp, depth, width, t, ckpt)
    ms.addData(words.slice(100, 250))
    ms.addData(words.slice(250, 300))
    StreamingSketch.runOnce(ms.toDF().withColumnRenamed("value", "tok"),
      fp, depth, width, t, ckpt)

    val expected = Sketches.cmsBuild(words.toDF("tok"), fp, depth, width)
    val got = StreamingSketch.merged(t).select("cms_row", "cms_bucket", "cnt")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)

    // partials accumulated one snapshot per micro-batch; compaction
    // folds them without changing the merged view
    assert(t.read().count() > expected.count())
    StreamingSketch.compact(t)
    assert(t.read().select("cms_row", "cms_bucket", "cnt").count() === expected.count())
    val after = StreamingSketch.merged(t).select("cms_row", "cms_bucket", "cnt")
    assert(after.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(after).count() === 0)
  }

  test("appending after compaction keeps counting from the folded state") {
    val root = Files.createTempDirectory("graft-cms2-").toString
    val t = StreamingSketch.table(spark, root)
    val a = Seq("x", "x", "y").toDF("tok")
    val b = Seq("x", "z").toDF("tok")
    t.append(Sketches.cmsBuild(a, fp, depth, width))
    StreamingSketch.compact(t)
    t.append(Sketches.cmsBuild(b, fp, depth, width))
    val est = Sketches.cmsEstimate(StreamingSketch.merged(t),
        Seq("x").toDF("tok"), fp, Seq("tok"), depth, width)
      .select("cms_est").as[Long].head()
    assert(est >= 3L) // 3 true occurrences of x across both appends
  }
}
