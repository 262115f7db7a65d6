package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("synthesized table has the production schema") {
    val mm = Multimodal.synthesize(spark, sfDir)
    val s = mm.schema
    assert(s("payload").dataType == BinaryType)
    assert(s("modality").dataType == StringType)
    assert(s("meta").dataType.isInstanceOf[StructType])
    assert(mm.count() > 0)
  }

  test("feature extraction: fixed-width vectors, deterministic") {
    val f = Multimodal.extractFeatures(Multimodal.synthesize(spark, sfDir))
    val rows = f.select($"doc_id", $"features").as[(Long, Seq[Float])].collect()
    assert(rows.forall(_._2.length == 8), "feature width must be fixed at 8")
    val again = Multimodal.extractFeatures(Multimodal.synthesize(spark, sfDir))
      .select($"doc_id", $"features").as[(Long, Seq[Float])].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("frame sampling yields ceil(duration/step) rows per video") {
    val mm = Multimodal.synthesize(spark, sfDir).cache()
    val frames = Multimodal.sampleFrames(mm, stepS = 5)
      .groupBy("doc_id").count()
    val want = mm.filter($"modality" === "video")
      .select($"doc_id", ceil($"meta.duration_s" / 5.0).cast("long").as("want"))
    val bad = frames.join(want, "doc_id").filter($"count" =!= $"want").count()
    assert(bad == 0)
    mm.unpersist()
  }

  test("metadata-only query over a parquet multimodal table prunes the payload column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm-").toString
    Multimodal.synthesize(spark, sfDir).write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .select($"doc_id", $"modality", $"meta.width")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("payload"),
      s"payload not pruned from scan:\n$plan")
  }
}
