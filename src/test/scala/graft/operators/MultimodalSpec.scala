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

  test("header decode round-trips the builders exactly") {
    val png = MediaHeaders.buildPng(640, 480, "body".getBytes)
    assert(MediaHeaders.parse(png)
      .contains(MediaHeaders.MediaMeta("png", Some(640), Some(480), None)))
    val wav = MediaHeaders.buildWav(byteRate = 100, dataSize = 700, fill = "x".getBytes)
    assert(MediaHeaders.parse(wav)
      .contains(MediaHeaders.MediaMeta("wav", None, None, Some(7))))
    val mp4 = MediaHeaders.buildMp4(1280, 720, 13, "zz".getBytes)
    assert(MediaHeaders.parse(mp4)
      .contains(MediaHeaders.MediaMeta("mp4", Some(1280), Some(720), Some(13))))
  }

  test("corrupt payloads decode to None, not garbage") {
    val png = MediaHeaders.buildPng(640, 480, "body".getBytes)
    png(18) = (png(18) ^ 0xFF).toByte // flip a width byte → IHDR CRC fails
    assert(MediaHeaders.parse(png).isEmpty)
    assert(MediaHeaders.parse("definitely not a container".getBytes).isEmpty)
    assert(MediaHeaders.parse(Array.empty[Byte]).isEmpty)
  }

  test("crafted near-Int.MaxValue chunk sizes return None, never crash") {
    // WAV with a data size of 0x7FFFFFF0: Int offset math would wrap
    // negative, pass the loop guard, and throw from tag/readLe32
    val wav = MediaHeaders.buildWav(100, 10, Array[Byte](1))
    wav(0x28) = 0xF0.toByte; wav(0x29) = 0xFF.toByte
    wav(0x2A) = 0xFF.toByte; wav(0x2B) = 0x7F.toByte
    // must return an Option (header-only parse may still succeed),
    // never throw from a wrapped negative offset
    MediaHeaders.parse(wav)
    // PNG with IHDR length 0x7FFFFFF8 → off + 12 + len wraps in Int
    val png = MediaHeaders.buildPng(640, 480, "body".getBytes)
    png(8) = 0x7F.toByte; png(9) = 0xFF.toByte
    png(10) = 0xFF.toByte; png(11) = 0xF8.toByte
    assert(MediaHeaders.parse(png).isEmpty)
    // MP4 with a moov size that overflows off + size
    val mp4 = MediaHeaders.buildMp4(1280, 720, 13, "zz".getBytes)
    mp4(16) = 0x7F.toByte; mp4(17) = 0xFF.toByte
    mp4(18) = 0xFF.toByte; mp4(19) = 0xF0.toByte
    assert(MediaHeaders.parse(mp4).isEmpty)
  }

  test("decoded metadata equals generator intent on every row") {
    val dec = Multimodal.decodeMeta(Multimodal.synthesize(spark, sfDir)).cache()
    assert(dec.filter($"decoded_modality".isNull).count() == 0,
      "some payload failed to parse")
    val bad = dec.filter(
      $"decoded_modality" =!= $"modality" ||
        ($"modality" =!= "audio" &&
          ($"width" =!= $"meta.width" || $"height" =!= $"meta.height")) ||
        ($"modality" =!= "image" && $"duration_s" =!= $"meta.duration_s")).count()
    assert(bad == 0, "decode diverges from generator intent")
    dec.unpersist()
  }

  test("feature extraction: fixed-width vectors from REAL content decode, deterministic") {
    val f = Multimodal.extractFeatures(Multimodal.synthesize(spark, sfDir))
    val rows = f.select($"doc_id", $"features").as[(Long, Seq[Float])].collect()
    assert(rows.forall(_._2 != null), "every valid payload must featurize")
    assert(rows.forall(_._2.length == 10), "feature width must be fixed at 10")
    val again = Multimodal.extractFeatures(Multimodal.synthesize(spark, sfDir))
      .select($"doc_id", $"features").as[(Long, Seq[Float])].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // normalized histogram sums to ~1 (it IS content-derived, not padding)
    rows.take(20).foreach { case (id, v) =>
      val s = v.take(8).sum
      assert(math.abs(s - 1.0f) < 1e-3, s"doc $id histogram sums to $s")
    }
  }

  test("extractBody round-trips the builders' content payloads exactly") {
    val body = "The quick brown fox".getBytes("UTF-8")
    assert(MediaHeaders.extractBody(MediaHeaders.buildPng(320, 240, body))
      .exists(_.sameElements(body)))
    assert(MediaHeaders.extractBody(MediaHeaders.buildMp4(320, 240, 7, body))
      .exists(_.sameElements(body)))
    // WAV: data chunk is `fill` cycled to dataSize
    val wav = MediaHeaders.buildWav(byteRate = 100, dataSize = 50, fill = body)
    val data = MediaHeaders.extractBody(wav)
    assert(data.exists(_.length == 50))
    assert(data.get.zipWithIndex.forall { case (b, i) => b == body(i % body.length) })
    // corrupt PNG: flip an IDAT byte → CRC fails → None
    val png = MediaHeaders.buildPng(320, 240, body)
    png(45) = (png(45) ^ 0xFF).toByte
    assert(MediaHeaders.extractBody(png).isEmpty)
    assert(MediaHeaders.extractBody("garbage".getBytes).isEmpty)
  }

  test("audio content stats: transitions count real PCM sample changes") {
    // cycled fill "ab" → every adjacent pair differs: transitions = n-1
    val wav = MediaHeaders.buildWav(byteRate = 10, dataSize = 40, fill = "ab".getBytes)
    val (n, hist, trans) = Multimodal.contentStats(MediaHeaders.extractBody(wav).get)
    assert(n == 40L && trans == 39L)
    assert(hist(3) == 40L, "ASCII 'a'/'b' (97/98) land in bin 3")
    // constant fill → zero transitions
    val flat = MediaHeaders.buildWav(byteRate = 10, dataSize = 40, fill = "z".getBytes)
    assert(Multimodal.contentStats(MediaHeaders.extractBody(flat).get)._3 == 0L)
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
    val plan = Multimodal.metaOnlyStored(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("payload"),
      s"payload not pruned from scan:\n$plan")
  }
}
