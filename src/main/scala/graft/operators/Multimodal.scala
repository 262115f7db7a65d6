package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns; decode / feature extraction / frame
  * sampling run as narrow per-row transforms.
  *
  * The payloads are REAL containers (valid PNG / WAV / MP4 built by
  * [[MediaHeaders]], bodies carry the document text bytes) and
  * [[decodeMeta]] is a REAL header decoder: it walks chunk/box
  * structure, checks CRCs, and reads width/height/duration out of
  * the bytes. Only [[extractFeatures]]' content featurization remains
  * a stand-in (no ML codecs in this container) — its byte-histogram
  * is deterministic and keeps the production signature (bytes in,
  * fixed-width float vector out).
  *
  * Scale notes: payload bytes live in their own column so column
  * pruning keeps metadata-only queries off the heavy bytes; frame
  * sampling explodes a Generator (no driver collect); feature vectors
  * are fixed-width `array<float>` ready for [[Similarity]] ANN.
  */
object Multimodal {

  val modalities = Seq("image", "audio", "video")

  /** Synthesize a deterministic multimodal table from `documents`:
    * payload = a valid container (doc_id mod 3 picks PNG/WAV/MP4)
    * whose header encodes dimensions/duration derived from doc_id and
    * whose body carries the text bytes. `meta` keeps the generator's
    * intended values so tests can assert decode == intent.
    */
  def synthesize(spark: SparkSession, sfDir: String): DataFrame = {
    val build = udf { (docId: Long, text: String) =>
      val w = (docId % 4 * 160 + 320).toInt
      val h = (docId % 3 * 120 + 240).toInt
      val durS = (docId % 30 + 1).toInt
      val body = text.getBytes(UTF_8)
      (docId % 3) match {
        case 0 => MediaHeaders.buildPng(w, h, body)
        case 1 => MediaHeaders.buildWav(byteRate = 100, dataSize = durS * 100, fill = body)
        case _ => MediaHeaders.buildMp4(w, h, durS, body)
      }
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(
      col("doc_id"),
      element_at(typedLit(modalities), (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
        .as("modality"),
      build(col("doc_id"), col("text")).as("payload"),
      struct(
        (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
        (pmod(col("doc_id"), lit(3)) * 120 + 240).cast("int").as("height"),
        (pmod(col("doc_id"), lit(30)) + 1).cast("int").as("duration_s"))
        .as("meta"))
  }

  private val decodeUdf = udf { bytes: Array[Byte] =>
    MediaHeaders.parse(bytes).map { m =>
      val modality = m.format match {
        case "png" => "image"
        case "wav" => "audio"
        case _ => "video"
      }
      (modality, m.width, m.height, m.durationS)
    }
  }

  /** REAL header decode: parse the payload container and attach
    * `modality` (from the sniffed format), `width`, `height`,
    * `duration_s` — null where the format doesn't carry the field
    * (PNG has no duration, WAV no dimensions) or the payload doesn't
    * parse.
    */
  def decodeMeta(mm: DataFrame): DataFrame =
    mm.withColumn("_dec", decodeUdf(col("payload")))
      .withColumn("decoded_modality", col("_dec._1"))
      .withColumn("width", col("_dec._2"))
      .withColumn("height", col("_dec._3"))
      .withColumn("duration_s", col("_dec._4"))
      .drop("_dec")

  /** Content featurization — STUB (deterministic byte-histogram
    * moments; a production build swaps in a codec call behind the
    * same bytes-in/vector-out signature).
    */
  val featureStub: Array[Byte] => Array[Float] = { bytes =>
    val n = math.max(bytes.length, 1)
    val out = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      out(i % 8) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    var j = 0
    while (j < 8) { out(j) = out(j) / n * 8.0f; j += 1 }
    out
  }

  /** Decode payloads into feature vectors (stubbed, see above). */
  def extractFeatures(mm: DataFrame): DataFrame = {
    val decode = udf(featureStub)
    mm.withColumn("features", decode(col("payload")))
  }

  /** Frame sampling for video rows: one row per sampled frame index,
    * every `stepS` seconds of the DECODED duration. Generator-based —
    * scales with output rows, not driver memory.
    */
  def sampleFrames(mm: DataFrame, stepS: Int): DataFrame =
    decodeMeta(mm)
      .filter(col("decoded_modality") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), col("duration_s") - 1, lit(stepS)))
          .as("frame_ts_s"))

  /** Metadata projection driven by the DECODED header (byte_len from
    * the payload itself). Payload-column pruning does NOT apply here
    * by definition — see [[metaOnlyStored]] for the pruned path over
    * a table with persisted metadata.
    */
  def metaOnly(mm: DataFrame): DataFrame =
    decodeMeta(mm).select(
      col("doc_id"), col("decoded_modality").as("modality"),
      length(col("payload")).as("byte_len"),
      col("width"), col("height"), col("duration_s"))

  /** Metadata-only projection over STORED metadata — prunes the
    * payload column at the scan (asserted in tests): the point of
    * keeping bytes in their own column.
    */
  def metaOnlyStored(mm: DataFrame): DataFrame =
    mm.select(col("doc_id"), col("modality"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.duration_s").as("duration_s"))
}
