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

  /** Integral content statistics of a DECODED payload body: length,
    * 8-bin byte histogram (bin = byte >>> 5), and the count of
    * adjacent unequal bytes (the byte-domain zero-crossing analog —
    * for our 8-bit PCM WAV it literally counts sample transitions).
    * Integral so the feature family is oracle-checkable.
    */
  def contentStats(body: Array[Byte]): (Long, Array[Long], Long) = {
    val hist = new Array[Long](8)
    var trans = 0L
    var i = 0
    while (i < body.length) {
      hist((body(i) & 0xFF) >>> 5) += 1
      if (i > 0 && body(i) != body(i - 1)) trans += 1
      i += 1
    }
    (body.length.toLong, hist, trans)
  }

  /** Content featurization — REAL decode path: extract the container's
    * content payload ([[MediaHeaders.extractBody]]: IDAT / data chunk /
    * mdat, CRC-checked where the format has one), then a fixed-width
    * descriptor of the actual content bytes — normalized 8-bin
    * histogram, transition rate, log-length. Deterministic; null on
    * corrupt payloads. A production build swaps a learned encoder
    * behind the same bytes-in/vector-out signature.
    */
  val contentFeatures: Array[Byte] => Option[Array[Float]] = { bytes =>
    MediaHeaders.extractBody(bytes).map { body =>
      val (n, hist, trans) = contentStats(body)
      val d = math.max(n, 1L).toFloat
      val out = new Array[Float](10)
      var j = 0
      while (j < 8) { out(j) = hist(j) / d; j += 1 }
      out(8) = trans / d
      out(9) = math.log1p(n.toDouble).toFloat
      out
    }
  }

  /** Decode payloads into feature vectors (real content decode; see
    * [[contentFeatures]]). Output is fixed-width `array<float>` —
    * directly usable by the [[Similarity]] ANN operators.
    */
  def extractFeatures(mm: DataFrame): DataFrame = {
    val decode = udf(contentFeatures)
    mm.withColumn("features", decode(col("payload")))
  }

  private val statsUdf = udf { bytes: Array[Byte] =>
    MediaHeaders.extractBody(bytes).map { body =>
      val (n, hist, trans) = contentStats(body)
      (n, hist(0), hist(1), hist(2), hist(3), trans)
    }
  }

  /** Integral content stats per payload (ASCII content occupies bins
    * 0-3; higher bins stay zero and are elided). The oracle seam:
    * for PNG/MP4 the generator's body IS the document text bytes, so
    * DuckDB recomputes every column from `text` — a full content
    * round-trip check through real container encode + decode.
    */
  def contentStatsOf(mm: DataFrame): DataFrame =
    mm.withColumn("_st", statsUdf(col("payload")))
      .select(col("doc_id"),
        col("_st._1").as("body_len"),
        col("_st._2").as("hist_0"), col("_st._3").as("hist_1"),
        col("_st._4").as("hist_2"), col("_st._5").as("hist_3"),
        col("_st._6").as("transitions"))

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
