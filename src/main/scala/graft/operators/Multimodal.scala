package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction / frame sampling run as narrow per-row transforms.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is
  * real and tested; the actual media decode is STUBBED (this
  * container ships no image/audio codecs) behind
  * [[Multimodal.decodeStub]], a deterministic fake that a production
  * build swaps for a real decoder (on PySpark: `mapInPandas`; here: a
  * vectorizable Scala UDF over the bytes).
  *
  * Scale notes: payload bytes live in their own column so column
  * pruning keeps metadata-only queries off the heavy bytes; the
  * synthetic frame-sampling explode is a Generator (no driver
  * collect); feature vectors are fixed-width `array<float>` ready for
  * [[Similarity]] ANN.
  */
object Multimodal {

  val modalities = Seq("image", "audio", "video")

  /** Synthesize a deterministic multimodal table from `documents`:
    * payload = UTF-8 bytes of the text (stand-in blob), modality and
    * fake dimensions derived from doc_id arithmetic (no RNG state).
    */
  def synthesize(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(
      col("doc_id"),
      element_at(typedLit(modalities), (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
        .as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
        (pmod(col("doc_id"), lit(3)) * 120 + 240).cast("int").as("height"),
        (pmod(col("doc_id"), lit(30)) + 1).cast("int").as("duration_s"))
        .as("meta"))
  }

  /** STUB media decode: deterministic 8-dim feature vector from the
    * payload bytes (byte-histogram moments). A real deployment
    * replaces ONLY this function with a codec call; the signature —
    * bytes in, fixed-width float vector out — is the production one.
    */
  val decodeStub: Array[Byte] => Array[Float] = { bytes =>
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
    val decode = udf(decodeStub)
    mm.withColumn("features", decode(col("payload")))
  }

  /** Frame sampling for video rows: one row per sampled frame index,
    * every `stepS` seconds of the fake duration. Generator-based —
    * scales with output rows, not driver memory.
    */
  def sampleFrames(mm: DataFrame, stepS: Int): DataFrame =
    mm.filter(col("modality") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), col("meta.duration_s") - 1, lit(stepS)))
          .as("frame_ts_s"))

  /** Metadata-only projection — must prune the payload column at the
    * scan (asserted in tests): the whole point of the column layout.
    */
  def metaOnly(mm: DataFrame): DataFrame =
    mm.select(col("doc_id"), col("modality"),
      length(col("payload")).as("byte_len"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.duration_s").as("duration_s"))
}
