package graft.compress

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Spark surface of the Gorilla chunk codec (SURVEY.md §2.9).
  *
  * `chunk_encode(ts_micros, v)` — a typed [[Aggregator]] UDAF collecting
  * the group's points and emitting one compressed binary chunk. Points
  * are sorted by (ts, value-bits) inside `finish`, so the chunk is
  * deterministic regardless of partitioning / arrival order — a
  * requirement for idempotent re-ingest (exactly-once rollup).
  *
  * `chunk_decode(bin)` — scalar UDF → `array<struct<ts_micros,v>>`,
  * explodable with the built-in Generator; no custom Catalyst class
  * needed.
  */
object ChunkCodec {

  final case class Pt(ts: Long, v: Double)

  /** Aggregator: points → Gorilla chunk. Buffer is kryo-encoded. */
  object ChunkAgg extends Aggregator[Pt, ArrayBuffer[Pt], Array[Byte]] {
    def zero: ArrayBuffer[Pt] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[Pt], a: Pt): ArrayBuffer[Pt] = { b += a; b }
    def merge(b1: ArrayBuffer[Pt], b2: ArrayBuffer[Pt]): ArrayBuffer[Pt] = { b1 ++= b2; b1 }
    def finish(b: ArrayBuffer[Pt]): Array[Byte] = {
      val sorted = b.sortBy(p => (p.ts, java.lang.Double.doubleToRawLongBits(p.v)))
      Gorilla.encode(sorted.map(p => (p.ts, p.v)).toSeq)
    }
    def bufferEncoder: Encoder[ArrayBuffer[Pt]] = Encoders.kryo[ArrayBuffer[Pt]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private val decodeFn: Array[Byte] => Seq[Pt] =
    bytes => Gorilla.decode(bytes).map { case (t, v) => Pt(t, v) }

  /** Register `chunk_encode` / `chunk_decode` on the session. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("chunk_encode", udaf(ChunkAgg))
    spark.udf.register("chunk_decode", udf(decodeFn))
  }

  /** Column helper: aggregate expression encoding (tsMicros, v) points. */
  def chunkEncode(tsMicros: Column, v: Column): Column =
    udaf(ChunkAgg).apply(tsMicros, v)

  def chunkDecode(bin: Column): Column = udf(decodeFn).apply(bin)
}
