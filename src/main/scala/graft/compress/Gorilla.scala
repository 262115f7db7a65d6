package graft.compress

import scala.collection.mutable.ArrayBuffer

/** Bit-level writer over a growable byte array (MSB-first). */
final class BitWriter {
  private var buf = new Array[Byte](64)
  private var bitPos = 0 // absolute bit position

  private def ensure(nBits: Int): Unit = {
    val needBytes = (bitPos + nBits + 7) >>> 3
    if (needBytes > buf.length) {
      val n = new Array[Byte](math.max(buf.length * 2, needBytes))
      System.arraycopy(buf, 0, n, 0, buf.length)
      buf = n
    }
  }

  def writeBit(b: Int): Unit = {
    ensure(1)
    if ((b & 1) != 0) buf((bitPos >>> 3)) = (buf(bitPos >>> 3) | (0x80 >>> (bitPos & 7))).toByte
    bitPos += 1
  }

  /** Write the low `n` bits of `v`, MSB first. n in [0,64]. */
  def writeBits(v: Long, n: Int): Unit = {
    ensure(n)
    var i = n - 1
    while (i >= 0) {
      writeBit(((v >>> i) & 1L).toInt)
      i -= 1
    }
  }

  def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitPos + 7) >>> 3)
}

/** Bit-level reader matching [[BitWriter]]'s layout. */
final class BitReader(bytes: Array[Byte], startBit: Int = 0) {
  private var bitPos = startBit

  def readBit(): Int = {
    val b = (bytes(bitPos >>> 3) >>> (7 - (bitPos & 7))) & 1
    bitPos += 1
    b
  }

  /** Read `n` bits MSB-first into the low bits of a Long (unsigned). */
  def readBits(n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 1) | readBit(); i += 1 }
    v
  }
}

/** Gorilla-style chunk codec: delta-of-delta timestamps + XOR-compressed
  * double values (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory
  * Time Series Database", VLDB 2015, §4.1).
  *
  * Layout: [int32 count][ts0:64][v0:64][per-point (dod, xor) streams
  * interleaved]. Point 1's "delta-of-delta" is its raw delta (prev delta
  * initialized to 0), so arbitrary first intervals round-trip exactly.
  *
  * Timestamp dod buckets (value ranges, MSB-first control codes):
  *   '0'                      dod == 0
  *   '10'    + 7  bits        [-63, 64]
  *   '110'   + 9  bits        [-255, 256]
  *   '1110'  + 12 bits        [-2047, 2048]
  *   '11110' + 32 bits        fits in int32
  *   '11111' + 64 bits        anything else (micros-scale jitter)
  *
  * Value XOR (vs previous value's raw bits):
  *   '0'   identical
  *   '10'  meaningful bits inside previous window → prevMeaningful bits
  *   '11'  6-bit leading-zero count + 6-bit (meaningful-1) + bits
  *
  * Encode/decode are bit-exact inverses for any finite doubles
  * (NaN payloads round-trip too since we work on raw bits).
  */
object Gorilla {

  def encode(points: Seq[(Long, Double)]): Array[Byte] = {
    val w = new BitWriter
    w.writeBits(points.length.toLong, 32)
    if (points.isEmpty) return w.toBytes

    var prevTs = points.head._1
    var prevBits = java.lang.Double.doubleToRawLongBits(points.head._2)
    w.writeBits(prevTs, 64)
    w.writeBits(prevBits, 64)

    var prevDelta = 0L
    var prevLeading = -1
    var prevMeaningful = 0

    var i = 1
    while (i < points.length) {
      val (ts, v) = points(i)
      // --- timestamp ---
      val delta = ts - prevTs
      val dod = delta - prevDelta
      if (dod == 0L) w.writeBit(0)
      else if (dod >= -63 && dod <= 64) { w.writeBits(0x2L, 2); w.writeBits(dod + 63, 7) }
      else if (dod >= -255 && dod <= 256) { w.writeBits(0x6L, 3); w.writeBits(dod + 255, 9) }
      else if (dod >= -2047 && dod <= 2048) { w.writeBits(0xEL, 4); w.writeBits(dod + 2047, 12) }
      else if (dod >= Int.MinValue && dod <= Int.MaxValue) { w.writeBits(0x1EL, 5); w.writeBits(dod & 0xFFFFFFFFL, 32) }
      else { w.writeBits(0x1FL, 5); w.writeBits(dod, 64) }
      prevDelta = delta
      prevTs = ts

      // --- value ---
      val bits = java.lang.Double.doubleToRawLongBits(v)
      val xor = bits ^ prevBits
      if (xor == 0L) w.writeBit(0)
      else {
        val leading = java.lang.Long.numberOfLeadingZeros(xor)
        val trailing = java.lang.Long.numberOfTrailingZeros(xor)
        val meaningful = 64 - leading - trailing
        val prevTrailing = if (prevLeading >= 0) 64 - prevLeading - prevMeaningful else 0
        if (prevLeading >= 0 && leading >= prevLeading && trailing >= prevTrailing) {
          w.writeBits(0x2L, 2)
          w.writeBits(xor >>> prevTrailing, prevMeaningful)
        } else {
          w.writeBits(0x3L, 2)
          val lead = math.min(leading, 63)
          w.writeBits(lead.toLong, 6)
          w.writeBits((meaningful - 1).toLong, 6)
          w.writeBits(xor >>> trailing, meaningful)
          prevLeading = lead
          prevMeaningful = meaningful
        }
      }
      prevBits = bits
      i += 1
    }
    w.toBytes
  }

  def decode(bytes: Array[Byte]): IndexedSeq[(Long, Double)] = {
    val r = new BitReader(bytes)
    val n = r.readBits(32).toInt
    val out = new ArrayBuffer[(Long, Double)](n)
    if (n == 0) return out.toIndexedSeq

    var ts = r.readBits(64)
    var bits = r.readBits(64)
    out += ((ts, java.lang.Double.longBitsToDouble(bits)))

    var delta = 0L
    var prevLeading = -1
    var prevMeaningful = 0

    var i = 1
    while (i < n) {
      // --- timestamp ---
      val dod: Long =
        if (r.readBit() == 0) 0L
        else if (r.readBit() == 0) r.readBits(7) - 63
        else if (r.readBit() == 0) r.readBits(9) - 255
        else if (r.readBit() == 0) r.readBits(12) - 2047
        else if (r.readBit() == 0) { val u = r.readBits(32); (u << 32) >> 32 } // sign-extend
        else r.readBits(64)
      delta += dod
      ts += delta

      // --- value ---
      if (r.readBit() == 1) {
        if (r.readBit() == 0) {
          val prevTrailing = 64 - prevLeading - prevMeaningful
          val m = r.readBits(prevMeaningful)
          bits ^= (m << prevTrailing)
        } else {
          val lead = r.readBits(6).toInt
          val meaningful = r.readBits(6).toInt + 1
          val trailing = 64 - lead - meaningful
          val m = r.readBits(meaningful)
          bits ^= (m << trailing)
          prevLeading = lead
          prevMeaningful = meaningful
        }
      }
      out += ((ts, java.lang.Double.longBitsToDouble(bits)))
      i += 1
    }
    out.toIndexedSeq
  }
}
