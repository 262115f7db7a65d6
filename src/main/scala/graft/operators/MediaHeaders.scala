package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.CRC32

/** Real byte-level media-container codecs for the multimodal column
  * plumbing: minimal-but-valid PNG / WAV(RIFF) / MP4(ISO-BMFF)
  * builders (deterministic fixture source — this sandbox ships no
  * media libraries, so the engine synthesizes its own containers) and
  * the matching header PARSERS, which are the production decode seam:
  * they walk actual chunk/box structure, verify magic numbers and the
  * PNG IHDR CRC, and extract width/height/duration from the bytes —
  * not from any side-channel metadata.
  *
  * Formats implemented from their public specifications: PNG (RFC
  * 2083 §3: signature + length/type/data/CRC chunks), canonical
  * 44-byte PCM WAV (RIFF chunks, little-endian), and ISO base media
  * boxes (size/type framing, `mvhd` timescale+duration, `tkhd`
  * 16.16-fixed width/height).
  */
object MediaHeaders {

  final case class MediaMeta(
      format: String, // "png" | "wav" | "mp4"
      width: Option[Int],
      height: Option[Int],
      durationS: Option[Int])

  // ------------------------------------------------------------------
  // byte helpers
  // ------------------------------------------------------------------

  private def be32(v: Int): Array[Byte] = Array(
    ((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
    ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >>> 8) & 0xFF).toByte,
    ((v >>> 16) & 0xFF).toByte, ((v >>> 24) & 0xFF).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >>> 8) & 0xFF).toByte)

  private def ascii(s: String): Array[Byte] = s.getBytes(US_ASCII)

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    if (off + 4 > b.length) ""
    else new String(b, off, 4, US_ASCII)

  private val pngSig: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  // ------------------------------------------------------------------
  // builders
  // ------------------------------------------------------------------

  private def pngChunk(chunkType: String, payload: Array[Byte]): Array[Byte] = {
    val crc = new CRC32()
    val t = ascii(chunkType)
    crc.update(t); crc.update(payload)
    be32(payload.length) ++ t ++ payload ++ be32(crc.getValue.toInt)
  }

  /** Valid PNG: signature, IHDR(w, h, 8-bit truecolor), one IDAT
    * carrying `body` verbatim (not zlib — headers are the contract
    * here), IEND. Total size = 57 + body.length.
    */
  def buildPng(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val ihdr = be32(width) ++ be32(height) ++ Array[Byte](8, 2, 0, 0, 0)
    pngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", body) ++
      pngChunk("IEND", Array.empty)
  }

  /** Canonical 44-byte-header PCM WAV (8-bit mono, blockAlign 1):
    * duration = dataSize / byteRate by the format's own math. `fill`
    * is cycled to fill the data chunk. Total size = 44 + dataSize.
    */
  def buildWav(byteRate: Int, dataSize: Int, fill: Array[Byte]): Array[Byte] = {
    require(byteRate > 0 && dataSize >= 0 && dataSize % 2 == 0)
    val data = new Array[Byte](dataSize)
    if (fill.nonEmpty) {
      var i = 0
      while (i < dataSize) { data(i) = fill(i % fill.length); i += 1 }
    }
    ascii("RIFF") ++ le32(36 + dataSize) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(byteRate) ++ le32(byteRate) ++ le16(1) ++ le16(8) ++
      ascii("data") ++ le32(dataSize) ++ data
  }

  /** Minimal ISO-BMFF: ftyp + moov(mvhd: timescale 1000, duration
    * durationS*1000; trak/tkhd: 16.16-fixed width/height) + mdat
    * carrying `body`. Total size = 240 + body.length.
    */
  def buildMp4(width: Int, height: Int, durationS: Int, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(be32(16)); out.write(ascii("ftyp"))
    out.write(ascii("isom")); out.write(be32(0))
    // mvhd v0: 108 bytes
    val mvhd = new ByteArrayOutputStream()
    mvhd.write(be32(108)); mvhd.write(ascii("mvhd"))
    mvhd.write(be32(0)) // version + flags
    mvhd.write(be32(0)); mvhd.write(be32(0)) // ctime, mtime
    mvhd.write(be32(1000)) // timescale
    mvhd.write(be32(durationS * 1000)) // duration
    mvhd.write(be32(0x00010000)) // rate 1.0 (16.16)
    mvhd.write(Array[Byte](0x01, 0x00, 0x00, 0x00)) // volume 1.0 (8.8) + reserved
    mvhd.write(new Array[Byte](8)) // reserved
    mvhd.write(new Array[Byte](36)) // matrix
    mvhd.write(new Array[Byte](24)) // predefined
    mvhd.write(be32(2)) // next track id
    val mvhdB = mvhd.toByteArray
    require(mvhdB.length == 108, s"mvhd ${mvhdB.length}")
    // tkhd v0: 92 bytes, width/height as 16.16 fixed at offsets 84/88
    val tkhd = new ByteArrayOutputStream()
    tkhd.write(be32(92)); tkhd.write(ascii("tkhd"))
    tkhd.write(be32(7)) // version 0, flags: enabled|in_movie|in_preview
    tkhd.write(be32(0)); tkhd.write(be32(0)) // ctime, mtime
    tkhd.write(be32(1)) // track id
    tkhd.write(be32(0)) // reserved
    tkhd.write(be32(durationS * 1000)) // duration
    tkhd.write(new Array[Byte](8)) // reserved
    tkhd.write(new Array[Byte](8)) // layer, alt group, volume, reserved
    tkhd.write(new Array[Byte](36)) // matrix
    tkhd.write(be32(width << 16)); tkhd.write(be32(height << 16))
    val tkhdB = tkhd.toByteArray
    require(tkhdB.length == 92, s"tkhd ${tkhdB.length}")
    val trak = be32(8 + tkhdB.length) ++ ascii("trak") ++ tkhdB
    val moovPayload = mvhdB ++ trak
    out.write(be32(8 + moovPayload.length)); out.write(ascii("moov"))
    out.write(moovPayload)
    out.write(be32(8 + body.length)); out.write(ascii("mdat")); out.write(body)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // parsers — the decode seam
  // ------------------------------------------------------------------

  /** Sniff the container by magic and parse its header. None on
    * anything truncated, corrupt (PNG IHDR CRC is verified), or
    * unrecognized. All offset arithmetic on untrusted sizes is done
    * in Long (a crafted chunk size near Int.MaxValue must not wrap to
    * a negative offset that passes the bounds guards); the Try is a
    * second line of defense so corrupt bytes can NEVER crash a task —
    * the documented contract is None, not an executor exception.
    */
  def parse(bytes: Array[Byte]): Option[MediaMeta] =
    scala.util.Try(parseSniffed(bytes)).toOption.flatten

  private def parseSniffed(bytes: Array[Byte]): Option[MediaMeta] =
    if (bytes.length >= 8 && bytes.take(8).sameElements(pngSig)) parsePng(bytes)
    else if (tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE") parseWav(bytes)
    else if (tag(bytes, 4) == "ftyp") parseMp4(bytes)
    else None

  /** Extract the CONTENT payload from the container — the image data
    * (first IDAT chunk, CRC-verified), audio samples (RIFF data
    * chunk), or video essence (mdat box). The decode seam content
    * featurization builds on; same Long-math bounds discipline and
    * None-on-corrupt contract as [[parse]].
    */
  def extractBody(bytes: Array[Byte]): Option[Array[Byte]] =
    scala.util.Try(extractBodySniffed(bytes)).toOption.flatten

  private def extractBodySniffed(b: Array[Byte]): Option[Array[Byte]] =
    if (b.length >= 8 && b.take(8).sameElements(pngSig)) pngChunkPayload(b, "IDAT")
    else if (tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE") riffChunkPayload(b, "data")
    else if (tag(b, 4) == "ftyp") mp4BoxPayload(b, "mdat")
    else None

  private def pngChunkPayload(b: Array[Byte], want: String): Option[Array[Byte]] = {
    var off = 8
    while (off + 8 <= b.length) {
      val len = readBe32(b, off)
      val typ = tag(b, off + 4)
      if (len < 0 || off + 12L + len > b.length) return None
      if (typ == want) {
        val crc = new CRC32()
        crc.update(b, off + 4, 4 + len)
        if (crc.getValue.toInt != readBe32(b, off + 8 + len)) return None
        return Some(java.util.Arrays.copyOfRange(b, off + 8, off + 8 + len))
      }
      off += 12 + len
    }
    None
  }

  private def riffChunkPayload(b: Array[Byte], want: String): Option[Array[Byte]] = {
    var off = 12L
    while (off + 8 <= b.length) {
      val o = off.toInt
      val id = tag(b, o)
      val size = readLe32(b, o + 4)
      if (size < 0) return None
      if (id == want) {
        if (o + 8L + size > b.length) return None
        return Some(java.util.Arrays.copyOfRange(b, o + 8, o + 8 + size))
      }
      off += 8L + size + (size & 1)
    }
    None
  }

  private def mp4BoxPayload(b: Array[Byte], want: String): Option[Array[Byte]] = {
    var off = 0
    while (off + 8 <= b.length) {
      val size = readBe32(b, off)
      val typ = tag(b, off + 4)
      if (size < 8 || off.toLong + size > b.length) return None
      if (typ == want)
        return Some(java.util.Arrays.copyOfRange(b, off + 8, off + size))
      off += size
    }
    None
  }

  private def parsePng(b: Array[Byte]): Option[MediaMeta] = {
    var off = 8
    while (off + 8 <= b.length) {
      val len = readBe32(b, off)
      val typ = tag(b, off + 4)
      if (len < 0 || off + 12L + len > b.length) return None
      if (typ == "IHDR") {
        if (len != 13) return None
        val crc = new CRC32()
        crc.update(b, off + 4, 4 + len)
        if (crc.getValue.toInt != readBe32(b, off + 8 + len)) return None
        return Some(MediaMeta("png",
          Some(readBe32(b, off + 8)), Some(readBe32(b, off + 12)), None))
      }
      off += 12 + len
    }
    None
  }

  private def parseWav(b: Array[Byte]): Option[MediaMeta] = {
    var off = 12L // Long: size near Int.MaxValue must not wrap the cursor
    var byteRate = 0
    var dataSize = -1
    while (off + 8 <= b.length) {
      val o = off.toInt // off + 8 <= length ⇒ fits in Int
      val id = tag(b, o)
      val size = readLe32(b, o + 4)
      if (size < 0) return None
      if (id == "fmt " && size >= 16) {
        if (o + 8L + 12 + 4 > b.length) return None
        byteRate = readLe32(b, o + 8 + 8)
      }
      if (id == "data") dataSize = size
      off += 8L + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (byteRate > 0 && dataSize >= 0)
      Some(MediaMeta("wav", None, None, Some(dataSize / byteRate)))
    else None
  }

  private def parseMp4(b: Array[Byte]): Option[MediaMeta] = {
    var width, height, duration = Option.empty[Int]
    def walk(from: Int, until: Int, depth: Int): Unit = {
      var off = from
      while (off + 8 <= until) {
        val size = readBe32(b, off)
        val typ = tag(b, off + 4)
        if (size < 8 || off.toLong + size > until) return
        typ match {
          case "moov" | "trak" if depth < 4 => walk(off + 8, off + size, depth + 1)
          case "mvhd" if size >= 32 =>
            val timescale = readBe32(b, off + 20)
            if (timescale > 0) duration = Some(readBe32(b, off + 24) / timescale)
          case "tkhd" if size >= 92 =>
            width = Some(readBe32(b, off + 84) >>> 16)
            height = Some(readBe32(b, off + 88) >>> 16)
          case _ =>
        }
        off += size
      }
    }
    walk(0, b.length, 0)
    if (duration.isDefined || width.isDefined)
      Some(MediaMeta("mp4", width, height, duration))
    else None
  }
}
