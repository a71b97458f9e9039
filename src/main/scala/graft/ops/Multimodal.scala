package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * processed batch-wise in typed mapPartitions (the Scala analogue of
  * mapInPandas batches).
  *
  * The image decode is a REAL pure-JVM header codec: it sniffs the magic
  * bytes and parses true dimensions from PNG IHDR, JPEG SOFn, GIF logical
  * screen, and BMP DIB headers (no external libraries, no AWT). Payloads
  * that are not a recognized image container (e.g. the documents table's
  * text bytes, used by the q21 oracle) fall back to a deterministic
  * derivation so the plumbing stays pinned by an exact DuckDB twin.
  * Full pixel decompression (inflate/DCT) is deliberately out of scope —
  * features come from the raw byte histogram, which is real and cheap.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class ImgFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      format: String,
      hist: Array[Float]) // byte-value histogram features

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** Parse (width, height, format) from a real image container header, or
    * None if the payload is not a recognized image. */
  def decodeHeader(b: Array[Byte]): Option[(Int, Int, String)] = {
    val n = b.length
    // PNG: 89 50 4E 47 0D 0A 1A 0A, then len+"IHDR", width/height BE32 at 16
    if (n >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' &&
        b(15) == 'R')
      Some((be32(b, 16), be32(b, 20), "png"))
    // GIF87a / GIF89a: logical screen w/h LE16 at 6/8
    else if (n >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      Some((le16(b, 6), le16(b, 8), "gif"))
    // BMP: "BM", DIB header size at 14; BITMAPCOREHEADER uses LE16 dims,
    // later headers signed LE32 (height may be negative = top-down)
    else if (n >= 26 && b(0) == 'B' && b(1) == 'M') {
      val dib = le32(b, 14)
      if (dib == 12) Some((le16(b, 18), le16(b, 20), "bmp"))
      else if (n >= 14 + dib && dib >= 40)
        Some((le32(b, 18), math.abs(le32(b, 22)), "bmp"))
      else None
    }
    // JPEG: FF D8, walk marker segments to the first SOFn frame header
    else if (n >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 9 < n && u8(b, i) == 0xff) {
        val m = u8(b, i + 1)
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // bare
        else {
          val segLen = be16(b, i + 2)
          if (segLen < 2) return None
          // SOF0-15 except DHT(C4)/JPG(C8)/DAC(CC): height BE16 at +5, width +7
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
            return Some((be16(b, i + 7), be16(b, i + 5), "jpeg"))
          i += 2 + segLen
        }
      }
      None
    } else None
  }

  /** Parse (channels, sampleRate, bitsPerSample, durationMs) from a real
    * RIFF/WAVE header (chunk walk to "fmt " + "data"), or None. */
  def decodeWavHeader(b: Array[Byte])
      : Option[(Int, Int, Int, Long)] = {
    val n = b.length
    if (n < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var channels = -1; var rate = -1; var bits = -1; var dataLen = -1L
    while (i + 8 <= n && (channels < 0 || dataLen < 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = le32(b, i + 4).toLong & 0xffffffffL
      if (id == "fmt " && i + 24 <= n) {
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
        bits = le16(b, i + 22)
      } else if (id == "data") dataLen = len
      i += 8 + len.toInt + (len.toInt & 1) // chunks are 2-byte aligned
    }
    if (channels <= 0 || rate <= 0 || bits <= 0) None
    else {
      val bytesPerSec = rate.toLong * channels * (bits / 8)
      val durMs = if (dataLen >= 0 && bytesPerSec > 0)
        dataLen * 1000L / bytesPerSec else -1L
      Some((channels, rate, bits, durMs))
    }
  }

  /** Parse (timescale, durationMs) from a real ISO-BMFF (MP4) header:
    * top-level box walk to moov, then moov children to mvhd (v0/v1). */
  def decodeMp4Header(b: Array[Byte]): Option[(Long, Long)] = {
    val n = b.length
    def boxAt(i: Int): Option[(String, Long, Int)] = { // (type, size, hdr)
      if (i + 8 > n) return None
      var size = be32(b, i).toLong & 0xffffffffL
      var hdr = 8
      if (size == 1) {
        if (i + 16 > n) return None
        size = (be32(b, i + 8).toLong << 32) |
          (be32(b, i + 12).toLong & 0xffffffffL)
        hdr = 16
      } else if (size == 0) size = (n - i).toLong
      if (size < hdr) return None
      Some((new String(b, i + 4, 4, "US-ASCII"), size, hdr))
    }
    def findBox(from: Int, until: Int, tpe: String): Option[(Int, Long, Int)] = {
      var i = from
      while (i < until) {
        boxAt(i) match {
          case Some((t, sz, hdr)) =>
            if (t == tpe) return Some((i, sz, hdr))
            if (sz <= 0 || i + sz > until) return None
            i += sz.toInt
          case None => return None
        }
      }
      None
    }
    for {
      (mi, msz, mh) <- findBox(0, n, "moov")
      (vi, _, vh) <- findBox(mi + mh, math.min(n, mi + msz.toInt), "mvhd")
      p = vi + vh
      if p + 4 <= n
      version = u8(b, p)
      res <- version match {
        case 0 if p + 20 <= n =>
          val ts = be32(b, p + 12).toLong & 0xffffffffL
          val dur = be32(b, p + 16).toLong & 0xffffffffL
          if (ts > 0) Some((ts, dur * 1000L / ts)) else None
        case 1 if p + 32 <= n =>
          val ts = be32(b, p + 20).toLong & 0xffffffffL
          val dur = (be32(b, p + 24).toLong << 32) |
            (be32(b, p + 28).toLong & 0xffffffffL)
          if (ts > 0) Some((ts, dur * 1000L / ts)) else None
        case _ => None
      }
    } yield res
  }

  /** Deterministic fallback for non-image payloads (pins the oracle). */
  def decodeFallback(payload: Array[Byte]): (Int, Int, String) = {
    val n = payload.length
    (16 + n % 240, 16 + (n * 7) % 180,
      if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp")
  }

  /** Full decode: real header parse first, deterministic fallback second. */
  def decode(payload: Array[Byte]): (Int, Int, String) =
    decodeHeader(payload).getOrElse(decodeFallback(payload))

  /** Normalized byte-value histogram over the raw payload. */
  def byteHistogram(payload: Array[Byte], bins: Int = 8): Array[Float] = {
    val h = new Array[Float](bins)
    var i = 0
    while (i < payload.length) {
      h((payload(i) & 0xff) * bins / 256) += 1f
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < bins) { h(j) /= payload.length; j += 1 }
    }
    h
  }

  /** media table -> image features, batch-iterated per partition. */
  def imageFeatures(spark: SparkSession, media: Dataset[MediaRow])
      : Dataset[ImgFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h, f) = decode(m.payload)
        ImgFeatures(m.doc_id, m.payload.length, w, h, f,
          byteHistogram(m.payload))
      }
    }
  }

  final case class AvFeatures(
      doc_id: Long, n_bytes: Int, kind: String,
      width: Int, height: Int, // image kinds; -1 otherwise
      channels: Int, sample_rate: Int, bits: Int, // wav; -1 otherwise
      duration_ms: Long) // wav/mp4; -1 otherwise

  /** Unified media sniff across all real header codecs: image containers,
    * RIFF/WAVE audio, ISO-BMFF video; "opaque" otherwise. Batch-iterated
    * per partition like [[imageFeatures]]. */
  def mediaFeatures(spark: SparkSession, media: Dataset[MediaRow])
      : Dataset[AvFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val b = m.payload
        decodeHeader(b) match {
          case Some((w, h, f)) =>
            AvFeatures(m.doc_id, b.length, f, w, h, -1, -1, -1, -1L)
          case None => decodeWavHeader(b) match {
            case Some((ch, rate, bits, dur)) =>
              AvFeatures(m.doc_id, b.length, "wav", -1, -1, ch, rate, bits, dur)
            case None => decodeMp4Header(b) match {
              case Some((_, durMs)) =>
                AvFeatures(m.doc_id, b.length, "mp4", -1, -1, -1, -1, -1, durMs)
              case None =>
                AvFeatures(m.doc_id, b.length, "opaque", -1, -1, -1, -1, -1, -1L)
            }
          }
        }
      }
    }
  }

  /** "video" frame sampling stub: chunk the payload into frame-sized
    * slices and keep every k-th — real chunking, fake frames. */
  def frameSample(spark: SparkSession, media: Dataset[MediaRow],
      frameBytes: Int, every: Int): DataFrame = {
    import spark.implicits._
    media.flatMap { m =>
      val nFrames = math.max(1, m.payload.length / math.max(1, frameBytes))
      (0 until nFrames by every).map { f =>
        (m.doc_id, f, math.min(frameBytes, m.payload.length - f * frameBytes))
      }
    }.toDF("doc_id", "frame", "frame_bytes")
  }

  /** Harness query: documents text bytes as the opaque payload; scalar
    * stub-decode outputs have an exact DuckDB twin. */
  def q21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = graft.Tables.parquet(s, s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
    imageFeatures(s, media)
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        col("format"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_media_decode" -> (q21 _))

  val oracles: Map[String, String] = Map(
    "q21_media_decode" ->
      """SELECT doc_id,
        | strlen(text) AS n_bytes,
        | 16 + strlen(text) % 240 AS width,
        | 16 + (strlen(text) * 7) % 180 AS height,
        | CASE strlen(text) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |   ELSE 'webp' END AS format
        |FROM documents""".stripMargin)
}
