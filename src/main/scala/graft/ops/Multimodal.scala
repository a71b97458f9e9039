package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * processed batch-wise in typed mapPartitions (the Scala analogue of
  * mapInPandas batches). The actual codecs are STUBBED deterministically —
  * image/audio libraries don't ship in this container — but the Spark-side
  * schema, batching, and partition flow are real.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class ImgFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int, // STUB: derived from payload size, stands in for decode
      height: Int,
      format: String,
      hist: Array[Float]) // STUB: byte-value histogram as fake features

  /** STUB decode: a real implementation would decode the image here; the
    * deterministic fake derives dimensions from the payload so tests and
    * oracles can pin the plumbing. */
  def decodeStub(payload: Array[Byte]): (Int, Int, String) = {
    val n = payload.length
    (16 + n % 240, 16 + (n * 7) % 180,
      if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp")
  }

  def featureStub(payload: Array[Byte], bins: Int = 8): Array[Float] = {
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
        val (w, h, f) = decodeStub(m.payload)
        ImgFeatures(m.doc_id, m.payload.length, w, h, f,
          featureStub(m.payload))
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
    val media = s.read.parquet(s"$dir/documents.parquet")
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
