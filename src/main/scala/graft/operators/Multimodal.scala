package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** X5: multimodal columns — media payloads travel as opaque `binary`
  * columns with a typed metadata struct, and feature extraction runs
  * batch-shaped over partitions (SURVEY.md §2.10 X5).
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked deterministic FAKE decode; everything around it —
  * schema, Dataset encoding, partition-parallel batch execution,
  * feature schema — is the real Spark plumbing a production decode
  * UDF would drop into (swap `decodeStub` for an actual codec call;
  * the `mapPartitions` boundary amortizes per-batch model/codec init
  * exactly like `mapInPandas` does in PySpark).
  *
  * Scale: decode is a narrow map stage — no shuffle, scales linearly
  * with partitions; binary payloads never pass through a wide
  * transformation, so no 2 GB-record or shuffle-spill hazards.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long,
      checksum: Long, feat0: Double, feat1: Double)

  /** Wrap a text table as a media table: payload = UTF-8 bytes, typed
    * metadata struct alongside (stands in for image/audio bytes).
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("lang").as("lang")).as("meta"))

  /** STUB — deterministic fake "decode + feature extraction".
    * A real deployment replaces this body with the codec / model
    * call; signature and batch shape stay identical.
    */
  def decodeStub(payload: Array[Byte]): (Long, Double, Double) = {
    var crc = 0L
    var i = 0
    while (i < payload.length) { crc = crc * 31 + (payload(i) & 0xff); i += 1 }
    val f0 = if (payload.isEmpty) 0.0 else (payload(0) & 0xff) / 255.0
    val f1 = payload.length.toDouble / 4096.0
    (crc, f0, f1)
  }

  /** Batch feature extraction over the media table: one decode pass
    * per partition (per-batch init cost amortized, like mapInPandas).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // per-partition init would happen here (codec/model handle)
        it.map { r =>
          val (crc, f0, f1) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, crc, f0, f1)
        }
      }
  }

  /** STUB — "resize": deterministic byte-domain downsample to
    * `targetBytes` (stride sampling). A real deployment decodes,
    * resizes pixels, re-encodes; the Spark shape — narrow
    * binary→binary map with bounded output size — is identical.
    */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] =
    if (payload.length <= targetBytes) payload
    else {
      val out = new Array[Byte](targetBytes)
      val stride = payload.length.toDouble / targetBytes
      var i = 0
      while (i < targetBytes) { out(i) = payload((i * stride).toInt); i += 1 }
      out
    }

  case class MediaFrame(doc_id: Long, frame_no: Int, frame: Array[Byte])

  /** STUB — "frame sampling": one fixed-size frame every `frameBytes`
    * of payload (stands in for video frame extraction; a UDTF-shaped
    * one-to-many flatMap — the row-multiplying plumbing is the real
    * part, the slicing is the fake decode).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int, everyN: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    media.select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
      .as[MediaRecord]
      .flatMap { r =>
        val nFrames = math.max(1, r.payload.length / frameBytes)
        (0 until nFrames by everyN).map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, r.payload.length)
          MediaFrame(r.doc_id, f, java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      }
  }
}
