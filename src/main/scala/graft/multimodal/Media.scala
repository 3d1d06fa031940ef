package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads ride through the engine as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extraction / resize /
  * frame-sampling run as batched `mapPartitions` over a typed Dataset
  * (the Scala analog of Python's mapInPandas: one iterator per
  * partition, vectorizable per batch, no per-row UDF dispatch).
  *
  * The actual codec step is a clearly marked STUB — media libraries
  * are not available in this environment — but everything Spark-side
  * is real and tested: the schema, the encoders, the partition-batch
  * iteration shape, and the deterministic byte-level operations. A
  * real decoder drops in behind the same signatures.
  *
  * Scale notes: payload columns are large — keep them OUT of shuffles
  * (featurize before any join, project the bytes away as soon as the
  * features exist), read with a small files.maxPartitionBytes so one
  * partition of blobs fits executor memory, and never collect them.
  */
object Media {

  case class MediaMeta(format: String, width: Int, height: Int)
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, features: Array[Float])
  case class MediaFrame(media_id: Long, frame_no: Int, frame: Array[Byte])

  /** STUB decoder: derives fake-but-deterministic dimensions from the
    * payload hash. A real implementation decodes the image header.
    */
  def decodeMetaStub(payload: Array[Byte], format: String): MediaMeta = {
    val h = MessageDigest.getInstance("MD5").digest(payload)
    MediaMeta(format, 16 + (h(0) & 0x7f), 16 + (h(1) & 0x7f))
  }

  /** STUB featurizer: 16 floats folded from the payload's md5 — the
    * deterministic stand-in for an embedding/CNN feature vector.
    */
  def featurizeStub(payload: Array[Byte]): Array[Float] = {
    val h = MessageDigest.getInstance("MD5").digest(payload)
    h.grouped(1).map(b => (b(0) & 0xff) / 255.0f).toArray
  }

  /** STUB resize: truncate/cycle payload to w*h bytes (a real one
    * re-encodes pixels). Keeps output size deterministic.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(1, w * h)
    Array.tabulate(n)(i => payload(i % math.max(1, payload.length)))
  }

  /** Evenly spaced fixed-width byte windows — the frame-sampling
    * access pattern (video → n frames) at byte level.
    */
  def sampleFrames(payload: Array[Byte], n: Int, width: Int = 16): Seq[Array[Byte]] = {
    if (payload.isEmpty) return Seq.empty
    val step = math.max(1, payload.length / n)
    (0 until math.min(n, payload.length)).map { i =>
      payload.slice(i * step, math.min(i * step + width, payload.length))
    }
  }

  /** Batched feature extraction: mapPartitions over the typed Dataset
    * — partition-parallel, one stub-model "load" per partition (the
    * real-codec cost model), payload projected away in the output.
    */
  def featurize(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup happens HERE (model/codec init, once)
      it.map(r => MediaFeatures(r.media_id, featurizeStub(r.payload)))
    }
  }

  /** Frame sampling as a typed flatMap (1 → n rows). */
  def frames(media: Dataset[MediaRecord], n: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap(r =>
      sampleFrames(r.payload, n).zipWithIndex.map { case (f, i) =>
        MediaFrame(r.media_id, i, f)
      })
  }

  /** Synthesize a media table from the documents corpus (text bytes
    * as opaque payloads — the harness has no real image files).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        MediaRecord(id, "image", payload, decodeMetaStub(payload, "png"))
      }
  }
}
