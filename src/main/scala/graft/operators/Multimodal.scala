package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads ride along as
  * opaque `binary` columns with a typed metadata struct, and per-record
  * decode/feature-extraction runs as partition-local batched processing —
  * the Spark-side plumbing (schema, batching, partitioning) is real; the
  * actual media decode is a STUB (this container has no image/audio codecs),
  * clearly marked below, producing deterministic pseudo-metadata derived
  * from the bytes so the pipeline is testable end-to-end.
  *
  * Scale shape: `mapPartitions` with an internal micro-batch (`batchSize`)
  * mirrors how a real decoder (GPU/native lib) wants its inputs — amortized
  * per-batch setup, bounded memory, no driver involvement. Decoded metadata
  * lands as ordinary columns, so downstream filtering/aggregation is plain
  * Catalyst.
  */
object Multimodal {

  /** A record carrying an opaque media payload. */
  case class MediaRecord(id: Long, media_type: String, media: Array[Byte])

  /** Extracted metadata (what a real decoder would emit: dimensions,
    * duration, sample rate...; here: deterministic stand-ins).
    */
  case class MediaMeta(id: Long, media_type: String, n_bytes: Long,
      checksum: String, width: Long, height: Long)

  /** Project a frame to a media-record shape — (id, media_type, media) —
    * by encoding an existing column's bytes (stand-in for reading real
    * blobs; real ingest would read binaryFile sources). Other columns are
    * NOT carried: [[MediaRecord]] is the decoder's input contract; callers
    * keeping sidecar columns join decode output back on `id`
    * (see [[decodePipeline]]).
    */
  def withMediaColumn(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String = "text/plain"): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      lit(mediaType).as("media_type"),
      encode(col(payloadCol), "UTF-8").as("media"))

  // =====================================================================
  // STUB DECODER — replace with a real codec (JNI/ffmpeg/ImageIO) when the
  // runtime has one. Deterministic by construction: every value derives
  // from the payload bytes only, so tests and oracles can recompute it.
  // =====================================================================
  private[operators] def decodeStub(r: MediaRecord): MediaMeta = {
    val md = MessageDigest.getInstance("MD5")
    val checksum = md.digest(r.media).map("%02x".format(_)).mkString
    val n = r.media.length.toLong
    // a real decoder would parse headers; the stub derives fake dimensions
    MediaMeta(r.id, r.media_type, n, checksum, n % 640, n % 480)
  }

  /** Batched partition-local "decode": the production shape for media
    * feature extraction. Batches exist so a real decoder can amortize
    * per-batch setup (codec contexts, GPU transfer); the stub just maps.
    */
  def extractMetadata(records: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[MediaMeta] = {
    require(batchSize >= 1, s"batchSize must be positive, got $batchSize")
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would happen here
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** Full plumbing demo: frame → media column → batched decode → metadata
    * columns. The decode output carries (id, media_type, n_bytes, checksum,
    * width, height); join it back on `id` when the original frame's other
    * columns are needed downstream.
    */
  def decodePipeline(spark: SparkSession, df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    import spark.implicits._
    val media = withMediaColumn(df, idCol, payloadCol).as[MediaRecord]
    extractMetadata(media).toDF()
  }
}
