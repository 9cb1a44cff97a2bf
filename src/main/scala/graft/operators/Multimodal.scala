package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media
  * (image/audio/video) carried as opaque `binary` columns with typed
  * metadata, processed via `mapPartitions` so per-partition batch shape
  * and decoder reuse are explicit.
  *
  * The decode step itself is a STUB (`decodeStub`) — media codecs are
  * not available in this environment — but everything Spark-side is
  * real and tested: the schema contract, partition-batched processing,
  * decoder-per-partition amortization, and the feature-extraction
  * column flow. Swap `decodeStub` for a real codec call (JNI/FFmpeg/
  * javax.imageio) without touching the plumbing.
  *
  * Scale notes: binary payloads stay columnar in parquet and are never
  * collected; per-partition batches bound memory (`batchSize` rows at a
  * time); feature extraction emits fixed-width vectors so downstream
  * similarity/dedup operators (graft.queries.Similarity) apply
  * unchanged to media embeddings.
  */
object Multimodal {

  /** Canonical media-row schema: payload + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("sample_rate", IntegerType))))))

  final case class DecodedMedia(
      mediaId: Long, modality: String, frames: Int, featureDim: Int,
      features: Array[Float])

  /** STUB decoder — deterministic fake: "decodes" payload bytes into a
    * fixed-width feature vector (byte histogram projected to `dim`).
    * Real implementation: decode → resize/frame-sample → embed. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val feat = new Array[Float](dim)
    if (payload == null) return feat
    var i = 0
    while (i < payload.length) {
      feat(java.lang.Byte.toUnsignedInt(payload(i)) % dim) += 1.0f
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    var j = 0
    while (j < dim) { feat(j) /= n; j += 1 }
    feat
  }

  /** STUB resize — real impl: decode → scale to (w, h) → re-encode.
    * Deterministic fake keeps byte length proportional to the target
    * area so size-based planning downstream stays meaningful. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (payload == null) return Array.empty
    val targetLen = math.max(1, math.min(payload.length, (w.toLong * h / 64).toInt))
    Array.tabulate[Byte](targetLen)(i => payload(i % payload.length))
  }

  /** STUB frame sampling — real impl: demux video, decode every
    * `stride`-th frame. Deterministic fake: slice the payload into
    * `frames` chunks, one "frame" feature vector per chunk. */
  def frameSampleStub(payload: Array[Byte], frames: Int, dim: Int): Array[Array[Float]] = {
    if (payload == null || payload.isEmpty) return Array.empty
    val chunk = math.max(1, payload.length / frames)
    Array.tabulate(math.min(frames, payload.length)) { f =>
      decodeStub(payload.slice(f * chunk, math.min((f + 1) * chunk, payload.length)), dim)
    }
  }

  final case class FrameFeatures(mediaId: Long, frameIdx: Int, features: Array[Float])

  /** Video path: one row per sampled frame — the explode-shaped output
    * that feeds frame-level dedup/similarity. */
  def sampleFrames(media: DataFrame, frames: Int = 8, dim: Int = 64): Dataset[FrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("modality") === "video")
      .select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        frameSampleStub(payload, frames, dim).zipWithIndex.map {
          case (feat, i) => FrameFeatures(id, i, feat)
        }
      }
  }

  /** Partition-batched decode + feature extraction. The decoder handle
    * is created once per partition (≙ loading a codec/model once per
    * executor task, the expensive part in real pipelines) and rows are
    * processed in bounded batches.
    */
  def extractFeatures(media: DataFrame, dim: Int = 64, batchSize: Int = 128): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init happens here (stubbed)
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, modality, payload) =>
            val frames = modality match {
              case "video" => 8 // frame-sampled (stub: fixed count)
              case _       => 1
            }
            DecodedMedia(id, modality, frames, dim, decodeStub(payload, dim))
          }
        }
      }
  }

  /** Feature table ready for the similarity operators: embeddings as
    * array<double> + id, the exact shape graft.queries.Similarity
    * consumes. */
  def featureTable(media: DataFrame, dim: Int = 64): DataFrame =
    extractFeatures(media, dim).toDF()
      .select(col("mediaId").as("vec_id"),
        col("features").cast(ArrayType(DoubleType)).as("embedding"))
}
