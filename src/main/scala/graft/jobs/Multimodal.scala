package graft.jobs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: image/audio/video
  * as opaque BINARY columns + typed metadata, processed in BATCHES via
  * mapPartitions (the Scala analogue of the Pandas-UDF batch shape).
  *
  * The actual byte decode is a clearly-marked STUB — no image/audio
  * libraries ship in this container — but everything Spark-side is
  * real and tested: schema, batching, partition-level iteration,
  * deterministic output at any parallelism, and the frame-sampling
  * fan-out. Swapping `decodeBatchStub` for a real decoder changes no
  * plan shape. */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sampleRateHz: Int, nFrames: Int)
  final case class MediaRow(mediaId: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeature(mediaId: Long, kind: String, dim: Int, feature: Array[Float])
  final case class Frame(mediaId: Long, frameIdx: Int, frameBytes: Array[Byte])

  val BatchSize = 64
  val FeatureDim = 16

  /** Deterministic media table derived from the pages html payload —
    * stands in for a real (id, kind, bytes, meta) multimodal table. */
  def mediaFromPages(spark: SparkSession, pages: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    pages.select(
        xxhash64(col("url")).as("mediaId"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(xxhash64(col("url"), lit(1)), lit(3)) + 1).cast("int")).as("kind"),
        col("html").as("bytes"),
        abs(pmod(xxhash64(col("url"), lit(2)), lit(1024))).cast("int").as("width"),
        abs(pmod(xxhash64(col("url"), lit(3)), lit(768))).cast("int").as("height"),
        lit(16000).as("sampleRateHz"),
        (abs(pmod(xxhash64(col("url"), lit(4)), lit(30))) + 1).cast("int").as("nFrames"))
      .select(col("mediaId"), col("kind"), col("bytes"),
        struct(col("width"), col("height"), col("sampleRateHz"), col("nFrames")).as("meta"))
      .as[MediaRow]
  }

  /** ??? STUB ???  A real implementation decodes the media bytes
    * (JPEG/PCM/container demux) and runs a feature extractor. This
    * deterministic fake hashes the bytes into FeatureDim floats so the
    * surrounding plumbing (batch shape, schema, ordering independence)
    * is fully testable without decoder libraries. */
  def decodeBatchStub(batch: Array[Array[Byte]]): Array[Array[Float]] =
    batch.map { bytes =>
      val out = new Array[Float](FeatureDim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
      var k = 0
      while (k < FeatureDim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(k) = (h % 1000L) / 1000.0f
        k += 1
      }
      out
    }

  /** Batched feature extraction: one decode call per ≤BatchSize rows —
    * the exact shape a vectorized/pandas UDF would have. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { chunk =>
        val feats = decodeBatchStub(chunk.map(_.bytes).toArray)
        chunk.zip(feats).map { case (row, f) =>
          MediaFeature(row.mediaId, row.kind, FeatureDim, f)
        }
      }
    }
  }

  /** Video frame sampling: explode each video row into nFrames stub
    * frames (deterministic byte slices) — the fan-out plan a real frame
    * sampler would produce. */
  def sampleFrames(media: Dataset[MediaRow], everyNth: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { row =>
      (0 until row.meta.nFrames by everyNth).map { idx =>
        val from = math.min(idx * 8, math.max(row.bytes.length - 8, 0))
        Frame(row.mediaId, idx,
          java.util.Arrays.copyOfRange(row.bytes, from,
            math.min(from + 8, row.bytes.length)))
      }
    }
  }
}
