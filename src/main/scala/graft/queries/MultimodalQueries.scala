package graft.queries

import org.apache.spark.sql.functions._

import graft.jobs.Multimodal
import graft.synth.Pages
import graft.util.QueryDef

/** Driver gate for the multimodal batch plumbing. All three media
  * kinds take REAL JDK decodes: imageio pixels for images, sampled-
  * audio PCM for audio, and RIFF demux + per-frame JPEG decode for
  * MJPEG-AVI video; outputs freeze into a digest golden like the other
  * fixture-derived queries. Feature floats are exact multiples of
  * 1/1000 with sub-16.7M numerators by construction, so the ×1000
  * quantization is lossless. */
object MultimodalQueries {

  /** The synthetic media table is a SESSION-scoped fixture (PNG/WAV
    * payload synthesis is gate-fixture construction, not the operator
    * under test): staged once per session as checkpointed blocks, so
    * repeated runs — and the timed bench row, via the untimed
    * throwaway — measure decode + features, not synthesis. */
  private lazy val mediaCached =
    new graft.util.SessionCache[org.apache.spark.sql.Dataset[Multimodal.MediaRow]]

  private[queries] def media(s: org.apache.spark.sql.SparkSession) =
    mediaCached.get(s)(
      Multimodal.mediaFromPages(s, Pages.generate(s, 20000)).localCheckpoint())

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_multimodal",
      (s, _) => {
        val media = MultimodalQueries.media(s)
        val featDigest = Multimodal.extractFeatures(media).toDF()
          .select(col("kind"),
            xxhash64(col("mediaId"), col("dim"),
              aggregate(transform(col("feature"),
                x => round(x.cast("double") * 1000, 0).cast("long")),
                lit(0L), (a, v) => a + v)).as("h0"))
          .groupBy("kind")
          .agg(count(lit(1)).as("n"), expr("bit_xor(h0)").as("h"))
        val frameDigest = Multimodal.sampleFrames(media).toDF()
          .select(lit("video_frames").as("kind"),
            xxhash64(col("mediaId"), col("frameIdx"), col("width"),
              col("height"), xxhash64(col("pixels"))).as("h0"))
          .groupBy("kind")
          .agg(count(lit(1)).as("n"), expr("bit_xor(h0)").as("h"))
        // resize verb: image rows resized 7×5 (real pixel-deterministic
        // NN resample + PNG re-encode), then decoded AGAIN and feature-
        // extracted — the digest witnesses the full decode→resize→
        // encode→decode chain, not just the resize call
        val resizeDigest = Multimodal.extractFeatures(
            Multimodal.resizeImages(media.filter(_.kind == "image"), 7, 5)).toDF()
          .select(lit("image_resized").as("kind"),
            xxhash64(col("mediaId"), col("dim"),
              aggregate(transform(col("feature"),
                x => round(x.cast("double") * 1000, 0).cast("long")),
                lit(0L), (a, v) => a + v)).as("h0"))
          .groupBy("kind")
          .agg(count(lit(1)).as("n"), expr("bit_xor(h0)").as("h"))
        featDigest.union(frameDigest).union(resizeDigest).orderBy("kind")
      },
      Some(GeoGolden.multimodalSql))
  )
}
