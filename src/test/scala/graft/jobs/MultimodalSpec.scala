package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.synth.Pages

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val media =
    Multimodal.mediaFromPages(spark, Pages.generate(spark, 500)).cache()

  test("media table has the multimodal shape: binary payload + typed meta") {
    val schema = media.schema
    assert(schema("bytes").dataType.simpleString == "binary")
    assert(schema("meta").dataType.simpleString.startsWith("struct<width:int"))
    assert(media.count() == 500)
    val kinds = media.collect().map(_.kind).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("batched feature extraction is deterministic at any parallelism") {
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(f => f.mediaId -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect()
      .map(f => f.mediaId -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.length == Multimodal.FeatureDim))
    // features depend on payload bytes: distinct payloads → distinct features
    assert(f1.values.toSeq.distinct.length > 400)
  }

  // an EXTERNAL 4×3 grayscale-ramp PNG (written by a separate encoder,
  // not our own ImageIO round-trip): pixel (x,y) has R=G=B = 10+20·(4y+x)
  private val externalPng = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAQAAAADCAIAAAA7ljmRAAAAMklEQVR4nAEnANj/AAoKCh4eHj" +
    "IyMkZGRgBaWlpubm6CgoKWlpYAqqqqvr6+0tLS5ubm3SsQ4fxWj/8AAAAASUVORK5CYII=")

  test("a real external PNG decodes to exact pixel-derived features") {
    val img = Multimodal.decodeImage(externalPng)
      .getOrElse(fail("external PNG must decode"))
    assert(img.getWidth == 4 && img.getHeight == 3)
    assert((img.getRGB(2, 1) & 0xffffff) == 0x828282) // 10+20·6 = 130
    val f = Multimodal.imageFeatures(img).toSeq
    val expect = Seq(0.004f, 0.003f, 0.120f, 0.120f, 0.120f, // dims, ch means
      0.002f, 0.001f, 0.002f, 0.001f, 0.002f, 0.002f, 0.001f, 0.001f, // luma hist
      0.012f, 0.010f, 0.230f) // n pixels, luma min, luma max
    assert(f == expect, s"got $f")
    // and the full batch path routes image bytes through the real decode
    val viaBatch = Multimodal.decodeBatch(Array(("image", externalPng))).head.toSeq
    assert(viaBatch == expect)
    // non-image bytes must fall back to the stub, not throw
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
  }

  // an EXTERNAL WAV (hand-assembled canonical 44-byte RIFF header +
  // little-endian PCM16 mono @8kHz, not our own AudioSystem round-trip)
  private val externalWav: Array[Byte] = {
    val samples = Seq(0, 1000, -1000, 32767, -32768, 500, -500, 0)
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  test("a real external WAV decodes to exact sample-derived features") {
    val (fmt, samples) = Multimodal.decodeAudio(externalWav)
      .getOrElse(fail("external WAV must decode"))
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1)
    assert(samples.toSeq == Seq(0, 1000, -1000, 32767, -32768, 500, -500, 0))
    val f = Multimodal.audioFeatures(fmt, samples).toSeq
    // ch=1, sr=8000, n=8, mean|s|=68535/8=8566, max=32767, min=-32768,
    // |s|>>12 hist [6,0,0,0,0,0,0,2] (32768>>12=8 clamps into bin 7),
    // 6 zero crossings, Σ|s| mod 1e6 = 68535
    val expect = Seq(0.001f, 8.0f, 0.008f, 8.566f, 32.767f, -32.768f,
      0.006f, 0f, 0f, 0f, 0f, 0f, 0f, 0.002f, 0.006f, 68.535f)
    assert(f == expect, s"got $f")
    // and the full batch path routes audio bytes through the real decode
    val viaBatch = Multimodal.decodeBatch(Array(("audio", externalWav))).head.toSeq
    assert(viaBatch == expect)
    // non-audio bytes must fall back to the stub, not throw
    assert(Multimodal.decodeAudio("not audio".getBytes).isEmpty)
  }

  test("synthetic media audio rows carry genuine WAVs matching their meta") {
    val auds = media.filter(_.kind == "audio").collect()
    assert(auds.nonEmpty)
    for (row <- auds.take(20)) {
      val (fmt, samples) = Multimodal.decodeAudio(row.bytes)
        .getOrElse(fail(s"media ${row.mediaId} must be a real WAV"))
      assert(fmt.getSampleRate.toInt == row.meta.sampleRateHz)
      assert(samples.length == row.meta.nFrames * 40 + 80)
    }
    // extracted features reflect the DECODED samples, not the bytes hash
    val feats = Multimodal.extractFeatures(media).collect()
      .filter(_.kind == "audio").map(f => f.mediaId -> f.feature).toMap
    for (row <- auds.take(20)) {
      val f = feats(row.mediaId)
      assert(math.round(f(1) * 1000) == row.meta.sampleRateHz)
      assert(math.round(f(2) * 1000) == row.meta.nFrames * 40 + 80)
    }
  }

  test("synthetic media image rows carry genuine PNGs matching their meta") {
    val imgs = media.filter(_.kind == "image").collect()
    assert(imgs.nonEmpty)
    for (row <- imgs.take(20)) {
      val img = Multimodal.decodeImage(row.bytes)
        .getOrElse(fail(s"media ${row.mediaId} must be a real PNG"))
      assert(img.getWidth == row.meta.width && img.getHeight == row.meta.height)
    }
    // extracted features reflect the DECODED dims, not the payload hash
    val feats = Multimodal.extractFeatures(media).collect()
      .filter(_.kind == "image").map(f => f.mediaId -> f.feature).toMap
    for (row <- imgs.take(20)) {
      val f = feats(row.mediaId)
      assert(math.round(f(0) * 1000) == row.meta.width)
      assert(math.round(f(1) * 1000) == row.meta.height)
    }
  }

  test("nearest-neighbour resize is pixel-exact and round-trips through PNG") {
    val img = Multimodal.decodeImage(externalPng).get // 4×3 gray ramp
    val r = Multimodal.resizeImage(img, 2, 1)
    assert(r.getWidth == 2 && r.getHeight == 1)
    // floor mapping: (0,0)←(0,0)=10 gray, (1,0)←(2,0)=50 gray
    assert((r.getRGB(0, 0) & 0xffffff) == 0x0a0a0a)
    assert((r.getRGB(1, 0) & 0xffffff) == 0x323232)
    // dataset-level: image rows get new dims + re-encoded PNG payload;
    // audio/video rows pass through untouched
    val resized = Multimodal.resizeImages(media, 7, 5).collect()
    for (row <- resized) {
      if (row.kind == "image") {
        assert(row.meta.width == 7 && row.meta.height == 5)
        val back = Multimodal.decodeImage(row.bytes).get
        assert(back.getWidth == 7 && back.getHeight == 5)
      }
    }
    val orig = media.collect().map(r2 => r2.mediaId -> r2).toMap
    for (row <- resized if row.kind != "image")
      assert(java.util.Arrays.equals(row.bytes, orig(row.mediaId).bytes))
  }

  test("frame sampling fan-out matches metadata and yields real decoded pixels") {
    val frames = Multimodal.sampleFrames(media, everyNth = 2).collect()
    val videos = media.filter(_.kind == "video").collect()
    assert(frames.length ==
      videos.map(v => (v.meta.nFrames + 1) / 2).sum)
    val byId = videos.map(v => v.mediaId -> v).toMap
    for (f <- frames) {
      val v = byId(f.mediaId)
      assert(f.width == v.meta.width && f.height == v.meta.height)
      assert(f.pixels.length == f.width * f.height * 3)
    }
    // frames of one video differ (per-frame keyed synthesis survives
    // the JPEG round trip)
    val multi = frames.groupBy(_.mediaId).values.find(_.length > 1).get
    assert(multi.map(_.pixels.toSeq).distinct.length > 1)
  }

  // a HAND-ASSEMBLED MJPEG-AVI fixture: two known JPEG frames placed in
  // a RIFF container built field-by-field here (independent of our own
  // encodeAviMjpeg writer), one of them inside a 'rec ' grouping and
  // one chunk odd-sized to exercise padding
  test("hand-assembled AVI fixture demuxes to its exact frames; frames decode") {
    def jpegOf(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(5, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 5)
        img.setRGB(x, y, (seed * 37 + y * 40 + x * 8) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      javax.imageio.ImageIO.write(img, "jpg", ios)
      ios.close()
      bos.toByteArray
    }
    val f0 = jpegOf(1)
    val f1raw = jpegOf(2)
    val f1 = if (f1raw.length % 2 == 0) f1raw :+ 0xd9.toByte else f1raw // force odd size
    def le(v: Int) = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def ck(cc: String, d: Array[Byte]) =
      cc.getBytes("US-ASCII") ++ le(d.length) ++ d ++
        (if (d.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val rec = ck("LIST", "rec ".getBytes("US-ASCII") ++ ck("00dc", f1))
    val junk = ck("JUNK", Array.fill(6)(0.toByte))
    val movi = ck("LIST", "movi".getBytes("US-ASCII") ++
      ck("00dc", f0) ++ junk ++ rec)
    val body = "AVI ".getBytes("US-ASCII") ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ le(body.length) ++ body
    val frames = Multimodal.demuxAvi(avi)
      .getOrElse(fail("fixture must demux"))
    assert(frames.length == 2)
    assert(java.util.Arrays.equals(frames(0), f0))
    assert(java.util.Arrays.equals(frames(1), f1))
    val img0 = Multimodal.decodeImage(frames(0))
      .getOrElse(fail("demuxed frame must JPEG-decode"))
    assert(img0.getWidth == 5 && img0.getHeight == 4)
    // and our own writer round-trips through the demuxer byte-exactly
    val own = Multimodal.encodeAviMjpeg(Seq(f0, f1raw), 5, 4)
    val back = Multimodal.demuxAvi(own).get
    assert(back.length == 2 && java.util.Arrays.equals(back(0), f0) &&
      java.util.Arrays.equals(back(1), f1raw))
    // non-AVI bytes: None, not a throw
    assert(Multimodal.demuxAvi("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.demuxAvi("not avi".getBytes).isEmpty)
    // recognized-but-CORRUPT AVI (chunk size past the buffer): None,
    // not a throw — one malformed row must never fail a whole task
    val dcSizeHi = avi.indexOfSlice("movi".getBytes) + 4 + 4 + 3 // 00dc size MSB
    val corrupt = avi.clone()
    corrupt(dcSizeHi) = 0x7f.toByte // size far past the buffer
    assert(Multimodal.demuxAvi(corrupt).isEmpty)
    val negSize = avi.clone()
    negSize(dcSizeHi) = 0xff.toByte // negative size
    assert(Multimodal.demuxAvi(negSize).isEmpty)
    // near-Int.MaxValue chunk size: off + 8 + n overflows Int if the
    // bound check isn't done in Long — must degrade to None, not crash
    val ovf = avi.clone()
    ovf(dcSizeHi - 3) = 0xf0.toByte
    ovf(dcSizeHi - 2) = 0xff.toByte
    ovf(dcSizeHi - 1) = 0xff.toByte
    ovf(dcSizeHi) = 0x7f.toByte // n = 0x7ffffff0
    assert(Multimodal.demuxAvi(ovf).isEmpty)
  }

  test("synthetic media video rows carry genuine MJPEG-AVIs matching their meta") {
    val vids = media.filter(_.kind == "video").collect()
    assert(vids.nonEmpty)
    for (row <- vids.take(20)) {
      val frames = Multimodal.demuxAvi(row.bytes)
        .getOrElse(fail(s"media ${row.mediaId} must be a real AVI"))
      assert(frames.length == row.meta.nFrames)
      for (f <- frames) {
        val img = Multimodal.decodeImage(f)
          .getOrElse(fail(s"media ${row.mediaId} frame must be JPEG"))
        assert(img.getWidth == row.meta.width && img.getHeight == row.meta.height)
      }
    }
    // extracted features reflect the DECODED first frame, not the
    // payload hash: dims land in feature slots 0/1
    val feats = Multimodal.extractFeatures(media).collect()
      .filter(_.kind == "video").map(f => f.mediaId -> f.feature).toMap
    for (row <- vids.take(20)) {
      val f = feats(row.mediaId)
      assert(math.round(f(0) * 1000) == row.meta.width)
      assert(math.round(f(1) * 1000) == row.meta.height)
    }
  }
}
