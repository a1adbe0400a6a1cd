package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    MediaRow(1L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), "image/png", 2, 2),
    MediaRow(2L, Array[Byte](9, 9, 9), "image/jpeg", 1, 1),
    MediaRow(3L, Array.emptyByteArray, "video/mp4", 0, 0))

  test("extractFeatures: fixed-dim deterministic features per row") {
    val ds = spark.createDataset(rows)
    val feats = Multimodal.extractFeatures(ds, dim = 8).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(feats.forall(_.features.length == 8))
    val again = Multimodal.extractFeatures(spark.createDataset(rows), dim = 8)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("sampleFrames: strided chunking with frame indexes") {
    val ds = spark.createDataset(Seq(MediaRow(7L, (0 until 10).map(_.toByte).toArray, "video/mp4", 0, 0)))
    val frames = Multimodal.sampleFrames(ds, frameBytes = 2, stride = 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
  }

  test("ImageCodec: real PNG decode to luminance-grid features") {
    import graft.multimodal.ImageCodec
    // 8×8 PNG, left half black, right half white — encoded in-memory so
    // the test exercises the REAL ImageIO decode path end to end.
    def png(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, png(), "image/png", 8, 8),
      MediaRow(2L, Array[Byte](1, 2, 3), "image/png", 0, 0)) // corrupt
    val feats = ImageCodec.extractImageFeatures(
      spark.createDataset(rows), gridDim = 2).collect().sortBy(_.media_id)
    val ok = feats(0)
    assert(ok.decoded && ok.width == 8 && ok.height == 8)
    // row-major 2×2 grid: [black, white, black, white]
    assert(ok.features.toSeq == Seq(0f, 1f, 0f, 1f))
    // corrupt payload survives the stage: stub features, decoded = false.
    val bad = feats(1)
    assert(!bad.decoded && bad.width == -1 && bad.features.length == 4)
    // real resize: 8×8 → 4×4, still decodable, left half stays dark.
    val small = ImageCodec.resizePng(png(), 4, 4).get
    val back = ImageCodec.decode(small).get
    assert(back.getWidth == 4 && back.getHeight == 4)
    assert((back.getRGB(0, 0) & 0xff) < (back.getRGB(3, 0) & 0xff))
  }

  test("AudioCodec: real WAV decode to rms/zero-crossing features") {
    import graft.multimodal.AudioCodec
    // 8-bit unsigned PCM, samples alternate 128±64 → normalized ±0.5:
    // rms exactly 0.5, a crossing at every step. Written through the
    // REAL javax.sound WAV encoder so decode runs end to end.
    def wav(): Array[Byte] = {
      val pcm = Array.tabulate[Byte](40)(i => (if (i % 2 == 0) 192 else 64).toByte)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 40L)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, wav(), "audio/wav", 0, 0),
      MediaRow(2L, Array[Byte](9, 9, 9), "audio/wav", 0, 0)) // corrupt
    val feats = AudioCodec.extractAudioFeatures(spark.createDataset(rows))
      .collect().sortBy(_.media_id)
    val ok = feats(0)
    assert(ok.decoded && ok.sample_rate == 8000 && ok.n_samples == 40)
    assert(ok.rms == 0.5 && ok.zero_crossings == 39)
    // corrupt payload survives the stage with decoded = false.
    val bad = feats(1)
    assert(!bad.decoded && bad.n_samples == 0 && bad.rms == 0.0)
  }

  test("VideoCodec: GVID demux, stride sampling, corruption fallback") {
    import graft.multimodal.VideoCodec
    def gray(g: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < 4) { var x = 0; while (x < 4) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val vid = VideoCodec.encode((0 until 5).map(i => gray(i * 50)))
    // Stride 2 decodes frames 0, 2, 4 only.
    val Some((n, frames)) = VideoCodec.demuxSampled(vid, every = 2)
    assert(n == 5 && frames.map(_._1).toSeq == Seq(0, 2, 4))
    val rows = Seq(
      MediaRow(1L, vid, "video/x-gvid", 4, 4),
      MediaRow(2L, Array[Byte]('G', 'V', 'I', 'X', 0), "video/x-gvid", 0, 0),
      MediaRow(3L, vid.take(vid.length - 3), "video/x-gvid", 4, 4)) // truncated
    val feats = VideoCodec.sampleFrameFeatures(
        spark.createDataset(rows), every = 2)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    val good = feats.filter(_.media_id == 1L)
    assert(good.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(good.forall(f => f.decoded && f.n_frames == 5 && f.width == 4))
    // Exact gray recovery per sampled frame.
    assert(good.map(f => math.round(f.features(0) * 255)).toSeq == Seq(0, 100, 200))
    // Bad magic and truncation each yield ONE decoded=false row.
    assert(feats.count(f => f.media_id == 2L) == 1)
    val bad = feats.filter(f => f.media_id >= 2L)
    assert(bad.forall(f => !f.decoded && f.frame_idx == -1))
    // A frame length far beyond the remaining payload must be rejected
    // as truncation BEFORE allocation (no multi-GB Array attempt).
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Array[Byte]('G', 'V', 'I', 'D')); out.writeInt(1)
    out.writeInt(Int.MaxValue - 2); out.write(Array[Byte](1, 2, 3))
    assert(VideoCodec.demuxSampled(bos.toByteArray, every = 1).isEmpty)
  }

  test("mediaStats: byte counts without decode") {
    val df = spark.createDataset(rows).toDF()
    val stats = Multimodal.mediaStats(df, "payload").orderBy("media_id")
    val got = stats.select("n_bytes", "is_empty").collect()
      .map(r => (r.getInt(0), r.getBoolean(1)))
    assert(got.toSeq == Seq((8, false), (3, false), (0, true)))
  }
}
