package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.Dataset

/** REAL image codec path (JDK `javax.imageio` — PNG/JPEG/BMP/GIF, no
  * external dependency), upgrading [[Multimodal]]'s stub tier: decode,
  * fixed-grid luminance features, and resize, all runnable inside
  * `mapPartitions` with the same iterator-batch execution shape.
  *
  * Feature contract: an image maps to a `gridDim × gridDim` grid of mean
  * luminances (0..1, row-major) — the classic cheap visual fingerprint
  * (aHash's continuous form). Deterministic for a given payload, so specs
  * can assert exact values from synthetic images.
  *
  * Payloads that fail to decode (truncated file, not an image) fall back
  * to [[Multimodal.stubDecode]] with `decoded = false` — a 100 TB media
  * sweep must tolerate corrupt rows without failing the stage.
  */
object ImageCodec {

  case class ImageFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      decoded: Boolean,
      features: Array[Float])

  /** Decode via ImageIO; None when the payload is not a decodable image.
    * (ImageIO.read returns null rather than throwing for unknown formats.)
    */
  def decode(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** Mean-luminance grid features, row-major, each cell in [0, 1].
    * Luminance = (r + g + b) / 3 / 255 — integer pixel walk, no
    * per-pixel allocation.
    */
  def gridFeatures(img: BufferedImage, gridDim: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](gridDim * gridDim)
    val counts = new Array[Long](gridDim * gridDim)
    var y = 0
    while (y < h) {
      val gy = math.min(y * gridDim / h, gridDim - 1)
      var x = 0
      while (x < w) {
        val gx = math.min(x * gridDim / w, gridDim - 1)
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0 / 255.0
        val cell = gy * gridDim + gx
        sums(cell) += lum
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](gridDim * gridDim)
    var i = 0
    while (i < out.length) {
      out(i) = if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat
      i += 1
    }
    out
  }

  /** Per-partition REAL feature extraction (vs [[Multimodal.extractFeatures]]'s
    * stub): decode each payload, emit grid features + true dimensions;
    * undecodable rows keep the pipeline alive with stub features and
    * `decoded = false`.
    */
  def extractImageFeatures(
      media: Dataset[Multimodal.MediaRow],
      gridDim: Int = 4): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // ImageIO plugin scanning happens once per JVM; per-partition we
      // only pay stream decode — same placement a JNI codec would have.
      rows.map { r =>
        decode(r.payload) match {
          case Some(img) =>
            ImageFeatures(r.media_id, r.mime, r.payload.length,
              img.getWidth, img.getHeight, decoded = true,
              gridFeatures(img, gridDim))
          case None =>
            ImageFeatures(r.media_id, r.mime, r.payload.length,
              -1, -1, decoded = false,
              Multimodal.stubDecode(r.payload, gridDim * gridDim))
        }
      }
    }
  }

  case class PixelStats(
      media_id: Long, decoded: Boolean, n_px: Long,
      sum_lum: Long, sum_lum_sq: Long, tv: Long)

  /** Exact integer pixel statistics for quality gating: channel-sum
    * luminance sums (÷3 gray factor NOT applied — it cancels in the
    * ratios callers compute), the squared sum, and the total variation
    * (Σ|p−right| + Σ|p−below|) — the cheap sharpness/flatness signal
    * (tv = 0 ⇔ a solid image; low tv ⇔ blurry/blank). PURE INTEGER end
    * to end, so an oracle replays it from the pixel formula exactly.
    */
  def pixelStats(img: BufferedImage): (Long, Long, Long) = {
    val w = img.getWidth
    val h = img.getHeight
    val p = Array.ofDim[Long](h, w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        p(y)(x) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toLong
        x += 1
      }
      y += 1
    }
    var s = 0L; var s2 = 0L; var tv = 0L
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = p(y)(x)
        s += v; s2 += v * v
        if (x + 1 < w) tv += math.abs(p(y)(x + 1) - v)
        if (y + 1 < h) tv += math.abs(p(y + 1)(x) - v)
        x += 1
      }
      y += 1
    }
    (s, s2, tv)
  }

  /** Per-partition pixel-stat extraction (same iterator-batch shape as
    * [[extractImageFeatures]]; undecodable rows emit decoded = false).
    */
  def extractPixelStats(media: Dataset[Multimodal.MediaRow]): Dataset[PixelStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decode(r.payload) match {
          case Some(img) =>
            val (s, s2, tv) = pixelStats(img)
            PixelStats(r.media_id, decoded = true,
              img.getWidth.toLong * img.getHeight, s, s2, tv)
          case None => PixelStats(r.media_id, decoded = false, 0L, 0L, 0L, 0L)
        }
      }
    }
  }

  case class AHash(media_id: Long, decoded: Boolean, h_hi: Long, h_lo: Long)

  /** 64-bit average hash (aHash) of an 8×8 image as two 32-bit halves
    * held in longs: bit i set ⇔ pixel i's channel sum × 64 > the image's
    * total channel sum — PURE INTEGER arithmetic end to end (no float
    * mean), so an oracle can replay the bits from the pixel formula
    * exactly and the common ×3 gray factor cancels. Halves double as
    * LSH bands: near-dup candidates are pairs agreeing exactly on at
    * least one half (two equi-joins + union — never all-pairs), with
    * the ≤-threshold Hamming verify run only on candidates.
    */
  def aHash64(img: BufferedImage): (Long, Long) = {
    val p = new Array[Long](64)
    var i = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val rgb = img.getRGB(x, y)
        p(i) = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        i += 1; x += 1
      }
      y += 1
    }
    val sum = p.sum
    var lo = 0L; var hi = 0L
    i = 0
    while (i < 64) {
      if (p(i) * 64 > sum) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo)
  }

  /** Per-partition aHash extraction; undecodable rows emit
    * `decoded = false` with zero hashes (kept alive, filterable).
    */
  def aHashes(media: Dataset[Multimodal.MediaRow]): Dataset[AHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decode(r.payload) match {
          case Some(img) =>
            val (hi, lo) = aHash64(img)
            AHash(r.media_id, decoded = true, hi, lo)
          case None => AHash(r.media_id, decoded = false, 0L, 0L)
        }
      }
    }
  }

  /** Real resize (smooth-scaled, re-encoded PNG): the bytes→bytes shape a
    * thumbnailing stage runs per partition.
    */
  def resizePng(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decode(payload).map { img =>
      val scaled = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = scaled.createGraphics()
      try g.drawImage(
        img.getScaledInstance(w, h, java.awt.Image.SCALE_SMOOTH), 0, 0, null)
      finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(scaled, "png", bos)
      bos.toByteArray
    }
}
