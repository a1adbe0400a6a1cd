package graft.multimodal

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Dataset

/** Video path over a deterministic frame container ("GVID": magic +
  * frame count, then length-prefixed PNG frames). Real demuxers
  * (MP4/MKV) are external native libraries this environment doesn't
  * ship; the CONTAINER is therefore ours, but everything around it is
  * the real thing — per-frame decode is the actual ImageIO codec
  * ([[ImageCodec]]), and the Spark-side plumbing (opaque binary column,
  * `mapPartitions` iterator batches, stride-based frame sampling,
  * per-frame feature rows) is exactly the shape an MP4 demuxer would
  * slot into.
  *
  * Frame sampling happens INSIDE the demux loop: a stride-`k` sample
  * decodes only every k-th frame — on a 100 TB video corpus the decode
  * cost (the dominant term) drops by k, not just the output size.
  *
  * Corrupt payloads (bad magic, truncated frame) yield a single
  * `decoded = false` row, keeping the stage alive — the same contract as
  * [[ImageCodec.extractImageFeatures]].
  */
object VideoCodec {

  private val Magic = Array[Byte]('G', 'V', 'I', 'D')

  case class FrameFeatures(
      media_id: Long,
      frame_idx: Int,
      n_frames: Int,
      width: Int,
      height: Int,
      decoded: Boolean,
      features: Array[Float])

  /** Mux PNG frames into one GVID payload. */
  def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.write(Magic)
    out.writeInt(frames.size)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    bos.toByteArray
  }

  /** Demux: frame count + a stride-`every` iterator of (frameIdx, bytes)
    * that SKIPS non-sampled frames without copying them. None on bad
    * magic or truncation.
    */
  def demuxSampled(
      payload: Array[Byte], every: Int): Option[(Int, Iterator[(Int, Array[Byte])])] = {
    if (payload.length < 8 || !payload.take(4).sameElements(Magic)) return None
    try {
      val in = new DataInputStream(new java.io.ByteArrayInputStream(payload, 4, payload.length - 4))
      val n = in.readInt()
      if (n < 0) return None
      // Materialize offsets eagerly so truncation fails the WHOLE payload
      // (None) rather than a partial frame list.
      val sampled = Vector.newBuilder[(Int, Array[Byte])]
      var i = 0
      while (i < n) {
        val len = in.readInt()
        // An untrusted length field larger than the bytes actually left
        // would allocate up to 2 GB before readFully could fail — reject
        // it as truncation BEFORE allocating so corrupt payloads stay on
        // the decoded=false path instead of OOMing the executor.
        if (len < 0 || len > in.available()) return None
        if (i % every == 0) {
          val buf = new Array[Byte](len)
          in.readFully(buf)
          sampled += ((i, buf))
        } else if (in.skipBytes(len) != len) return None
        i += 1
      }
      Some((n, sampled.result().iterator))
    } catch { case _: java.io.IOException => None }
  }

  /** Per-partition demux → stride sample → REAL per-frame decode →
    * luminance-grid features; one output row per sampled frame.
    */
  def sampleFrameFeatures(
      media: Dataset[Multimodal.MediaRow],
      every: Int,
      gridDim: Int = 2): Dataset[FrameFeatures] = {
    require(every > 0, "sampling stride must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        demuxSampled(r.payload, every) match {
          case Some((n, frames)) =>
            frames.map { case (idx, png) =>
              ImageCodec.decode(png) match {
                case Some(img) =>
                  FrameFeatures(r.media_id, idx, n, img.getWidth,
                    img.getHeight, decoded = true,
                    ImageCodec.gridFeatures(img, gridDim))
                case None =>
                  FrameFeatures(r.media_id, idx, n, -1, -1, decoded = false,
                    Multimodal.stubDecode(png, gridDim * gridDim))
              }
            }
          case None =>
            Iterator.single(FrameFeatures(r.media_id, -1, -1, -1, -1,
              decoded = false,
              Multimodal.stubDecode(r.payload, gridDim * gridDim)))
        }
      }
    }
  }
}
