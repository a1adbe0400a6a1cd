package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.Dataset

/** REAL audio codec path (JDK `javax.sound.sampled` — WAV/AIFF/AU PCM,
  * no external dependency), upgrading [[Multimodal]]'s stub tier the
  * same way [[ImageCodec]] did for images: decode, per-clip signal
  * features, all inside `mapPartitions` with the iterator-batch
  * execution shape.
  *
  * Feature contract: normalized samples in [-1, 1] (channels mono-mixed),
  * RMS amplitude and zero-crossing count — the classic cheap audio
  * fingerprint pair. All sample math is exact binary arithmetic for
  * power-of-two PCM ranges (v/128, v/32768), so synthetic clips
  * round-trip to EXACTLY predictable features and q91's oracle can
  * compute them with pure arithmetic, no audio library on the DuckDB
  * side.
  *
  * Payloads that fail to decode (truncated, not audio, exotic encodings)
  * fall back to [[Multimodal.stubDecode]]-style survival with
  * `decoded = false` — a media sweep must tolerate corrupt rows.
  */
object AudioCodec {

  case class AudioFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Int,
      sample_rate: Int,
      n_samples: Long,
      decoded: Boolean,
      rms: Double,
      zero_crossings: Long)

  /** Decode to normalized mono samples; None for undecodable payloads or
    * sample sizes other than 8/16-bit PCM.
    */
  def decode(payload: Array[Byte]): Option[(AudioFormat, Array[Double])] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      val fmt = in.getFormat
      val bits = fmt.getSampleSizeInBits
      if (bits != 8 && bits != 16) return None
      val bytes = in.readAllBytes()
      val ch = fmt.getChannels
      val sampleBytes = bits / 8
      val frameBytes = sampleBytes * ch
      val n = bytes.length / frameBytes
      val unsigned8 =
        fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        var acc = 0.0
        var c = 0
        while (c < ch) {
          val off = i * frameBytes + c * sampleBytes
          val v =
            if (bits == 8) {
              if (unsigned8) ((bytes(off) & 0xff) - 128) / 128.0
              else bytes(off) / 128.0
            } else {
              val s =
                if (fmt.isBigEndian) (bytes(off) << 8) | (bytes(off + 1) & 0xff)
                else (bytes(off + 1) << 8) | (bytes(off) & 0xff)
              s / 32768.0
            }
          acc += v
          c += 1
        }
        out(i) = acc / ch
        i += 1
      }
      Some((fmt, out))
    } catch { case _: Exception => None }

  /** RMS amplitude: sqrt(mean(x²)); 0 for empty clips. Sequential
    * left-to-right sum — deterministic, and exact for the synthetic
    * power-of-two-amplitude clips the oracle predicts.
    */
  def rms(samples: Array[Double]): Double = {
    if (samples.isEmpty) return 0.0
    var s = 0.0
    var i = 0
    while (i < samples.length) { s += samples(i) * samples(i); i += 1 }
    math.sqrt(s / samples.length)
  }

  /** Sign-change count between consecutive samples. */
  def zeroCrossings(samples: Array[Double]): Long = {
    var z = 0L
    var i = 1
    while (i < samples.length) {
      if (samples(i - 1) * samples(i) < 0) z += 1
      i += 1
    }
    z
  }

  case class AudioFingerprint(
      media_id: Long,
      n_samples: Long,
      decoded: Boolean,
      fp: Long,
      fp_hi: Long,
      fp_lo: Long)

  /** Landmark-style 64-bit audio fingerprint (the audio analog of
    * [[ImageCodec.aHash64]]): the clip is cut into `nFrames` equal
    * frames (len = ⌈n/nFrames⌉, crossing i — a sign change between
    * samples i−1 and i — attributed to the frame containing i, the last
    * frame absorbing any tail) and each frame's zero-crossing count,
    * capped at 255, packs into 8 bits of one long. PURE INTEGER end to
    * end: amplitude cancels entirely (only signs matter), so re-leveled
    * copies of a clip fingerprint identically and an oracle can replay
    * the bits from the signal's closed form with no audio library. The
    * two 32-bit halves double as LSH bands (the q215 discipline).
    */
  def frameCrossingFingerprint(samples: Array[Double], nFrames: Int = 8): Long = {
    if (samples.length < 2) return 0L
    val len = math.max(1, (samples.length + nFrames - 1) / nFrames)
    val counts = new Array[Long](nFrames)
    var i = 1
    while (i < samples.length) {
      if (samples(i - 1) * samples(i) < 0) {
        val f = math.min(i / len, nFrames - 1)
        if (counts(f) < 255) counts(f) += 1
      }
      i += 1
    }
    var fp = 0L
    var f = 0
    while (f < nFrames) { fp |= counts(f) << (8 * f); f += 1 }
    fp
  }

  /** Per-partition fingerprint extraction over the REAL decode path;
    * undecodable rows survive with `decoded = false`.
    */
  def audioFingerprints(
      media: Dataset[Multimodal.MediaRow]): Dataset[AudioFingerprint] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decode(r.payload) match {
          case Some((_, samples)) =>
            val fp = frameCrossingFingerprint(samples)
            AudioFingerprint(r.media_id, samples.length.toLong,
              decoded = true, fp, fp >>> 32, fp & 0xffffffffL)
          case None =>
            AudioFingerprint(r.media_id, 0L, decoded = false, 0L, 0L, 0L)
        }
      }
    }
  }

  /** Per-partition REAL audio feature extraction; undecodable rows keep
    * the pipeline alive with `decoded = false` and zeroed features.
    */
  def extractAudioFeatures(
      media: Dataset[Multimodal.MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decode(r.payload) match {
          case Some((fmt, samples)) =>
            AudioFeatures(r.media_id, r.mime, r.payload.length,
              fmt.getSampleRate.toInt, samples.length.toLong,
              decoded = true, rms(samples), zeroCrossings(samples))
          case None =>
            AudioFeatures(r.media_id, r.mime, r.payload.length,
              -1, 0L, decoded = false, 0.0, 0L)
        }
      }
    }
  }
}
