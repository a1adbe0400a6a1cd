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
