package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns next to a typed metadata
  * struct; decode/featurize/resize/frame-sample run per partition over
  * iterator batches (the Scala analog of `mapInPandas` — one decoder
  * instantiation per partition, streamed row batches, no driver collect).
  *
  * Codec tiers: [[ImageCodec]] is the REAL image path (JDK ImageIO —
  * PNG/JPEG decode, luminance-grid features, resize) and [[AudioCodec]]
  * the REAL audio path (javax.sound WAV/AIFF PCM — rms/zero-crossing
  * features); [[stubDecode]] remains the deterministic byte-mix fallback
  * for payload types with no in-JVM codec (video) and for undecodable
  * rows. The Spark-side contract — schema, partitioning, batch shape,
  * null behavior — is identical across tiers.
  */
object Multimodal {

  /** A media row: payload + typed metadata (mirrors how parquet stores
    * e.g. image bytes + width/height/mime).
    */
  case class MediaRow(
      media_id: Long,
      payload: Array[Byte],
      mime: String,
      width: Int,
      height: Int)

  case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Int,
      features: Array[Float])

  /** STUB decoder: deterministic pseudo-features from payload bytes
    * (xxhash-style mix per dimension). Replace with a real codec; the
    * signature (bytes → fixed-dim float vector) is the production one.
    */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    var d = 0
    while (d < dim) {
      val x = (h ^ (d * 2654435761L)) * 0x9e3779b97f4a7c15L
      out(d) = ((x >>> 40).toInt % 1000) / 1000.0f
      d += 1
    }
    out
  }

  /** Per-partition feature extraction: the decoder is instantiated once
    * per partition (the expensive part for real codecs) and rows stream
    * through it — identical execution shape to `mapInPandas`.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val decoder = Codec.open(...) here, once per partition
      rows.map { r =>
        MediaFeatures(r.media_id, r.mime, r.payload.length, stubDecode(r.payload, dim))
      }
    }
  }

  /** Frame sampling for video payloads: emit every `stride`-th chunk of
    * `frameBytes` as its own row (STUB chunking standing in for real frame
    * decode; the explode-shaped output schema is the production one).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media
      .flatMap { r =>
        r.payload.grouped(frameBytes).zipWithIndex.collect {
          case (chunk, idx) if idx % stride == 0 =>
            (r.media_id, idx, chunk)
        }
      }
      .toDF("media_id", "frame_idx", "frame_payload")
  }

  /** Size/validity metadata pass as pure column ops (no decode needed) —
    * the cheap scan that typically gates which payloads get decoded.
    */
  def mediaStats(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)))
      .withColumn("is_empty", col("n_bytes") === 0)
}
