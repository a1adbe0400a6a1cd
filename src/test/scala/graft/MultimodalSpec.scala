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

  test("mediaStats: byte counts without decode") {
    val df = spark.createDataset(rows).toDF()
    val stats = Multimodal.mediaStats(df, "payload").orderBy("media_id")
    val got = stats.select("n_bytes", "is_empty").collect()
      .map(r => (r.getInt(0), r.getBoolean(1)))
    assert(got.toSeq == Seq((8, false), (3, false), (0, true)))
  }
}
