package graft

import graft.multimodal.Multimodal

/** Resize / frame-sample plumbing over the stubbed decode features
  * (multimodal/Multimodal.scala): exact integer math, hand-computed.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def feats(w: Int, h: Int, frames: Int) =
    Seq(("d1", "media://img/1", "image", w, h, frames, 0L, 0L))
      .toDF("doc_id", "media_ref", "media_kind", "width", "height",
        "n_frames", "bytes_len", "phash")

  test("resizePlan: aspect-preserving exact integer math") {
    // landscape 1280x720 -> width-limited: 256 x (720*256) div 1280 = 256x144
    val land = Multimodal.resizePlan(feats(1280, 720, 1), 256, 256)
      .select("out_width", "out_height", "out_bytes").head()
    assert((land.getInt(0), land.getInt(1)) === ((256, 144)))
    assert(land.getLong(2) === 256L * 144 * 3)
    // portrait 600x900 -> height-limited: (600*256) div 900 = 170 x 256
    val port = Multimodal.resizePlan(feats(600, 900, 2), 256, 256)
      .select("out_width", "out_height", "out_bytes").head()
    assert((port.getInt(0), port.getInt(1)) === ((170, 256)))
    assert(port.getLong(2) === 170L * 256 * 3 * 2)
  }

  test("sampleFrames: every-Nth frame index; single-frame media emit 0") {
    val vid = Multimodal.sampleFrames(feats(100, 100, 25), 10)
      .select("frame_idx").collect().map(_.getInt(0)).toSeq
    assert(vid === Seq(0, 10, 20))
    val img = Multimodal.sampleFrames(feats(100, 100, 1), 10)
      .select("frame_idx").collect().map(_.getInt(0)).toSeq
    assert(img === Seq(0))
  }
}
