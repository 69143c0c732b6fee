package graft

import graft.multimodal.{MediaRow, Multimodal}
import graft.synth.Synth
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mediaRows: Seq[MediaRow] = {
    val img = Synth.baseImage(5L, nearFlat = false)
    val png = graft.kernel.ImageCodec.encodePng(img)
    Seq(
      MediaRow("m-img", "image", png, "png", img.w, img.h, 0, 0L),
      MediaRow("m-img2", "image", png, "png", img.w, img.h, 0, 0L), // dup
      MediaRow("m-aud", "audio", Array.tabulate(4096)(i => (i % 251).toByte),
        "wav-stub", 0, 0, 16000, 0L),
      MediaRow("m-vid", "video", Array.tabulate(8192)(i => ((i * 7) % 255).toByte),
        "mp4-stub", 0, 0, 0, 5000L),
      MediaRow("m-bad", "image", Array[Byte](1, 2, 3), "png", 10, 10, 0, 0L))
  }

  test("batch kernel dispatches per kind; image real, audio/video stubbed") {
    import spark.implicits._
    val feats = Multimodal.features(spark, mediaRows.toDF()).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats("m-img").ok && feats("m-img").feature.length == 32)
    assert(feats("m-img").decode_note == "imageio")
    assert(feats("m-aud").ok && feats("m-aud").decode_note == "stub-pcm")
    assert(feats("m-vid").ok && feats("m-vid").frames_sampled == 5)
    assert(!feats("m-bad").ok && feats("m-bad").decode_note.startsWith("decode-failed"))
  }

  test("cosine near-dup over feature column finds the duplicate image") {
    import spark.implicits._
    val feats = Multimodal.features(spark, mediaRows.toDF()).toDF()
    val pairs = Multimodal.cosinePairs(feats, 0.95).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("m-img", "m-img2")))
    assert(!pairs.exists(p => p._1 == "m-bad" || p._2 == "m-bad"))
  }
}
