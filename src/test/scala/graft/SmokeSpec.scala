package graft

import graft.kernel.ImageCodec
import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows; per-row invariants from
  * BASELINE.json input_hint — decoded-pixel fidelity (exact for lossless,
  * PSNR≥40dB decoder-fidelity for lossy) and caption equality through the
  * kernel. */
class SmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("SparkEntry.entry returns grouped rows (driver smoke check)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("status") && df.columns.contains("members"))
  }

  test("caption equality: the kernel carries captions through unmodified") {
    import spark.implicits._
    val rows = (0L until 10L).flatMap(Synth.rowsForBase)
    val images = rows
      .map(r => (r.image_id, r.bytes, r.w, r.h, r.fmt, r.caption, r.phash))
      .toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    val sig = Pipeline.signatures(spark, images)
      .select("image_id", "caption").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    rows.foreach(r => assert(sig(r.image_id) == r.caption, r.image_id))
  }

  test("decode fidelity: PNG exact; JPEG decode-encode-decode ≥ 40 dB") {
    val img = Synth.baseImage(321L, nearFlat = false)
    // lossless: bit-exact round trip
    val png = ImageCodec.decode(ImageCodec.encodePng(img), "png", img.w, img.h).get
    assert(ImageCodec.psnr(img, png).isPosInfinity)
    // decoder fidelity (the per-row invariant is about the DECODER, not
    // codec loss): decoding the same JPEG twice must agree exactly, and
    // re-encoding a decoded JPEG at the same quality stays ≥ 40 dB
    val jb = ImageCodec.encodeJpeg(img, 0.90f)
    val d1 = ImageCodec.decode(jb, "jpg", img.w, img.h).get
    val d2 = ImageCodec.decode(jb, "jpg", img.w, img.h).get
    assert(ImageCodec.psnr(d1, d2).isPosInfinity, "decoder must be deterministic")
    val rere = ImageCodec.decode(ImageCodec.encodeJpeg(d1, 0.90f), "jpg", d1.w, d1.h).get
    val p = ImageCodec.psnr(d1, rere)
    info(f"jpeg re-encode PSNR = $p%.1f dB")
    assert(p >= 40.0, f"re-encode PSNR $p%.1f < 40")
  }
}
