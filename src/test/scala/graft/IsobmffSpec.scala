package graft

import graft.kernel.{Exif, ExifData, HeaderDims, ImageCodec, Isobmff, SignatureKernel}
import graft.model.ImageRow
import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite

import java.security.MessageDigest

/** ISOBMFF metadata tiers (S7 dims + S8 EXIF for HEIC/AVIF/JXL — the
  * formats whose PIXEL codec is env-blocked): the box-walk parser against
  * the spec-conformant shell encoder, hand-assembled iloc/infe version
  * variants the encoder does not emit, and the end-to-end kernel path over
  * Synth's heicmeta rows. */
class IsobmffSpec extends AnyFunSuite {

  private def check(parsed: Option[ExifData], orientation: Int, dto: String,
                    lat: Double, lon: Double): Unit = {
    assert(parsed.isDefined, "no EXIF parsed")
    val e = parsed.get
    assert(e.orientation.contains(orientation))
    assert(e.dateTimeOriginal.contains(dto))
    assert(e.lat.exists(v => math.abs(v - lat) < 1e-6), s"lat ${e.lat}")
    assert(e.lon.exists(v => math.abs(v - lon) < 1e-6), s"lon ${e.lon}")
  }

  private def exifPayload(orientation: Int, dto: String,
                          lat: Double, lon: Double): Array[Byte] = {
    val app1 = Exif.buildApp1(orientation, dto, Some(lat), Some(lon))
    java.util.Arrays.copyOfRange(app1, 4, app1.length) // "Exif\0\0" + TIFF
  }

  test("heic shell roundtrip: mdat Exif item (iloc v0, file offsets)") {
    val b = Isobmff.encodeHeicShell(640, 480,
      Some(exifPayload(6, "2023:07:01 10:20:30", 20.9, -156.7)),
      Array.fill[Byte](128)(0x5a))
    check(Exif.fromBytes(b, "heic"), 6, "2023:07:01 10:20:30", 20.9, -156.7)
    assert(HeaderDims.probe(b, "heic").contains((640, 480)))
    // pixel tier stays an honest stub
    assert(ImageCodec.decodeWithStatus(b, "heic", 640, 480) ===
      ((None, ImageCodec.StatusUnsupported)))
  }

  test("heic shell roundtrip: idat Exif item (iloc v1, construction_method 1)") {
    val b = Isobmff.encodeHeicShell(99, 77,
      Some(exifPayload(3, "2021:12:31 23:59:59", -33.5, 151.25)),
      Array.fill[Byte](64)(0x11), exifInIdat = true)
    check(Exif.fromBytes(b, "heic"), 3, "2021:12:31 23:59:59", -33.5, 151.25)
    assert(HeaderDims.probe(b, "heic").contains((99, 77)))
  }

  test("avif brand parses under its own fmt AND via the generic sniff") {
    val b = Isobmff.encodeHeicShell(31, 17,
      Some(exifPayload(1, "2020:01:01 00:00:00", 0.25, 0.5)),
      Array.fill[Byte](32)(0x7f), brand = "avif")
    check(Exif.fromBytes(b, "avif"), 1, "2020:01:01 00:00:00", 0.25, 0.5)
    // mislabeled row: the S5 sniff rule applies to metadata too
    check(Exif.fromBytes(b, "bin"), 1, "2020:01:01 00:00:00", 0.25, 0.5)
  }

  test("no Exif item → None; exif parse never disturbs dims") {
    val b = Isobmff.encodeHeicShell(10, 10, None, Array.fill[Byte](16)(1))
    assert(Exif.fromBytes(b, "heic").isEmpty)
    assert(HeaderDims.probe(b, "heic").contains((10, 10)))
  }

  // ---- hand-assembled forms the encoder does not emit ------------------

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(name: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(body.length + 8L) ++ name.getBytes("ISO-8859-1") ++ body
  }
  private def full(name: String, version: Int, payload: Array[Byte]*): Array[Byte] =
    box(name, be32(version.toLong << 24) +: payload: _*)

  test("iinf v1 + infe v3 + iloc v2 with a split two-extent Exif item") {
    val app1 = Exif.buildApp1(8, "2019:06:15 12:00:00", Some(45.125), Some(-122.5))
    val tiff = java.util.Arrays.copyOfRange(app1, 10, app1.length)
    // ExifDataBlock with tiff-direct offset 0, split into two extents
    val block = be32(0L) ++ tiff
    val (p1, p2) = block.splitAt(block.length / 2)
    val infe3 = full("infe", 3, be32(7L), be16(0),
      "Exif".getBytes("ISO-8859-1"), Array[Byte](0))
    val iinf = full("iinf", 1, be32(1L), infe3)
    // iloc v2: u32 item count, u32 item_ID, method 0, two 4-byte extents
    def ilocV2(off1: Long, off2: Long) = full("iloc", 2,
      Array[Byte](0x44, 0x00), be32(1L),
      be32(7L), be16(0), be16(0), be16(2),
      be32(off1), be32(p1.length.toLong), be32(off2), be32(p2.length.toLong))
    // two-pass for absolute offsets
    def fileOf(off1: Long, off2: Long): Array[Byte] = {
      val meta = full("meta", 0, iinf, ilocV2(off1, off2))
      val ftyp = box("ftyp", "heic".getBytes, be32(0L), "mif1".getBytes)
      // mdat carries p2 FIRST then p1 — extents must reassemble in iloc
      // order, not file order
      ftyp ++ meta ++ box("mdat", p2, p1)
    }
    // mdat payload start = total length minus the payload itself
    val off2 = fileOf(0, 0).length - (p1.length + p2.length)
    val off1 = off2 + p2.length
    val b = fileOf(off1, off2)
    check(Exif.fromBytes(b, "heic"), 8, "2019:06:15 12:00:00", 45.125, -122.5)
  }

  test("jxl container: top-level Exif box + jxlc codestream dims") {
    val app1 = Exif.buildApp1(2, "2022:03:04 05:06:07", Some(-1.75), Some(103.25))
    val payload = java.util.Arrays.copyOfRange(app1, 4, app1.length)
    // SizeHeader: small=1, ysize_div8=3 (→32), ratio=1 → 32×32 (the
    // HeaderDimsSpec hard-coded vector)
    val codestream = Array(0xff, 0x0a, 0x47, 0x00).map(_.toByte)
    val b = box("JXL ", Array(0x0d, 0x0a, 0x87, 0x0a).map(_.toByte)) ++
      box("ftyp", "jxl ".getBytes, be32(0L), "jxl ".getBytes) ++
      box("Exif", be32(6L), payload) ++
      box("jxlc", codestream)
    check(Exif.fromBytes(b, "jxl"), 2, "2022:03:04 05:06:07", -1.75, 103.25)
    assert(HeaderDims.probe(b, "jxl").contains((32, 32)))
    assert(ImageCodec.decodeWithStatus(b, "jxl", 32, 32)._2 ==
      ImageCodec.StatusUnsupported)
  }

  test("jxl container encoder roundtrip: SizeHeader dims + Exif box") {
    val b = Isobmff.encodeJxlContainer(320, 179,
      Some(exifPayload(5, "2023:02:03 04:05:06", 47.5, 8.25)),
      Array.fill[Byte](96)(0x2e))
    check(Exif.fromBytes(b, "jxl"), 5, "2023:02:03 04:05:06", 47.5, 8.25)
    assert(HeaderDims.probe(b, "jxl").contains((320, 179)))
    // mislabeled row: the generic sniff recognizes the JXL signature box
    check(Exif.fromBytes(b, "bin"), 5, "2023:02:03 04:05:06", 47.5, 8.25)
    assert(ImageCodec.decodeWithStatus(b, "jxl", 320, 179)._2 ==
      ImageCodec.StatusUnsupported)
    // dims edge: selector-1 bounds
    assert(HeaderDims.probe(Isobmff.encodeJxlContainer(1, 8192, None,
      Array.fill[Byte](8)(0)), "jxl").contains((1, 8192)))
  }

  test("synth jxlmeta rows: kernel carries real EXIF + unsupported status") {
    val rows = (0L until 120L).flatMap(Synth.rowsForBase)
      .filter(_.variant == "jxlmeta")
    assert(rows.nonEmpty, "no jxlmeta rows in 120 bases — rate broken")
    val sha = MessageDigest.getInstance("SHA-256")
    rows.foreach { r =>
      val sig = SignatureKernel.computeOne(
        ImageRow(r.image_id, r.bytes, r.w, r.h, r.fmt, r.caption, r.phash), sha)
      assert(sig.decode_status == ImageCodec.StatusUnsupported, r.image_id)
      assert(!sig.has_pdq, r.image_id)
      val want = Synth.exifFor(r.group_id, r.variant)
      assert(sig.orientation == want.orientation, r.image_id)
      assert(sig.exif_ts == want.timestamp, r.image_id)
      assert(HeaderDims.probe(r.bytes, r.fmt).contains((r.w, r.h)), r.image_id)
    }
  }

  test("synth heicmeta rows: kernel carries real EXIF + unsupported status") {
    val rows = (0L until 80L).flatMap(Synth.rowsForBase)
      .filter(_.variant == "heicmeta")
    assert(rows.nonEmpty, "no heicmeta rows in 80 bases — rate broken")
    val sha = MessageDigest.getInstance("SHA-256")
    rows.foreach { r =>
      val sig = SignatureKernel.computeOne(
        ImageRow(r.image_id, r.bytes, r.w, r.h, r.fmt, r.caption, r.phash), sha)
      assert(sig.decode_status == ImageCodec.StatusUnsupported, r.image_id)
      assert(!sig.has_pdq, r.image_id)
      val want = Synth.exifFor(r.group_id, r.variant)
      assert(sig.orientation == want.orientation, r.image_id)
      assert(sig.exif_ts == want.timestamp, r.image_id)
      assert(sig.gps_lat.zip(want.lat).forall { case (a, b) => math.abs(a - b) < 1e-6 })
      assert(sig.gps_lon.zip(want.lon).forall { case (a, b) => math.abs(a - b) < 1e-6 })
      // header dims real (S7) — the ispe carries the true dims
      assert(HeaderDims.probe(r.bytes, r.fmt).contains((r.w, r.h)), r.image_id)
    }
    // both iloc construction methods present in the corpus
    val methods = rows.map(_.group_id % 2 == 1).toSet
    assert(methods.size == 2, "only one iloc construction method drawn")
  }

  test("fuzz: truncations and bit flips never throw, junk parses to None") {
    val good = Isobmff.encodeHeicShell(64, 64,
      Some(exifPayload(1, "2024:01:01 00:00:00", 1.5, 2.5)),
      Array.fill[Byte](32)(3))
    // every truncation point: total parse safety
    (0 until good.length).foreach { n =>
      val t = java.util.Arrays.copyOf(good, n)
      Exif.fromBytes(t, "heic") // must not throw
      HeaderDims.probe(t, "heic")
    }
    // deterministic bit flips across the whole container
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val m = good.clone()
      val i = rnd.nextInt(m.length)
      m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      Exif.fromBytes(m, "heic")
      HeaderDims.probe(m, "heic")
    }
    assert(Exif.fromBytes(Array.fill[Byte](64)(0x42), "heic").isEmpty)
  }
}
