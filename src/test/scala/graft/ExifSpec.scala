package graft

import graft.kernel.{Exif, ImageCodec}
import graft.synth.Synth
import org.scalatest.funsuite.AnyFunSuite

/** S8 gate: EXIF parsed from real image BYTES — writer/parser round trip,
  * big-endian path, and the Synth-embedded fixtures (scanner.rs:107-192 +
  * exif_types.rs semantics). */
class ExifSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def jpegOf(seed: Int): Array[Byte] = {
    val argb = Array.tabulate(64 * 48) { i =>
      val x = i % 64; val y = i / 64
      0xff000000 | (((x * 3 + seed) % 256) << 16) | (((y * 5) % 256) << 8) | ((x + y) % 256)
    }
    ImageCodec.encodeJpeg(graft.kernel.DecodedImage(64, 48, argb), 0.8f)
  }

  test("APP1 round trip: all orientations, timestamp, GPS in 4 hemispheres") {
    for (o <- 1 to 8) {
      val dto = f"2019:07:${o}%02d 08:30:1$o"
      val (lat, lon) = o match {
        case 1 => (21.2864, -157.8399) // NW (the Kaanapali-style fixture)
        case 2 => (-33.8688, 151.2093) // SE
        case 3 => (51.5074, -0.1278)
        case 4 => (-54.8019, -68.3030) // SW
        case _ => (o * 7.123456, -o * 11.654321)
      }
      val jpeg = Exif.spliceIntoJpeg(jpegOf(o),
        Exif.buildApp1(o, dto, Some(lat), Some(lon)))
      val parsed = Exif.fromJpeg(jpeg)
      assert(parsed.isDefined, s"no EXIF parsed at orientation $o")
      val e = parsed.get
      assert(e.orientation.contains(o))
      assert(e.dateTimeOriginal.contains(dto))
      assert(e.timestamp.contains(Exif.parseExifTimestamp(dto).get))
      assert(math.abs(e.lat.get - lat) < 1e-6, s"lat ${e.lat} != $lat")
      assert(math.abs(e.lon.get - lon) < 1e-6, s"lon ${e.lon} != $lon")
      assert(e.tags.contains(Exif.TagMake))
      // decode is unaffected by the spliced segment
      val d0 = ImageCodec.decode(jpegOf(o), "jpg", 64, 48).get
      val d1 = ImageCodec.decode(jpeg, "jpg", 64, 48).get
      assert(d0.argb.sameElements(d1.argb), "splice changed decoded pixels")
    }
  }

  test("TIFF-container round trip: all orientations + GPS via Exif.fromBytes") {
    val argb = Array.tabulate(24 * 18)(i => 0xff000000 | (i * 2654435761L).toInt & 0xffffff)
    val img = graft.kernel.DecodedImage(24, 18, argb)
    for (o <- 1 to 8) {
      val dto = f"2020:03:${o}%02d 17:45:2$o"
      val (lat, lon) = (o * 5.5 - 20.0, o * 13.25 - 60.0)
      val bytes = graft.kernel.Tiff.encode(img, 8,
        Some(graft.kernel.TiffExif(o, dto, Some(lat), Some(lon))))
      val e = Exif.fromBytes(bytes, "tiff")
      assert(e.isDefined, s"no EXIF from TIFF at orientation $o")
      assert(e.get.orientation.contains(o))
      assert(e.get.dateTimeOriginal.contains(dto))
      assert(e.get.timestamp.contains(Exif.parseExifTimestamp(dto).get))
      assert(math.abs(e.get.lat.get - lat) < 1e-4, s"lat ${e.get.lat} != $lat")
      assert(math.abs(e.get.lon.get - lon) < 1e-4, s"lon ${e.get.lon} != $lon")
    }
    // RAW ext: same TIFF block at offset 0 parses through the raw branch
    val raw = graft.kernel.Tiff.encodeRawContainer(img,
      ImageCodec.encodeJpeg(img, 0.9f),
      Some(graft.kernel.TiffExif(5, "2022:11:30 23:59:59", None, None)))
    val er = Exif.fromBytes(raw, "dng")
    assert(er.isDefined && er.get.orientation.contains(5))
    assert(er.get.dateTimeOriginal.contains("2022:11:30 23:59:59"))
  }

  test("fuzz: adversarial bytes never crash container EXIF parsing or preview scan") {
    // the parse runs inside the kernel's hot mapPartitions — an unguarded
    // offset on corrupt input would fail whole tasks at corpus scale
    val r = new java.util.Random(99)
    for (_ <- 0 until 300) {
      val n = r.nextInt(4000)
      val b = new Array[Byte](n); r.nextBytes(b)
      for (fmt <- Seq("jpg", "tiff", "nef", "png", "xyz"))
        Exif.fromBytes(b, fmt) // must not throw
      if (n >= 8) {
        // TIFF-header-prefixed junk: the likeliest adversarial shape
        b(0) = 'I'; b(1) = 'I'; b(2) = 42; b(3) = 0
        Exif.fromBytes(b, "tiff")
        b(0) = 'M'; b(1) = 'M'; b(2) = 0; b(3) = 42
        Exif.fromBytes(b, "dng")
      }
      if (n >= 4) {
        // SOI-prefixed junk through the preview scanner
        b(0) = 0xff.toByte; b(1) = 0xd8.toByte; b(2) = 0xff.toByte
        ImageCodec.extractLargestJpegPreview(b)
        Exif.fromBytes(b, "jpg")
      }
    }
    // truncated REAL structures: every prefix of a valid EXIF TIFF block
    val full = graft.kernel.Tiff.encode(
      graft.kernel.DecodedImage(4, 3, Array.fill(12)(0xff112233)), 8,
      Some(graft.kernel.TiffExif(3, "2020:01:01 00:00:00", Some(1.5), Some(-2.5))))
    for (cut <- 0 to math.min(full.length, 400))
      Exif.fromBytes(java.util.Arrays.copyOf(full, cut), "tiff")
  }

  test("SRATIONAL (type 10) renders signed: ExposureBias -1/3") {
    // little-endian block: IFD0 with one SRATIONAL entry (tag 0x9204),
    // value at offset 26: num = -1 (0xFFFFFFFF), den = 3
    val b = java.nio.ByteBuffer.allocate(34).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    b.putShort(1)
    b.putShort(0x9204.toShort).putShort(10).putInt(1).putInt(26)
    b.putInt(0) // next IFD
    b.putInt(-1).putInt(3)
    val arr = b.array()
    val parsed = Exif.parseTiff(arr, 0, arr.length)
    assert(parsed.isDefined)
    val rendered = parsed.get.tags(0x9204)
    assert(rendered.toDouble < 0, s"ExposureBias rendered unsigned: $rendered")
    assert(math.abs(rendered.toDouble - (-1.0 / 3.0)) < 1e-9, rendered)
  }

  test("big-endian (MM) TIFF block parses") {
    // minimal MM block: header + one IFD with Orientation=6
    val b = java.nio.ByteBuffer.allocate(26)
    b.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    b.putShort(1) // one entry
    b.putShort(0x0112).putShort(3).putInt(1).putShort(6).putShort(0)
    b.putInt(0)   // next IFD
    val arr = b.array()
    val parsed = Exif.parseTiff(arr, 0, arr.length)
    assert(parsed.isDefined && parsed.get.orientation.contains(6))
  }

  test("JPEGs without APP1 and non-JPEGs parse to None") {
    assert(Exif.fromJpeg(jpegOf(1)).isEmpty) // plain encoder emits no EXIF
    assert(Exif.fromJpeg(Array[Byte](1, 2, 3)).isEmpty)
    assert(Exif.fromJpeg(ImageCodec.encodePng(
      graft.kernel.DecodedImage(8, 8, new Array[Int](64)))).isEmpty)
  }

  test("property: random orientation/timestamp/GPS round-trip exactly") {
    // 500 randomized writer→parser round trips (seeded): the APP1 layout
    // math (offsets, inline vs remote values, rational encoding) must
    // hold for arbitrary inputs, not just the fixture grid
    val r = new scala.util.Random(20260816L)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy:MM:dd HH:mm:ss")
    for (i <- 0 until 500) {
      val o = 1 + r.nextInt(8)
      val epoch = 315532800L + (math.abs(r.nextLong()) % 2524608000L) // 1980..2050
      val dto = java.time.LocalDateTime
        .ofEpochSecond(epoch, 0, java.time.ZoneOffset.UTC).format(fmt)
      val hasGps = r.nextBoolean()
      val lat = if (hasGps) Some(r.nextDouble() * 180.0 - 90.0) else None
      val lon = if (hasGps) Some(r.nextDouble() * 360.0 - 180.0) else None
      val app1 = Exif.buildApp1(o, dto, lat, lon, make = s"m$i")
      val parsed = Exif.parseTiff(app1, 4 + 6, app1.length)
      assert(parsed.isDefined, s"iter $i: parse failed")
      val e = parsed.get
      assert(e.orientation.contains(o), s"iter $i orientation")
      assert(e.dateTimeOriginal.contains(dto), s"iter $i dto")
      assert(e.timestamp.contains(epoch), s"iter $i ts")
      (lat, e.lat) match {
        case (Some(w), Some(g)) => assert(math.abs(w - g) < 2e-6, s"iter $i lat $w vs $g")
        case (None, None) =>
        case other => fail(s"iter $i lat mismatch: $other")
      }
      (lon, e.lon) match {
        case (Some(w), Some(g)) => assert(math.abs(w - g) < 2e-6, s"iter $i lon $w vs $g")
        case (None, None) =>
        case other => fail(s"iter $i lon mismatch: $other")
      }
    }
  }

  test("Synth JPEG rows carry parseable EXIF matching the deterministic fixture") {
    val rows = (0L until 12L).flatMap(Synth.rowsForBase).filter(_.fmt == "jpg")
    assert(rows.nonEmpty, "no jpg rows in synth sample")
    var checked = 0
    rows.foreach { r =>
      val want = Synth.exifFor(r.group_id, r.variant)
      val got = Exif.fromJpeg(r.bytes)
      assert(got.isDefined, s"${r.image_id}: no EXIF in synth JPEG")
      assert(got.get.orientation == want.orientation, r.image_id)
      assert(got.get.timestamp == want.timestamp, r.image_id)
      assert(math.abs(got.get.lat.get - want.lat.get) < 1e-6, r.image_id)
      assert(math.abs(got.get.lon.get - want.lon.get) < 1e-6, r.image_id)
      checked += 1
    }
    info(s"checked $checked synth JPEGs")
  }

  test("signature kernel carries EXIF columns from the same pass (decode-once)") {
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    val rows = (0L until 6L).flatMap(Synth.rowsForBase)
    rows.foreach { r =>
      val sig = graft.kernel.SignatureKernel.computeOne(
        graft.model.ImageRow(r.image_id, r.bytes, r.w, r.h, r.fmt, r.caption, r.phash), sha)
      // every container Synth writes EXIF into must surface it from the
      // same kernel pass: jpg APP1, tiff IFD, nef RAW, heic item, jxl box,
      // webp EXIF chunk; the rest must stay empty
      if (Set("jpg", "tiff", "nef", "heic", "jxl", "webp")(r.fmt)) {
        val want = Synth.exifFor(r.group_id, r.variant)
        assert(sig.orientation == want.orientation, r.image_id)
        assert(sig.exif_ts == want.timestamp, r.image_id)
        assert(math.abs(sig.gps_lat.get - want.lat.get) < 1e-6, r.image_id)
      } else {
        assert(sig.orientation.isEmpty && sig.exif_ts.isEmpty, r.image_id)
      }
    }
  }

  test("ExifFeatures kernel extracts over a DataFrame (S8 as an operator)") {
    import spark.implicits._
    val rows = (0L until 8L).flatMap(Synth.rowsForBase)
    val images = rows
      .map(r => (r.image_id, r.bytes, r.w, r.h, r.fmt, r.caption, r.phash))
      .toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    val feats = graft.kernel.ExifFeatures.features(spark, images).collect()
    val byId = feats.map(r => r.getString(0) -> r).toMap
    rows.foreach { r =>
      val f = byId(r.image_id)
      if (r.fmt == "jpg") {
        assert(f.getBoolean(1), s"${r.image_id}: has_exif false for jpg")
        val want = Synth.exifFor(r.group_id, r.variant)
        assert(f.getInt(2) == want.orientation.get, r.image_id)
        assert(f.getLong(4) == want.timestamp.get, r.image_id)
      } else {
        assert(!f.getBoolean(1), s"${r.image_id}: unexpected EXIF for ${r.fmt}")
      }
    }
  }
}
