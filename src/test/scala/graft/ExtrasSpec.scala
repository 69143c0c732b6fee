package graft

import graft.functions.{NaturalSort, SearchQuery}
import graft.kernel.Pdq
import graft.lsh.BandJoin
import graft.streaming.StreamingSignatures
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtrasSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("salted band join is recall-neutral (same edge set at S=1 and S=4)") {
    import spark.implicits._
    val r = new java.util.Random(9)
    def rh(): Array[Byte] = { val b = new Array[Byte](32); r.nextBytes(b); b }
    val base = rh()
    def flip(h: Array[Byte], n: Int): Array[Byte] = {
      val out = h.clone()
      (0 until n).foreach { i => out(i) = (out(i) ^ 1).toByte }
      out
    }
    val hashes = Seq(base, flip(base, 2), flip(base, 4)) ++ Seq.fill(200)(rh())
    val sig = hashes.zipWithIndex.map { case (h, i) =>
      val l = Pdq.toLongs(h)
      (i.toLong, l(0), l(1), l(2), l(3), Array(l), false, true)
    }.toDF("ord", "h0", "h1", "h2", "h3", "variants", "low_conf", "has_pdq")
    def edgeSet(s: Int) = BandJoin.edges(sig, 40, saltFactor = s).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getInt(2))).toSet
    assert(edgeSet(1) == edgeSet(4))
    assert(edgeSet(1) == edgeSet(0), "auto-salt mode changed the edge set")
    assert(edgeSet(1).nonEmpty)
  }

  test("natural sort key orders digit runs numerically") {
    import spark.implicits._
    val names = Seq("img10", "img2", "IMG1", "img2b", "a100b20", "a100b3")
    val sorted = names.toDF("n").orderBy(NaturalSort.key(col("n")).asc)
      .collect().map(_.getString(0)).toSeq
    // case-insensitive text order, digit runs numeric: img2 < img10, b3 < b20
    assert(sorted == Seq("a100b3", "a100b20", "IMG1", "img2", "img2b", "img10"))
  }

  test("sort_files: all 12 reference orders produce the right permutations") {
    import spark.implicits._
    // (name, mtime, size, exif_ts, lat, lon) — exif null on two rows
    val df = Seq(
      ("img10.jpg", 50L, 300L, Some(20L), Some(10.0), Some(10.0)),
      ("img2.jpg", 10L, 100L, None, None, None),
      ("IMG1.jpg", 30L, 200L, Some(5L), Some(40.0), Some(40.0)),
      ("a.jpg", 20L, 400L, None, Some(-10.0), Some(-10.0)))
      .map(t => (t._1, t._2, t._3, t._4, t._5, t._6))
      .toDF("name", "mtime", "size", "exif_ts", "lat", "lon")
    def sortedNames(order: String): Seq[String] =
      df.orderBy(NaturalSort.order(order, col("name"), col("mtime"),
        col("size"), col("exif_ts"), col("lat"), col("lon"),
        refLat = 0.0, refLon = 0.0): _*).collect().map(_.getString(0)).toSeq

    assert(sortedNames("name") == Seq("IMG1.jpg", "a.jpg", "img10.jpg", "img2.jpg"))
    assert(sortedNames("name-desc") == sortedNames("name").reverse)
    assert(sortedNames("name-natural") == Seq("a.jpg", "IMG1.jpg", "img2.jpg", "img10.jpg"))
    assert(sortedNames("name-natural-desc") == sortedNames("name-natural").reverse)
    assert(sortedNames("date") == Seq("img2.jpg", "a.jpg", "IMG1.jpg", "img10.jpg"))
    assert(sortedNames("date-desc") == sortedNames("date").reverse)
    assert(sortedNames("size") == Seq("img2.jpg", "IMG1.jpg", "img10.jpg", "a.jpg"))
    assert(sortedNames("size-desc") == sortedNames("size").reverse)
    // exif-date: EXIF'd rows first by ts (IMG1=5 < img10=20), then
    // EXIF-less by mtime (img2=10 < a=20) — scanner.rs:2078-2095
    assert(sortedNames("exif-date") == Seq("IMG1.jpg", "img10.jpg", "img2.jpg", "a.jpg"))
    // desc flips within both halves but EXIF'd still first
    assert(sortedNames("exif-date-desc") == Seq("img10.jpg", "IMG1.jpg", "a.jpg", "img2.jpg"))
    // location: distance to (0,0) — a(-10,-10) < img10(10,10)? equal dist;
    // tie resolved by input order stability is not guaranteed → check set
    // positions: GPS-less img2 must be last, nearest two first
    val loc = sortedNames("location")
    assert(loc.last == "img2.jpg")
    assert(loc.take(2).toSet == Set("a.jpg", "img10.jpg"))
    assert(sortedNames("random").toSet == loc.toSet) // a permutation
    assert(sortedNames("bogus") == sortedNames("name-natural")) // fallback
  }

  test("span cuts: keep-first manifest over cross-doc and within-doc repeats") {
    import spark.implicits._
    // SpanLen=32, SpanStride=16 → windows at pos 1,17,33,… (1-based).
    // S,T,A,B,C: 64-char non-periodic strings, pairwise distinct.
    def s64(mult: Int, off: Int): String =
      (0 until 64).map(i => ('a' + (i * mult + off) % 26).toChar).mkString
    val S = s64(7, 0); val A = s64(11, 3); val B = s64(17, 5)
    // mults must be pairwise distinct (same-step windows can collide);
    // avoid reversals — reversing step m yields step 26-m (19 reversed
    // would collide with S's 7)
    val T = s64(23, 1)
    val docs = Seq(
      (1L, S + A), // canonical copy of S (min doc)
      (2L, S + B), // S duplicated at same alignment → cut
      (3L, s64(3, 9) + s64(9, 2)), // all unique, no cuts
      (4L, T + T)  // within-doc repeat: second T cut, first kept
    ).toDF("doc_id", "text")
    val got = graft.queries.TextEmbedQueries.spanCuts(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // doc2: windows pos 1,17,33 inside S match doc1's → one island
    //   [1, 33+31] with keep_doc=1; doc4: windows 65,81,97 inside the
    //   second T match pos 1,17,33 of the first → island [65,128], keep 4.
    assert(got == Set((2L, 1L, 64L, 3L, 1L), (4L, 65L, 128L, 3L, 4L)))
  }

  test("span apply: cuts excised, keep-first copy survives, full-cut doc empties") {
    import spark.implicits._
    def s64(mult: Int, off: Int): String =
      (0 until 64).map(i => ('a' + (i * mult + off) % 26).toChar).mkString
    val S = s64(7, 0); val A = s64(11, 3); val B = s64(17, 5)
    val T = s64(23, 1); val U = s64(3, 9) + s64(9, 2)
    val docs = Seq(
      (1L, S + A), // canonical copy of S — survives intact
      (2L, S + B), // S's windows cut → only B remains
      (3L, U),     // all unique — untouched
      (4L, T + T), // within-doc repeat: second T excised
      (5L, S)      // every window duplicated → empties completely
    ).toDF("doc_id", "text")
    val got = graft.queries.TextEmbedQueries.spanApply(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((0L, 128L, 128L, S + A)))
    assert(got(2L) == ((1L, 128L, 64L, B)))
    assert(got(3L) == ((0L, 128L, 128L, U)))
    assert(got(4L) == ((1L, 128L, 64L, T)))
    assert(got(5L) == ((1L, 64L, 0L, "")))
  }

  test("search query parser: ops, ranges, implicit contains") {
    val cs = SearchQuery.parse("size:10-30 name:contains:red iso:1600- f:>2.8 make:Canon")
    assert(cs.map(c => (c.tag, c.op)) == Seq(
      ("size", "range"), ("name", "contains"), ("iso", "ge"), ("f", "gt"),
      ("make", "contains")))
    assert(SearchQuery.parse("n:42").head.op == "eq")
  }

  test("streaming signatures: files stream through the kernel, checkpointed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val rows = (0L until 6L).flatMap(graft.synth.Synth.rowsForBase)
      .map(r => (r.image_id, r.bytes, r.w, r.h, r.fmt, r.caption, r.phash))
    rows.toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
      .write.mode("overwrite").parquet(s"$dir/in")
    val q = StreamingSignatures.start(spark, s"$dir/in", s"$dir/out", s"$dir/ckpt")
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == rows.size)
    assert(out.where(col("has_pdq")).count() > 0)
    // restart with no new files: idempotent, no duplicate appends
    val q2 = StreamingSignatures.start(spark, s"$dir/in", s"$dir/out", s"$dir/ckpt")
    q2.awaitTermination(120000)
    assert(spark.read.parquet(s"$dir/out").count() == rows.size)
  }

  test("stateful streaming exact-dup detection (flatMapGroupsWithState)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val dups = StreamingSignatures.streamingExactDups(
      spark, input.toDF().toDF("content_hex", "image_id"))
    val q = dups.writeStream.format("memory").queryName("stream_dups")
      .outputMode("append").start()
    try {
      // batch 1: h1 seen twice (one dup), h2 once
      input.addData(("h1", "a"), ("h1", "b"), ("h2", "c"))
      q.processAllAvailable()
      // batch 2: h1 again (dup #3), h2 again (dup #2) — state crosses batches
      input.addData(("h1", "d"), ("h2", "e"))
      q.processAllAvailable()
      val got = spark.table("stream_dups")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
      assert(got == Set(
        ("h1", "b", "a", 2), ("h1", "d", "a", 3), ("h2", "e", "c", 2)), got.toString)
    } finally q.stop()
  }

  test("windowed ingest metrics (watermark + tumbling window)") {
    import spark.implicits._
    val events = Seq(
      (java.sql.Timestamp.valueOf("2026-01-01 00:01:00"), "scan", 1.0),
      (java.sql.Timestamp.valueOf("2026-01-01 00:02:00"), "scan", 2.0),
      (java.sql.Timestamp.valueOf("2026-01-01 00:07:00"), "hash", 3.0))
      .toDF("ts", "event_type", "value")
    val m = StreamingSignatures.ingestMetrics(events).collect()
    assert(m.length == 2)
  }

  test("hardlink subgroups (A9/J5): same file_id within a group counts once") {
    import spark.implicits._
    // two dup groups; group 10 has three paths to one inode (f1) plus a
    // distinct file; group 20 has no hardlinks
    val assembled = Seq(
      (10L, "a"), (10L, "b"), (10L, "c"), (10L, "d"),
      (20L, "e"), (20L, "f"))
      .toDF("comp", "image_id")
    val fileIds = Seq(
      ("a", 100L), ("b", 100L), ("c", 100L), ("d", 101L),
      ("e", 200L), ("f", 201L))
      .toDF("image_id", "file_id")
    val got = graft.groups.Groups.withHardlinks(assembled, fileIds)
      .select("image_id", "hardlink_count", "is_hardlink").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got("a") == ((3L, true)) && got("b") == ((3L, true)) && got("c") == ((3L, true)))
    assert(got("d") == ((1L, false)))
    assert(got("e") == ((1L, false)) && got("f") == ((1L, false)))
    // a member with no file id row counts as its own storage copy
    val sparse = graft.groups.Groups.withHardlinks(assembled,
      fileIds.where($"image_id" =!= "a"))
      .where($"image_id" === "a").select("hardlink_count").head().getLong(0)
    assert(sparse == 1L)
  }

  test("keep-list: one keeper per group under the chosen W3 order") {
    import spark.implicits._
    val assembled = Seq(
      (10L, "a", 500L), (10L, "b", 900L), (10L, "c", 900L),
      (20L, "d", 100L), (20L, "e", 50L))
      .toDF("comp", "image_id", "size")
    val got = graft.groups.Groups.keepList(assembled, Seq(-$"size"))
      .select("image_id", "keep").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // keep-largest; size tie broken by image_id asc
    assert(got == Map("a" -> false, "b" -> true, "c" -> false,
      "d" -> true, "e" -> false))
    // null-safe key (exif-date shape: stamped first, then by mtime)
    val withTs = Seq(
      (30L, "f", Some(200L), 5L), (30L, "g", None, 1L), (30L, "h", Some(100L), 9L))
      .toDF("comp", "image_id", "exif_ts", "mtime")
    val keepOldest = graft.groups.Groups.keepList(withTs,
      Seq($"exif_ts".isNull.cast("int"), coalesce($"exif_ts", $"mtime")))
      .where($"keep").select("image_id").head().getString(0)
    assert(keepOldest == "h", "earliest EXIF-stamped member must win")
  }
}
