package graft

import graft.functions.SuffixArray
import org.scalatest.funsuite.AnyFunSuite

/** Prefix-doubling suffix array vs a direct in-memory suffix sort —
  * ranks must equal the dense rank of each suffix string corpus-wide,
  * ties exactly on byte-identical suffixes. */
class SuffixArraySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def bruteRanks(docs: Seq[(Long, String)]): Map[(Long, Int), Long] = {
    val suffixes = for {
      (id, text) <- docs if text.nonEmpty
      pos <- 1 to text.length
    } yield ((id, pos), text.substring(pos - 1))
    val order = suffixes.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    suffixes.map { case (k, s) => k -> order(s) }.toMap
  }

  private def run(docs: Seq[(Long, String)]): Map[(Long, Int), Long] = {
    import spark.implicits._
    SuffixArray.ranks(docs.toDF("doc_id", "text"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
  }

  test("ranks == direct suffix sort (mixed corpus, shared substrings)") {
    val docs = Seq(
      1L -> "banana", 2L -> "bananas", 3L -> "anagram",
      4L -> "banana", // exact dup of doc 1: every suffix ties
      5L -> "aaaaaaa", 6L -> "", 7L -> "b")
    val got = run(docs)
    val want = bruteRanks(docs)
    assert(got == want,
      s"diff=${(got.toSet diff want.toSet).take(5)} / ${(want.toSet diff got.toSet).take(5)}")
    // dup doc: all suffixes of doc 4 tie with doc 1's
    (1 to 6).foreach(p => assert(got((1L, p)) == got((4L, p))))
    // empty doc contributes nothing
    assert(!got.keys.exists(_._1 == 6L))
  }

  test("ranks == direct sort on random corpus (small alphabet forces deep ties)") {
    val r = new scala.util.Random(7)
    val docs = (1L to 40L).map(i =>
      i -> Seq.fill(1 + r.nextInt(60))("ab" (r.nextInt(2))).mkString)
    val got = run(docs)
    assert(got == bruteRanks(docs))
  }

  private def withSliceLen[T](n: Int)(body: => T): T = {
    spark.conf.set("graft.suffix.sliceLen", n.toString)
    try body finally spark.conf.unset("graft.suffix.sliceLen")
  }

  test("ranks unchanged when document slicing engages (sliceLen < doc length)") {
    val docs = Seq(
      1L -> "banana", 2L -> "bananas", 3L -> "anagram",
      4L -> "banana", 5L -> "aaaaaaa", 6L -> "", 7L -> "b")
    val got = withSliceLen(3)(run(docs))
    assert(got == bruteRanks(docs))
  }

  test("pathologically long doc: per-task fan-out bounded by slices, not doc length") {
    import spark.implicits._
    val r = new scala.util.Random(11)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val longDoc = Seq.fill(48000)(alpha(r.nextInt(26))).mkString
    val docs = Seq(1L -> longDoc, 2L -> "short sibling")
    val maxTaskShuffleRecords = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          val w = m.shuffleWriteMetrics.recordsWritten
          maxTaskShuffleRecords.updateAndGet(c => math.max(c, w))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // AQE partition coalescing re-merges this tiny corpus (~50 KB) into
    // single-task stages downstream — correct behavior, since it coalesces
    // by BYTE size, which at real scale bounds rows per task on its own.
    // Disable it here so the listener measures what slicing controls: the
    // per-task fan-out of the per-character explode.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val n = withSliceLen(1000)(
        SuffixArray.ranks(docs.toDF("doc_id", "text")).count())
      assert(n == longDoc.length + "short sibling".length)
      // listener events are delivered asynchronously
      Thread.sleep(3000)
    } finally {
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
      spark.sparkContext.removeSparkListener(listener)
    }
    // unsliced, the task reading doc 1 shuffle-writes all 48k suffix rows;
    // sliced (1000 chars × 48 slices over 8 partitions) no task should come
    // near half the document
    val worst = maxTaskShuffleRecords.get()
    assert(worst > 0, "listener saw no shuffle writes")
    assert(worst < 24000,
      s"a single task shuffle-wrote $worst records — slicing did not spread the explode")
  }

  test("adjacent-rank LCP scan == brute-force sorted-suffix scan (interior spans)") {
    import spark.implicits._
    val docs = Seq(
      1L -> "aaa the duplicated interior span here bbb",
      2L -> "ccc the duplicated interior span here ddd",
      3L -> "totally different words only",
      4L -> "aaa the duplicated interior span here bbb") // exact dup of 1
    val minLcp = 12; val maxLcp = 64
    val got = SuffixArray.adjacentLcp(docs.toDF("doc_id", "text"), minLcp, maxLcp)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4)))
      .toSet

    // brute force: sort all suffixes (tie-break doc, pos), scan adjacency
    val suffixes = (for {
      (id, text) <- docs
      pos <- 1 to text.length
    } yield (text.substring(pos - 1), id, pos))
      .sortBy { case (s, id, pos) => (s, id, pos) }
    val want = suffixes.sliding(2).collect {
      case Seq((sb, ib, pb), (sa, ia, pa)) =>
        val la = sa.take(maxLcp); val lb = sb.take(maxLcp)
        val lcp = la.zip(lb).takeWhile { case (x, y) => x == y }.length
        ((ia, pa, ib, pb, lcp.toLong), lcp)
    }.collect { case (row, lcp) if lcp >= minLcp => row }.toSet
    assert(got == want,
      s"only-got=${(got diff want).take(4)} only-want=${(want diff got).take(4)}")
    // the interior planted span must surface across docs 1/2
    assert(got.exists(p => Set(p._1, p._3) == Set(1L, 2L) ||
      Set(p._1, p._3) == Set(2L, 4L)), s"planted interior span missing: $got")
  }

  test("adjacent-rank LCP scan correct when slices are shorter than maxLcp") {
    import spark.implicits._
    val docs = Seq(
      1L -> "aaa the duplicated interior span here bbb",
      2L -> "ccc the duplicated interior span here ddd",
      3L -> "totally different words only")
    val minLcp = 12; val maxLcp = 64
    def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4)))
      .toSet
    val unsliced = collect(
      SuffixArray.adjacentLcp(docs.toDF("doc_id", "text"), minLcp, maxLcp))
    // sliceLen 7 « maxLcp 64: every pre-string crosses many slice
    // boundaries and must come from the overlap extension
    val sliced = withSliceLen(7)(collect(
      SuffixArray.adjacentLcp(docs.toDF("doc_id", "text"), minLcp, maxLcp)))
    assert(sliced == unsliced,
      s"only-sliced=${(sliced diff unsliced).take(4)} only-unsliced=${(unsliced diff sliced).take(4)}")
  }

  test("dup classes find tail-anchored duplicate text across docs") {
    import spark.implicits._
    val tail = "the quick brown fox jumps over it"
    val docs = Seq(
      10L -> s"first document ends with $tail",
      20L -> s"second one also ends with $tail",
      30L -> "unrelated content entirely here")
    val classes = SuffixArray.dupClasses(docs.toDF("doc_id", "text"), minLen = 10)
      .collect()
    assert(classes.nonEmpty, "no dup classes found")
    // the longest shared tail (≥10 chars) appears as a class spanning docs 10+20
    assert(classes.forall(_.getLong(2) == 2), "classes must span both docs")
    assert(classes.exists(r => r.getLong(1) == 2 && r.getLong(2) == 2))
    // no class involves the unrelated doc
    val ranksOf30 = SuffixArray.ranks(docs.toDF("doc_id", "text"))
      .where(org.apache.spark.sql.functions.col("doc_id") === 30L)
      .select("srank").collect().map(_.getLong(0)).toSet
    assert(classes.forall(r => !ranksOf30.contains(r.getLong(0))))
  }
}
