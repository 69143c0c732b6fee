package graft

import graft.groups.FileOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}

/** S13 physical apply — the delete / move-into-dir flow
  * (phdupes.rs:477-494, state.rs:824-860, fileops.rs:97-257) driven
  * against real temp files: dry-run touches nothing, delete removes only
  * drops, move never overwrites, re-runs are idempotent, and the safety
  * rails (allowed root, keep∩drop conflict) refuse before acting. */
class FileOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Fresh root with n drop files + one keeper; returns (root, manifest). */
  private def fixture(n: Int): (Path, org.apache.spark.sql.DataFrame) = {
    val root = Files.createTempDirectory("fileops")
    val rows = (0 until n).map { i =>
      val f = root.resolve(f"dup-$i%03d.jpg")
      Files.write(f, s"bytes-$i".getBytes)
      (f.toString, false)
    } :+ {
      val k = root.resolve("keeper.jpg")
      Files.write(k, "keeper".getBytes)
      (k.toString, true)
    }
    (root, rows.toDF("path", "keep"))
  }

  test("dry-run plans every drop and touches nothing") {
    val (root, manifest) = fixture(4)
    val res = FileOps.applyManifest(manifest, FileOps.ModeDelete,
      root.toString, dryRun = true).collect()
    assert(res.length == 4)
    assert(res.forall(r => r.action == "would_delete" && r.ok))
    assert(Files.list(root).count() == 5) // all files still there
  }

  test("delete removes exactly the drops; keeper survives; re-run idempotent") {
    val (root, manifest) = fixture(4)
    val res = FileOps.applyManifest(manifest, FileOps.ModeDelete,
      root.toString, dryRun = false).collect()
    assert(res.count(r => r.action == "deleted" && r.ok) == 4)
    assert(Files.exists(root.resolve("keeper.jpg")))
    assert(Files.list(root).count() == 1)
    // a resumed/retried run sees finished rows as successes, not failures
    val again = FileOps.applyManifest(manifest, FileOps.ModeDelete,
      root.toString, dryRun = false).collect()
    assert(again.forall(r => r.action == "already_absent" && r.ok))
  }

  test("move relocates drops without overwriting; collision gets a suffix") {
    val (root, manifest) = fixture(3)
    val dest = Files.createTempDirectory("fileops-dest")
    // plant a collision: dest already holds a file named like drop 0
    Files.write(dest.resolve("dup-000.jpg"), "squatter".getBytes)
    val res = FileOps.applyManifest(manifest, FileOps.ModeMove,
      root.toString, Some(dest.toString), dryRun = false).collect()
    assert(res.count(r => r.action == "moved" && r.ok) == 3)
    // the squatter survives untouched; the colliding drop landed suffixed
    assert(new String(Files.readAllBytes(dest.resolve("dup-000.jpg"))) == "squatter")
    val landed = Files.list(dest).iterator()
    var names = List.empty[String]
    while (landed.hasNext) names ::= landed.next().getFileName.toString
    assert(names.count(_.startsWith("dup-000")) == 2) // squatter + suffixed
    assert(names.exists(n => n.startsWith("dup-000~") && n.endsWith(".jpg")))
    assert(Files.exists(root.resolve("keeper.jpg")))
  }

  test("paths outside the allowed root are refused per-row, not acted on") {
    val (root, _) = fixture(0)
    val outside = Files.createTempFile("fileops-outside", ".jpg")
    Files.write(outside, "x".getBytes)
    val manifest = Seq((outside.toString, false)).toDF("path", "keep")
    val res = FileOps.applyManifest(manifest, FileOps.ModeDelete,
      root.toString, dryRun = false).collect()
    assert(res.length == 1 && res.head.action == "refused" && !res.head.ok)
    assert(Files.exists(outside))
  }

  test("a manifest that keeps AND drops one path refuses wholesale") {
    val (root, _) = fixture(0)
    val f = root.resolve("both.jpg")
    Files.write(f, "x".getBytes)
    val manifest = Seq((f.toString, true), (f.toString, false)).toDF("path", "keep")
    val e = intercept[IllegalArgumentException] {
      FileOps.applyManifest(manifest, FileOps.ModeDelete,
        root.toString, dryRun = false).collect()
    }
    assert(e.getMessage.contains("keeps AND drops"))
    assert(Files.exists(f))
  }

  test("NAME_MAX truncation keeps the extension (fileops.rs:384-427)") {
    val longStem = "x" * 300
    val fitted = FileOps.fitName(s"$longStem.jpeg")
    assert(fitted.getBytes("UTF-8").length <= 255)
    assert(fitted.endsWith(".jpeg"))
    assert(FileOps.fitName("short.jpg") == "short.jpg")
    // an extension that alone exceeds NAME_MAX can't be preserved — the
    // whole name truncates instead of emitting a still-too-long result
    val longExt = FileOps.fitName("a." + "y" * 300)
    assert(longExt.getBytes("UTF-8").length <= 255)
    // multi-byte chars never split mid-codepoint
    val multi = FileOps.fitName("é" * 200 + ".jpg")
    assert(multi.getBytes("UTF-8").length <= 255 && multi.endsWith(".jpg"))
  }

  test("dangling symlink is a present entry: deleted, not already_absent") {
    val (root, _) = fixture(0)
    val target = root.resolve("gone.jpg")
    val link = root.resolve("link.jpg")
    Files.createSymbolicLink(link, target) // target never exists
    val manifest = Seq((link.toString, false)).toDF("path", "keep")
    val res = FileOps.applyManifest(manifest, FileOps.ModeDelete,
      root.toString, dryRun = false).collect()
    assert(res.head.action == "deleted" && res.head.ok)
    assert(!Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
  }
}
