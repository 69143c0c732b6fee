package graft.groups

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/**
 * S13 completion — PHYSICAL application of the keep/drop manifest: the
 * batch, distributed form of the reference's interactive file actions.
 *
 *  - `delete`: phdupes.rs:477-494 (`fs::remove_file` over the selected
 *    group members) and state.rs:824-860 (`perform_deletion`).
 *  - `move`: fileops.rs:97-257 (`move_files_into`) — relocate the dropped
 *    files into a destination directory, rename within a filesystem,
 *    copy+delete across filesystems, NEVER overwriting an existing
 *    destination, with collision-safe and length-safe destination names
 *    (fileops.rs:384-427 truncates to the 255-byte NAME_MAX).
 *
 * Spark shape: the manifest's `keep = false` rows (path-joined — the
 * input contract carries image_id, not paths, so the caller supplies the
 * (image_id → path) mapping it scanned from) are applied inside
 * `mapPartitions` — one task per manifest slice, no shuffle, results
 * returned as a lineage table (path, action, ok, dest, err) the caller
 * persists next to the manifest. This is the executors-mount-a-shared-
 * POSIX-tree layout (NFS/Lustre/FUSE-mounted object store); at 10⁹ files
 * the same rows drive the store's native delete/rename API instead.
 *
 * Idempotent by design: a re-run after a partial failure sees already-
 * deleted (or already-moved) sources as `already_absent` successes, so a
 * task retry or a resumed job cannot double-fail — the analog of the
 * reference's retained `marked_for_deletion` set (state.rs:1080-1084,
 * only FAILED paths stay marked).
 *
 * Safety rails, because this is the one irreversible operator:
 *  - every source must canonicalize under `allowedRoot` — anything else
 *    is refused per-row (no action, ok = false);
 *  - a manifest where some path is BOTH kept and dropped (a malformed
 *    join upstream) refuses wholesale before any side effect;
 *  - `dryRun = true` (the default) performs no side effect and reports
 *    exactly what an apply run would do.
 */
object FileOps {
  /** One result row per acted-on manifest row. `action` ∈ would_delete /
    * would_move / deleted / moved / already_absent / refused / error. */
  final case class OpResult(path: String, action: String, ok: Boolean,
                            dest: String, err: String)

  final val ModeDelete = "delete"
  final val ModeMove = "move"

  /** NAME_MAX on every POSIX fs the reference detects (fileops.rs:384). */
  private final val MaxNameBytes = 255

  /**
   * Apply (or plan, with `dryRun`) the drop side of a keep/drop manifest.
   *
   * @param manifest    rows with `path: String` and `keep: Boolean`
   *                    (e.g. [[Groups.keepList]] output joined with the
   *                    caller's image_id → path table)
   * @param mode        [[ModeDelete]] or [[ModeMove]]
   * @param allowedRoot directory every source path must live under
   * @param destDir     required for `move`: destination directory
   *                    (created up front, driver-side)
   * @param dryRun      report planned actions without side effects
   */
  def applyManifest(manifest: DataFrame, mode: String, allowedRoot: String,
                    destDir: Option[String] = None,
                    dryRun: Boolean = true): Dataset[OpResult] = {
    require(mode == ModeDelete || mode == ModeMove,
      s"mode '$mode' is not $ModeDelete|$ModeMove")
    val dest = destDir.map { d =>
      val p = Paths.get(d)
      if (!dryRun) Files.createDirectories(p)
      p.toAbsolutePath.normalize.toString
    }
    require(mode == ModeDelete || dest.isDefined, "move needs a destDir")

    val spark = manifest.sparkSession
    import spark.implicits._

    val paths = manifest.select(col("path").cast("string"), col("keep").cast("boolean"))
    // refuse a manifest that both keeps and drops one physical path: the
    // upstream join was bad and "apply the drops" would eat a keeper
    val conflicted = paths.groupBy("path")
      .agg(countDistinct("keep").as("k")).where(col("k") > 1)
      .limit(1).collect()
    require(conflicted.isEmpty,
      s"manifest keeps AND drops '${conflicted.head.getString(0)}' — refusing")

    val root = Paths.get(allowedRoot).toAbsolutePath.normalize.toString
    val isDelete = mode == ModeDelete
    val dry = dryRun
    val destRoot = dest.getOrElse("")

    paths.where(!col("keep")).select("path").distinct()
      .as[String].mapPartitions { it =>
        it.map(p => applyOne(p, root, isDelete, destRoot, dry))
      }
  }

  /** One source file through the chosen op — the per-row kernel. */
  private def applyOne(rawPath: String, root: String, isDelete: Boolean,
                       destRoot: String, dryRun: Boolean): OpResult = {
    val src =
      try Paths.get(rawPath).toAbsolutePath.normalize
      catch { case scala.util.control.NonFatal(e) =>
        return OpResult(rawPath, "refused", ok = false, "", s"bad path: ${e.getMessage}")
      }
    if (!(src.toString == root || src.toString.startsWith(root + java.io.File.separator)))
      return OpResult(rawPath, "refused", ok = false, "",
        s"outside allowed root $root")
    try {
      // NOFOLLOW: a dangling symlink is a present directory entry the op
      // must still act on (delete/move the LINK) — Files.exists would
      // follow it, report absent, and leave the entry behind forever
      if (!Files.exists(src, java.nio.file.LinkOption.NOFOLLOW_LINKS))
        OpResult(rawPath, "already_absent", ok = true, "", "")
      else if (dryRun)
        OpResult(rawPath, if (isDelete) "would_delete" else "would_move",
          ok = true,
          if (isDelete) "" else destName(src, destRoot).toString, "")
      else if (isDelete) {
        Files.deleteIfExists(src)
        OpResult(rawPath, "deleted", ok = true, "", "")
      } else {
        val dst = moveNoOverwrite(src, destRoot)
        OpResult(rawPath, "moved", ok = true, dst.toString, "")
      }
    } catch { case scala.util.control.NonFatal(e) =>
      OpResult(rawPath, "error", ok = false, "",
        s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  /** Collision- and length-safe destination path (fileops.rs:145-197 +
    * 384-427): the plain name first; on collision, a deterministic
    * source-path-derived suffix before the extension; names over
    * NAME_MAX bytes truncated keeping the extension. */
  private def destName(src: Path, destRoot: String): Path = {
    val plain = Paths.get(destRoot).resolve(fitName(src.getFileName.toString))
    if (!Files.exists(plain)) plain
    else Paths.get(destRoot).resolve(fitName(suffixed(src)))
  }

  private def suffixed(src: Path): String = {
    val name = src.getFileName.toString
    val tag = f"${scala.util.hashing.MurmurHash3.stringHash(src.toString)}%08x"
    val dot = name.lastIndexOf('.')
    if (dot > 0) s"${name.substring(0, dot)}~$tag${name.substring(dot)}"
    else s"$name~$tag"
  }

  /** Truncate a file name to NAME_MAX utf-8 bytes, keeping the extension
    * (fileops.rs:384-427's truncate_filename_to_limit). */
  private[graft] def fitName(name: String): String = {
    if (name.getBytes("UTF-8").length <= MaxNameBytes) return name
    val dot = name.lastIndexOf('.')
    val (stem0, ext0) = if (dot > 0) (name.substring(0, dot), name.substring(dot))
      else (name, "")
    // an extension that alone (nearly) exhausts NAME_MAX cannot be
    // preserved — truncate the whole name instead, or the result would
    // still exceed the limit and every move would ENAMETOOLONG forever
    val (stem, ext) =
      if (ext0.getBytes("UTF-8").length >= MaxNameBytes) (name, "")
      else (stem0, ext0)
    val budget = math.max(1, MaxNameBytes - ext.getBytes("UTF-8").length)
    var cut = math.min(stem.length, budget)
    while (stem.substring(0, cut).getBytes("UTF-8").length > budget) cut -= 1
    stem.substring(0, cut) + ext
  }

  /** Move src into destRoot without ever overwriting: rename within the
    * fs, Files.move's copy+delete across stores, one collision retry with
    * the deterministic suffix (two racers on the SAME source are task
    * retries — the winner moved it, the loser sees already_absent on its
    * re-read; two DIFFERENT sources with one name diverge on the suffix). */
  private def moveNoOverwrite(src: Path, destRoot: String): Path = {
    val first = Paths.get(destRoot).resolve(fitName(src.getFileName.toString))
    try { Files.move(src, first); first }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val second = Paths.get(destRoot).resolve(fitName(suffixed(src)))
        Files.move(src, second)
        second
    }
  }
}
