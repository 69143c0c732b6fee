package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Natural-order sort key (the reference's natord comparison,
 * scanner.rs:2026-2038 / sort_files :2040-2109): digit runs compare
 * numerically, text case-insensitively — "img2" < "img10".
 *
 * Implemented as a sortable-key transform: every digit run is left-padded
 * with zeros to fixed width, the rest lowercased. A pure `Column`
 * expression pipeline (regexp over split), no UDF — stays in codegen.
 */
object NaturalSort {
  private val Width = 12

  /** Sortable key column: lowercase, digit runs zero-padded to 12. */
  def key(c: Column): Column = {
    // split into alternating text/digit runs, pad the digit runs, re-join
    val parts = split(lower(c), "(?<=\\D)(?=\\d)|(?<=\\d)(?=\\D)")
    array_join(
      transform(parts, p =>
        when(p.rlike("^\\d+$"), lpad(p, Width, "0")).otherwise(p)),
      "")
  }

  /** The reference's 12 sort orders (scanner.rs:2040-2109), as sort
    * Columns over (name, mtime-ish, size) columns. */
  def order(sortOrder: String, name: Column, date: Column, size: Column,
            seed: Long = 42L): Seq[Column] = sortOrder match {
    case "name" => Seq(name.asc)
    case "name-desc" => Seq(name.desc)
    case "natural" => Seq(key(name).asc)
    case "natural-desc" => Seq(key(name).desc)
    case "date" => Seq(date.asc)
    case "date-desc" => Seq(date.desc)
    case "size" => Seq(size.asc)
    case "size-desc" => Seq(size.desc)
    case "random" => Seq(rand(seed).asc)
    case other => throw new IllegalArgumentException(s"unknown sort order: $other")
  }
}
