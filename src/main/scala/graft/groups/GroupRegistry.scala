package graft.groups

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Cross-run-stable group identity (SURVEY.md S11/J7, db.rs:1277-1403):
 * every duplicate group gets a UUID; when any member's PDQ hash already
 * maps to a UUID in the registry, that UUID is reused (first match by
 * lowest ord, mirroring the reference's first-found semantics,
 * db.rs:1304-1321); otherwise the group gets a deterministic new UUID
 * derived from its minimum member hash — so re-running the same corpus
 * yields identical UUIDs (idempotent, unlike the reference's random v4).
 */
object GroupRegistry {
  /** Deterministic UUID (v8-style: md5 of the group's min hash words). */
  private val mintUuid = udf((h0: Long, h1: Long, h2: Long, h3: Long) => {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(32)
    bb.putLong(h0).putLong(h1).putLong(h2).putLong(h3)
    val d = md.digest(bb.array())
    new java.util.UUID(
      java.nio.ByteBuffer.wrap(d, 0, 8).getLong,
      java.nio.ByteBuffer.wrap(d, 8, 8).getLong).toString
  })

  /**
   * assembled: per-member group rows (needs comp, ord, h0..h3).
   * registry: (h0,h1,h2,h3, group_uuid) — may be empty.
   * Returns (comp, group_uuid) one row per group.
   */
  def assign(assembled: DataFrame, registry: DataFrame): DataFrame = {
    val members = assembled.select("comp", "ord", "h0", "h1", "h2", "h3")
    // earliest member whose hash is already registered wins
    val matched = members.join(registry, Seq("h0", "h1", "h2", "h3"))
      .groupBy("comp").agg(min(struct(col("ord"), col("group_uuid"))).as("m"))
      .select(col("comp"), col("m.group_uuid").as("reused_uuid"))
    // deterministic mint from the group's minimum member hash
    val minted = members
      .groupBy("comp")
      .agg(min(struct(col("h0"), col("h1"), col("h2"), col("h3"))).as("mh"))
      .select(col("comp"), mintUuid(col("mh.h0"), col("mh.h1"), col("mh.h2"),
        col("mh.h3")).as("minted_uuid"))
    minted.join(matched, Seq("comp"), "left")
      .select(col("comp"),
        coalesce(col("reused_uuid"), col("minted_uuid")).as("group_uuid"))
  }

  /** Registry rows implied by an assignment (every member hash → uuid) —
    * append/merge into the registry table for the next run. */
  def registryRows(assembled: DataFrame, assigned: DataFrame): DataFrame =
    assembled.select("comp", "h0", "h1", "h2", "h3").distinct()
      .join(assigned, "comp")
      .select("h0", "h1", "h2", "h3", "group_uuid")

  /** Persist: idempotent merge by hash (latest uuid wins deterministically
    * by uuid ordering — stable across reruns). */
  def merge(spark: SparkSession, path: String, rows: DataFrame): Unit = {
    val existing =
      try spark.read.parquet(path)
      catch { case scala.util.control.NonFatal(_) => rows.limit(0) }
    existing.unionByName(rows)
      .groupBy("h0", "h1", "h2", "h3")
      .agg(min("group_uuid").as("group_uuid"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path-next")
    // swap via overwrite read-back (single-file registry table)
    val next = spark.read.parquet(s"$path-next")
    next.write.mode(SaveMode.Overwrite).parquet(path)
  }
}
