package graft.groups

import graft.lsh.BandJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Group assembly + analytics over connected components — the Spark form of
 * the reference's analyze_group_with_features (scanner.rs:2183-2254):
 *
 *  - membership: component id → members (size > 1 guaranteed: components
 *    only exist where edges exist, scanner.rs:1817's len>1 filter)
 *  - bit-identical counts per content_hash (A4), pixel-identical counts +
 *    appearance-order subgroup ids (A5)
 *  - max_dist: max over members of min-over-8-pivot-dihedral-variants
 *    Hamming distance to the pivot (A6); pivot = lowest-ord member with
 *    features (the reference picks the first sorted member with features —
 *    same idea, ord replaces the filesystem sort)
 *  - status: AllIdentical / SomeIdentical / None (A7)
 *  - group ordering: identical-status first, max_dist asc, pivot size
 *    desc (W1, scanner.rs:1561-1574)
 */
object Groups {

  /** sig: full signatures; comps: (id, comp). Returns one row per group
    * member with group-level analytics attached. */
  def assemble(sig: DataFrame, comps: DataFrame): DataFrame = {
    val members = sig.join(comps, sig("ord") === comps("id"), "inner").drop("id")

    val wg = Window.partitionBy("comp")
    val wContent = Window.partitionBy("comp", "content_hash")
    val wPixel = Window.partitionBy("comp", "pixel_hash")

    val withCounts = members
      .withColumn("group_size", count(lit(1)).over(wg))
      .withColumn("bit_count_dup", count(lit(1)).over(wContent))
      .withColumn("pixel_count_dup",
        when(col("pixel_hash").isNull, lit(0L)).otherwise(count(lit(1)).over(wPixel)))
      .withColumn("n_distinct_content",
        size(collect_set(col("content_hash")).over(wg)))
      .withColumn("has_bit_dup", max(col("bit_count_dup") > 1).over(wg))

    // pivot = lowest-ord member with features; its dihedral variants
    val pivots = withCounts
      .where(col("has_pdq"))
      .withColumn("rn", row_number().over(Window.partitionBy("comp").orderBy("ord")))
      .where(col("rn") === 1)
      .select(col("comp").as("p_comp"), col("variants").as("pivot_variants"))

    val hs = Seq("h0", "h1", "h2", "h3")
    val withDist = withCounts
      .join(pivots, withCounts("comp") === pivots("p_comp"), "left")
      .drop("p_comp")
      .withColumn("dist_to_pivot",
        when(!col("has_pdq") || col("pivot_variants").isNull, lit(null))
          .otherwise(array_min(transform(col("pivot_variants"),
            v => BandJoin.hammingCols(hs.map(col), (0 until 4).map(v.getItem(_)))))))
      .drop("pivot_variants")

    withDist
      .withColumn("max_dist",
        coalesce(max(col("dist_to_pivot")).over(wg), lit(0)))
      .withColumn("status",
        when(col("n_distinct_content") === 1, lit("AllIdentical"))
          .when(col("has_bit_dup"), lit("SomeIdentical"))
          .otherwise(lit("None")))
  }

  /** One row per group, ordered like the reference result list (W1). */
  def groupSummary(assembled: DataFrame): DataFrame = {
    assembled.groupBy("comp").agg(
      first("group_size").as("group_size"),
      first("max_dist").as("max_dist"),
      first("status").as("status"),
      min("image_id").as("first_member"),
      collect_list("image_id").as("members"))
      .orderBy((col("status") =!= lit("None")).desc,
        col("max_dist").asc, col("group_size").desc)
  }
}
