package graft.tools

import graft.Pipeline
import graft.cc.ConnectedComponents
import org.apache.spark.sql.functions._

/**
 * Distributed connected-components at real size (round-3 VERDICT #2):
 * every pipeline bench so far routed CC through the driver union-find
 * (edge counts ≪ 2M), so the large-star/small-star path that a 10⁹-image
 * corpus actually needs had only toy-scale coverage (CcSpec). This bench
 * pushes ≥10⁷ synthetic edges through the ITERATIVE path
 * (driverPathMaxEdges = 0) and records wall + rounds, then asserts label
 * equality against the exact driver union-find on a ~10⁶-edge slice.
 *
 * Edge shape mirrors a dedup corpus plus its adversarial tail:
 *  - families of W nodes with chain + random intra-family edges (the
 *    bulk: many small components, like dup groups)
 *  - one GIANT pure-chain component (diameter = its size) — the
 *    worst case for min-label propagation, converging in ~log₂(size)
 *    doubling rounds; a flat-image corpus that exact-stars into one
 *    component is the real-world analog
 *
 * Usage: runMain graft.tools.CcBench [nFamilies] [familyWidth] [giantLen] [cpus]
 * Defaults: 1.2M families × 10 nodes (~13M edges) + 100k-node chain.
 */
object CcBench {
  def main(args: Array[String]): Unit = {
    val nFamilies = args.headOption.map(_.toLong).getOrElse(1200000L)
    val width = if (args.length > 1) args(1).toInt else 10
    val giantLen = if (args.length > 2) args(2).toLong else 100000L
    val cpus = if (args.length > 3) args(3).toInt else 16
    val spark = Pipeline.session(s"local[$cpus]", shufflePartitions = cpus)
    spark.sparkContext.setLogLevel("WARN")

    val famNodes = nFamilies * width
    // distributed deterministic generation — no driver-side
    // materialization. Each union branch gets its OWN range: branches
    // sharing one range's attribute ids trip Union constraint rewriting.
    val chain = spark.range(0, famNodes, 1, cpus)
      .where((col("id") % width) =!= (width - 1))
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    // one extra pseudo-random intra-family edge per node (cycles + skew)
    val extra = spark.range(0, famNodes, 1, cpus).select(col("id").as("a"),
      ((col("id") - (col("id") % width)) +
        pmod(xxhash64(col("id")), lit(width))).as("b"))
    val giant = spark.range(0, giantLen - 1, 1, cpus)
      .select((col("id") + famNodes).as("a"), (col("id") + famNodes + 1).as("b"))
    // materialize the union before handing it to CC: a live
    // union→project→filter→distinct plan trips a Catalyst constraint-
    // rewrite NoSuchElement edge case in 4.1, and a materialized edge
    // table is also what the real edges stage hands CC
    val edges = chain.unionByName(extra).unionByName(giant)
      .withColumn("dist", lit(0))
      .localCheckpoint()

    val t0 = System.nanoTime()
    val (labels, rounds, nEdges) = ConnectedComponents.runWithStats(
      spark, edges, maxIter = 40, driverPathMaxEdges = 0L)
    val labelled = labels.localCheckpoint()
    val nComps = labelled.select("comp").distinct().count()
    val wall = (System.nanoTime() - t0) / 1e9

    // the giant chain must be ONE component rooted at its min node
    val giantComps = labelled.where(col("id") >= famNodes)
      .select("comp").distinct().collect()
    require(giantComps.length == 1 && giantComps.head.getLong(0) == famNodes,
      s"giant chain split into ${giantComps.length} components")

    // equality vs the exact driver union-find on a ~10⁶-edge slice
    // (each family contributes 2·width − 1 edges)
    val sliceFamilies = math.min(nFamilies, 1100000L / (2L * width - 1))
    val sliceMax = sliceFamilies * width
    val slice = edges.where(col("a") < sliceMax && col("b") < sliceMax)
      .localCheckpoint()
    val iterLabels = ConnectedComponents.run(spark, slice,
      maxIter = 40, driverPathMaxEdges = 0L)
    val ufLabels = ConnectedComponents.run(spark, slice,
      driverPathMaxEdges = Long.MaxValue)
    val diff = iterLabels.withColumnRenamed("comp", "c1")
      .join(ufLabels.withColumnRenamed("comp", "c2"), Seq("id"), "full")
      .where(col("c1").isNull || col("c2").isNull || col("c1") =!= col("c2"))
      .count()
    require(diff == 0, s"iterative vs driver union-find diverged on $diff nodes")

    println(f"""CCBENCH {"edges":$nEdges,"nodes":${famNodes + giantLen},""" +
      f""""components":$nComps,"rounds":$rounds,"giant_chain":$giantLen,""" +
      f""""wall_sec":$wall%.1f,"edges_per_sec":${nEdges / wall}%.0f,""" +
      f""""slice_equality_nodes_checked":${sliceMax},"cpus":$cpus}""")
    spark.stop()
  }
}
