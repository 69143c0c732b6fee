package graft.cc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Greedy single-pass grouping — the reference MIH library's alternative to
 * union-find (hamminghash.rs:191-271, SURVEY.md A3): iterate nodes in
 * ascending id order; an ungrouped node seeds a new group and grabs all of
 * its still-ungrouped direct neighbors. Unlike connected components this
 * does NOT close transitively: a chain a-b-c yields groups {a,b} and {c}.
 *
 * The scan order makes the sequential form look inherently serial, but the
 * result has a closed characterization that parallelizes:
 *
 *   seeds  = the lexicographically-greedy maximal independent set by id
 *            (s is a seed iff no adjacent seed has a smaller id)
 *   grp(v) = v when v is a seed, else min adjacent seed
 *            (every non-seed has an adjacent seed with a smaller id, and in
 *             ascending scan order the smallest one grabs v first)
 *
 * Phase 1 computes the MIS with priority rounds (Blelloch et al., "Greedy
 * sequential maximal independent set…", SPAA'12 — the deterministic
 * by-priority variant): each round, every undecided node that is a local
 * minimum among undecided neighbors (or has none left) becomes a seed;
 * undecided neighbors of new seeds become non-seeds. Removing decided
 * non-seeds never changes any other node's seed condition (it only depends
 * on smaller-id MIS members), so the fixpoint equals the sequential MIS.
 * Phase 2 is a single join: non-seed → min adjacent seed.
 *
 * Rounds are bounded by the longest monotone path; duplicate clusters are
 * tiny, so 2-5 rounds in practice. Below `driverPathMaxEdges` the exact
 * sequential scan runs driver-side (same result, zero shuffle rounds) —
 * the same adaptive design as [[ConnectedComponents]].
 */
object GreedyGrouping {

  /** Sequential reference semantics (hamminghash.rs:191-271 port). */
  def sequential(edges: Iterable[(Long, Long)]): Map[Long, Long] = {
    val adj = new java.util.HashMap[Long, java.util.TreeSet[java.lang.Long]]()
    def add(a: Long, b: Long): Unit =
      adj.computeIfAbsent(a, _ => new java.util.TreeSet[java.lang.Long]()).add(b)
    edges.foreach { case (a, b) => if (a != b) { add(a, b); add(b, a) } }
    val nodes = adj.keySet().toArray(new Array[java.lang.Long](0))
      .map(_.longValue()).sorted
    val grp = new java.util.HashMap[Long, Long]()
    nodes.foreach { n =>
      if (!grp.containsKey(n)) {
        grp.put(n, n)
        adj.get(n).forEach(m => if (!grp.containsKey(m)) grp.put(m, n))
      }
    }
    import scala.jdk.CollectionConverters._
    grp.asScala.map { case (k, v) => (k.longValue(), v.longValue()) }.toMap
  }

  /**
   * edges: (a: long, b: long) undirected, self-loops ignored.
   * Returns (id: long, grp: long) for every node incident to an edge;
   * grp is the seed's id.
   *
   * `nEdgesHint` ≥ 0 is the caller's already-known distinct-edge count
   * (the A8 comparison metric, same contract as BandJoin's nConfHint —
   * round-4 VERDICT #8): the driver-vs-distributed choice then costs no
   * count() job, and the driver path skips the symmetrize/distinct
   * shuffle too ([[sequential]] symmetrizes and dedups itself). An UPPER
   * BOUND is acceptable — the hint only selects the execution path, both
   * paths compute the same result.
   */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 200,
          driverPathMaxEdges: Long = ConnectedComponents.DriverPathMaxEdges,
          nEdgesHint: Long = -1): DataFrame = {
    if (nEdgesHint >= 0 && nEdgesHint <= driverPathMaxEdges) {
      import spark.implicits._
      // the hint bounds DISTINCT edges, so dedup before collecting — the
      // raw frame may carry arbitrary duplication the hint says nothing
      // about, and the driver must only ever hold the distinct set
      val pairs = edges.select(col("a"), col("b")).distinct()
        .as[(Long, Long)].collect()
      return spark.createDataset(sequential(pairs).toSeq).toDF("id", "grp")
        .repartition(spark.sessionState.conf.numShufflePartitions)
    }
    val sym0 = edges.select(col("a").as("src"), col("b").as("dst"))
      .where(col("src") =!= col("dst"))
    val sym = sym0.unionByName(
        sym0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    if (nEdgesHint < 0 && sym.count() / 2 <= driverPathMaxEdges)
      return driverGreedy(spark, sym)

    // phase 1: priority-MIS rounds
    var undecided = sym.select(col("src").as("id")).distinct().localCheckpoint()
    var active = sym
    var seeds: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      undecided.schema)
    var i = 0
    while (undecided.count() > 0) {
      require(i < maxIter, s"greedy grouping did not converge in $maxIter rounds")
      val minNbr = active.groupBy("src").agg(min("dst").as("mn"))
      val newSeeds = undecided.join(minNbr, undecided("id") === minNbr("src"), "left")
        .where(col("mn").isNull || col("mn") > col("id"))
        .select(col("id"))
        .localCheckpoint()
      val grabbed = active.join(newSeeds, active("dst") === newSeeds("id"))
        .select(col("src").as("id")).distinct()
      val decided = newSeeds.unionByName(grabbed).distinct().localCheckpoint()
      seeds = seeds.unionByName(newSeeds).localCheckpoint()
      undecided = undecided.join(decided, Seq("id"), "left_anti").localCheckpoint()
      active = active
        .join(decided.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(decided.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .localCheckpoint()
      i += 1
    }
    // phase 2: non-seed → min adjacent seed over the ORIGINAL edges
    val nonSeedGrp = sym.join(seeds.select(col("id").as("dst")), Seq("dst"))
      .join(seeds.select(col("id").as("src")), Seq("src"), "left_anti")
      .groupBy(col("src").as("id")).agg(min("dst").as("grp"))
    seeds.select(col("id"), col("id").as("grp")).unionByName(nonSeedGrp)
  }

  private def driverGreedy(spark: SparkSession, sym: DataFrame): DataFrame = {
    import spark.implicits._
    val pairs = sym.as[(Long, Long)].collect()
    val out = sequential(pairs).toSeq
    spark.createDataset(out).toDF("id", "grp")
      .repartition(spark.sessionState.conf.numShufflePartitions)
  }
}
