package graft

import graft.cc.GreedyGrouping
import org.scalatest.funsuite.AnyFunSuite

/** Greedy seed+neighbors grouping (hamminghash.rs:191-271, SURVEY.md A3):
  * the distributed priority-MIS formulation must match the sequential
  * scan-order reference on every graph shape. */
class GreedyGroupingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Independent re-derivation of the sequential semantics (not the
    * production `sequential` — a second opinion). */
  private def oracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.SortedSet[Long]]
    edges.foreach { case (a, b) =>
      if (a != b) {
        adj.getOrElseUpdate(a, scala.collection.mutable.SortedSet.empty[Long]) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.SortedSet.empty[Long]) += a
      }
    }
    val grp = scala.collection.mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { n =>
      if (!grp.contains(n)) {
        grp(n) = n
        adj(n).foreach(m => if (!grp.contains(m)) grp(m) = n)
      }
    }
    grp.toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    val want = oracle(edges)
    // both paths: forced distributed rounds (cap 0) and driver sequential
    for (cap <- Seq(0L, Long.MaxValue)) {
      val got = GreedyGrouping.run(spark, df, driverPathMaxEdges = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"cap=$cap: got $got want $want")
    }
    // the hinted paths (no count() job): hint under the cap takes the raw
    // driver collect; hint over it forces the distributed rounds
    for (cap <- Seq(0L, Long.MaxValue)) {
      val got = GreedyGrouping.run(spark, df, driverPathMaxEdges = cap,
          nEdgesHint = edges.size.toLong)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"hinted cap=$cap: got $got want $want")
    }
  }

  test("greedy differs from CC on a path: pairs, not one component") {
    // 0-1-2-3-4: greedy → {0,1},{2,3},{4}; CC would give one component
    val got = oracle(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L, 4L -> 4L))
    check(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
  }

  test("late small seed cannot steal an early grab (round-trap case)") {
    // chain 0-1-2-3 plus 4-5 and 2-5: sequential → 2 grabs 5 before 4 seeds.
    // A naive round-parallel grab assigns 5 to 4 (seeded round 1); the
    // two-phase min-adjacent-seed assignment must give grp(5) = 2.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 5L), (2L, 5L))
    assert(oracle(edges)(5L) == 2L)
    check(edges)
  }

  test("cliques collapse on min member; stars on hub") {
    check(for (a <- 0L until 8L; b <- a + 1 until 8L) yield (a, b))
    check((1L to 7L).map(i => (0L, i)))
    check((1L to 7L).map(i => (i, 9L))) // hub has the LARGEST id
  }

  test("random graphs: distributed rounds == sequential scan") {
    val r = new java.util.Random(42)
    for (_ <- 0 until 4) {
      val n = 150
      val edges = Seq.fill(140)((r.nextInt(n).toLong, r.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      check(edges)
    }
  }

  test("long path: rounds terminate and pair up") {
    val edges = (0L until 39L).map(i => (i, i + 1))
    val want = (0L to 39L).map(i => i -> (i - i % 2)).toMap
    assert(oracle(edges) == want)
    check(edges)
  }
}
