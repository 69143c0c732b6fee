package graft.tools

import graft.Pipeline
import graft.lsh.BandJoin
import graft.synth.Synth

/** Scratch: time the edges stage at a given parallelism and print the plan. */
object DebugEdges {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val corpus = if (args.length > 1) args(1) else "/root/repo/target/bench-corpus-6000"
    val spark = Pipeline.session(s"local[$cpus]", shufflePartitions = math.max(cpus, 8))
    spark.sparkContext.setLogLevel("WARN")
    val sig = spark.read.parquet(s"$corpus-sig")
    val edges = BandJoin.edges(sig, 40)
    edges.explain("formatted")
    val t0 = System.nanoTime()
    val n = edges.count()
    println(f"cpus=$cpus edges=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
