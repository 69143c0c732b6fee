package graft.tools
import graft.Pipeline
import graft.synth.Synth
/** Generate the bench corpus standalone: args = nBases outDir. */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(30000L)
    val dir = if (args.length > 1) args(1) else s"/root/repo/target/bench-corpus-$n"
    val spark = Pipeline.session("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    Synth.generate(spark, n, dir)
    println(f"generated $n bases at $dir in ${(System.nanoTime() - t0) / 1e9}%.0f s")
    spark.stop()
  }
}
