package graft.tools

import graft.{Pipeline, SparkEntry}

/** Time one named SparkEntry query: `runMain graft.tools.TimeQuery <name> <sfDir> [reps]`. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Pipeline.session(s"local[$cpus]")
    spark.sparkContext.setLogLevel("WARN")
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"TIMEQUERY $name rows=$n sec=$s%.3f")
      s
    }
    println(f"TIMEQUERY $name best=${times.min}%.3f")
    spark.stop()
  }
}
