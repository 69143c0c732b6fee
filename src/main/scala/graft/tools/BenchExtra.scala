package graft.tools

import graft.Pipeline
import graft.synth.Synth
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-6 isolation benches (spark_optimization_guide §1.4): time
  * individual pipeline stages with a noop sink over persisted bench-corpus
  * signatures, so each computation is measured without the parquet sink or
  * the neighboring stages. NOT part of the frozen driver bench
  * (graft.Bench) — numbers from here are cited in OPTIMIZATION_r06.md.
  *
  * Usage: runMain graft.tools.BenchExtra [cpus] [corpusDir] [what...]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("16").toInt
    val corpus =
      if (args.length > 1) args(1) else "/root/repo/target/bench-corpus-40000"
    val what: Set[String] =
      if (args.length > 2) args.drop(2).toSet else Set("edges", "ratio")
    val spark = Pipeline.session(s"local[$cpus]",
      shufflePartitions = math.max(cpus, 8))
    spark.sparkContext.setLogLevel("WARN")

    // committed signatures for the corpus (computed once, reused across
    // invocations — the EDGES stage is what's being isolated here)
    val sigPath = s"$corpus-sig"
    val fs = new org.apache.hadoop.fs.Path(sigPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$sigPath/_SUCCESS")))
      Pipeline.signatures(spark, Synth.readImages(spark, corpus))
        .write.mode("overwrite").parquet(sigPath)
    val sig = spark.read.parquet(sigPath)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      f
      println(f"BENCHEXTRA $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.setJobDescription(null)
    }

    if (what("ratio")) {
      val conf = sig.filter(col("has_pdq") && !col("low_conf"))
      val n = conf.count()
      val d = conf.select("h0", "h1", "h2", "h3", "variants").distinct().count()
      println(f"BENCHEXTRA rep_ratio conf=$n distinct=$d ratio=${d.toDouble / n}%.3f")
    }
    if (what("edges")) {
      time("edges_full")(noop(
        graft.lsh.BandJoin.edges(sig, Pipeline.DefaultThreshold)))
      time("fuzzy_only")(noop(
        graft.lsh.BandJoin.fuzzyEdges(sig, Pipeline.DefaultThreshold)))
      time("exact_only")(noop(graft.lsh.BandJoin.exactEdges(sig)))
    }
    if (what("signatures")) {
      time("signatures_kernel")(noop(
        graft.kernel.SignatureKernel.signatures(
          spark, Synth.readImages(spark, corpus)).toDF()))
    }
    // equivalence harness: dump the full edge set to parquet (dump=<path>),
    // or diff two dumps (diff=<pathA>,<pathB> — prints row counts + both
    // anti-join counts, all three must agree/be zero)
    args.drop(2).find(_.startsWith("dump=")).map(_.stripPrefix("dump=")).foreach { p =>
      graft.lsh.BandJoin.edges(sig, Pipeline.DefaultThreshold)
        .write.mode("overwrite").parquet(p)
      println(s"BENCHEXTRA dumped edges to $p")
    }
    args.drop(2).find(_.startsWith("diff=")).map(_.stripPrefix("diff=")).foreach { s =>
      val Array(pa, pb) = s.split(",")
      val a = spark.read.parquet(pa)
      val b = spark.read.parquet(pb)
      val onlyA = a.exceptAll(b).count()
      val onlyB = b.exceptAll(a).count()
      println(s"BENCHEXTRA diff rowsA=${a.count()} rowsB=${b.count()} " +
        s"onlyA=$onlyA onlyB=$onlyB")
    }
    if (what("groups")) {
      val edges = graft.lsh.BandJoin.edges(sig, Pipeline.DefaultThreshold)
      val comps = graft.cc.ConnectedComponents.run(spark, edges)
      time("groups_assemble")(noop(graft.groups.Groups.assemble(sig, comps)))
    }
    spark.stop()
  }
}
