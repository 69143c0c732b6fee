package graft.tools

import graft.Pipeline
import graft.lsh.BandJoin
import graft.synth.Synth

/** Print the physical plans of the pipeline stages for audit: column
  * pruning into the parquet scans, join strategies, codegen coverage. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/root/repo/target/bench-corpus-6000")
    val spark = Pipeline.session("local[4]")
    spark.sparkContext.setLogLevel("WARN")
    val sig = spark.read.parquet(s"$corpus-sig")

    println("########## signatures (kernel) plan")
    Pipeline.signatures(spark, Synth.readImages(spark, corpus)).explain("formatted")

    println("########## edges (band join) plan")
    BandJoin.edges(sig, 40).explain("formatted")

    println("########## groups plan")
    graft.groups.Groups.assemble(sig,
      sig.select(org.apache.spark.sql.functions.col("ord").as("id"),
        org.apache.spark.sql.functions.col("ord").as("comp")))
      .explain("formatted")
    spark.stop()
  }
}
