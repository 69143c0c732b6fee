package graft.tools
import graft.Pipeline
import graft.synth.Synth
object DebugEdgesPrep {
  def main(args: Array[String]): Unit = {
    val spark = Pipeline.session("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val corpus = "/root/repo/target/bench-corpus-6000"
    Pipeline.signatures(spark, Synth.readImages(spark, corpus))
      .write.mode("overwrite").parquet(s"$corpus-sig")
    spark.stop()
  }
}
