package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed suites. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = Pipeline.session("local[4]", shufflePartitions = 8)
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
