package graft.streaming

import graft.Pipeline
import graft.kernel.SignatureKernel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/**
 * Structured-Streaming ingestion of the images table: new parquet files
 * landing under the input path stream through the same signature kernel
 * and append to the signatures table, checkpointed.
 *
 * The reference has no event-time streaming (SURVEY.md §2.10) — its
 * closest analogs are the fs-watcher view mode (T5) and the background
 * enrichment job (T3). This is the beyond-reference scale path: at 10^12
 * images the signatures table is built incrementally as new snapshots
 * land, not in one batch; micro-batch append + checkpoint gives exactly
 * the at-least-once + idempotent-commit semantics the batch pipeline's
 * Ckpt stages give per-run.
 */
object StreamingSignatures {
  /** The input_hint schema (BASELINE.json). */
  val imageSchema: StructType = StructType(Seq(
    StructField("image_id", StringType),
    StructField("bytes", BinaryType),
    StructField("w", IntegerType),
    StructField("h", IntegerType),
    StructField("fmt", StringType),
    StructField("caption", StringType),
    StructField("phash", LongType)))

  /** Start the kernel as a streaming query: parquet files under inputPath
    * stream to signatures appended at outPath, checkpointed. */
  def start(spark: SparkSession, inputPath: String, outPath: String,
            checkpoint: String, maxFilesPerTrigger: Int = 16): StreamingQuery = {
    val stream = spark.readStream
      .schema(imageSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputPath)
    val sigs = SignatureKernel.signatures(spark, stream.toDF()).toDF()
      // ord for streamed rows: stable hash of the id (dense ords are
      // assigned by the batch grouping job over the materialized table)
      .withColumn("ord", xxhash64(col("image_id")))
    sigs.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Windowed ingest metrics over the events stream (the progress-channel
    * analog, scanner.rs:1206-1211 → watermarked windowed counts). */
  def ingestMetrics(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
}
