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

  /** A detected exact duplicate in the stream. */
  final case class StreamDup(content_hex: String, image_id: String,
                             first_image_id: String, nth: Int)

  /**
   * Stateful streaming exact-dup detection with `flatMapGroupsWithState`:
   * keyed by content hash, state = (first-seen image_id, count); every
   * subsequent arrival of the same bytes emits a StreamDup row pointing at
   * the keeper. This is the streaming form of the hash_db cache-hit path
   * (scanner.rs:1251-1294: a re-seen content hash skips recompute) — here
   * the "cache" is Spark-managed per-key state, so it scales out with the
   * shuffle and survives restarts via the checkpoint.
   *
   * Input: a streaming frame with (content_hex string, image_id string).
   */
  def streamingExactDups(spark: SparkSession, hashed: DataFrame)
  : org.apache.spark.sql.Dataset[StreamDup] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    hashed.select("content_hex", "image_id").as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(String, Int), StreamDup](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[(String, Int)]) =>
          // deterministic order inside a batch: ids sorted
          val ids = rows.map(_._2).toSeq.sorted
          val first = state.getOption.map(_._1).getOrElse(ids.head)
          val prev = state.getOption.map(_._2).getOrElse(0)
          val out = ids.zipWithIndex.collect {
            case (id, i) if prev + i + 1 > 1 => // every arrival after the keeper
              StreamDup(key, id, first, prev + i + 1)
          }
          state.update((first, prev + ids.length))
          out.iterator
      }
  }
}
