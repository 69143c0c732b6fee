package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Scalable GLOBAL ordinals — the replacement for `row_number() over
 * (Window.orderBy(...))` with no partition key, which Spark executes as
 * a single task holding the whole input ("No Partition Defined for
 * Window operation"). Shape: range-partition by the sort order (so
 * partition i's rows all precede partition i+1's), sort within
 * partitions, then assign ordinals with `zipWithIndex` — the one RDD
 * drop-down this codebase allows itself, because a global ordinal has no
 * scalable Dataset analog.
 *
 * The sort order must be TOTAL (include a unique tiebreaker): the range
 * partitioner may split equal keys across partition boundaries, so ties
 * would get arbitrary ordinals. Callers here all end their key with a
 * unique id.
 */
object Ranks {
  def globalRowNumber(df: DataFrame, order: Seq[Column],
                      out: String): DataFrame = {
    val spark = df.sparkSession
    val p = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val sorted = df.repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1L))
      }, schema)
  }
}
