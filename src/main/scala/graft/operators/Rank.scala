package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global ranking: one range-partitioned sort with
  * `monotonically_increasing_id`, then a broadcast join against the
  * per-partition offsets. The scale replacement for
  * `row_number().over(Window.orderBy(...))`, whose empty partition spec
  * funnels the entire input through one task.
  *
  * Stays inside Tungsten end to end: `monotonically_increasing_id`
  * encodes (partition, row-in-partition) as a codegen'd long during the
  * post-sort projection — no `RDD.zipWithIndex` round-trip deserializing
  * every row out of columnar form (the previous formulation; same job
  * count, but each row paid encoder in + out). The sorted+numbered frame
  * is localCheckpoint'ed once, so the sort runs exactly once: the tiny
  * per-partition count aggregate and every downstream consumer read the
  * checkpointed blocks. Only the per-partition counts (one row per
  * partition) reach the driver.
  */
object Rank {

  /** Appends a 1-based global *row number* under the given order —
    * unique consecutive positions, `row_number` semantics (not
    * `dense_rank`: ties get distinct positions). The order must be total
    * (include a unique tie-break column) or the assignment within a tie
    * group is partition-dependent. */
  def globalRank(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    // partition ID in the upper 31 bits, row-in-partition in the lower 33
    val rowMask = (1L << 33) - 1
    val numbered = sortedNumbered(df, order)
    val offDf = partitionOffsets(numbered, count(lit(1)))
    numbered
      .join(offDf, "__pid")
      .withColumn(rankCol,
        col("__off") + col("__mid").bitwiseAND(lit(rowMask)) + lit(1L))
      .select(df.columns.map(col).toSeq :+ col(rankCol): _*)
  }

  /** Appends an inclusive global prefix sum of `value` (a LongType
    * column) under the given total order — the classic parallel scan as a
    * DataFrame operator, and the backbone of sequence packing
    * ("concatenate the corpus, chop every C tokens"). Same two-level
    * shape as [[globalRank]]: per-partition partial sums travel to the
    * driver (one row per partition), and the within-partition running sum
    * is a window *partitioned by the sort partition* — never a
    * single-partition global window. */
  def prefixSum(df: DataFrame, sumCol: String, value: Column,
      order: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val numbered = sortedNumbered(df, order)
    val offDf = partitionOffsets(numbered, sum(value))
    val w = Window.partitionBy(col("__pid")).orderBy(col("__mid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered
      .join(offDf, "__pid")
      .withColumn(sumCol, col("__off") + sum(value).over(w))
      .select(df.columns.map(col).toSeq :+ col(sumCol): _*)
  }

  /** One range-partitioned sort, numbered and materialized exactly once;
    * both passes (partial aggregate, final join) read the checkpoint. */
  private def sortedNumbered(df: DataFrame, order: Seq[Column]): DataFrame =
    df.orderBy(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .localCheckpoint()

  /** Exclusive per-partition offsets of `agg` over the numbered frame:
    * one row per partition to the driver, broadcast back. */
  private def partitionOffsets(numbered: DataFrame,
      agg: Column): DataFrame = {
    var acc = 0L
    val offsets = numbered
      .groupBy(col("__pid")).agg(agg.cast("long").as("__n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
      .map { case (pid, n) => val o = (pid, acc); acc += n; o }
    val spark = numbered.sparkSession
    import spark.implicits._
    broadcast(offsets.toSeq.toDF("__pid", "__off"))
  }
}
