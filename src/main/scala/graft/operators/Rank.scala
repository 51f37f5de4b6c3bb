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
    val numbered = df.orderBy(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint()
    // cumulative offsets: one row per partition to the driver, nothing else
    var acc = 0L
    val offsets = numbered
      .groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
      .map { case (pid, n) => val o = (pid, acc); acc += n; o }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    numbered
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .join(offDf, "__pid")
      .withColumn(rankCol,
        col("__off") + col("__mid").bitwiseAND(lit(rowMask)) + lit(1L))
      .select(df.columns.map(col).toSeq :+ col(rankCol): _*)
  }
}
