package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Distributed global ranking: a range-partitioned sort followed by
  * `RDD.zipWithIndex` — every partition keeps its slice of the total order
  * and only the per-partition row counts travel to the driver. The scale
  * replacement for `row_number().over(Window.orderBy(...))`, whose empty
  * partition spec funnels the entire input through one task.
  *
  * `zipWithIndex` runs one extra job to compute partition offsets, so the
  * input is localCheckpoint'ed first: the sort's lineage (often a full
  * corpus tokenize+aggregate) is materialized once and both passes read
  * the checkpointed blocks.
  */
object Rank {

  /** Appends a 1-based dense global rank column under the given total
    * order. The order should be total (include a unique tie-break column)
    * so the rank is deterministic. */
  def globalRank(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    val base = df.localCheckpoint()
    val sorted = base.orderBy(order: _*)
    val schema = sorted.schema.add(StructField(rankCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
