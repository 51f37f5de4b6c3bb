package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right-side values at or
  * before the left timestamp, per key (DuckDB `ASOF JOIN` semantics).
  *
  * Implemented by composition — union both sides, one window pass with
  * `last(..., ignoreNulls)` carrying right values forward, filter back to
  * left rows (preference (a) of the custom-operator ladder: no custom
  * SparkPlan needed because the merge-sort the operator wants IS a window
  * sort). Cost: one shuffle on the key + one sort — the same lower bound a
  * native as-of merge join would have. Skewed keys fall under AQE's
  * skew-split handling like any window.
  */
object AsOf {

  /** Left as-of join. Right rows at exactly the left timestamp are
    * included (`<=` semantics: right side sorts before left on ties).
    *
    * @param rightVals right columns to carry; appear as `asof_<name>` */
  def joinLastBefore(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r0 = right.select(
      (col(keyCol) +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        rightVals.map(v => col(v).as(s"__rv_$v"))): _*)
    val merged = l.unionByName(r0, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(merged) { (df, v) =>
      df.withColumn(s"asof_$v", last(col(s"__rv_$v"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++ rightVals.map(v => col(s"asof_$v"))): _*)
  }
}
