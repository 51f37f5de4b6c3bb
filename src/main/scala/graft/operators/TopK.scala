package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.ColumnBridge
import graft.plans.{TopKPerKeyPlan, TopKPerKeyStrategy}

/** Public face of the custom per-key top-k operator
  * ([[graft.plans.TopKPerKeyPlan]]): resolves the named columns against
  * the input's analyzed plan, installs the planner strategy on the
  * session (idempotently, via `spark.experimental.extraStrategies` — the
  * config-free injection point; `spark.sql.extensions` wiring would do
  * the same at session build), and hands the logical node back as a
  * DataFrame. */
object TopK {

  /** Top `k` rows per distinct `keyCols` value, ranked by `orderCol`
    * DESC with `tieCol` ASC as the total-order tiebreak. Equivalent to
    * `row_number().over(Window.partitionBy(keyCols).orderBy(orderCol
    * desc, tieCol)) <= k` minus the rank column — but executed as a
    * partial+final bounded heap, never a per-partition full sort. */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      tieCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val child = df.queryExecution.analyzed
    def attr(n: String) = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name).mkString(", ")}"))
    ColumnBridge.ofRows(spark,
      TopKPerKeyPlan(keyCols.map(attr), attr(orderCol), attr(tieCol), k, child))
  }
}
