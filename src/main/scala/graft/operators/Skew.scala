package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins.
  *
  * AQE's skew-join splitting handles most cases at runtime; this is the
  * explicit fallback for the pathological shape AQE can't fix — a single
  * hot key whose build-side rows must meet *every* probe row of that key
  * in one task. Salting spreads one key across `salts` tasks: the skewed
  * (probe) side gets a deterministic salt derived from its row content,
  * the build side is replicated `salts`× so every (key, salt) bucket still
  * joins completely. Trade: build side grows by the salt factor — size it
  * by the observed hot-key multiplicity, and keep the build side the
  * smaller input.
  */
object Skew {

  /** Inner/left equi-join on `key` with the left (probe/skewed) side
    * salted and the right (build) side replicated. Result equals the
    * unsalted join exactly — salting only changes the partitioning. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // deterministic per-row salt (content hash, not rand()) so retries and
    // speculative tasks agree on placement
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts))
        .cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft
      .join(replicatedRight,
        saltedLeft(key) === replicatedRight(key) &&
          saltedLeft("__salt") === replicatedRight("__salt"),
        joinType)
      .drop(replicatedRight(key)).drop(replicatedRight("__salt"))
      .drop(saltedLeft("__salt"))
  }
}
