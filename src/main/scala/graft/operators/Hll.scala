package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped HyperLogLog in exact integer arithmetic (Flajolet et al.,
  * AofA'07), factored out of the global a7 query so batch, streaming, and
  * merge paths share one register pipeline.
  *
  * 64 registers per group; hash = the same squared-remix 61-bit family
  * the Count-Min sketch uses ([[CountMin.mix61]]); bucket = h mod 64;
  * rank = 1-based lowest-set-bit position of h div 64, computed by a
  * broadcast join against the 55 powers of two — no float log anywhere,
  * so every engine with 64-bit integers replays the registers bit for
  * bit. The raw estimate α·m²/Σ2^(−r) is one exact big-integer division
  * with the sum pre-scaled by 2^56 (Σ ≤ 64·2^56 < 2^63); the small-range
  * correction branch is deliberately omitted (it needs ln()) — the raw
  * estimator is deterministic and its bias at low cardinality is
  * documented by the `zero_registers` column riding along.
  *
  * Scale: registers are ONE map-side-combined aggregate — groups·64 cells
  * of state however large the input — and register tables merge by
  * element-wise MAX, so per-partition/per-day sketches combine without
  * touching raw data (the property [[merge]] exposes and the spec pins).
  */
object Hll {

  val NumRegisters = 64
  /** α₆₄·64² scaled by 1000: ⌊0.709·4096·1000⌋ = 2904064, kept as the
    * (numerator, 1000) pair so the division stays integer-exact. The
    * constant is pinned in the Round18/19/24 oracle SQL literals — do not
    * "simplify" it to ⌊0.709·4096⌋·1000 = 2904000, which breaks every
    * HLL hash gate. */
  val AlphaM2x1000: BigInt = BigInt(2904064)

  private def pow2Dict(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    broadcast(Seq.tabulate(55)(e => (1L << e, e + 1)).toDF("p", "r"))
  }

  /** Per-group register table (groupCols..., bkt, rmax) for the
    * non-negative long key column `keyCol`. Works on streaming inputs too
    * (one stateful aggregation; complete output mode). */
  def registers(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ CountMin.mix61(col(keyCol), 1299709L, 104729L).as("h"): _*)
      .select(g :+ expr("h % 64").as("bkt") :+ expr("h div 64").as("v"): _*)
      .withColumn("lsb", expr("v & -v"))
      .join(pow2Dict(df), col("lsb") === col("p"), "left")
      .select(g :+ col("bkt") :+ coalesce(col("r"), lit(56)).as("r"): _*)
      .groupBy(g :+ col("bkt"): _*)
      .agg(max(col("r")).as("rmax"))
  }

  /** Element-wise MAX of two register tables — the HLL merge operator:
    * registers(A ∪ B) = merge(registers(A), registers(B)). */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame = {
    val keys = groupCols :+ "bkt"
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(max(col("rmax")).as("rmax"))
  }

  /** (groupCols..., hll_est, t56, zero_registers) from a register table:
    * the raw HLL estimate as one exact integer division per group. The
    * numerator α·m²·2^56/1000 ≈ 2.1·10²³ exceeds BIGINT, so the division
    * runs as an integral divide over DECIMAL(38,0) columns — codegen'd
    * and SQL-expressible, no driver-side UDF (r7 verdict ask #6; both
    * operands positive, so decimal `div`'s truncation IS the BigInt floor
    * division the oracles replay in HUGEINT). */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val num = (AlphaM2x1000 * BigInt(2).pow(56)).toString
    regs.groupBy(g: _*)
      .agg(
        sum(expr("shiftleft(cast(1 as bigint), 56 - rmax)")).as("tp"),
        count(lit(1)).as("nb"))
      .withColumn("t56", col("tp") +
        (lit(NumRegisters.toLong) - col("nb")) *
          expr("shiftleft(cast(1 as bigint), 56)"))
      .select(g :+
        expr(s"cast($num as decimal(38,0)) div " +
          "(cast(t56 as decimal(38,0)) * 1000)").as("hll_est") :+
        col("t56") :+
        (lit(NumRegisters.toLong) - col("nb")).as("zero_registers"): _*)
  }
}
