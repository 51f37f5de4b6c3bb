package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable fixed-width histogram quantiles — the 100 TB quantile
  * primitive: raw data collapses to a (bin, cnt) table in ONE map-side-
  * combined aggregate, histograms from different partitions/days merge by
  * adding counts, and quantile extraction runs on the tiny sketch, never
  * the data. The estimate is a [lo, hi] *bracket* (the bin containing the
  * rank-⌈q·n/100⌉ value) — deterministic, integer-exact, engine-portable;
  * accuracy is the bin width, chosen up front (the fixed-bin trade
  * against GK/t-digest, whose adaptive buckets don't replay exactly
  * across engines).
  *
  * All arithmetic stays in longs: values are pre-quantized by the caller
  * (e.g. cents), ranks are ⌈q·n/100⌉ computed as `(q·n + 99) div 100`.
  */
object HistQuantile {

  /** (bin, cnt): fixed-width histogram of the long column `valueCol`.
    * One hash aggregate; at most domain/binWidth cells. Binning is FLOOR
    * division (`(v − pmod(v,w)) div w`), not truncate-toward-zero: floor
    * keeps bins contiguous across zero, so a caller histogramming deltas
    * gets one well-defined bin per value (r7 ADVICE item). NOTE the
    * cross-engine nuance (measured, round 8): DuckDB's INTEGER `//`
    * TRUNCATES toward zero (-3 // 2 = -1) just like Spark's `div`; only
    * its float `//` floors. An oracle over negative values must
    * therefore replay this same pmod floor form explicitly — a bare
    * `v // w` would diverge below zero in BOTH engines. For non-negative
    * inputs all forms coincide (every current oracle). */
  def histogram(df: DataFrame, valueCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    df.groupBy(
        expr(s"(`$valueCol` - pmod(`$valueCol`, $binWidth)) div $binWidth")
          .as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Histogram merge: counts add. merge(hist(A), hist(B)) = hist(A ∪ B). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))

  /** Per requested integer percentile q: (q, rank, est_lo, est_hi, n)
    * where rank = ⌈q·n/100⌉ and [est_lo, est_hi] is the bin holding the
    * rank-th smallest value. The cumulative window runs over the
    * histogram (≤ domain/binWidth rows — sketch-sized, not data-sized),
    * so the single-partition sort is bounded by construction. */
  def quantiles(hist: DataFrame, binWidth: Long, qs: Seq[Int]): DataFrame = {
    val s = hist.sparkSession
    import s.implicits._
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val tot = hist.agg(sum(col("cnt")).as("n"))
    qs.map(_.toLong).toDF("q")
      .crossJoin(tot)
      .withColumn("rank", expr("(q * n + 99) div 100"))
      .join(cum, col("cum") >= col("rank"))
      .groupBy(col("q"), col("rank"), col("n"))
      .agg(min(col("bin")).as("bin"))
      .select(col("q"), col("rank"),
        (col("bin") * binWidth).as("est_lo"),
        ((col("bin") + 1L) * binWidth - 1L).as("est_hi"),
        col("n"))
  }
}
