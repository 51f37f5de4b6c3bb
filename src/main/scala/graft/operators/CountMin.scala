package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) over a long key
  * column — the mergeable counting sketch: d×w integer counters,
  * estimate = min over rows of the hashed cell, never an undercount.
  *
  * Scale shape: building the sketch is ONE map-side-combined aggregate
  * with d·w reduce groups regardless of N (the sketch of a union is the
  * cell-wise sum of sketches — partition partials merge for free, the
  * property that makes CM the streaming/distributed counter of choice).
  * Point queries join the d-row probe set against the d·w-cell table.
  *
  * Determinism: the hash family is the affine Karp-Rabin form
  * `((a·k + b) mod (2⁶¹−1)) mod w` with fixed integer constants — every
  * cell and every estimate is exact BIGINT arithmetic an oracle replays
  * (unlike a sampled sketch, CM has no RNG at all once the family is
  * fixed).
  *
  * Reference scope: extension beyond the reference surface
  * (/root/reference/tools.py:58-65 leaves the transform dialect open).
  */
object CountMin {

  val P: Long = 2305843009213693951L // 2^61 - 1, the repo's hash modulus

  /** Default 3-row family: fixed odd multipliers/offsets (primes). */
  val DefaultFamily: Seq[(Long, Long)] =
    Seq((1299709L, 104729L), (15485863L, 1999L), (32452843L, 777767L))

  private def bucket(k: Column, a: Long, b: Long, w: Int): Column =
    pmod(pmod(k * lit(a) + lit(b), lit(P)), lit(w.toLong))

  /** The d×w counter table (i, b, cnt) for `keys` (a column named `k`,
    * non-negative longs). One aggregate; d·w cells. */
  def sketch(keys: DataFrame, family: Seq[(Long, Long)],
      w: Int): DataFrame =
    keys.select(posexplode(array(family.map { case (a, b) =>
        bucket(col("k"), a, b, w) }: _*)).as(Seq("i", "b")))
      .groupBy(col("i"), col("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for `probe` (column `k`): min over the d hashed
    * cells — (k, cm_est). Missing cells read as 0 (keys never seen). */
  def estimate(probe: DataFrame, cm: DataFrame,
      family: Seq[(Long, Long)], w: Int): DataFrame =
    probe.select(col("k"), posexplode(array(family.map { case (a, b) =>
        bucket(col("k"), a, b, w) }: _*)).as(Seq("i", "b")))
      .join(cm, Seq("i", "b"), "left")
      .groupBy(col("k"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
}
