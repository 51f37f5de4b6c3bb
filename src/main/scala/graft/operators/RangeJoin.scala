package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join as an equi-join: `point ∈ [start, end)`.
  *
  * A naive non-equi join plans as a nested loop — O(|L|·|R|) and
  * broadcast-bound, unusable at scale. Here both sides are bucketized to a
  * fixed time width: the left point lands in exactly one bucket, the right
  * interval explodes to every bucket it overlaps, and a plain shuffle
  * equi-join on the bucket key meets exactly the candidate pairs, with the
  * precise containment predicate applied after. Cost is one shuffle plus
  * |R| × (interval/width + 1) exploded rows — the standard interval-join
  * strategy (Spark's own stream-stream time-interval joins bucketize the
  * same way). Pick `bucketWidthSec` near the typical interval length so
  * intervals explode to ~2 buckets.
  */
object RangeJoin {

  /** [[pointInInterval]] with extra equi-join keys and an optional
    * inclusive end bound — the attribution-window shape: "this user's
    * clicks within the 30 minutes up to AND INCLUDING the purchase".
    * Joining on (keys..., bucket) instead of keys alone is the skew
    * guard: a power user's year of clicks no longer meets every one of
    * their purchases in a single task — candidates are confined to the
    * ≤ ⌈interval/width⌉+1 time buckets each interval overlaps, so the
    * per-task work tracks the WINDOW's density, not the user's lifetime
    * row count. */
  def pointInIntervalKeyed(left: DataFrame, right: DataFrame,
      keys: Seq[String], pointCol: String, startCol: String, endCol: String,
      bucketWidthSec: Long, endInclusive: Boolean = false): DataFrame = {
    val w = lit(bucketWidthSec * 1000000L)
    def us(c: String) =
      unix_micros(col(c).cast(org.apache.spark.sql.types.TimestampType))
    val lb = left.withColumn("__bucket", floor(us(pointCol) / w))
    val rb = right
      .filter(if (endInclusive) col(endCol) >= col(startCol)
        else col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        floor(us(startCol) / w),
        floor((if (endInclusive) us(endCol) else us(endCol) - 1) / w))))
    val contained =
      if (endInclusive)
        col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol)
      else
        col(pointCol) >= col(startCol) && col(pointCol) < col(endCol)
    lb.join(rb, (keys :+ "__bucket").toIndexedSeq)
      .filter(contained)
      .drop("__bucket")
  }

  def pointInInterval(left: DataFrame, right: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidthSec: Long): DataFrame = {
    val w = lit(bucketWidthSec * 1000000L)
    // unix_micros wants TIMESTAMP; NTZ columns convert losslessly in the
    // engine's UTC session
    def us(c: String) =
      unix_micros(col(c).cast(org.apache.spark.sql.types.TimestampType))
    val lb = left.withColumn("__bucket", floor(us(pointCol) / w))
    // Drop malformed intervals (end <= start) before the explode: `sequence`
    // with stop < start generates a *descending* sequence, so one dirty row
    // (say an epoch-zero end) would fan out to millions of spurious bucket
    // rows and blow up the shuffle. The rows can't match the containment
    // predicate anyway — filtering them is semantics-preserving.
    // end-exclusive: the last contained microsecond is end − 1
    val rb = right
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        floor(us(startCol) / w),
        floor((us(endCol) - 1) / w))))
    lb.join(rb, "__bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
