package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Adversarial power-user skew for the attribution/funnel joins (r7
  * verdict ask #5): one user owning thousands of clicks is the classic
  * hot key that makes a bare user-keyed purchases×clicks join meet that
  * user's ENTIRE click history per purchase. The bucketized interval
  * join (q83's shape since round 8) must (a) produce exactly the naive
  * join's rows, and (b) bound the candidate set by window density — the
  * per-(user, bucket) meet — not by the user's lifetime row count.
  */
class AttributionSkewSpec extends SparkSpec {
  import spark.implicits._

  // user 42: a click every 10 minutes for ~14 days (2000 clicks) and 50
  // purchases; users 1..20 sparse background traffic.
  private val base = 1700000000000000L // µs epoch, any fixed point
  private val minUs = 60000000L

  private lazy val clicks = (
    (0 until 2000).map(i => (42L, 100000L + i, base + i * 10 * minUs)) ++
      (1 to 20).flatMap(u =>
        (0 until 5).map(i => (u.toLong, 200000L + u * 100 + i,
          base + i * 77 * minUs)))
    ).toDF("user_id", "c_id", "c_us")
    .select(col("user_id"), col("c_id"),
      timestamp_micros(col("c_us")).as("c_ts"))

  private lazy val purchases = (
    (0 until 50).map(i => (42L, 300000L + i, base + (i * 400 + 25) * minUs)) ++
      (1 to 20).map(u => (u.toLong, 400000L + u, base + 200 * minUs))
    ).toDF("user_id", "p_id", "p_us")
    .select(col("user_id"), col("p_id"),
      timestamp_micros(col("p_us")).as("p_ts"))
    .withColumn("w_start", col("p_ts") - expr("INTERVAL 30 MINUTES"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("user_id"), col("p_id"), col("c_id"))
      .collect().map(_.toString).sorted.toSeq

  test("bucketized interval join equals the naive user join exactly") {
    val naive = purchases.join(clicks, Seq("user_id"))
      .filter(col("c_ts") >= col("w_start") && col("c_ts") <= col("p_ts"))
    val bucketized = RangeJoin.pointInIntervalKeyed(
      clicks, purchases, Seq("user_id"), "c_ts", "w_start", "p_ts",
      bucketWidthSec = 1800L, endInclusive = true)
    assert(canon(bucketized) == canon(naive))
    assert(canon(bucketized).nonEmpty, "fixture must actually attribute")
  }

  test("candidates scale with window density, not the power user's history") {
    // the naive join's candidate set for user 42: 50 purchases × 2000
    // clicks = 100k rows before the interval filter
    val naiveCandidates = purchases.join(clicks, Seq("user_id")).count()
    assert(naiveCandidates >= 100000L, s"fixture skew eroded: $naiveCandidates")
    // the bucketized join's candidate set: each purchase window overlaps
    // ≤2 half-hour buckets × ≤3 clicks per bucket for user 42's cadence
    val w = lit(1800L * 1000000L)
    val cb = clicks.withColumn("__bucket",
      floor(unix_micros(col("c_ts")) / w))
    val pb = purchases.withColumn("__bucket", explode(sequence(
      floor(unix_micros(col("w_start")) / w),
      floor(unix_micros(col("p_ts")) / w))))
    val bucketCandidates = cb.join(pb, Seq("user_id", "__bucket")).count()
    assert(bucketCandidates < naiveCandidates / 100,
      s"bucketized candidates ($bucketCandidates) must be orders of " +
        s"magnitude below the naive meet ($naiveCandidates)")
  }

  test("q84's funnel join tolerates the hot key: build side is one row per user") {
    // first-view dedup BEFORE the join is the guard — assert it holds
    // under the power user (50 purchases meet exactly one view row)
    val views = clicks.withColumnRenamed("c_ts", "v_ts") // stand-in views
    val firstView = views.groupBy(col("user_id"))
      .agg(min(col("v_ts")).as("fv_ts"))
    assert(firstView.filter(col("user_id") === 42L).count() == 1L)
    val joined = purchases.join(firstView, Seq("user_id"))
    assert(joined.filter(col("user_id") === 42L).count() == 50L,
      "per-purchase fan-out must be 1 (the dedup'd first view)")
  }
}
