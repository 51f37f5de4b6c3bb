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

  /** Second-stage remix constants shared by every family row. */
  val A2: Long = 179424673L
  val B2: Long = 15485867L

  /** Mixing hash on [0, 2^61-1): `h1 = (k·a + b) mod P`, squared mod P,
    * remixed affinely — `((h1² mod P)·A2 + B2) mod P`. The squaring is
    * the load-bearing step: a purely affine map sends sequential keys to
    * an arithmetic progression that never wraps at realistic key ranges,
    * so bucket/rank/order statistics inherit the input's structure and
    * every estimator built on them is silently biased (observed: KMV off
    * by 10^5×, HLL by 2.1× on TPC-H part keys). The quadratic term
    * scatters progressions across the field; an oracle replays the chain
    * with 128-bit integers (`(h1*h1 % P * A2 + B2) % P` in HUGEINT). */
  def mix61(k: Column, a: Long, b: Long): Column = {
    import graft.functions.NativeExprs.mulmodP
    val h1 = pmod(mulmodP(k, lit(a)) + lit(b), lit(P))
    pmod(mulmodP(mulmodP(h1, h1), lit(A2)) + lit(B2), lit(P))
  }

  private def bucket(k: Column, a: Long, b: Long, w: Int): Column =
    pmod(mix61(k, a, b), lit(w.toLong))

  /** The d×w counter table (i, b, cnt) for `keys` (a column named `k`,
    * non-negative longs). One aggregate; d·w cells. */
  def sketch(keys: DataFrame, family: Seq[(Long, Long)],
      w: Int): DataFrame =
    keys.select(posexplode(array(family.map { case (a, b) =>
        bucket(col("k"), a, b, w) }: _*)).as(Seq("i", "b")))
      .groupBy(col("i"), col("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Join-size (inner-product) estimate from two sketches built with the
    * SAME family and width (AMS/CM inner product, Cormode & Muthukrishnan
    * 2005 §4.2): for each hash row i, Σ_b cntA(i,b)·cntB(i,b) ≥ |A ⋈ B|
    * — hash collisions only ever ADD cross terms — and the min over the d
    * rows is the tightest upper bound. Two d·w-cell tables in, ONE row
    * out (`cm_join_est`): the 100 TB use is sizing a join (broadcast vs
    * shuffle, partition count) from two tiny pre-aggregated sketches
    * without touching either full table. The inner join on (i, b) is
    * exact because a cell missing from either side contributes 0. */
  def joinSizeEstimate(cmA: DataFrame, cmB: DataFrame): DataFrame =
    cmA.join(cmB.withColumnRenamed("cnt", "cntB"), Seq("i", "b"))
      .groupBy(col("i"))
      .agg(sum(col("cnt") * col("cntB")).as("ip"))
      .agg(min(col("ip")).as("cm_join_est"))

  /** Bloom-style membership over the (i, b) cell projection of a sketch
    * (d rows of w bits — the same hashed cells, presence instead of
    * counts): a probe key reports `bloom_hit` iff ALL d of its cells are
    * occupied. False negatives are impossible (a member's cells are all
    * set by construction); false positives occur at ~occupancy^d. The
    * 100 TB use is the membership gate a pipeline ships instead of the
    * key set itself — kilobytes of cells versus a join against the full
    * dimension. Returns (k, bloom_hit), one row per DISTINCT probe key:
    * the per-key hit test is `count(hit) = d`, so a probe with repeated
    * keys must collapse them first — the round-13 sf1 gate caught
    * exactly this (duplicate batch texts → duplicate fingerprints →
    * count 2d/3d per key → true duplicates reading bloom_hit=false;
    * invisible at small scale where batch keys happen to be unique). */
  def membership(probe: DataFrame, cells: DataFrame,
      family: Seq[(Long, Long)], w: Int): DataFrame =
    probe.select(col("k")).distinct()
      .select(col("k"), posexplode(array(family.map { case (a, b) =>
        bucket(col("k"), a, b, w) }: _*)).as(Seq("i", "b")))
      .join(cells.select(col("i"), col("b"), lit(1).as("hit")),
        Seq("i", "b"), "left")
      .groupBy(col("k"))
      .agg((count(col("hit")) === family.size).as("bloom_hit"))

  /** Point estimates for `probe` (column `k`): min over the d hashed
    * cells — (k, cm_est). Missing cells read as 0 (keys never seen). */
  def estimate(probe: DataFrame, cm: DataFrame,
      family: Seq[(Long, Long)], w: Int): DataFrame =
    probe.select(col("k"), posexplode(array(family.map { case (a, b) =>
        bucket(col("k"), a, b, w) }: _*)).as(Seq("i", "b")))
      .join(cm, Seq("i", "b"), "left")
      .groupBy(col("k"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))

  // ── dyadic range extension (Cormode & Muthukrishnan 2005 §4.1) ────────

  /** Levels a dyadic sketch carries; the composite key reserves 4 bits,
    * so levels must stay < 16. */
  val DyadicLevels = 13 // levels 0..12, blocks up to 2^12

  /** Canonical dyadic cover of [lo, hi): greedy largest-aligned-block
    * decomposition into ≤ 2·log₂(hi−lo) nodes, each node (level, idx)
    * covering [idx·2^level, (idx+1)·2^level). Pure integer function —
    * both engines receive the SAME node list as literals. */
  def dyadicCover(lo: Long, hi: Long,
      maxLevel: Int = DyadicLevels - 1): Seq[(Int, Long)] = {
    require(lo >= 0 && hi > lo, s"bad range [$lo, $hi)")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var x = lo
    while (x < hi) {
      var l = if (x == 0) maxLevel
        else math.min(java.lang.Long.numberOfTrailingZeros(x), maxLevel)
      while ((1L << l) > hi - x) l -= 1
      out += ((l, x >> l))
      x += (1L << l)
    }
    out.toSeq
  }

  /** Composite key for (level, idx): `idx·16 + level` — one long key
    * space lets a single d×w sketch serve every dyadic level. */
  def dyadicKey(level: Int, idx: Long): Long = idx * 16 + level

  /** Dyadic CM sketch over `keys` (column `k`, non-negative longs):
    * each input key contributes its (level, k div 2^level) composite for
    * every level — still ONE map-side-combined aggregate, d·w cells,
    * mergeable; the explode factor is the fixed level count, not data.
    * Negative keys FAIL LOUDLY at execution (r7 ADVICE item): the
    * composite key space (idx·16 + level) can't represent them, and the
    * truncate-vs-floor `div` divergence would otherwise corrupt cells
    * silently. */
  def dyadicSketch(keys: DataFrame, family: Seq[(Long, Long)],
      w: Int): DataFrame = {
    val guarded = keys.select(expr(
      "CASE WHEN k < 0 THEN CAST(raise_error(" +
        "concat('dyadicSketch: negative key ', CAST(k AS STRING))) " +
        "AS BIGINT) ELSE k END").as("k"))
    sketch(guarded.select(explode(array((0 until DyadicLevels).map(l =>
      expr(s"k div ${1L << l}") * 16 + l): _*)).as("k")), family, w)
  }

  /** Range-count estimate for [lo, hi) from a [[dyadicSketch]]: the sum
    * of the cover nodes' point estimates — each is an upper bound (CM
    * never undercounts) so the sum is too; error grows with the ≤
    * 2·log₂(hi−lo) node count, the dyadic trade. One row: `cm_range_est`. */
  def rangeEstimate(cm: DataFrame, family: Seq[(Long, Long)], w: Int,
      lo: Long, hi: Long): DataFrame = {
    val s = cm.sparkSession
    import s.implicits._
    val nodes = dyadicCover(lo, hi).map { case (l, idx) => dyadicKey(l, idx) }
    estimate(nodes.toDF("k"), cm, family, w)
      .agg(sum(col("cm_est")).as("cm_range_est"))
  }

  /** Serving-side batch of range estimates from a persisted
    * [[dyadicSketch]]: one row per named range [lo, hi) —
    * (range_id, cm_range_est). The cover nodes of ALL ranges form one
    * tiny literal relation (≤ 2·log₂(range) rows each) joined once
    * against the d×w cells — the dashboard pattern: many ranges answered
    * from the artifact without touching the raw data. */
  def rangeEstimates(cm: DataFrame, family: Seq[(Long, Long)], w: Int,
      ranges: Seq[(String, Long, Long)]): DataFrame = {
    val s = cm.sparkSession
    import s.implicits._
    val nodes = ranges.flatMap { case (id, lo, hi) =>
      dyadicCover(lo, hi).map { case (l, idx) => (id, dyadicKey(l, idx)) }
    }.toDF("range_id", "k")
    nodes.select(col("range_id"), col("k"),
        posexplode(array(family.map { case (a, b) =>
          bucket(col("k"), a, b, w) }: _*)).as(Seq("i", "b")))
      .join(cm, Seq("i", "b"), "left")
      .groupBy(col("range_id"), col("k"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
      .groupBy(col("range_id"))
      .agg(sum(col("cm_est")).as("cm_range_est"))
  }
}
