package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-13 sf1-gate fix to [[CountMin.membership]]: a probe
  * with REPEATED keys (duplicate batch texts hash to the same
  * fingerprint — the normal case in a dedup corpus) must report exactly
  * one row per distinct key with the correct all-cells-set test. The
  * pre-fix plan counted hits across all occurrences of a key
  * (count = 2d/3d ≠ d), so true duplicates read bloom_hit=false — at
  * sf0.01/sf0.1 every batch key happened to be unique, which is why
  * only the sf1 run caught it (24271/25000 rows wrong). */
class BloomMembershipSpec extends SparkSpec {

  import spark.implicits._

  test("membership is per-DISTINCT-key: duplicated probe keys still " +
      "flag, non-members still miss, no duplicate output rows") {
    val w = 64
    val fam = CountMin.DefaultFamily
    val corpusKeys = Seq(11L, 22L, 33L, 44L)
    val cells = CountMin.sketch(corpusKeys.toDF("k"), fam, w)
    // 11 appears three times (a triplicated duplicate), 999 twice
    // (a repeated NON-member); 22 once
    val probe = Seq(11L, 11L, 11L, 22L, 999L, 999L).toDF("k")
    val got = CountMin.membership(probe, cells, fam, w)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.size === 3, "one row per distinct key")
    assert(got(11L) && got(22L), "members must flag regardless of " +
      "probe multiplicity (no false negatives)")
    // 999 may still collide into occupied cells at this tiny w; what is
    // pinned is that multiplicity does not ALTER the verdict: the same
    // key probed once agrees with it probed twice
    val once = CountMin.membership(Seq(999L).toDF("k"), cells, fam, w)
      .collect().head.getBoolean(1)
    assert(got(999L) === once, "multiplicity must not change the verdict")
  }
}
