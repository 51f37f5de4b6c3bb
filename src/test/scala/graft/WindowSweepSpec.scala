package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Enforces the round-11 unpartitioned-window adjudication (SCALE.md):
  * the queries converted to Rank.globalRank / Rank.prefixSum must never
  * regrow an empty-partition-spec window (the single-task corpus sort),
  * and the documented deliberate exceptions must stay exactly as
  * documented — a new unpartitioned window anywhere in these plans is a
  * scale regression, not a style choice.
  */
class WindowSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Count of Window nodes with an EMPTY partition spec in the optimized
    * logical plan — each one is a single-task sort of its whole input. */
  private def unpartitioned(name: String): Int = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }.size
  }

  test("converted queries carry zero unpartitioned windows") {
    val converted = Seq(
      "q142_balanced_sharding",  // docs rank → globalRank
      "t48_quantile_normalize",  // pooled rank → globalRank
      "t31_score_correlation",   // two rank passes → globalRank×2
      "q114_rfm_segments",       // three ntile axes → globalRank×3
      "t28_heaps_law",           // cumulative sums → prefixSum×2
      "q102_pareto",             // running spend → prefixSum
      "q107_ks_drift",           // two CDFs → prefixSum×2
      "q123_mann_whitney",       // rank-below count → prefixSum
      "d25_importance_weights",  // top-30 → globalRank
      "p54_sorted_batching")     // batch rank → globalRank
    converted.foreach { name =>
      assert(unpartitioned(name) === 0,
        s"$name regrew an unpartitioned window (single-task corpus sort)")
    }
  }

  test("documented exceptions stay exactly as adjudicated") {
    // q143: pass-2 rank INSIDE the band (narrowed provably) + the direct
    // full-order median rider the gate compares against — 2 by design
    assert(unpartitioned("q143_two_pass_median") === 2)
    // q19: corpus-wide quartiles over the supplier DIM table — global
    // window is the query's semantics, deliberately dimension-scoped
    assert(unpartitioned("q19_window_rank") >= 1)
  }
}
