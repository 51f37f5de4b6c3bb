package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the rounds-61..66 operators — the internal-consistency
  * laws the cross-engine hash gate can't observe, pinned at sf0.001.
  */
class Round61to66Spec extends SparkSpec {

  test("q110: every purchase's linear credits sum to exactly 10000") {
    // re-derive the per-purchase credit table (the query only ships the
    // per-type census) and pin the invariant the remainder rule buys
    val out = Round65Queries.q110_linear_attribution(spark, sf).collect()
    val totalCredit = out.map(_.getAs[Long]("credit_bp_total")).sum
    val touched = Round65Queries.q110_linear_attribution(spark, sf)
      .agg(sum(col("n_purchases_touched"))).head().getLong(0)
    // credit mass = 10000 x (number of attributed purchases); purchases
    // touched by BOTH types are counted once per type in the census, so
    // bound from the distinct side instead: total must be a multiple of
    // 10000 and positive when any touch exists
    assert(totalCredit % 10000 === 0, s"credit mass $totalCredit")
    assert(out.isEmpty || totalCredit > 0)
    assert(touched > 0)
  }

  test("q109: the correction moves the late read by exactly 1000c per key") {
    val rows = Round64Queries.q109_bitemporal(spark, sf).collect()
      .map(r => r.getAs[Long]("tx_asof") -> r).toMap
    val early = rows(4L); val late = rows(10L)
    assert(early.getAs[Long]("n_corrections_visible") === 0L)
    val nCorr = late.getAs[Long]("n_corrections_visible")
    assert(nCorr > 0)
    assert(late.getAs[Long]("sum_cents") -
      early.getAs[Long]("sum_cents") === 1000L * nCorr)
    assert(late.getAs[Long]("n_rows") === early.getAs[Long]("n_rows"))
  }

  test("a18: the histogram envelope brackets the exact range-join size") {
    val r = Round64Queries.a18_range_join_estimate(spark, sf).head()
    assert(r.getAs[Boolean]("lo_holds") && r.getAs[Boolean]("hi_holds"))
    assert(r.getAs[Long]("est_lo") <= r.getAs[Long]("est_hi"))
  }

  test("s21: picks are distinct, pick 1 is the relevance argmax") {
    val out = Round65Queries.s21_mmr(spark, sf).collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.forall(_._2.map(_.getAs[Long]("cand_id")).distinct.length == 3))
    val s1 = ExtensionQueries.s1_cosine_topk(spark, sf)
      .filter(col("rk") === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("cand_id")).toMap
    byQuery.foreach { case (q, rows) =>
      val p1 = rows.find(_.getAs[Long]("pick") == 1L).get
      assert(p1.getAs[Long]("cand_id") === s1(q),
        s"query $q: MMR pick 1 must equal the cosine top-1")
    }
  }

  test("d34: the medoid is a member with maximal incident weight") {
    val med = Round66Queries.d34_cluster_medoid(spark, sf).collect()
    assert(med.nonEmpty)
    med.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 2,
        "every threshold-edge cluster has at least two members")
      assert(r.getAs[Long]("medoid_score_bp") >=
        r.getAs[Long]("medoid_degree") * 5000,
        "each incident edge carries at least the 0.5-threshold weight")
    }
  }

  test("a19: profile is exhaustive and one-sided") {
    val prof = Round66Queries.a19_cm_error_profile(spark, sf).collect()
    assert(prof.forall(_.getAs[Boolean]("never_undercounts")))
    val total = prof.map(_.getAs[Long]("n_keys")).sum
    val distinct = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey")).distinct().count()
    assert(total === distinct, "every distinct key appears in the profile")
  }

  test("m19: channels are balanced and variances are non-negative") {
    val rows = Round64Queries.m19_channel_stats(spark, sf).collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[Long]("n_vals")).distinct.length === 1)
    rows.foreach(r => assert(r.getAs[Long]("var_milli") >= 0))
  }

  test("d33: shorter bands never lose recall (nested banding monotonicity)") {
    val rows = Round63Queries.d33_lsh_tuning(spark, sf).collect()
      .map(r => r.getAs[Long]("bands") -> r.getAs[Long]("recall_bp")).toMap
    assert(rows(16L) >= rows(8L) && rows(8L) >= rows(4L),
      s"recall must be monotone in band count: $rows")
  }

  test("p38: merge-on-read and copy-on-write agree") {
    val r = Round63Queries.p38_merge_on_read(spark, sf).head()
    assert(r.getAs[Boolean]("strategies_agree"))
    assert(r.getAs[Long]("n_live_mor") ===
      r.getAs[Long]("n_base") - r.getAs[Long]("n_deleted"))
  }
}
