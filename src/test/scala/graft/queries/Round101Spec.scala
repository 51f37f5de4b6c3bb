package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-101 operators, pinned at sf0.001. */
class Round101Spec extends SparkSpec {

  test("p51: lineage tracks projections, drops predicate-only columns") {
    val rows = Round101Queries.p51_column_lineage(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // revenue derives from exactly the two lineitem price columns
    assert(rows.filter(_._1 == "revenue").toSet ===
      Set(("revenue", "lineitem", "l_extendedprice"),
        ("revenue", "lineitem", "l_discount")))
    // group keys pass through from orders
    assert(rows.contains(("o_orderkey", "orders", "o_orderkey")))
    // the customer segment filter is control flow, not data lineage
    assert(!rows.exists(_._2 == "customer"))
    // a second plan: q1's agg lineage resolves through the cast+alias
    val q1 = graft.plans.Lineage.extract(
      CoreQueries.q1_agg(spark, sf))
    assert(q1.nonEmpty)
    q1.foreach { case (_, tbl, _) => assert(tbl === "lineitem") }
  }

  test("t56: the ROC curve is a monotone tradeoff") {
    val rows = Round101Queries.t56_roc_points(spark, sf).collect()
      .sortBy(_.getAs[Long]("th"))
    assert(rows.length === 5)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        // raising the threshold never increases TP or FP
        assert(b.getAs[Long]("tp") <= a.getAs[Long]("tp"))
        assert(b.getAs[Long]("fp") <= a.getAs[Long]("fp"))
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("tpr") >= 0.0 && r.getAs[Double]("tpr") <= 1.0)
      assert(r.getAs[Double]("fpr") >= 0.0 && r.getAs[Double]("fpr") <= 1.0)
      // the classifier is genuinely informative: TPR dominates FPR
      assert(r.getAs[Double]("tpr") >= r.getAs[Double]("fpr"))
    }
  }

  test("m35: equalized rasters span the full range") {
    val rows = Round101Queries.m35_hist_equalization(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("eq_min") === 0L,
        "the darkest level maps to 0 by the cdf_min shift")
      if (r.getAs[Long]("n_levels") > 1L)
        assert(r.getAs[Long]("eq_max") === 255L,
          "the brightest level maps to 255")
      assert(r.getAs[Long]("n_levels") >= 1L &&
        r.getAs[Long]("n_levels") <= 64L)
      assert(r.getAs[Long]("eq_sum") <= 255L * 64L)
    }
  }
}
