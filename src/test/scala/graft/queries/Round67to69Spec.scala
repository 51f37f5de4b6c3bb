package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the rounds-67..69 operators, pinned at sf0.001. */
class Round67to69Spec extends SparkSpec {

  test("d35: tightening the threshold never yields more pairs or drops") {
    val rows = Round67Queries.d35_threshold_sweep(spark, sf).collect()
      .sortBy(_.getAs[Long]("threshold_pct"))
    assert(rows.length === 3)
    rows.sliding(2).foreach { case Array(loose, tight) =>
      assert(tight.getAs[Long]("n_pairs") <= loose.getAs[Long]("n_pairs"))
      assert(tight.getAs[Long]("n_docs_dropped") <=
        loose.getAs[Long]("n_docs_dropped"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs_dropped") ===
        r.getAs[Long]("n_docs_implicated") - r.getAs[Long]("n_clusters"))
    }
  }

  test("p39: the skew factor is >= 10000 (even) and internally consistent") {
    val r = Round67Queries.p39_partition_skew_audit(spark, sf).head()
    assert(r.getAs[Long]("skew_bp") >= 10000,
      "max is at least the mean, so max*parts/total >= 10000")
    assert(r.getAs[Long]("max_rows") >= r.getAs[Long]("min_rows"))
    assert(r.getAs[Long]("n_parts_occupied") <= 32)
  }

  test("q112: survival is monotone non-increasing and risk-set consistent") {
    val rows = Round68Queries.q112_survival(spark, sf).collect()
      .sortBy(_.getAs[Long]("day_idx"))
    assert(rows.length === 30)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("survival_micro") <=
        a.getAs[Long]("survival_micro"), "KM curve never increases")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_deaths") <= r.getAs[Long]("n_risk"))
      assert(r.getAs[Long]("survival_micro") >= 0 &&
        r.getAs[Long]("survival_micro") <= 1000000L)
    }
  }

  test("t40: confusion-matrix rows account for every document") {
    val out = Round68Queries.t40_langid_confusion(spark, sf)
    val total = out.agg(sum(col("n_docs"))).head().getLong(0)
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(total === nDocs)
    val badRow = out.groupBy(col("lang_declared"))
      .agg(sum(col("n_docs")).as("s"), max(col("declared_total")).as("t"))
      .filter(col("s") =!= col("t")).count()
    assert(badRow === 0, "per-class counts must sum to the declared total")
  }

  test("d36: closure census is a valid wedge partition") {
    val r = Round69Queries.d36_transitivity_audit(spark, sf).head()
    assert(r.getAs[Long]("n_closed") + r.getAs[Long]("n_open") ===
      r.getAs[Long]("n_wedges"))
    val bp = r.getAs[Long]("closure_bp")
    assert(bp >= 0 && bp <= 10000)
  }
}
