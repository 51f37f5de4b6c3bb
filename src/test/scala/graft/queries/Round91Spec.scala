package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-91 operators, pinned at sf0.001. */
class Round91Spec extends SparkSpec {

  test("q132: Shapley efficiency holds exactly in integers") {
    val rows = Round91Queries.q132_shapley_attribution(spark, sf).collect()
    assert(rows.length === 4)
    val convTotal = rows.head.getAs[Long]("conv_total")
    assert(convTotal > 0)
    // efficiency: Σ φ_c = v(grand coalition), exactly, scaled by 24
    assert(rows.map(_.getAs[Long]("shap24")).sum === 24L * convTotal)
    // monotone coverage game ⇒ non-negative marginal contributions
    rows.foreach(r => assert(r.getAs[Long]("shap24") >= 0L))
    // shares are a probability vector (up to the 1e-6 rounding)
    val share = rows.map(_.getAs[Double]("shapley_share")).sum
    assert(math.abs(share - 1.0) < 1e-5)
  }

  test("m28: signature matches a from-scratch Haar computation for doc 0") {
    val rows = Round91Queries.m28_haar_signature(spark, sf).collect()
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("sig"), r.getAs[Long]("ll_total"))).toMap
    // recompute doc 0's raster and transform by hand
    val text = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") === 0).select(col("text"))
      .collect().head.getString(0)
    val cps = text.codePoints().toArray
    val v = Array.tabulate(64)(i => (cps(i % cps.length) % 256).toLong)
    var sig = 0L
    var llTotal = 0L
    for (by <- 0 until 4; bx <- 0 until 4) {
      val blk = by * 4 + bx
      val a = v(2 * by * 8 + 2 * bx);     val b = v(2 * by * 8 + 2 * bx + 1)
      val c = v((2 * by + 1) * 8 + 2 * bx)
      val d = v((2 * by + 1) * 8 + 2 * bx + 1)
      llTotal += a + b + c + d
      if (a - b + c - d > 0) sig |= 1L << (3 * blk)
      if (a + b - c - d > 0) sig |= 1L << (3 * blk + 1)
      if (a - b - c + d > 0) sig |= 1L << (3 * blk + 2)
    }
    assert(byDoc(0L) === ((sig, llTotal)))
    // cluster accounting: identical texts always share a signature
    val sizes = rows.groupBy(_.getAs[Long]("sig"))
      .map { case (_, rs) => rs.head.getAs[Long]("n_same_sig") -> rs.length }
    sizes.foreach { case (reported, actual) => assert(reported === actual) }
  }

  test("q133: pair accounting is complete and correlation is positive") {
    val r = Round91Queries.q133_kendall_tau(spark, sf).collect().head
    val n = graft.Tables.load(spark, sf, "orders")
      .filter(col("o_custkey") % 4 === 0)
      .select(col("o_custkey")).distinct().count()
    val pairs = r.getAs[Long]("nc") + r.getAs[Long]("nd") +
      r.getAs[Long]("tx") + r.getAs[Long]("ty") + r.getAs[Long]("txy")
    assert(pairs === n * (n - 1) / 2)
    val tau = r.getAs[Double]("tau_b")
    assert(tau > 0.0 && tau <= 1.0,
      s"order count and spend must correlate positively, got $tau")
  }
}
