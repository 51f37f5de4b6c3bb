package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-102 operators, pinned at sf0.001. */
class Round102Spec extends SparkSpec {

  test("q145: the decomposition identity holds exactly in integers") {
    val rows = Round102Queries.q145_price_volume_mix(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // volume_n + price_n == total_delta * q0 * q1, as exact strings
      assert(r.getAs[String]("check_n") === r.getAs[String]("check_d"),
        s"brand ${r.getAs[String]("brand")}")
      // the rounded effects approximately reconstruct the delta (USD)
      val recon = r.getAs[Double]("volume_effect_usd") +
        r.getAs[Double]("price_effect_usd")
      val delta = r.getAs[Long]("total_delta") / 100.0
      assert(math.abs(recon - delta) < 0.05,
        s"effects $recon vs delta $delta")
    }
  }

  test("m36: dither bitmaps agree with a driver replay for doc 0") {
    val rows = Round102Queries.m36_ordered_dither(spark, sf).collect()
    val bayer = Array(0, 8, 2, 10, 12, 4, 14, 6, 3, 11, 1, 9, 15, 7, 13, 5)
    val text = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") === 0).select(col("text"))
      .collect().head.getString(0)
    val cps = text.codePoints().toArray
    var lo = 0L; var hi = 0L; var on = 0L
    for (i <- 0 until 64) {
      val v = cps(i % cps.length) % 256
      val b = bayer((i / 8 % 4) * 4 + i % 8 % 4)
      if (v > 16 * b + 8) {
        on += 1
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
    }
    val d0 = rows.find(_.getAs[Long]("doc_id") == 0L).get
    assert(d0.getAs[Long]("n_on") === on)
    assert(d0.getAs[Long]("bm_lo") === lo)
    assert(d0.getAs[Long]("bm_hi") === hi)
    // the popcount of the halves always equals n_on
    rows.foreach { r =>
      assert(java.lang.Long.bitCount(r.getAs[Long]("bm_lo")) +
        java.lang.Long.bitCount(r.getAs[Long]("bm_hi")) ===
        r.getAs[Long]("n_on").toInt)
    }
  }

  test("t57: the entropy rate is bounded by log2 of the alphabet") {
    val r = Round102Queries.t57_markov_entropy_rate(spark, sf)
      .collect().head
    val h = r.getAs[Double]("entropy_rate_bits")
    assert(h > 0.0 && h <= math.log(5.0) / math.log(2.0) + 1e-9,
      s"entropy rate $h outside (0, log2 5]")
    assert(r.getAs[Long]("n_transition_kinds") <= 25L)
    assert(r.getAs[Long]("min_cell") > 0L)
  }
}
