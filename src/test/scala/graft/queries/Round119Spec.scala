package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-119 operators, pinned at sf0.001. */
class Round119Spec extends SparkSpec {

  test("q164: winsorized mean replays the exact nearest-rank clamping") {
    val r = Round119Queries.q164_winsorized_mean(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    val xs = graft.Tables.load(spark, sf, "orders")
      .selectExpr("CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x")
      .collect().map(_.getLong(0)).sorted
    val n = xs.length.toLong
    def nearestRank(p: Long): Long = xs(((p * n + 99) / 100 - 1).toInt)
    val (p5, p95) = (nearestRank(5), nearestRank(95))
    assert(row.getAs[Long]("n_rows") === n)
    assert(row.getAs[Long]("p5_cents") === p5)
    assert(row.getAs[Long]("p95_cents") === p95)
    val clamped = xs.map(x => math.max(p5, math.min(p95, x)))
    assert(row.getAs[Long]("mean_wins_cents") === clamped.sum / n)
    assert(row.getAs[Long]("mean_raw_cents") === xs.sum / n)
    assert(row.getAs[Long]("n_lo_clip") === xs.count(_ < p5).toLong)
    assert(row.getAs[Long]("n_hi_clip") === xs.count(_ > p95).toLong)
    // clipping counts are bounded by the tail definitions
    assert(row.getAs[Long]("n_lo_clip") < n * 5 / 100 + 1)
    assert(row.getAs[Long]("n_hi_clip") <= n - (95 * n + 99) / 100 + 1)
  }

  test("t69: dispersion replays against per-doc count vectors") {
    val rows = Round119Queries.t69_burstiness(spark, sf).collect()
    assert(rows.length === 20)
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
    val nd = docs.length.toLong
    val perTerm = docs.flatMap { r =>
      r.getString(1).trim.split("\\s+").groupBy(identity)
        .map { case (w, occ) => (w, r.getLong(0), occ.length.toLong) }
    }.groupBy(_._1)
    rows.foreach { r =>
      val w = r.getAs[String]("w")
      val entries = perTerm(w)
      val df = entries.map(_._2).distinct.length.toLong
      val tt = entries.map(_._3).sum
      val sx2 = entries.map(e => e._3 * e._3).sum
      assert(r.getAs[Long]("df") === df)
      assert(r.getAs[Long]("total_occ") === tt)
      assert(r.getAs[Long]("vmr_ppm") ===
        (nd * sx2 - tt * tt) * 1000000L / (nd * tt))
    }
    // the top-20 really are the highest-df terms
    val minDf = rows.map(_.getAs[Long]("df")).min
    val better = perTerm.count { case (_, es) =>
      es.map(_._2).distinct.length.toLong > minDf }
    assert(better <= 20)
  }

  test("e38: the streaming monitor equals the batch drift row-for-row") {
    val streamed = Round119Queries.e38_stream_centroid_drift(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = Round118Queries.s26_centroid_drift(spark, sf)
      .collect().map(_.toString).toSeq
    assert(streamed === batch)
    assert(streamed.length === 5)
  }
}
