package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-88 operators, pinned at sf0.001. */
class Round88Spec extends SparkSpec {

  test("t47: stopwords never surface and degree dominates frequency") {
    val rows = Round88Queries.t47_rake(spark, sf).collect()
    assert(rows.nonEmpty)
    val stop = Set("a", "the", "and", "of", "to", "in", "is", "it", "on",
      "for")
    rows.foreach { r =>
      assert(!stop(r.getAs[String]("term")))
      // every phrase containing w has length >= 1, so deg >= freq
      assert(r.getAs[Long]("deg") >= r.getAs[Long]("freq"))
      assert(r.getAs[Double]("rake_score") >= 1.0)
    }
  }

  test("t48: normalization is monotone and spans the pooled extremes") {
    val rows = Round88Queries.t48_quantile_normalize(spark, sf).collect()
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("n_chars")).collect().map(_.getLong(0))
    assert(rows.length === docs.length)
    // the per-source max rank always maps to the pooled maximum
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getAs[Long]("n_chars"),
        r.getAs[Long]("doc_id")))
      assert(sorted.last.getAs[Long]("norm_chars") === docs.max,
        "top rank of each source maps to the pooled max")
      // monotone: higher per-source rank never lowers the normalized value
      sorted.map(_.getAs[Long]("norm_chars")).sliding(2).foreach {
        case Array(a, b) => assert(a <= b); case _ =>
      }
    }
    // normalized values are actual pooled values
    val pool = docs.toSet
    rows.foreach(r => assert(pool(r.getAs[Long]("norm_chars"))))
  }

  test("t49: bins partition the corpus and confidence is monotone") {
    val rows = Round88Queries.t49_calibration(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("bin")).toSeq ===
      rows.map(_.getAs[Long]("bin")).toSeq.sorted)
    val total = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    // mean confidence rises strictly with the bin index
    rows.map(_.getAs[Double]("conf")).sliding(2).foreach {
      case Array(a, b) => assert(a < b); case _ =>
    }
    // brier and ece are corpus-level constants repeated per row
    assert(rows.map(_.getAs[Double]("brier")).distinct.length === 1)
    assert(rows.map(_.getAs[Double]("ece")).distinct.length === 1)
    val brier = rows.head.getAs[Double]("brier")
    assert(brier >= 0.0 && brier <= 1.0)
  }

  test("q129: grid classification equals the brute-force DBSCAN labels") {
    val got = Round88Queries.q129_dbscan_grid(spark, sf).collect()
      .map(r => r.getAs[Long]("c") ->
        (r.getAs[Long]("n_nbrs"), r.getAs[String]("cls"))).toMap
    val pts = graft.Tables.load(spark, sf, "customer")
      .selectExpr("c_custkey AS c", "(c_custkey * 7919) % 100000 AS x",
        "(c_custkey * 104729) % 100000 AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def d2(a: (Long, Long, Long), b: (Long, Long, Long)): Long =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    val nbrs = pts.map(p =>
      p._1 -> pts.filter(q => q._1 != p._1 && d2(p, q) <= 25000000L)).toMap
    val core = pts.filter(p => nbrs(p._1).length >= 12).map(_._1).toSet
    pts.foreach { p =>
      val (n, cls) = got(p._1)
      assert(n === nbrs(p._1).length.toLong)
      val expected =
        if (core(p._1)) "core"
        else if (nbrs(p._1).exists(q => core(q._1))) "border"
        else "noise"
      assert(cls === expected, s"point ${p._1}")
    }
  }
}
