package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-115 operators, pinned at sf0.001. */
class Round115Spec extends SparkSpec {

  test("q163: Fiedler vector is unit-norm, v1-orthogonal; cut replays") {
    val rows = Round115Queries.q163_spectral_bisection(spark, sf).collect()
    // only nations in the THRESHOLDED trade graph appear (14 at sf0.001:
    // the 60%-of-max cut drops the thin bilateral routes); the exact node
    // set is pinned against the recomputed edge set below
    assert(rows.nonEmpty)
    // both sides of the bisection are non-empty (otherwise no cut)
    val sides = rows.map(_.getAs[String]("side")).toSet
    assert(sides === Set("P", "N"))
    // every row carries the same cut_edges scalar
    assert(rows.map(_.getAs[Long]("cut_edges")).toSet.size === 1)

    // recompute the thresholded edge set + invariants from the raw tables
    val x = rows.map(r => r.getAs[String]("n_name") ->
      r.getAs[Double]("fiedler_score")).toMap
    val nat = graft.Tables.load(spark, sf, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val w = graft.Tables.load(spark, sf, "lineitem").as("l")
      .join(graft.Tables.load(spark, sf, "orders").as("o"),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.load(spark, sf, "customer").as("c"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.load(spark, sf, "supplier").as("s"),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").cast("long").as("u"),
        col("s_nationkey").cast("long").as("v"))
      .count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("count"))
    val maxw = w.map(_._2).max
    val e = w.collect { case ((u, v), c) if c * 5 >= maxw * 3 => (u, v) }
    // cut_edges: directed edges whose endpoints land on opposite sides
    val cut = e.count { case (u, v) => x(nat(u)) * x(nat(v)) < 0 }
    assert(rows.head.getAs[Long]("cut_edges") === cut.toLong)
    // unit norm and deflation (orthogonality to the trivial eigenvector)
    val und = (e ++ e.map(p => (p._2, p._1))).distinct
    val deg = und.groupBy(_._1).map { case (n, es) => n -> es.length }
    val norm = deg.keys.toSeq.map(n => x(nat(n)) * x(nat(n))).sum
    assert(math.abs(norm - 1.0) < 1e-6, s"norm $norm")
    val m2 = deg.values.sum.toDouble
    val dot = deg.toSeq.map { case (n, d) =>
      x(nat(n)) * math.sqrt(d / m2) }.sum
    assert(math.abs(dot) < 1e-6, s"v1 component $dot survived deflation")
    // isolated nations (not in the thresholded graph) are absent from x
    // and joined away — the result's nation set must equal the node set
    // of the recomputed thresholded graph, no more, no fewer
    assert(deg.keySet.map(nat) === x.keySet)
  }

  test("t64: suffix-automaton count equals the brute-force substring set") {
    val rows = Round115Queries.t64_distinct_substrings(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val p = texts(r.getAs[Long]("doc_id")).toLowerCase
        .replaceAll("[^a-z ]", "").take(48)
      val n = p.length.toLong
      assert(r.getAs[Long]("n") === n)
      val brute = (for {
        i <- 0 until p.length
        j <- (i + 1) to p.length
      } yield p.substring(i, j)).toSet.size.toLong
      assert(r.getAs[Long]("n_distinct") === brute,
        s"doc ${r.getAs[Long]("doc_id")}: automaton vs brute force")
      val novelty = r.getAs[Double]("novelty")
      assert(novelty > 0.0 && novelty <= 1.0)
    }
  }
}
