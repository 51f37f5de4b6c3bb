package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-108 operators, pinned at sf0.001. */
class Round108Spec extends SparkSpec {

  test("q152: decoded path matches a full-matrix Viterbi replay and is optimal") {
    val rows = Round108Queries.q152_viterbi_regimes(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent replay: full T x 2 matrix with explicit backpointers
    def viterbi(obs: Seq[Long]): (Long, String) = {
      val T = obs.length
      val dp = Array.ofDim[Long](T, 2)
      val bp = Array.ofDim[Int](T, 2)
      for (s <- 0 to 1) dp(0)(s) = if (obs(0) == s) 0L else 2L
      for (t <- 1 until T; s <- 0 to 1) {
        val emit = if (obs(t) == s) 0L else 2L
        val c0 = dp(t - 1)(0) + (if (s == 0) 1L else 3L)
        val c1 = dp(t - 1)(1) + (if (s == 1) 1L else 3L)
        if (c0 <= c1) { dp(t)(s) = c0 + emit; bp(t)(s) = 0 }
        else { dp(t)(s) = c1 + emit; bp(t)(s) = 1 }
      }
      var s = if (dp(T - 1)(0) <= dp(T - 1)(1)) 0 else 1
      val cost = dp(T - 1)(s)
      val path = new StringBuilder
      for (t <- (T - 1) to 0 by -1) {
        path.insert(0, s)
        if (t > 0) s = bp(t)(s)
      }
      (cost, path.toString)
    }
    def pathCost(obs: Seq[Long], path: String): Long = {
      val emit = obs.indices.map(i =>
        if (obs(i) == (path(i) - '0').toLong) 0L else 2L).sum
      val trans = (1 until path.length).map(i =>
        if (path(i) == path(i - 1)) 1L else 3L).sum
      emit + trans
    }
    // rebuild each priority's observation sequence exactly as the query does
    val base = graft.Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderpriority").as("pri"),
        ((year(col("o_orderdate")) - 1992) * 12 +
          month(col("o_orderdate")) - 1).cast("long").as("mb"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val lo = base.map(_._2).min; val hi = base.map(_._2).max
    val obsBy = base.groupBy(_._1).map { case (p, xs) =>
      val m = xs.map(x => x._2 -> x._3).toMap
      val v = (lo to hi).map(m.getOrElse(_, 0L))
      val tot = v.sum; val n = v.length
      p -> v.map(x => if (x * n >= tot) 1L else 0L)
    }
    rows.foreach { r =>
      val pri = r.getAs[String]("pri")
      val path = r.getAs[String]("path")
      val cost = r.getAs[Long]("cost")
      val obs = obsBy(pri)
      val (wc, wp) = viterbi(obs)
      assert(path === wp, s"decoded path differs for $pri")
      assert(cost === wc, s"cost differs for $pri")
      assert(path.length === obs.length)
      assert(cost === pathCost(obs, path), "reported cost != path's cost")
      // optimality spot-check: beats the trivial decodes
      assert(cost <= pathCost(obs, "0" * obs.length))
      assert(cost <= pathCost(obs, "1" * obs.length))
      assert(cost <= pathCost(obs, obs.map(_.toString).mkString))
      assert(r.getAs[Long]("n_high") === path.count(_ == '1').toLong)
    }
    // expression anchors: a lone blip is absorbed (switching costs 6,
    // mis-emitting costs 2), a long block is kept
    import graft.functions.ViterbiExpr
    val a = spark.range(1).select(
      ViterbiExpr.viterbi(typedLit(Seq(0L, 0L, 1L, 0L, 0L))).as("blip"),
      ViterbiExpr.viterbi(typedLit(Seq(0L, 0L, 1L, 1L, 1L, 0L))).as("block"),
      ViterbiExpr.viterbi(typedLit(Seq(1L, 1L))).as("ones"))
      .collect()(0)
    assert(a.getString(0) === "00000")
    assert(a.getString(1) === "001110")
    assert(a.getString(2) === "11")
  }

  test("p52: unique/minimal flags replay from driver sets") {
    val rows = Round108Queries.p52_key_discovery(spark, sf).collect()
    assert(rows.length === 21) // 6 singles + 15 pairs
    val byCombo = rows.map(r => r.getAs[String]("combo") -> r).toMap
    val o = graft.Tables.load(spark, sf, "orders")
    val nRows = o.count()
    // driver replay of three representative combos
    val okDistinct = o.select(col("o_orderkey")).distinct().count()
    assert(byCombo("o_orderkey").getAs[Long]("n_distinct") === okDistinct)
    val pairDistinct = o.select(col("o_custkey"), col("o_totalprice"))
      .distinct().count()
    assert(byCombo("o_custkey,o_totalprice").getAs[Long]("n_distinct")
      === pairDistinct)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") === nRows)
      val nd = r.getAs[Long]("n_distinct")
      assert(nd >= 1L && nd <= nRows)
      assert((r.getAs[Long]("is_unique") === 1L) === (nd === nRows))
    }
    // the primary key is unique AND minimal; its supersets are not minimal
    assert(byCombo("o_orderkey").getAs[Long]("is_minimal") === 1L)
    byCombo.keys.filter(c => c.contains(",") && c.contains("o_orderkey"))
      .foreach { c =>
        assert(byCombo(c).getAs[Long]("is_unique") === 1L)
        assert(byCombo(c).getAs[Long]("is_minimal") === 0L,
          s"superset of a key flagged minimal: $c")
      }
    // pair distinct count is at least either projection's
    byCombo.keys.filter(_.contains(",")).foreach { c =>
      val Array(a, b) = c.split(",")
      assert(byCombo(c).getAs[Long]("n_distinct") >=
        math.max(byCombo(a).getAs[Long]("n_distinct"),
          byCombo(b).getAs[Long]("n_distinct")))
    }
  }

  test("s25: neighbor ranking replays from raw co-purchase counts") {
    val rows = Round108Queries.s25_item_cf(spark, sf).collect()
    assert(rows.nonEmpty)
    val baskets = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val supp = baskets.groupBy(_._2).map { case (b, xs) => b -> xs.length }
    val co: Map[(String, String), Int] = baskets.groupBy(_._1).values
      .flatMap { xs =>
        val items = xs.map(_._2).toSeq
        for (a <- items; b <- items if a != b) yield (a, b)
      }.toSeq.groupBy(identity).map { case (p, xs) => p -> xs.length }
    val wantTop = supp.keys.toSeq.sorted.flatMap { item =>
      co.keys.filter(_._1 == item).toSeq
        .map { case (_, nb) =>
          val c = co((item, nb))
          val cos = math.round(c / math.sqrt(supp(item).toDouble *
            supp(nb)) * 1e6) / 1e6
          (nb, cos)
        }
        .sortBy { case (nb, cos) => (-cos, nb) }.take(3).zipWithIndex
        .map { case ((nb, cos), i) => (item, nb, i + 1L, cos) }
    }
    val got = rows.map(r => (r.getAs[String]("item"),
      r.getAs[String]("neighbor"), r.getAs[Long]("rnk"),
      r.getAs[Double]("cosine")))
    assert(got.length === wantTop.length)
    got.zip(wantTop).foreach { case (g, w) =>
      assert(g._1 === w._1 && g._2 === w._2 && g._3 === w._3,
        s"ranking differs: $g vs $w")
      assert(math.abs(g._4 - w._4) < 2e-6)
      assert(g._4 >= 0.0 && g._4 <= 1.0)
    }
  }
}
