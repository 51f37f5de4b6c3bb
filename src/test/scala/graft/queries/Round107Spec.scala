package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-107 operators, pinned at sf0.001. */
class Round107Spec extends SparkSpec {

  test("q150: rules respect the Apriori bounds and replay from raw baskets") {
    val rows = Round107Queries.q150_basket_rules(spark, sf).collect()
    assert(rows.nonEmpty)
    // raw basket replay via plain driver sets
    val baskets = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nBaskets = baskets.map(_._1).distinct.length
    val supp = baskets.groupBy(_._2).map { case (b, xs) => b -> xs.length }
    val pairSupp = baskets.groupBy(_._1).values
      .flatMap(xs => xs.map(_._2).sorted.combinations(2)
        .map(p => (p(0), p(1))))
      .toSeq.groupBy(identity).map { case (p, xs) => p -> xs.length }
    rows.foreach { r =>
      val a = r.getAs[String]("antecedent")
      val c = r.getAs[String]("consequent")
      val sab = r.getAs[Long]("supp_ab")
      val key = if (a < c) (a, c) else (c, a)
      assert(pairSupp(key).toLong === sab, s"pair support differs for $a->$c")
      // a-priori: pair support cannot exceed either item support
      assert(sab <= supp(a) && sab <= supp(c))
      assert(sab * 100 >= nBaskets, "below min support")
      val conf = r.getAs[Double]("confidence")
      assert(math.abs(conf - sab.toDouble / supp(a)) < 2e-6)
      assert(conf > 0.0 && conf <= 1.0)
      val lift = r.getAs[Double]("lift")
      assert(math.abs(lift - sab.toDouble * nBaskets /
        (supp(a).toLong * supp(c))) < 2e-6)
    }
    // every unordered pair appears as exactly two directed rules, and
    // lift is direction-invariant
    val byPair = rows.groupBy { r =>
      val a = r.getAs[String]("antecedent"); val c = r.getAs[String]("consequent")
      if (a < c) (a, c) else (c, a)
    }
    byPair.values.foreach { rs =>
      assert(rs.length === 2)
      assert(rs(0).getAs[Double]("lift") === rs(1).getAs[Double]("lift"))
    }
  }

  test("q151: DTW matches a full-matrix driver replay and the warp bounds") {
    val rows = Round107Queries.q151_dtw_profiles(spark, sf).collect()
    assert(rows.nonEmpty)
    // driver replay: full (n+1)x(m+1) matrix instead of the two-row DP
    def dtwFull(a: Seq[Long], b: Seq[Long]): Long = {
      val inf = Long.MaxValue / 4
      val dp = Array.fill(a.length + 1, b.length + 1)(inf)
      dp(0)(0) = 0L
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
          math.min(dp(i - 1)(j - 1), math.min(dp(i - 1)(j), dp(i)(j - 1)))
      dp(a.length)(b.length)
    }
    val ev = graft.Tables.load(spark, sf, "events")
    val prof = ev.select(col("event_type"),
        hour(graft.Tables.tsMicros(ev)).cast("long").as("hr"))
      .groupBy(col("event_type"), col("hr")).count()
      .collect().map(r => (r.getString(0), r.getLong(1).toInt, r.getLong(2)))
      .groupBy(_._1).map { case (et, xs) =>
        val v = Array.fill(24)(0L)
        xs.foreach { case (_, h, c) => v(h) = c }
        et -> v.toSeq
      }
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val dtw = r.getAs[Long]("dtw_cost")
      val l1 = r.getAs[Long]("l1_cost")
      assert(dtw === dtwFull(prof(ta), prof(tb)), s"replay differs $ta/$tb")
      assert(l1 === prof(ta).zip(prof(tb)).map { case (x, y) =>
        math.abs(x - y) }.sum)
      // the diagonal path is a valid warp, so DTW never exceeds L1
      assert(dtw >= 0L && dtw <= l1)
    }
    // expression anchors: identity, symmetry
    import graft.functions.DtwExpr
    val a = Seq(3L, 1L, 4L, 1L, 5L)
    val b = Seq(2L, 7L, 1L, 8L, 2L)
    val df = spark.range(1).select(
      DtwExpr.dtw(typedLit(a), typedLit(a)).as("self"),
      DtwExpr.dtw(typedLit(a), typedLit(b)).as("ab"),
      DtwExpr.dtw(typedLit(b), typedLit(a)).as("ba")).collect()(0)
    assert(df.getLong(0) === 0L)
    assert(df.getLong(1) === df.getLong(2), "DTW must be symmetric")
    assert(df.getLong(1) === dtwFull(a, b))
  }

  test("s24: LOF top-20 matches a driver kNN replay") {
    val rows = Round107Queries.s24_lof_outliers(spark, sf).collect()
    assert(rows.length === 20)
    val pts = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray)
      .sortBy(_._1)
    val ids = pts.map(_._1); val xs = pts.map(_._2); val n = ids.length
    val k = 5
    def d2(i: Int, j: Int): Long =
      xs(i).zip(xs(j)).map { case (a, b) => (a - b) * (a - b) }.sum
    val knn = Array.tabulate(n) { i =>
      (0 until n).filter(_ != i).sortBy(j => (d2(i, j), ids(j))).take(k)
    }
    val kd = Array.tabulate(n)(i => d2(i, knn(i).last))
    val sr = Array.tabulate(n)(i =>
      knn(i).map(o => math.max(kd(o), d2(i, o))).sum.toDouble)
    val lof = Array.tabulate(n)(i => knn(i).map(o => sr(i) / sr(o)).sum / k)
    val want = (0 until n).sortBy(i => (-math.round(lof(i) * 1e6), ids(i)))
      .take(20).map(i => (ids(i), math.round(lof(i) * 1e6) / 1e6))
    rows.zip(want).foreach { case (r, (id, lf)) =>
      assert(r.getAs[Long]("vec_id") === id)
      assert(math.abs(r.getAs[Double]("lof") - lf) < 2e-6)
      assert(r.getAs[Double]("lof") > 0.0)
    }
  }
}
