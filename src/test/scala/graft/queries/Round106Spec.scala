package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-106 operators, pinned at sf0.001. */
class Round106Spec extends SparkSpec {

  test("q147: v-optimal curve matches a top-down memo replay and is convex-ish") {
    val rows = Round106Queries.q147_voptimal_curve(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent replay: top-down memoized recursion instead of the
    // bottom-up table
    def vopt(ys: Array[Long], maxB: Int): Array[Double] = {
      val n = ys.length
      val s = ys.scanLeft(0L)(_ + _)
      val sq = ys.scanLeft(0L)((a, y) => a + y * y)
      def sse(i: Int, j: Int): Double = { // 1-indexed inclusive
        val d = (s(j) - s(i - 1)).toDouble
        (sq(j) - sq(i - 1)).toDouble - d * d / (j - i + 1).toDouble
      }
      val memo = scala.collection.mutable.Map.empty[(Int, Int), Double]
      def f(j: Int, b: Int): Double = // optimal for prefix [1..j] with b buckets
        if (b == 1) sse(1, j)
        else memo.getOrElseUpdate((j, b),
          (b to j).map(i => f(i - 1, b - 1) + sse(i, j)).min)
      (1 to math.min(maxB, n)).map(b => f(n, b)).toArray
    }
    val series = graft.Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderpriority").as("pri"),
        expr("(dayofyear(o_orderdate) - 1) div 10").cast("long").as("bk"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (p, rs) => p -> rs.sortBy(_._2).map(_._3).toArray }
    rows.groupBy(_.getAs[String]("pri")).foreach { case (pri, rs) =>
      val got = rs.sortBy(_.getAs[Long]("n_buckets"))
        .map(_.getAs[Double]("sse"))
      val want = vopt(series(pri), 6).map(v => math.round(v * 1e6) / 1e6)
      assert(got.toSeq === want.toSeq, s"memo replay differs for $pri")
      // more buckets can never hurt: the curve is non-increasing
      assert(got.zip(got.tail).forall { case (a, b) => a >= b - 1e-9 },
        s"curve not non-increasing for $pri")
      assert(got.forall(_ >= -1e-9), s"negative SSE for $pri")
    }
    // expression anchors against hand-computed optima
    import graft.functions.VOptCurveExpr
    val a = spark.range(1).select(
      VOptCurveExpr.voptCurve(typedLit(Seq(1L, 1L, 5L, 5L)), 3).as("c"))
      .collect()(0).getSeq[Double](0)
    // b=1: mean 3, sse = 4*4 = 16; b=2: {1,1|5,5} sse 0; b=3: 0
    assert(a === Seq(16.0, 0.0, 0.0))
    val b = spark.range(1).select(
      VOptCurveExpr.voptCurve(typedLit(Seq(4L)), 6).as("c"))
      .collect()(0).getSeq[Double](0)
    assert(b === Seq(0.0)) // curve truncates at n when n < maxB
  }

  test("q148: WL colors refine monotonically and respect automorphism classes") {
    val rows = Round106Queries.q148_wl_refinement(spark, sf).collect()
    assert(rows.length === 25)
    def classes(k: Int) = rows.groupBy(_.getAs[Long](s"color$k"))
      .values.map(_.map(_.getAs[String]("n_name")).toSet).toSet
    val (c1, c2, c3) = (classes(1), classes(2), classes(3))
    // each round's partition refines the previous one (every class at
    // round k+1 is a subset of some class at round k)
    assert(c2.forall(g => c1.exists(g.subsetOf(_))), "round 2 not a refinement")
    assert(c3.forall(g => c2.exists(g.subsetOf(_))), "round 3 not a refinement")
    assert(c1.size <= c2.size && c2.size <= c3.size)
    // colors are dense ranks starting at 1
    (1 to 3).foreach { k =>
      val cs = rows.map(_.getAs[Long](s"color$k")).distinct.sorted
      assert(cs.toSeq === (1L to cs.length).toSeq, s"ranks not dense at $k")
    }
  }

  test("q149: TPC-H foreign keys are discovered; coverage is consistent") {
    val rows = Round106Queries.q149_inclusion_deps(spark, sf).collect()
    assert(rows.length === 90) // 10 columns, ordered pairs
    val byPair = rows.map(r => (r.getAs[String]("col_a"),
      r.getAs[String]("col_b")) -> r).toMap
    // ground-truth TPC-H FK inclusions must all be flagged
    val fks = Seq(
      ("orders.o_custkey", "customer.c_custkey"),
      ("lineitem.l_orderkey", "orders.o_orderkey"),
      ("lineitem.l_partkey", "part.p_partkey"),
      ("lineitem.l_suppkey", "supplier.s_suppkey"),
      ("customer.c_nationkey", "nation.n_nationkey"))
    fks.foreach { p =>
      assert(byPair(p).getAs[Long]("included") === 1L, s"FK missed: $p")
    }
    // a PK can never be included in a 25-value nation key
    assert(byPair(("orders.o_orderkey", "nation.n_nationkey"))
      .getAs[Long]("included") === 0L)
    rows.foreach { r =>
      val cov = r.getAs[Double]("coverage")
      assert(cov >= 0.0 && cov <= 1.0)
      assert((r.getAs[Long]("included") === 1L) ===
        (r.getAs[Long]("n_shared") === r.getAs[Long]("n_a")))
    }
    // driver replay of one non-trivial pair via plain sets
    val ck = graft.Tables.load(spark, sf, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val ok = graft.Tables.load(spark, sf, "orders")
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val r = byPair(("customer.c_custkey", "orders.o_custkey"))
    assert(r.getAs[Long]("n_a") === ck.size.toLong)
    assert(r.getAs[Long]("n_shared") === (ck intersect ok).size.toLong)
  }
}
