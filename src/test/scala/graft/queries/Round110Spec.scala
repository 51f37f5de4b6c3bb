package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import scala.collection.mutable

/** Invariants for the round-110 operators, pinned at sf0.001. */
class Round110Spec extends SparkSpec {

  private def thresholdedEdges(): Seq[(Long, Long, Long)] = {
    val w = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.load(spark, sf, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").cast("long").as("u"),
        col("s_nationkey").cast("long").as("v"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    w
  }

  test("q155: betweenness matches a stack-based Brandes replay") {
    val rows = Round110Queries.q155_betweenness(spark, sf).collect()
    assert(rows.nonEmpty)
    val all = thresholdedEdges()
    val maxw = all.map(_._3).max
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    all.filter(e => e._3 * 5 >= maxw * 3).foreach { case (u, v, _) =>
      adj.getOrElseUpdate(u, mutable.Set.empty) += v
      adj.getOrElseUpdate(v, mutable.Set.empty) += u
    }
    val nodes = adj.keys.toSeq.sorted
    val bc = mutable.Map(nodes.map(_ -> 0.0): _*)
    nodes.foreach { s0 =>
      val stack = mutable.Stack.empty[Long]
      val pred = mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
      val sigma = mutable.Map(nodes.map(_ -> 0L): _*); sigma(s0) = 1L
      val dist = mutable.Map(nodes.map(_ -> -1L): _*); dist(s0) = 0L
      val q = mutable.Queue(s0)
      while (q.nonEmpty) {
        val v = q.dequeue(); stack.push(v)
        adj(v).foreach { w2 =>
          if (dist(w2) < 0) { dist(w2) = dist(v) + 1; q.enqueue(w2) }
          if (dist(w2) == dist(v) + 1) {
            sigma(w2) += sigma(v); pred(w2) = v :: pred(w2)
          }
        }
      }
      val delta = mutable.Map(nodes.map(_ -> 0.0): _*)
      while (stack.nonEmpty) {
        val w2 = stack.pop()
        pred(w2).foreach { v =>
          delta(v) += sigma(v).toDouble / sigma(w2) * (1 + delta(w2))
        }
        if (w2 != s0) bc(w2) += delta(w2)
      }
    }
    val names = graft.Tables.load(spark, sf, "nation")
      .select(col("n_name"), col("n_nationkey").cast("long")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length === nodes.length)
    rows.foreach { r =>
      val nk = names(r.getAs[String]("n_name"))
      val want = bc(nk) / 2.0
      assert(math.abs(r.getAs[Double]("betweenness") - want) < 2e-5,
        s"betweenness differs for node $nk: got " +
          s"${r.getAs[Double]("betweenness")}, want $want")
    }
    // the hub of a sparsified hub-and-spoke graph must dominate
    assert(rows.map(_.getAs[Double]("betweenness")).max > 0.0)
  }

  test("q156: matching is valid, maximal, and replays the greedy walk") {
    val rows = Round110Queries.q156_greedy_matching(spark, sf).collect()
    assert(rows.nonEmpty)
    val all = thresholdedEdges().sortBy { case (u, v, w) => (-w, u, v) }
    val matched = mutable.Set.empty[Long]
    val want = all.flatMap { case (u, v, w) =>
      if (!matched.contains(u) && !matched.contains(v)) {
        matched += u; matched += v; Some((u, v, w))
      } else None
    }
    val names = graft.Tables.load(spark, sf, "nation")
      .select(col("n_name"), col("n_nationkey").cast("long")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length === want.length)
    rows.zip(want).foreach { case (r, (u, v, w)) =>
      assert(names(r.getAs[String]("name_u")) === u)
      assert(names(r.getAs[String]("name_v")) === v)
      assert(r.getAs[Long]("w") === w)
    }
    assert(rows.map(_.getAs[Long]("rnk")).toSeq ===
      (1L to rows.length.toLong))
    // matching validity: no endpoint appears twice
    val eps = rows.flatMap(r => Seq(r.getAs[String]("name_u"),
      r.getAs[String]("name_v")))
    assert(eps.distinct.length === eps.length, "endpoint reused")
    // maximality: every non-matched edge touches a matched endpoint
    val matchedIds = eps.map(names).toSet
    all.foreach { case (u, v, _) =>
      assert(matchedIds.contains(u) || matchedIds.contains(v),
        s"unmatched edge ($u,$v) extends the matching — not maximal")
    }
    // expression anchors
    import graft.functions.GreedyMatchExpr
    val f = spark.range(1).select(
      GreedyMatchExpr.greedyMatch(typedLit(Seq(1L, 1L, 3L)),
        typedLit(Seq(2L, 3L, 4L))).as("a")).collect()(0).getSeq[Long](0)
    // edge1 (1,2) kept; edge2 (1,3) blocked by 1; edge3 (3,4) kept
    assert(f === Seq(1L, 0L, 1L))
  }
}
