package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import scala.collection.mutable

/** Invariants for the round-111 operators, pinned at sf0.001. */
class Round111Spec extends SparkSpec {

  test("t62: BWT inverts back to the input via LF-mapping") {
    val rows = Round111Queries.t62_bwt_probe(spark, sf).collect()
    assert(rows.nonEmpty)
    val prefixes = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        concat(substring(regexp_replace(lower(col("text")), "[^a-z ]", ""),
          1, 48), lit("|")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // inverse BWT: stable-sort positions by character (LF mapping), walk
    // the cycle, then rotate so the unique '|' sentinel is last — a
    // genuinely different algorithm from the forward rotation sort
    def invert(bwt: String): String = {
      val n = bwt.length
      val order = bwt.indices.sortBy(i => (bwt(i), i)) // first column
      val out = new StringBuilder
      var i = order(0) // start anywhere on the cycle; fix rotation later
      var k = 0
      while (k < n) { i = order(i); out.append(bwt(i)); k += 1 }
      val s0 = out.toString
      val cut = s0.indexOf('|')
      s0.substring(cut + 1) + s0.substring(0, cut + 1)
    }
    rows.foreach { r =>
      val p = prefixes(r.getAs[Long]("doc_id"))
      val bwt = r.getAs[String]("bwt")
      assert(bwt.length === p.length)
      assert(bwt.sorted === p.sorted, "BWT must permute the input")
      assert(invert(bwt) === p, s"inverse BWT failed for ${r.getAs[Long]("doc_id")}")
      val (br, rr) = (r.getAs[Long]("bwt_runs"), r.getAs[Long]("raw_runs"))
      assert(br >= 1L && br <= p.length.toLong)
      assert(rr >= 1L && rr <= p.length.toLong)
      assert(math.abs(r.getAs[Double]("clustering_gain") -
        math.round(br.toDouble / rr * 1e6) / 1e6) < 1e-9)
    }
  }

  test("q157: backbone replays Kruskal and matches Prim's total weight") {
    val rows = Round111Queries.q157_max_spanning_backbone(spark, sf).collect()
    assert(rows.nonEmpty)
    val edges = graft.Tables.load(spark, sf, "lineitem")
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
    // driver Kruskal with a rank-based union-find (different structure)
    val sorted = edges.sortBy { case (u, v, w) => (-w, u, v) }
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val want = sorted.flatMap { case (u, v, w) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(rv) = ru; Some((u, v, w)) } else None
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
    // Prim from the min node must reach the same total weight (max
    // spanning weight is unique even when the edge set is not)
    val adj = mutable.Map.empty[Long, mutable.Map[Long, Long]]
    edges.foreach { case (u, v, w) =>
      val uu = adj.getOrElseUpdate(u, mutable.Map.empty)
      uu(v) = math.max(uu.getOrElse(v, Long.MinValue), w)
      val vv = adj.getOrElseUpdate(v, mutable.Map.empty)
      vv(u) = math.max(vv.getOrElse(u, Long.MinValue), w)
    }
    var total = 0L
    val all = adj.keySet.toSet
    val visited = mutable.Set.empty[Long]
    while (visited.size < all.size) {
      val seed = (all -- visited).min
      visited += seed
      var grown = true
      while (grown) {
        val cands = for {
          v <- visited.toSeq; (n2, w) <- adj(v) if !visited.contains(n2)
        } yield (w, n2)
        if (cands.isEmpty) grown = false
        else { val best = cands.maxBy(_._1); total += best._1; visited += best._2 }
      }
    }
    assert(rows.map(_.getAs[Long]("w")).sum === total,
      "Kruskal total != Prim total")
    // acyclic spanning check: edges == nodes - components
    assert(rows.length === all.size - 1 ||
      rows.length < all.size, "not a forest")
  }

  test("q158: rally/drawdown replay from the collected daily series") {
    val rows = Round111Queries.q158_drawdown_rally(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderpriority").as("pri"),
        to_date(col("o_orderdate")).as("d"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    rows.foreach { r =>
      val pri = r.getAs[String]("pri")
      val series = daily.filter(_._1 == pri).sortBy(_._2.getTime).map(_._3)
      val diffs = series.zip(series.tail).map { case (a, b) => b - a }
      val prefix = diffs.scanLeft(0L)(_ + _)
      val rally = prefix.indices.map(i => prefix(i) - prefix.take(i + 1).min).max
      val draw = prefix.indices.map(i => prefix.take(i + 1).max - prefix(i)).max
      assert(r.getAs[Long]("max_rally_cents") === rally, s"rally differs $pri")
      assert(r.getAs[Long]("max_drawdown_cents") === draw, s"draw differs $pri")
      assert(rally >= 0L && draw >= 0L)
    }
  }
}
