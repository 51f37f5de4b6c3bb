package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-109 operators, pinned at sf0.001. */
class Round109Spec extends SparkSpec {

  test("q153: eccentricities match a Floyd-Warshall replay") {
    val rows = Round109Queries.q153_eccentricity(spark, sf).collect()
    assert(rows.nonEmpty)
    // rebuild the thresholded graph and run APSP a completely different
    // way (Floyd-Warshall instead of BFS frontiers)
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
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxw = w.map(_._3).max
    val edges = w.filter(e => e._3 * 5 >= maxw * 3)
      .flatMap(e => Seq((e._1, e._2), (e._2, e._1))).distinct
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val Inf = Int.MaxValue / 4
    val d = Array.fill(n, n)(Inf)
    nodes.indices.foreach(i => d(i)(i) = 0)
    edges.foreach { case (a, b) => d(idx(a))(idx(b)) = 1 }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (d(i)(k) + d(k)(j) < d(i)(j)) d(i)(j) = d(i)(k) + d(k)(j)
    val eccBy = nodes.indices.map { i =>
      val reach = d(i).filter(_ < Inf)
      nodes(i) -> (reach.max.toLong, reach.length.toLong)
    }.toMap
    val nationName = graft.Tables.load(spark, sf, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name")).collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(rows.length === n)
    val eccs = rows.map { r =>
      val nk = nationName(r.getAs[String]("n_name"))
      val (wantEcc, wantReach) = eccBy(nk)
      assert(r.getAs[Long]("ecc") === wantEcc, s"ecc differs for node $nk")
      assert(r.getAs[Long]("n_reachable") === wantReach)
      r.getAs[Long]("ecc")
    }
    val (diam, radius) = (eccs.max, eccs.min)
    rows.foreach { r =>
      assert((r.getAs[Long]("is_center") === 1L) ===
        (r.getAs[Long]("ecc") === radius))
      assert((r.getAs[Long]("is_periphery") === 1L) ===
        (r.getAs[Long]("ecc") === diam))
    }
  }

  test("q154: supports match a brute-force gap-subsequence scan") {
    val rows = Round109Queries.q154_seq_patterns(spark, sf).collect()
    // zero-support patterns are absent; 25 pairs + 125 triples is the cap
    assert(rows.nonEmpty && rows.length <= 150)
    val raw = graft.Tables.load(spark, sf, "events")
    val seqs = raw.select(col("user_id"), col("event_type"),
        unix_micros(graft.Tables.tsMicros(raw)).as("tu"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (u, xs) =>
        u -> xs.map(x => (x._3, x._2)).sortBy(_._1).toSeq
      }
    val gap = 3600L * 1000000L
    // existence of t1<t2<=t1+g (<t3<=t2+g): try every qualifying chain
    def has2(seq: Seq[(Long, String)], a: String, b: String): Boolean =
      seq.exists { case (ta, ea) => ea == a &&
        seq.exists { case (tb, eb) => eb == b && tb > ta && tb <= ta + gap } }
    def has3(seq: Seq[(Long, String)], a: String, b: String,
        c: String): Boolean =
      seq.exists { case (ta, ea) => ea == a &&
        seq.exists { case (tb, eb) => eb == b && tb > ta && tb <= ta + gap &&
          seq.exists { case (tc, ec) => ec == c && tc > tb &&
            tc <= tb + gap } } }
    val nUsers = seqs.size
    rows.foreach { r =>
      val parts = r.getAs[String]("pattern").split(">")
      val want = parts.length match {
        case 2 => seqs.values.count(s => has2(s, parts(0), parts(1)))
        case 3 => seqs.values.count(s => has3(s, parts(0), parts(1), parts(2)))
      }
      assert(r.getAs[Long]("support_users") === want.toLong,
        s"support differs for ${r.getAs[String]("pattern")}")
      assert(r.getAs[Long]("k") === parts.length.toLong)
      assert(math.abs(r.getAs[Double]("support_frac") -
        math.round(want.toDouble / nUsers * 1e6) / 1e6) < 1e-9)
    }
    // absent patterns really have zero support
    val present = rows.map(_.getAs[String]("pattern")).toSet
    val types = seqs.values.flatMap(_.map(_._2)).toSeq.distinct.sorted
    for (a <- types; b <- types if !present.contains(s"$a>$b"))
      assert(!seqs.values.exists(has2(_, a, b)), s"missing pattern $a>$b")
  }

  test("t61: automaton counts equal naive position scans, incl. overlaps") {
    // expression anchors on hostile literals: self-overlapping and nested
    import graft.functions.AhoCountExpr
    val a = spark.range(1).select(
      AhoCountExpr.ahoCount(lit("aaaa"), Seq("aa", "aaa")).as("x"),
      AhoCountExpr.ahoCount(lit("ababab"), Seq("ab", "bab", "abab")).as("y"),
      AhoCountExpr.ahoCount(lit("mississippi"),
        Seq("iss", "ssi", "issi", "ppi")).as("z"))
      .collect()(0)
    assert(a.getSeq[Long](0) === Seq(3L, 2L))       // overlapping runs
    assert(a.getSeq[Long](1) === Seq(3L, 2L, 2L))   // nested + staggered
    assert(a.getSeq[Long](2) === Seq(2L, 2L, 2L, 1L))
    // full replay at sf0.001: naive scan per (doc, term)
    val rows = Round109Queries.t61_dictionary_scan(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def naive(text: String, term: String): Long =
      (0 to text.length - term.length)
        .count(i => text.regionMatches(i, term, 0, term.length)).toLong
    rows.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val counts = Round109Queries.ScanTerms.map(tm => tm -> naive(text, tm))
      assert(r.getAs[Long]("n_matches") === counts.map(_._2).sum)
      assert(r.getAs[Long]("n_terms_hit") === counts.count(_._2 > 0).toLong)
      val top = counts.minBy { case (tm, c) => (-c, tm) }._1
      assert(r.getAs[String]("top_term") === top)
    }
  }
}
