package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic invariants of the sixth batch — contracts the row-hash oracle
  * can't express (probability normalization, decile monotonicity, BFS
  * frontier soundness, hop-window/tumbling-window consistency, Zipf
  * shape, profile bounds).
  */
class Round6QueriesSpec extends SparkSpec {

  test("markov: outgoing probabilities normalize to 1 per from_type") {
    import spark.implicits._
    val rows = Round6Queries.q69_markov(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (ft, rs) =>
      val mass = rs.map(_.getDouble(3)).sum
      // each term is rounded to 1e-6, so the sum drifts by ≤ rows/2 ulps
      assert(math.abs(mass - 1.0) <= rs.length * 5e-7,
        s"P(·|$ft) sums to $mass")
    }
  }

  test("yoy: prev_revenue is exactly the revenue of the month 12 back") {
    val rows = Round6Queries.q71_yoy(spark, sf).collect()
    val byMon = rows.map(r => r.getDate(0).toLocalDate -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val mon = r.getDate(0).toLocalDate
      val expected = byMon.get(mon.minusMonths(12))
      val got = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(got == expected, s"$mon: prev must be the -12mo month or null")
    }
    assert(rows.exists(!_.isNullAt(3)), "later years have growth rows")
  }

  test("deciles: equal-split sizes and non-increasing spend bands") {
    val rows = Round6Queries.q72_decile(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L),
      "exactly deciles 1..10")
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, "ntile splits sizes within 1")
    // decile 1 holds the top spenders: band k's min >= band k+1's max
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi.getDouble(3) >= lo.getDouble(4),
        "decile k's min spend is never below decile k+1's max")
    }
  }

  test("bfs: source at 0, hops within budget, every hop has a witness") {
    import spark.implicits._
    val out = Round6Queries.q73_bfs_hops(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val src = out.minBy(_._1)._1
    // the source is the minimum node of the graph and only it sits at 0
    assert(out.count(_._2 == 0) == 1)
    assert(out.values.forall(d => d >= 0 && d <= 4))
    // every non-source node must have a neighbor one hop closer
    val und = graft.Tables.load(spark, sf, "lineitem")
      .filter($"l_partkey" % 10 === 0)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val adj = und.as("x").join(und.as("y"),
        $"x.ok" === $"y.ok" && $"x.pk" =!= $"y.pk")
      .select($"x.pk".as("u"), $"y.pk".as("v"))
      .distinct().as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    out.filter(_._2 > 0).foreach { case (n, d) =>
      assert(adj(n).exists(m => out.get(m).contains(d - 1)),
        s"node $n at hop $d needs a hop-${d - 1} neighbor")
    }
    assert(out.contains(src) && out(src) == 0)
  }

  test("hopping windows aggregate exactly the 4 enclosed 15-min buckets") {
    import spark.implicits._
    val sliding = Round6Queries.e13_stream_sliding(spark, sf)
      .select($"win_start", $"n").as[(java.sql.Timestamp, Long)]
      .collect().toMap
    val rawEvents = graft.Tables.load(spark, sf, "events")
    val tumbling = rawEvents
      .withColumn("ts_us", graft.Tables.tsMicros(rawEvents))
      .groupBy(window($"ts_us", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start", $"n").as[(java.sql.Timestamp, Long)]
      .collect().toMap
    sliding.foreach { case (ws, n) =>
      val parts = (0 until 4).map { i =>
        val b = java.sql.Timestamp.from(
          ws.toInstant.plusSeconds(900L * i))
        tumbling.getOrElse(b, 0L)
      }
      assert(parts.sum == n,
        s"window $ws: hop count $n != sum of 15-min buckets ${parts.sum}")
    }
    // and every event lands in exactly 4 sliding windows
    val events = graft.Tables.load(spark, sf, "events").count()
    assert(sliding.values.sum == 4 * events)
  }

  test("zipf fit has the canonical shape: negative slope, positive intercept") {
    val r = Round6Queries.t13_zipf(spark, sf).collect()(0)
    // n_types must be exactly the fixture's vocabulary, whatever its size
    val vocab = graft.Tables.load(spark, sf, "documents")
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .distinct().count()
    assert(vocab > 1, "fixture has a usable vocabulary")
    assert(r.getLong(0) == vocab, s"n_types ${r.getLong(0)} != vocab $vocab")
    assert(r.getDouble(1) < 0, "frequency falls with rank")
    assert(r.getDouble(2) > 0, "rank-1 log-frequency is positive")
  }

  test("pmi: top-20 respects the min-count gate and the rank order") {
    val rows = Round6Queries.t14_pmi(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.forall(_.getLong(1) >= 5), "bigram count gate")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(4) > b.getDouble(4) ||
        (a.getDouble(4) == b.getDouble(4) &&
          a.getString(0) < b.getString(0)),
        "rows ordered by (pmi desc, bigram)")
    }
  }

  test("mips: 5 per query, non-increasing dot, distinct candidates") {
    val rows = Round6Queries.s6_mips_topk(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q returns exactly k rows")
      assert(rs.map(_.getLong(1)).distinct.length == 5)
      rs.sortBy(_.getLong(3)).sliding(2).foreach { case Array(a, b) =>
        assert(a.getDouble(2) >= b.getDouble(2),
          "rank order follows the dot product")
      }
    }
  }

  test("profile: row/null/distinct accounting over the customer table") {
    val rows = Round6Queries.p20_profile(spark, sf).collect()
    assert(rows.length == 5, "one row per profiled column")
    val n = graft.Tables.load(spark, sf, "customer").count()
    rows.foreach { r =>
      assert(r.getLong(1) == n, "n_rows is the table cardinality")
      assert(r.getLong(2) == 0, "fixture has no nulls")
      assert(r.getLong(3) <= n && r.getLong(3) > 0)
    }
    val key = rows.find(_.getString(0) == "c_custkey").get
    assert(key.getLong(3) == n, "the key column is unique")
  }
}
