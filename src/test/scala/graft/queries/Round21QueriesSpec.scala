package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{CountMin, HistQuantile}

/** Semantic invariants of the twenty-first batch: dyadic cover algebra,
  * sketch range-bound flags, streaming histogram parity, and the
  * attribution arithmetic on a synthetic fixture that exercises every
  * position branch (the TPC-H-ish fixture's purchase windows are mostly
  * single-click, so first/middle/last splitting needs planted windows).
  */
class Round21QueriesSpec extends SparkSpec {
  import spark.implicits._

  test("dyadic cover partitions any range exactly") {
    val ranges = Seq((0L, 1L), (5L, 6L), (9131L, 9496L), (1L, 1024L),
      (1023L, 1025L), (0L, 4096L), (7L, 4097L))
    ranges.foreach { case (lo, hi) =>
      val nodes = CountMin.dyadicCover(lo, hi)
      // each node is an aligned dyadic block; together, in order, they
      // tile [lo, hi) with no gap or overlap
      var x = lo
      nodes.foreach { case (l, idx) =>
        assert(idx % 1 == 0 && (idx << l) == x,
          s"[$lo,$hi): node ($l,$idx) must start at $x")
        x += (1L << l)
      }
      assert(x == hi, s"[$lo,$hi): cover ends at $x")
      assert(nodes.size <= 2 * (64 - java.lang.Long.numberOfLeadingZeros(
        hi - lo)) + 2, s"[$lo,$hi): ${nodes.size} nodes is not logarithmic")
    }
  }

  test("range sketch honors both structural flags on the fixture") {
    val r = Round21Queries.a10_cms_range(spark, sf).collect()(0)
    assert(r.getBoolean(2), "CM range estimates can never undercount")
    assert(r.getBoolean(3), "estimate must sit inside the error envelope")
    assert(r.getLong(1) > 0, "1995 must have shipments in the fixture")
  }

  test("streamed histogram cells equal the batch histogram") {
    val streamed = Round21Queries.e20_stream_hist_ingest(spark, sf)
    val cents = graft.Tables.load(spark, sf, "lineitem")
      .select(round($"l_extendedprice" * 100).cast("long").as("c"))
    val batch = HistQuantile.histogram(cents, "c", 100000L)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("U-shaped attribution conserves 10000 bp per purchase, every branch") {
    // planted windows: n = 1, 2, 3, 5 clicks inside 30 min, plus one
    // click 2 h out (no attribution row at all)
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def ts(minBefore: Int) = new java.sql.Timestamp(
      base.getTime - minBefore * 60000L)
    val rows = Seq(
      (100L, base, 1L, "purchase"), (101L, ts(5), 1L, "click"),
      (200L, base, 2L, "purchase"), (201L, ts(10), 2L, "click"),
      (202L, ts(5), 2L, "click"),
      (300L, base, 3L, "purchase"), (301L, ts(15), 3L, "click"),
      (302L, ts(10), 3L, "click"), (303L, ts(5), 3L, "click"),
      (400L, base, 4L, "purchase"), (401L, ts(25), 4L, "click"),
      (402L, ts(20), 4L, "click"), (403L, ts(15), 4L, "click"),
      (404L, ts(10), 4L, "click"), (405L, ts(5), 4L, "click"),
      (500L, base, 5L, "purchase"), (501L, ts(120), 5L, "click"))
    val dir = tmpDir("q83_fixture").toString
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Round21Queries.q83_position_attribution(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // n=1 → first 10000; n=2 → first 5000, last 5000; n=3 → 4000/2000/
    // 4000; n=5 → each = 666, leftover 2 → first 4002, 3×666, last 4000
    assert(out("first") == (4L, 10000L + 5000L + 4000L + 4002L))
    assert(out("last") == (3L, 5000L + 4000L + 4000L))
    assert(out("middle") == (4L, 2000L + 3 * 666L))
    assert(out.values.map(_._2).sum == 40000L,
      "4 attributed purchases × 10000 bp, conserved exactly")
  }
}
