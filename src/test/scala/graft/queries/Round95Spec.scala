package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-95 operators, pinned at sf0.001. */
class Round95Spec extends SparkSpec {

  test("q137: the native DP matches a from-scratch driver replay") {
    val got = Round95Queries.q137_interval_scheduling(spark, sf).collect()
      .map(r => r.getAs[Long]("c") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("best_w"))).toMap
    val ords = graft.Tables.load(spark, sf, "orders")
      .filter(col("o_custkey") % 8 === 1)
    val iv = ords.select(col("o_custkey"), col("o_orderkey"),
        unix_micros(graft.Tables.tsMicros(ords, "o_orderdate")).as("st"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("w"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(2) + (r.getLong(1) % 30 + 1) * 86400000000L,
        r.getLong(3)))
    assert(got.nonEmpty)
    iv.groupBy(_._1).foreach { case (c, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._3, r._2)) // (end, start, ok)
      val ends = sorted.map(_._4)
      val dp = new Array[Long](sorted.length + 1)
      for (i <- sorted.indices) {
        var lo = 0; var hi = i
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (ends(mid) <= sorted(i)._3) lo = mid + 1 else hi = mid
        }
        dp(i + 1) = math.max(dp(i), sorted(i)._5 + dp(lo))
      }
      assert(got(c) === ((sorted.length.toLong, dp(sorted.length))),
        s"customer $c")
      // DP bounds: at least the best single interval, at most the total
      assert(dp(sorted.length) >= rows.map(_._5).max)
      assert(dp(sorted.length) <= rows.map(_._5).sum)
    }
  }

  test("m31: SAD search matches a driver replay for doc 0") {
    val rows = Round95Queries.m31_block_motion(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("best_dx").abs <= 1)
      assert(r.getAs[Long]("best_dy").abs <= 1)
      assert(r.getAs[Long]("best_sad") >= 0)
      assert(r.getAs[Long]("n_valid") >= 8 && r.getAs[Long]("n_valid") <= 16)
    }
    val text = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") === 0).select(col("text"))
      .collect().head.getString(0)
    val cps = text.codePoints().toArray
    def f0(i: Int) = cps(i % cps.length) % 256
    def f1(i: Int) = cps((i + 1) % cps.length) % 256
    for (blk <- 0 until 4) {
      val bx = (blk % 2) * 4; val by = (blk / 2) * 4
      var best = (Long.MaxValue, 2L, 2L, 0L)
      for (dy <- -1 to 1; dx <- -1 to 1) {
        var sad = 0L; var nv = 0L
        for (i <- 0 until 16) {
          val x = bx + i % 4; val y = by + i / 4
          if (x + dx >= 0 && x + dx <= 7 && y + dy >= 0 && y + dy <= 7) {
            sad += math.abs(f1(y * 8 + x) - f0((y + dy) * 8 + x + dx))
            nv += 1
          }
        }
        val better = sad < best._1 ||
          (sad == best._1 && (dy < best._2 ||
            (dy == best._2 && dx < best._3)))
        if (better) best = (sad, dy, dx, nv)
      }
      val got = rows.find(r => r.getAs[Long]("doc_id") == 0L &&
        r.getAs[Long]("blk") == blk.toLong).get
      assert(got.getAs[Long]("best_sad") === best._1, s"block $blk")
      assert(got.getAs[Long]("best_dy") === best._2)
      assert(got.getAs[Long]("best_dx") === best._3)
      assert(got.getAs[Long]("n_valid") === best._4)
    }
  }

  test("e32: the streaming keyness table equals the batch t52 answer") {
    val stream = Round95Queries.e32_stream_keyness(spark, sf).collect()
    val batch = Round94Queries.t52_keyness_g2(spark, sf).collect()
    assert(stream.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }
}
