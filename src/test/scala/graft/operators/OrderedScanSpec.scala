package graft.operators

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class OrderedScanSpec extends SparkSpec {
  import spark.implicits._

  /** Reference fold: sequential clamped balance per key. */
  private def truth(rows: Seq[(Long, Long, Long)])
      : Map[Long, (Long, Long, Long, Long)] =
    rows.groupBy(_._1).map { case (k, rs) =>
      var bal, mx, clamps, steps = 0L
      rs.sortBy(_._2).foreach { case (_, _, d) =>
        val next = bal + d
        if (next < 0) { clamps += 1; bal = 0 } else bal = next
        if (bal > mx) mx = bal
        steps += 1
      }
      k -> (steps, clamps, mx, bal)
    }

  private def run(rows: Seq[(Long, Long, Long)], parts: Int)
      : Map[Long, (Long, Long, Long, Long)] =
    OrderedScan.cappedBalance(
        rows.toDF("k", "ord", "delta").repartition(parts),
        col("k"), Seq(col("ord")), col("delta"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toMap

  test("cappedBalance matches the sequential fold on random inputs") {
    val rnd = new scala.util.Random(41)
    (1 to 5).foreach { _ =>
      val rows = Seq.tabulate(300)(i =>
        (rnd.nextLong(12), i.toLong, rnd.nextLong(201) - 100))
      assert(run(rows, 7) == truth(rows))
    }
  }

  test("cappedBalance is partition-invariant") {
    val rnd = new scala.util.Random(43)
    val rows = Seq.tabulate(400)(i =>
      (rnd.nextLong(9), i.toLong, rnd.nextLong(41) - 20))
    assert(run(rows, 1) == run(rows, 17))
  }

  test("halvingEwma matches the sequential fold and is partition-invariant") {
    def ewmaTruth(rows: Seq[(String, Long, Long)])
        : Map[String, (Long, Long, Long)] =
      rows.groupBy(_._1).map { case (k, rs) =>
        var s = 0L; var mx = Long.MinValue; var first = true
        rs.sortBy(_._2).foreach { case (_, _, x) =>
          s = if (first) x else (s + x) / 2
          first = false
          if (s > mx) mx = s
        }
        k -> (rs.size.toLong, mx, s)
      }
    def run(rows: Seq[(String, Long, Long)], parts: Int) =
      OrderedScan.halvingEwma(
          rows.toDF("k", "ord", "x").repartition(parts),
          col("k"), Seq(col("ord")), col("x"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3)))
        .toMap
    val rnd = new scala.util.Random(53)
    val rows = Seq.tabulate(300)(i =>
      (s"t${rnd.nextInt(7)}", i.toLong, rnd.nextLong(1000)))
    assert(run(rows, 5) == ewmaTruth(rows))
    assert(run(rows, 1) == run(rows, 13))
    // hand case: 8, (8+0)/2=4, (4+9)/2=6 → final 6, max 8
    assert(run(Seq(("a", 1L, 8L), ("a", 2L, 0L), ("a", 3L, 9L)), 2) ==
      Map("a" -> (3L, 8L, 6L)))
  }

  test("clamp engages and is counted; all-debit key floors at zero") {
    val rows = Seq(
      (1L, 1L, 10L), (1L, 2L, -25L), (1L, 3L, 7L), // clamp once, end at 7
      (2L, 1L, -5L), (2L, 2L, -5L))                // two clamps, end 0
    assert(run(rows, 3) == Map(
      1L -> (3L, 1L, 10L, 7L),
      2L -> (2L, 2L, 0L, 0L)))
  }
}
