package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins q130's orientation kernel: [[NativeExprs.sortedCountLE]] must
  * equal the naive "count of array elements ≤ x" on sorted arrays —
  * including empty arrays, probes below/above the range, duplicate
  * values, and exact-hit boundaries — in both interpreted eval and
  * whole-stage codegen. */
class SortedCountLESpec extends SparkSpec {

  private def naive(arr: Seq[Long], x: Long): Long = arr.count(_ <= x).toLong

  test("binary search equals linear count on randomized sorted arrays") {
    val rnd = new scala.util.Random(14)
    val cases = (0 until 200).map { i =>
      val n = rnd.nextInt(40)
      // duplicates on purpose: values drawn from a small range
      val arr = Seq.fill(n)(rnd.nextInt(25).toLong - 5L).sorted
      val x = rnd.nextInt(40).toLong - 10L
      (i.toLong, arr, x)
    }
    import spark.implicits._
    val df = cases.toDF("id", "arr", "x")
      .withColumn("got", NativeExprs.sortedCountLE(col("arr"), col("x")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)))
      .toMap
    cases.foreach { case (id, arr, x) =>
      assert(df(id) === naive(arr, x), s"case $id: arr=$arr x=$x")
    }
  }

  test("boundary probes: empty, all-below, all-above, exact duplicates") {
    import spark.implicits._
    val cases = Seq(
      (1L, Seq.empty[Long], 7L, 0L),
      (2L, Seq(5L, 5L, 5L), 5L, 3L),
      (3L, Seq(5L, 5L, 5L), 4L, 0L),
      (4L, Seq(1L, 2L, 3L), 99L, 3L),
      (5L, Seq(1L, 2L, 3L), 0L, 0L),
      (6L, Seq(Long.MinValue, 0L, Long.MaxValue), 0L, 2L))
    val got = cases.map(c => (c._1, c._2, c._3)).toDF("id", "arr", "x")
      .withColumn("got", NativeExprs.sortedCountLE(col("arr"), col("x")))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    cases.foreach { case (id, _, _, want) => assert(got(id) === want) }
  }
}
