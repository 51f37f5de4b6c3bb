package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("bucketized interval join equals naive non-equi join") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == start: contained
      (2L, ts("2024-01-03 12:00:00")), // interior, crosses bucket edge cases
      (3L, ts("2024-01-08 00:00:00")), // == end: excluded
      (4L, ts("2024-01-07 23:59:59")), // last second: contained
      (5L, ts("2023-12-31 23:59:59")), // before start
      (6L, ts("2024-02-15 06:30:00"))  // inside second interval
    ).toDF("pid", "pt")
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-08 00:00:00")),
      (20L, ts("2024-02-10 00:00:00"), ts("2024-02-20 00:00:00")),
      (30L, ts("2024-01-05 00:00:00"), ts("2024-01-06 00:00:00"))
    ).toDF("iid", "s", "e")

    val naive = points.join(intervals,
        col("pt") >= col("s") && col("pt") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketized = RangeJoin.pointInInterval(
        points, intervals, "pt", "s", "e", bucketWidthSec = 86400L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(bucketized == naive)
    assert(bucketized == Set((1L, 10L), (2L, 10L), (4L, 10L), (6L, 20L)))
  }

  test("each match appears exactly once even when intervals span many buckets") {
    val points = Seq((1L, ts("2024-01-15 00:00:00"))).toDF("pid", "pt")
    // 30-day interval over 1-day buckets: explodes to ~31 bucket rows, but
    // the point lives in exactly one bucket, so exactly one joined row
    val intervals = Seq((10L, ts("2024-01-01 00:00:00"),
      ts("2024-01-31 00:00:00"))).toDF("iid", "s", "e")
    val rows = RangeJoin.pointInInterval(
      points, intervals, "pt", "s", "e", bucketWidthSec = 86400L).collect()
    assert(rows.length == 1)
  }
}
