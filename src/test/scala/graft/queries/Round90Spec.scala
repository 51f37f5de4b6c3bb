package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-90 operators, pinned at sf0.001. */
class Round90Spec extends SparkSpec {

  test("t51: segment accounting is consistent and similarity is a cosine") {
    val rows = Round90Queries.t51_texttiling(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_segments") ===
        r.getAs[Long]("n_boundaries") + 1)
      assert(r.getAs[Long]("n_boundaries") <= r.getAs[Long]("n_gaps"))
      val mc = r.getAs[Double]("mean_cos")
      assert(mc >= 0.0 && mc <= 1.0)
    }
    // the threshold discriminates on real data: both outcomes occur
    assert(rows.exists(r => r.getAs[Long]("n_boundaries") > 0))
    assert(rows.exists(r =>
      r.getAs[Long]("n_boundaries") < r.getAs[Long]("n_gaps")))
  }

  test("q131: census matches a brute-force recount for one user") {
    val rows = Round90Queries.q131_temporal_motifs(spark, sf).collect()
    assert(rows.nonEmpty)
    val types = Set("click", "view", "purchase", "signup", "error")
    rows.foreach { r =>
      assert(types(r.getAs[String]("t1")) && types(r.getAs[String]("t2")) &&
        types(r.getAs[String]("t3")))
      assert(r.getAs[Long]("n") > 0)
    }
    // brute-force the full census driver-side at sf0.001 (1000 events)
    val ev = graft.Tables.load(spark, sf, "events")
    val es = ev.select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(graft.Tables.tsMicros(ev)).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val win = 6L * 3600L * 1000000L
    val byUser = es.groupBy(_._1)
    var expected = Map.empty[(String, String, String), Long]
      .withDefaultValue(0L)
    byUser.values.foreach { us =>
      val sorted = us.sortBy(e => (e._4, e._2))
      for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
        if sorted(j)._4 - sorted(i)._4 <= win
        k <- (j + 1) until sorted.length
        if sorted(k)._4 - sorted(i)._4 <= win
      } {
        val key = (sorted(i)._3, sorted(j)._3, sorted(k)._3)
        expected += key -> (expected(key) + 1L)
      }
    }
    val got = rows.map(r => (r.getAs[String]("t1"), r.getAs[String]("t2"),
      r.getAs[String]("t3")) -> r.getAs[Long]("n")).toMap
    assert(got === expected)
  }

  test("e31: the streaming monitor lands exactly the batch t49 answer") {
    val stream = Round90Queries.e31_stream_calibration(spark, sf).collect()
    val batch = Round88Queries.t49_calibration(spark, sf).collect()
    assert(stream.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }
}
