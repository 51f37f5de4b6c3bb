package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic invariants of q84: the conversion population is exactly the
  * users with a purchase at/after their first view, and the sketch
  * brackets behave (monotone in q, well-formed bounds). */
class Round23QueriesSpec extends SparkSpec {
  import spark.implicits._

  test("convert-time quantiles: population count and bracket sanity") {
    val rows = Round23Queries.q84_convert_time_quantiles(spark, sf)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(50L, 90L))
    val raw = graft.Tables.load(spark, sf, "events")
    val e = raw.withColumn("ts_us", graft.Tables.tsMicros(raw))
      .select($"user_id", $"event_type", unix_micros($"ts_us").as("us"))
    val fv = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("v_us"))
    val nConv = e.filter($"event_type" === "purchase")
      .join(fv, "user_id").filter($"us" >= $"v_us")
      .select($"user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getLong(4) == nConv, "n = converting users")
      assert(r.getLong(2) >= 0 && r.getLong(3) >= r.getLong(2),
        "bracket must be well-formed")
      assert(r.getLong(1) >= 1 && r.getLong(1) <= nConv)
    }
    assert(rows(0).getLong(2) <= rows(1).getLong(2),
      "p50 bracket cannot start above p90's")
  }
}
