package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Hll

/** Semantic invariants of a11: the daily-artifact serving identity —
  * merging per-day registers reproduces whole-range registers for ANY
  * range, including the full month. */
class Round24QueriesSpec extends SparkSpec {
  import spark.implicits._

  test("daily register artifact merges back to whole-corpus registers") {
    val raw = graft.Tables.load(spark, sf, "events")
    val ev = raw.select(to_date(graft.Tables.tsMicros(raw)).as("day"),
      $"user_id")
    val daily = Hll.registers(ev, Seq("day"), "user_id")
    val mergedAll = daily.groupBy($"bkt").agg(max($"rmax").as("rmax"))
    val whole = Hll.registers(ev.select($"user_id", lit(1).as("g")),
      Seq("g"), "user_id").select($"bkt", $"rmax")
    assert(mergedAll.exceptAll(whole).isEmpty &&
      whole.exceptAll(mergedAll).isEmpty,
      "max-merge of daily sketches must equal the all-data registers")
  }

  test("range estimate from the artifact behaves like an HLL estimate") {
    val r = Round24Queries.a11_hll_daily_union(spark, sf).collect()(0)
    val (est, exact) = (r.getLong(0), r.getLong(3))
    assert(exact > 0, "the 7-day window must contain users")
    if (exact >= 5L * Hll.NumRegisters)
      assert(math.abs(est - exact).toDouble / exact < 0.45)
    else
      assert(est > 0 && est <= exact + 2L * Hll.NumRegisters)
  }
}
