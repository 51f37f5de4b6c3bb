package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hand fixtures for the membership/sampling/attribution batch. */
class Round17QueriesSpec extends SparkSpec {

  import spark.implicits._

  test("bloom membership: members always hit; collisions give false positives only") {
    import graft.operators.CountMin
    val fam = Seq((1L, 0L))
    val members = Seq(1L).toDF("k")
    val cells = CountMin.sketch(members, fam, w = 8)
    // probe: the member (hit), a collision 9 ≡ 1 mod 8 (false positive),
    // and a clean miss (2)
    val out = CountMin.membership(Seq(1L, 9L, 2L).toDF("k"), cells, fam, 8)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(out == Map(1L -> true, 9L -> true, 2L -> false))
  }

  test("bloom membership: a key must hit ALL rows of the family") {
    import graft.operators.CountMin
    // two rows: 9 collides with 1 on the identity row (both ≡ 1 mod 8)
    // but separates on the (5k+3) row (0 vs 8 mod 8 = 0 ... use w=16:
    // 5·1+3=8, 5·9+3=48 ≡ 0 mod 16) -> no false positive
    val fam = Seq((1L, 0L), (5L, 3L))
    val cells = CountMin.sketch(Seq(1L).toDF("k"), fam, w = 16)
    val out = CountMin.membership(Seq(1L, 9L).toDF("k"), cells, fam, 16)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(out == Map(1L -> true, 9L -> false))
  }

  test("weighted sample priority: heavier docs draw smaller priorities") {
    import graft.operators.CountMin
    val out = Seq((10L, 1L), (10L, 1000000L)).toDF("doc_id", "w")
      .select(col("w"),
        expr(s"pmod(doc_id * 1299709 + 104729, ${CountMin.P})" +
          " div greatest(w, 1)").as("priority"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // identical hash, weight 10^6 divides priority by 10^6
    assert(out(1000000L) == out(1L) / 1000000L)
  }

  test("last-touch attribution credits the latest preceding click/view") {
    val events = Seq(
      (1L, 1L, 10L, "click"), (2L, 1L, 20L, "view"),
      (3L, 1L, 30L, "purchase"),          // -> view
      (4L, 2L, 5L, "purchase"),           // -> unattributed (no touch yet)
      (5L, 2L, 6L, "error"), (6L, 2L, 7L, "click"),
      (7L, 2L, 8L, "purchase"))           // -> click (error ignored)
      .toDF("event_id", "user_id", "ts", "event_type")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = events
      .withColumn("touch",
        last(when(col("event_type").isin("click", "view"),
          col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("unattributed")).as("t"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("view" -> 1L, "unattributed" -> 1L, "click" -> 1L))
  }
}
