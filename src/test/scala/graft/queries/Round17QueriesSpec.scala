package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hand fixtures for the membership/sampling/attribution batch. */
class Round17QueriesSpec extends SparkSpec {

  import spark.implicits._

  // test-side mirror of CountMin.mix61 / bucket (mulmod chain)
  private def bucketOf(k: Long, a: Long, b: Long, w: Int): Long = {
    import graft.functions.RollingMinHash.{mulmod, M}
    val h1 = (mulmod(k, a) + b) % M
    ((mulmod(mulmod(h1, h1), 179424673L) + 15485867L) % M) % w
  }

  test("bloom membership: members always hit; collisions give false positives only") {
    import graft.operators.CountMin
    val fam = Seq((1299709L, 104729L))
    val members = Seq(1L).toDF("k")
    val cells = CountMin.sketch(members, fam, w = 8)
    val b1 = bucketOf(1L, 1299709L, 104729L, 8)
    // search a collider (false positive) and a clean miss
    val fp = (2L to 5000L).find(k =>
      bucketOf(k, 1299709L, 104729L, 8) == b1).get
    val miss = (2L to 5000L).find(k =>
      bucketOf(k, 1299709L, 104729L, 8) != b1).get
    val out = CountMin.membership(Seq(1L, fp, miss).toDF("k"), cells, fam, 8)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(out == Map(1L -> true, fp -> true, miss -> false))
  }

  test("bloom membership: a key must hit ALL rows of the family") {
    import graft.operators.CountMin
    // a key colliding on row 1 but not row 2 must NOT report membership
    val fam = Seq((1299709L, 104729L), (15485863L, 1999L))
    val cells = CountMin.sketch(Seq(1L).toDF("k"), fam, w = 16)
    val partial = (2L to 50000L).find(k =>
      bucketOf(k, 1299709L, 104729L, 16) ==
        bucketOf(1L, 1299709L, 104729L, 16) &&
      bucketOf(k, 15485863L, 1999L, 16) !=
        bucketOf(1L, 15485863L, 1999L, 16)).get
    val out = CountMin.membership(Seq(1L, partial).toDF("k"), cells, fam, 16)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(out == Map(1L -> true, partial -> false))
  }

  test("weighted sample priority: heavier docs draw smaller priorities") {
    import graft.operators.CountMin
    val out = Seq((10L, 1L), (10L, 1000000L)).toDF("doc_id", "w")
      .select(col("w"),
        CountMin.mix61(col("doc_id"), 1299709L, 104729L).as("mh"))
      .select(col("w"), expr("mh div greatest(w, 1)").as("priority"))
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
