package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-93 operators, pinned at sf0.001. */
class Round93Spec extends SparkSpec {

  test("q134: regex census anchors on hand-checked strings") {
    // pin the pattern semantics on literal strings through the same
    // Spark regex calls the query uses
    import spark.implicits._
    val probe = Seq("vcp", "vccep", "vpvp", "ccc", "ccxcc", "evcc")
      .toDF("str")
      .selectExpr("str",
        "size(regexp_extract_all(str, 'v[ce]*p', 0)) AS vp",
        "size(regexp_extract_all(str, 'cc+', 0)) AS bursts",
        "CASE WHEN str RLIKE '^v' THEN 1 ELSE 0 END AS open_v")
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(probe("vcp") === ((1, 0, 1)))
    assert(probe("vccep") === ((1, 1, 1)))   // greedy run counted once
    assert(probe("vpvp") === ((2, 0, 1)))    // non-overlapping scan
    assert(probe("ccc") === ((0, 1, 0)))     // one maximal burst
    assert(probe("ccxcc") === ((0, 2, 0)))
    assert(probe("evcc") === ((0, 1, 0)))
    val row = Round93Queries.q134_event_regex(spark, sf).collect().head
    assert(row.getAs[Long]("total_events") ===
      graft.Tables.load(spark, sf, "events").count())
  }

  test("q135: decisions partition the users and crossings are genuine") {
    val rows = Round93Queries.q135_sprt(spark, sf).collect()
    val nUsers = rows.map(_.getAs[Long]("n_users")).sum
    val ev = graft.Tables.load(spark, sf, "events")
    val expected = ev.filter(col("event_type").isin("purchase", "view"))
      .select(col("user_id")).distinct().count()
    assert(nUsers === expected)
    rows.foreach { r =>
      assert(Set("accept_h1", "accept_h0", "continue")(
        r.getAs[String]("decision")))
      assert(r.getAs[Long]("total_obs") > 0)
    }
    // continue-users' final LLR stays strictly inside the bounds only if
    // they never crossed; crossing users may end anywhere — so check the
    // continue bucket, if present, averages inside (-ln4, ln4) scaled
    rows.find(_.getAs[String]("decision") == "continue").foreach { r =>
      val avg = r.getAs[Long]("sum_final_llr").toDouble /
        r.getAs[Long]("n_users")
      assert(math.abs(avg) < 1386294.0)
    }
  }

  test("m30: every box agrees and a corner case is hand-verified") {
    val rows = Round93Queries.m30_integral_image(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("agree"),
        s"SAT corner formula disagreed for ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("sat_sum") === r.getAs[Long]("direct_sum"))
    }
    // box 0 of doc 0 is the top-left 4x4: recompute from the closed form
    val text = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") === 0).select(col("text"))
      .collect().head.getString(0)
    val cps = text.codePoints().toArray
    val expected = (for (y <- 0 until 4; x <- 0 until 4)
      yield (cps((y * 8 + x) % cps.length) % 256).toLong).sum
    val got = rows.find(r => r.getAs[Long]("doc_id") == 0L &&
      r.getAs[Long]("box") == 0L).get
    assert(got.getAs[Long]("sat_sum") === expected)
  }
}
