package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-86 operators, pinned at sf0.001. */
class Round86Spec extends SparkSpec {

  test("d39: classic Soundex anchors incl. the H/W-transparency rule") {
    // the corpus vocab never puts two same-code letters across an H/W
    // (Tymczak) or on the retained first letter (Pfister), so pin the
    // published NARA anchors through the exact production expression
    import spark.implicits._
    val docs = Seq((1L, "tymczak robert pfister whit a jackson"))
      .toDF("doc_id", "text")
    val out = graft.queries.Round86Queries.d39_soundex_blocking(spark, sf)
    assert(out.columns.toSeq ===
      Seq("sdx_key", "n_tokens", "total_occ", "total_df", "tok_min",
        "tok_max"))
    val keyed = docs.select(explode(split(trim(col("text")), "\\s+"))
        .as("w"))
      .withColumn("up", regexp_replace(upper(col("w")), "[^A-Z]", ""))
      .withColumn("codes", expr(
        """translate(concat(substring(up, 1, 1),
          | translate(substring(up, 2, length(up)), 'HW', '')),
          | 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
          | '01230120022455012623010202')""".stripMargin))
      .withColumn("sdx_key", expr(
        """rpad(concat(substring(up, 1, 1), substring(
          |  array_join(filter(transform(sequence(1, length(codes)),
          |    i -> CASE WHEN i >= 2
          |              AND substring(codes, i, 1) BETWEEN '1' AND '6'
          |              AND substring(codes, i, 1)
          |                  != substring(codes, i - 1, 1)
          |         THEN substring(codes, i, 1) END),
          |    x -> x IS NOT NULL), ''), 1, 3)), 4, '0')""".stripMargin))
      .select(col("w"), col("sdx_key")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(keyed("tymczak") === "T522") // CZ collapse, vowel separation
    assert(keyed("robert") === "R163")
    assert(keyed("pfister") === "P236") // P/F same code, F dropped
    assert(keyed("whit") === "W300")    // leading W retained, H dropped
    assert(keyed("a") === "A000")       // no coded digits -> zero pad
    assert(keyed("jackson") === "J250") // CKS run collapses to one 2
  }

  test("d40: the planted-match pattern scores strictly highest") {
    val rows = graft.queries.Round86Queries.d40_fellegi_sunter(spark, sf)
      .collect()
    val matchRows = rows.filter(_.getAs[Int]("is_match") === 1)
    assert(matchRows.nonEmpty, "planted variants must surface")
    // every planted pair agrees on all three fields by construction
    matchRows.foreach { r =>
      assert(r.getAs[Int]("name_a") === 1)
      assert(r.getAs[Int]("seg_a") === 1)
      assert(r.getAs[Int]("bal_a") === 1)
    }
    val best = rows.maxBy(_.getAs[Double]("score"))
    assert(best.getAs[Int]("name_a") === 1 &&
      best.getAs[Int]("seg_a") === 1 && best.getAs[Int]("bal_a") === 1,
      "full agreement must be the highest-weight pattern")
    // monotone: every extra agreement on the same other fields never
    // lowers the score (log-likelihood weights are per-field additive)
    val byPat = rows.map(r => (r.getAs[Int]("name_a"), r.getAs[Int]("seg_a"),
      r.getAs[Int]("bal_a")) -> r.getAs[Double]("score")).toMap
    for {
      ((n, sg, b), sc) <- byPat
      if n == 0; up <- byPat.get((1, sg, b))
    } assert(up > sc, "name agreement must raise the weight")
  }

  test("q127: cell blocking finds exactly the brute-force pair set") {
    val blocked = graft.queries.Round86Queries
      .q127_spatial_cell_join(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cp = graft.Tables.load(spark, sf, "customer")
      .selectExpr("c_custkey AS c", "(c_custkey * 7919) % 1000000 AS x",
        "(c_custkey * 104729) % 1000000 AS y")
    val sp = graft.Tables.load(spark, sf, "supplier")
      .selectExpr("s_suppkey AS s", "(s_suppkey * 60013) % 1000000 AS sx",
        "(s_suppkey * 122777) % 1000000 AS sy")
    val brute = cp.crossJoin(sp)
      .filter(expr("(x-sx)*(x-sx) + (y-sy)*(y-sy) <= 25000000"))
      .selectExpr("c", "s", "(x-sx)*(x-sx) + (y-sy)*(y-sy) AS d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked === brute)
    assert(blocked.nonEmpty, "sf0.001 plants at least the (0,0) pair")
  }
}
