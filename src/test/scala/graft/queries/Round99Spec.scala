package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-99 operators, pinned at sf0.001. */
class Round99Spec extends SparkSpec {

  test("q142: snake sharding balances within 5% and conserves mass") {
    val rows = Round99Queries.q142_balanced_sharding(spark, sf).collect()
    assert(rows.length === 8)
    val total = graft.Tables.load(spark, sf, "documents")
      .agg(sum(col("n_chars"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("mass")).sum === total)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("balance_ratio") - 1.0) < 0.05,
        s"shard ${r.getAs[Long]("shard")} imbalanced")
    }
  }

  test("q143: the banded selection finds the exact median") {
    val r = Round99Queries.q143_two_pass_median(spark, sf).collect().head
    assert(r.getAs[Long]("agree") === 1L)
    // the band is a genuine narrowing
    assert(r.getAs[Long]("band_size") < r.getAs[Long]("n_total"))
    // driver-side reference median
    val xs = graft.Tables.load(spark, sf, "orders")
      .select(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("x"),
        col("o_orderkey"))
      .collect().map(row => (row.getLong(0), row.getLong(1)))
      .sortBy(identity)
    val k = (xs.length + 1) / 2
    assert(r.getAs[Long]("direct_median") === xs(k - 1)._1)
    assert(r.getAs[Long]("band_median") === xs(k - 1)._1)
  }

  test("t55: coverage is monotone and the full vocab covers everything") {
    val rows = Round99Queries.t55_vocab_coverage(spark, sf).collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq ===
      Seq(1L, 2L, 4L, 8L, 16L, 32L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("covered") <= b.getAs[Long]("covered"))
      case _ =>
    }
    // this corpus's vocabulary fits in 32 types -> full coverage
    assert(rows.last.getAs[Double]("coverage") === 1.0)
    assert(rows.head.getAs[Double]("coverage") > 0.0)
  }
}
