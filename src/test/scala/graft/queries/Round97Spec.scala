package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-97 operators, pinned at sf0.001. */
class Round97Spec extends SparkSpec {

  test("q139: the windowed skyline equals the brute-force dominance set") {
    val got = Round97Queries.q139_skyline(spark, sf).collect()
      .map(r => (r.getAs[Long]("c"), r.getAs[Long]("n_orders"),
        r.getAs[Long]("avg_cents"))).toSet
    val pts = graft.Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"),
        expr("""CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
          | AS BIGINT) div COUNT(*)""".stripMargin).as("a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = pts.filter { p =>
      !pts.exists(q => q != p &&
        q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3))
    }.toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("m32: channel masses partition the raster mass") {
    val rows = Round97Queries.m32_bayer_binning(spark, sf).collect()
    val texts = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(50).foreach { r =>
      val cps = texts(r.getAs[Long]("doc_id")).codePoints().toArray
      def v(i: Int) = (cps(i % cps.length) % 256).toLong
      var rs = 0L; var gs = 0L; var bs = 0L
      for (cy <- 0 until 4; cx <- 0 until 4) {
        rs += v(2 * cy * 8 + 2 * cx)
        gs += (v(2 * cy * 8 + 2 * cx + 1) + v((2 * cy + 1) * 8 + 2 * cx)) / 2
        bs += v((2 * cy + 1) * 8 + 2 * cx + 1)
      }
      assert(r.getAs[Long]("r_sum") === rs)
      assert(r.getAs[Long]("g_sum") === gs)
      assert(r.getAs[Long]("b_sum") === bs)
    }
  }

  test("t54: removing a rule never shrinks the kept set") {
    val r = Round97Queries.t54_gate_ablation(spark, sf).collect().head
    val all = r.getAs[Long]("kept_all")
    assert(all > 0)
    Seq("kept_no_len", "kept_no_lang", "kept_no_tokens", "kept_no_density")
      .foreach { c =>
        assert(r.getAs[Long](c) >= all, s"$c must dominate kept_all")
        assert(r.getAs[Long](c) <= r.getAs[Long]("n_docs"))
      }
    // the language rule genuinely bites on this corpus
    assert(r.getAs[Long]("kept_no_lang") > all)
  }
}
