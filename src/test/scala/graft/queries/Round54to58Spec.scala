package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cross-checks for the rounds-54..58 operators — invariants the DuckDB
  * hash gate can't see (it proves engine agreement, not internal
  * consistency), pinned at sf0.001.
  */
class Round54to58Spec extends SparkSpec {

  test("t34: chunks tile every document — full coverage, dense ids") {
    import graft.functions.Text
    val chunks = Round54Queries.t34_chunk_windows(spark, sf)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        max(col("chunk_id")).as("max_id"),
        max(col("tok_start") + col("n_toks")).as("covered"))
    val docs = graft.Tables.load(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("n"))
    val bad = chunks.join(docs, "doc_id")
      .filter(col("covered") =!= col("n") ||
        col("max_id") =!= col("n_chunks") - 1 ||
        // starts at stride 48: last start must still be < n
        col("max_id") * 48 >= col("n"))
      .count()
    assert(bad === 0, "every token must land in a chunk, ids dense from 0")
  }

  test("t35: per-source keep census is exactly the top quartile") {
    val out = Round55Queries.t35_quality_gate_relative(spark, sf)
    val bad = out.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
      .filter(col("kept") =!= (col("n") + 3) / lit(4).cast("long"))
      .count()
    assert(bad === 0, "kept = ceil(n/4) per source")
  }

  test("q104: class census accounts for every customer") {
    val total = Round54Queries.q104_l_diversity(spark, sf)
      .agg(sum(col("n_records"))).head().getLong(0)
    val n = graft.Tables.load(spark, sf, "customer").count()
    assert(total === n)
  }

  test("s19: fused ranks are valid positions and RRF is bounded") {
    val out = Round57Queries.s19_rank_fusion(spark, sf)
    val rows = out.collect()
    assert(rows.length === 25, "5 queries x top-5")
    rows.foreach { r =>
      val rCos = r.getAs[Long]("r_cos"); val rDot = r.getAs[Long]("r_dot")
      val rrf = r.getAs[Long]("rrf_micro")
      assert(rCos >= 1 && rDot >= 1)
      assert(rrf == 1000000000L / (60 + rCos) + 1000000000L / (60 + rDot))
      assert(rrf <= 2 * (1000000000L / 61))
    }
  }

  test("q106: assortativity lands in [-1, 1] with positive variance") {
    val r = Round58Queries.q106_assortativity(spark, sf).head()
    assert(r.getAs[Long]("den4") > 0)
    val bp = r.getAs[Long]("r_bp")
    assert(bp >= -10000 && bp <= 10000, s"r_bp=$bp out of range")
  }

  test("m16: patch sums tile the raster — they add up to m5's channel total") {
    import graft.functions.ImageExprs
    val patchTotals = Round58Queries.m16_image_patches(spark, sf)
      .groupBy(col("doc_id")).agg(sum(col("p_sum")).as("patch_total"))
    val rasterTotals = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        ImageExprs.imageStats(
          ImageExprs.encodeImageFromText(col("text"), "pgm", 8, 8))
          .as("st"))
      .select(col("doc_id"), col("st.sum_c0").as("raster_total"))
    val bad = patchTotals.join(rasterTotals, "doc_id")
      .filter(col("patch_total") =!= col("raster_total")).count()
    assert(bad === 0, "16 disjoint 2x2 patches must cover all 64 samples")
  }

  test("s18: mined pairs split even/odd and margins are finite") {
    val rows = Round55Queries.s18_margin_mining(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("query_id") % 2 === 0)
      assert(r.getAs[Long]("cand_id") % 2 === 1)
      assert(!r.getAs[Double]("margin_m").isNaN)
    }
  }
}
