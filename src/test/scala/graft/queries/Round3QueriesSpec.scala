package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic invariants of the round-3 operators — properties the row-hash
  * oracle can't express (range tiling, conservation, partition laws).
  */
class Round3QueriesSpec extends SparkSpec {

  test("SCD2 ranges tile each customer's history without gaps or overlap") {
    val scd = Round3Queries.p7_scd2(spark, sf).cache()
    try {
      // exactly one current version per customer
      val multiCurrent = scd.filter(col("is_current"))
        .groupBy(col("o_custkey")).count().filter(col("count") =!= 1)
      assert(multiCurrent.isEmpty, "each customer needs exactly one current row")
      // versions are 1..k contiguous and valid_to chains to the next
      // version's valid_from (no gaps, no overlap)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("version"))
      val chained = scd.select(col("o_custkey"), col("version"),
          col("valid_from"), col("valid_to"),
          lead(col("valid_from"), 1).over(w).as("next_from"),
          lead(col("version"), 1).over(w).as("next_ver"))
      val broken = chained.filter(
        (col("next_ver").isNotNull &&
          (col("next_ver") =!= col("version") + 1 ||
            col("valid_to") =!= col("next_from"))) ||
          (col("next_ver").isNull && col("valid_to").isNotNull))
      assert(broken.isEmpty, "version chain must tile: " +
        broken.take(3).mkString(", "))
      // consecutive versions always change state (runs are maximal)
      val sameState = scd.select(col("o_custkey"), col("state"),
          lead(col("state"), 1).over(w).as("next_state"))
        .filter(col("next_state").isNotNull &&
          col("state") === col("next_state"))
      assert(sameState.isEmpty, "adjacent versions must differ in state")
    } finally scd.unpersist()
  }

  test("quarantine split conserves rows and routes every failure") {
    val q = Round3Queries.p9_quarantine(spark, sf)
    val total = q.agg(sum(col("n"))).collect()(0).getLong(0)
    val expected = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(total == expected, "every input row lands in exactly one bucket")
  }

  test("stratified sample is deterministic and a per-stratum subset") {
    val s1 = Round3Queries.q50_stratified_sample(spark, sf).collect()
    val s2 = Round3Queries.q50_stratified_sample(spark, sf).collect()
    assert(s1.sameElements(s2), "hash sampling must be re-run stable")
    val full = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    s1.foreach { r =>
      assert(r.getLong(1) < full(r.getString(0)),
        "each stratum's sample must be a strict subset")
    }
  }

  test("cross-corpus dedup partitions the batch and matches only corpus docs") {
    val res = graft.queries.ExtensionQueries
      .d9_cross_corpus_dedup(spark, sf).cache()
    try {
      val batchCount = spark.read.parquet(s"$sf/documents.parquet")
        .filter(col("doc_id") % 2 === 1).count()
      assert(res.count() == batchCount, "verdict for every batch doc")
      // dup_of always points into the corpus (even ids), never the batch
      assert(res.filter(col("dup_of").isNotNull &&
        col("dup_of") % 2 =!= 0).isEmpty)
      // kept <=> no dup found
      assert(res.filter(col("kept") === col("dup_of").isNotNull).isEmpty)
    } finally res.unpersist()
  }

  test("batched scoring is independent of batch size and partitioning") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val base = Multimodal.attachFakePayload(docs, "text")
    def scores(batch: Int, parts: Int): Map[Long, Double] =
      Multimodal.scoreBatchedStub(base.repartition(parts), batch)
        .select(col("doc_id"), col("score"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = scores(32, 4)
    assert(ref == scores(1, 4), "batch size must not change results")
    assert(ref == scores(7, 1), "partitioning must not change results")
    assert(ref.values.forall(v => v >= 0.0 && v < 1.0))
  }

  test("resize plan fits the max edge, keeps aspect, never upscales") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planned = Multimodal.resizePlan(
      Multimodal.attachFakePayload(docs, "text"), maxEdgePx = 512)
    val bad = planned.filter(
      greatest(col("resize.out_w"), col("resize.out_h")) > 512 ||
        col("resize.scale") > 1.0 ||
        col("resize.out_w") > col("media.width_px") ||
        col("resize.out_h") > col("media.height_px"))
    assert(bad.isEmpty)
    // aspect preserved up to rounding: out edges are w*scale, h*scale
    // rounded to the nearest pixel (extreme fake aspect ratios make a
    // ratio-based check meaningless at 7-px edges)
    val drift = planned.filter(
      abs(col("resize.out_w") -
        col("media.width_px") * col("resize.scale")) > lit(0.51) ||
        abs(col("resize.out_h") -
          col("media.height_px") * col("resize.scale")) > lit(0.51))
    assert(drift.isEmpty)
  }

  test("tf-idf ranks at most 3 terms per doc with no score inversions") {
    val r = Round3Queries.t7_tfidf(spark, sf).cache()
    try {
      assert(r.groupBy(col("doc_id")).count()
        .filter(col("count") > 3).isEmpty)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("rk"))
      val inverted = r.select(col("doc_id"), col("rk"), col("tfidf"),
          lead(col("tfidf"), 1).over(w).as("next"))
        .filter(col("next").isNotNull && col("next") > col("tfidf"))
      assert(inverted.isEmpty, "rank order must be non-increasing in score")
    } finally r.unpersist()
  }
}
