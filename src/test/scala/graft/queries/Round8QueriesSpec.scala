package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Eighth-batch invariants beyond the DuckDB gate: persisted-artifact
  * paths must coincide with their transient twins, the winnow cap can
  * only shrink evidence, and directed PageRank must conserve rank mass —
  * the property the dangling-redistribution term exists to protect.
  */
class Round8QueriesSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("persisted IVF serves exactly the transient-index answer") {
    assert(rows(Round8Queries.s7_ann_ivf_persisted(spark, sf)) ==
      rows(ExtensionQueries.s3_ann_ivf_topk(spark, sf)),
      "same quantizer, same probes — the artifact must change cost, " +
        "not results")
  }

  test("incremental dedup against the artifact reproduces d9 exactly") {
    assert(rows(Round8Queries.d14_incremental_dedup(spark, sf)) ==
      rows(ExtensionQueries.d9_cross_corpus_dedup(spark, sf)),
      "reading persisted shingle sets must be invisible to the result")
  }

  test("LSH-index and streaming ingest paths also reproduce d9 exactly") {
    val d9 = rows(ExtensionQueries.d9_cross_corpus_dedup(spark, sf))
    assert(rows(Round8Queries.d15_lsh_incremental(spark, sf)) == d9,
      "band candidates + exact verify must coincide with the " +
        "exhaustive answer")
    assert(rows(Round8Queries.e14_stream_ingest_dedup(spark, sf)) == d9,
      "the streaming ingest join must compute exactly the batch answer")
  }

  test("the winnow cap only removes evidence: capped pairs ⊆ uncapped, shared ≤") {
    val capped = Round8Queries.d13b_winnow_capped(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val uncapped = Round7Queries.d13_winnow_overlap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped.keySet.subsetOf(uncapped.keySet),
      "dropping postings can never create a pair")
    capped.foreach { case (pair, shared) =>
      assert(shared <= uncapped(pair),
        s"$pair: capped shared $shared > uncapped ${uncapped(pair)}")
    }
  }

  test("directed pagerank conserves rank mass (the dangling term's job)") {
    val total = Round8Queries.q75_pagerank_directed(spark, sf)
      .agg(sum(col("pagerank"))).head().getDouble(0)
    // 12-decimal per-node rounding over ~200 nodes: mass stays 1 to ~1e-6
    assert(math.abs(total - 1.0) < 1e-4,
      s"rank mass must neither leak through sinks nor inflate (got $total)")
    // and it is genuinely different math from the undirected twin
    assert(rows(Round8Queries.q75_pagerank_directed(spark, sf)) !=
      rows(Round6Queries.q74_pagerank(spark, sf)))
  }
}
