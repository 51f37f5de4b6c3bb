package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand fixtures for the round-13 batch: PQ encode + ADC arithmetic and
  * the alternating HITS passes. */
class Round13QueriesSpec extends SparkSpec {

  import spark.implicits._

  test("s9: codes pick the nearest subspace centroid; ADC sums the tables") {
    // 4-dim vectors, m=2 subspaces of 2 dims, codebook = ids 0,1.
    //   id0 [0,0|0,0] (seed c0), id1 [1,1|2,2] (seed c1),
    //   id2 [.9,.9|.1,.1] -> codes (c1, c0), id3 [0,0|2,2] -> (c0, c1)
    // query id0 tables: sub0 {c0:0, c1:2e12}, sub1 {c0:0, c1:8e12}
    // ADC: id2 = 2e12, id3 = 8e12, id1 = 1e13
    val emb = Seq(
      (0L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(1.0f, 1.0f, 2.0f, 2.0f)),
      (2L, Seq(0.9f, 0.9f, 0.1f, 0.1f)),
      (3L, Seq(0.0f, 0.0f, 2.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = graft.operators.Pq
      .adcTopK(emb, "vec_id", "embedding", m = 2, sub = 2, kCent = 2,
        queryMod = 4, topK = 3)
      .orderBy(col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2000000000000L, 1L),
      (0L, 3L, 8000000000000L, 2L),
      (0L, 1L, 10000000000000L, 3L)))
  }

  test("q77: two HITS passes on a hand triangle") {
    // 1->2, 1->3, 2->3:
    //   a1 = indegree {2:1, 3:2}; h1 {1: 3, 2: 2}
    //   a2 {2: 3, 3: 5};          h2 {1: 8, 2: 5}
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    val out = graft.operators.Graph.hits(e, "u", "v", iters = 2)
      .orderBy(col("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 8L, 0L), (2L, 5L, 3L), (3L, 0L, 5L)))
  }

  test("q77: a pure hub accumulates all authority mass on a star") {
    // center 0 -> leaves 1..3: iter1 gives each leaf authority 1 and
    // the center hub 3; iter2 gives each leaf authority 3 (the center's
    // hub) and the center hub 3+3+3 = 9. Leaves never act as hubs, the
    // center never as an authority.
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("u", "v")
    val m = graft.operators.Graph.hits(e, "u", "v", iters = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(m(0L) == ((9L, 0L)))
    assert(m(1L) == ((0L, 3L)) && m(2L) == ((0L, 3L)) && m(3L) == ((0L, 3L)))
  }
}
