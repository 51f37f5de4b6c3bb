package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Equivalence pins for the round-14 batch: IVFADC degrades to plain
  * ADC at full probe, the two encode formulations agree (including
  * ties), and the streaming ingest equals the batch encode. */
class Round14QueriesSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = Seq(
    (0L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Seq(1.0f, 1.0f, 2.0f, 2.0f)),
    (2L, Seq(0.9f, 0.9f, 0.1f, 0.1f)),
    (3L, Seq(0.0f, 0.0f, 2.0f, 2.0f)),
    (4L, Seq(0.5f, 0.5f, 1.0f, 1.0f))) // sub0 equidistant to c0/c1 -> c0
    .toDF("vec_id", "embedding")

  test("encodeMapped ties break to the smaller code, equal to the join encode") {
    import graft.operators.{Kmeans, Pq}
    val q = Kmeans.quantized(fixture, "vec_id", "embedding")
    val cb = Pq.codebook(q, m = 2, sub = 2, kCent = 2)
    val joinCodes = Pq.encode(q, cb, m = 2, sub = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val cbLocal = cb.collect().groupBy(_.getInt(1)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getLong(0)).map(_.getSeq[Long](2).toArray).toArray
      }.toArray
    val mapped = Pq.encodeMapped(q, cbLocal, m = 2, sub = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(mapped == joinCodes)
    // the tie case: vec 4's sub0 [.5,.5] is equidistant to [0,0] and
    // [1,1] -> code 0 in both formulations
    assert(mapped.contains((4L, 0, 0L)))
  }

  test("IVFADC at full probe equals the exhaustive ADC scan") {
    import graft.operators.{Kmeans, Pq}
    import graft.functions.NativeExprs
    import org.apache.spark.sql.expressions.Window
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val q = Kmeans.quantized(emb, "vec_id", "embedding").localCheckpoint()
    val cent = Kmeans.centroids(emb, "vec_id", "embedding",
      k = 4, iters = 2).localCheckpoint()
    val cells = Kmeans.assign(q, cent).select(col("id"), col("c").as("cell"))
    val queries = q.where(col("id") % 100 === 0)
    val probeW = Window.partitionBy(col("qid"))
      .orderBy(col("d2"), col("cell"))
    val probes = queries.crossJoin(broadcast(cent))
      .select(col("id").as("qid"), col("c").as("cell"),
        NativeExprs.l2sqLong(col("v"), col("cv")).as("d2"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= 4) // nprobe = k: nothing pruned
      .select(col("qid"), col("cell"))
    val cb = Pq.codebook(q, m = 4, sub = 16, kCent = 4).localCheckpoint()
    val codes = Pq.encode(q, cb, m = 4, sub = 16)
    val dtab = Pq.distTables(queries, cb, m = 4, sub = 16)
    val cand = cells.join(broadcast(probes), "cell")
      .select(col("qid"), col("id"))
    val full = Pq.ivfadcRank(codes, cand, dtab, topK = 5)
      .orderBy(col("query_id"), col("rk")).collect().toSeq
    val plain = Pq.adcTopK(emb, "vec_id", "embedding", m = 4, sub = 16,
        kCent = 4, queryMod = 100, topK = 5)
      .orderBy(col("query_id"), col("rk")).collect().toSeq
    assert(full == plain)
  }

  test("k-means and PQ results are partition-invariant") {
    // the 100 TB contract: any repartitioning computes the same answer
    import graft.operators.{Kmeans, Pq}
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val base = Kmeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 2)
      .orderBy(col("id")).collect().toSeq
    val skewed = Kmeans.lloyd(emb.repartition(7), "vec_id", "embedding",
        k = 4, iters = 2)
      .orderBy(col("id")).collect().toSeq
    assert(skewed == base)
    val pq = Pq.adcTopK(emb, "vec_id", "embedding", 4, 16, 4, 100, 5)
      .orderBy(col("query_id"), col("rk")).collect().toSeq
    val pqSkewed = Pq.adcTopK(emb.repartition(7), "vec_id", "embedding",
        4, 16, 4, 100, 5)
      .orderBy(col("query_id"), col("rk")).collect().toSeq
    assert(pqSkewed == pq)
  }

  test("e17: streaming ingest codes equal the batch encode of the odd half") {
    import graft.operators.{Kmeans, Pq}
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val q = Kmeans.quantized(emb, "vec_id", "embedding")
    val batch = Pq.encode(q.where(col("id") % 2 === 1), Pq.codebook(q, 4, 16, 4), 4, 16)
      .select(col("id").as("vec_id"), col("j"), col("c").as("code"))
      .orderBy(col("vec_id"), col("j")).collect().toSeq
    val stream = Round14Queries.e17_stream_pq_ingest(spark, sf)
      .collect().toSeq
    assert(stream == batch)
  }
}
