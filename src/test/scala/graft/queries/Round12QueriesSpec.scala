package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixtures and invariants for the round-12 batch: cluster-bounded
  * SemDeDup, the streaming NB gate's batch equivalence, epoch-shuffle
  * permutation properties, and OOV accounting. */
class Round12QueriesSpec extends SparkSpec {

  import spark.implicits._

  test("d18: pairs form only within a k-means cluster") {
    // 1-D values 1,2,10,11 -> clusters {0,1} and {2,3} (see the s8
    // spec's Lloyd trace). Every 1-D positive pair has cosine exactly
    // 1.0, so an unclustered dedup would drop ids 1,2,3; the
    // cluster-bounded one drops only the larger id of each
    // within-cluster pair: 1 (from {0,1}) and 3 (from {2,3}).
    val emb = Seq((0L, Seq(1.0f)), (1L, Seq(2.0f)),
      (2L, Seq(10.0f)), (3L, Seq(11.0f))).toDF("vec_id", "embedding")
    val clusters = graft.operators.Kmeans
      .lloyd(emb, "vec_id", "embedding", k = 2, iters = 2)
      .select(col("id").as("vec_id"), col("c").as("cluster"))
    val withC = emb.join(clusters, "vec_id")
    val a = withC.select(col("cluster"), col("vec_id").as("id_a"),
      col("embedding").as("va"))
    val b = withC.select(col("cluster"), col("vec_id").as("id_b"),
      col("embedding").as("vb"))
    val dropped = a.join(b, "cluster")
      .filter(col("id_a") < col("id_b") &&
        graft.operators.Vectors.cosine(col("va"), col("vb")) >= 0.30)
      .select(col("id_b")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(dropped == Set(1L, 3L))
  }

  test("e16: the streaming NB gate equals the batch classifier exactly") {
    val batch = Round11Queries.t20_nb_langid(spark, sf).collect().toSeq
    val stream = Round12Queries.e16_stream_nb_gate(spark, sf).collect().toSeq
    assert(stream == batch)
  }

  test("p24: epoch shuffle is a deterministic permutation with balanced shards") {
    val out = Round12Queries.p24_epoch_shuffle(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = out.length
    assert(out.map(_._2).sorted.toSeq == (1L to n).toSeq,
      "positions must be a permutation of 1..N")
    assert(out.forall { case (_, pos, shard) => shard == (pos - 1) % 8 })
    // deterministic: a second run reproduces the exact layout
    val again = Round12Queries.p24_epoch_shuffle(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == out.toSeq)
    // balanced round-robin: shard sizes differ by at most 1
    val sizes = out.groupBy(_._3).map(_._2.length)
    assert(sizes.max - sizes.min <= 1)
  }

  test("t21: in-vocabulary tokens add up to the top-30 vocabulary mass") {
    import graft.functions.Text
    val out = Round12Queries.t21_oov_rate(spark, sf)
    val rows = out.collect()
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)),
      "n_oov must never exceed n_tok")
    val inVocab = rows.map(r => r.getLong(1) - r.getLong(2)).sum
    val top30Mass = graft.Tables.load(spark, sf, "documents")
      .select(explode(Text.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(30)
      .agg(sum(col("freq"))).collect()(0).getLong(0)
    assert(inVocab == top30Mass,
      "sum of per-doc in-vocab tokens must equal the vocabulary's corpus mass")
  }
}
