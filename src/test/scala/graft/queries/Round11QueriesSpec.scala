package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the round-11 batch: Lloyd k-means in
  * quantized integer arithmetic and the Naive-Bayes scoring formula. */
class Round11QueriesSpec extends SparkSpec {

  import spark.implicits._

  test("s8: two Lloyd updates move both centroids to pair midpoints") {
    // 1-D points 0, 1, 10, 11; k=2 seeds = points 0 (q=0) and 1 (q=1e6).
    // iter1: {0}->c0, {1,10,11}->c1 (point 10: d(c0)=1e14 > d(c1)=8.1e13)
    //        c0=0, c1=floor(22e6/3)=7333333
    // iter2: {0,1}->c0 (point 1: d(c0)=1e12 < d(c1)=6333333^2≈4.01e13),
    //        {10,11}->c1; c0=500000, c1=10500000
    // final assignment: every point sits 500000 from its centroid.
    val emb = Seq((0L, Seq(0.0f)), (1L, Seq(1.0f)),
      (2L, Seq(10.0f)), (3L, Seq(11.0f))).toDF("vec_id", "embedding")
    val out = graft.operators.Kmeans
      .lloyd(emb, "vec_id", "embedding", k = 2, iters = 2)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val d = 500000L * 500000L
    assert(out.toSeq == Seq((0L, 0L, d), (1L, 0L, d), (2L, 1L, d),
      (3L, 1L, d)))
  }

  test("s8: equidistant points break toward the smaller centroid id; empty clusters drop") {
    // Both seeds quantize identically, so every point is equidistant:
    // all assign to centroid 0 and cluster 1 vanishes from the update.
    val emb = Seq((0L, Seq(5.0f)), (1L, Seq(5.0f)), (2L, Seq(5.0f)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Kmeans
      .lloyd(emb, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq.sorted == Seq((0L, 0L, 0L), (1L, 0L, 0L),
      (2L, 0L, 0L)))
  }

  test("t20: add-one-smoothed log-likelihoods pick the right class") {
    // train: id0 en "a a b", id2 fr "c c d"; V={a,b,c,d}, each class has
    // 3 tokens so every denominator is 3+4=7 and priors are ln(1/2).
    // id1 "a b": en = ln.5+ln(3/7)+ln(2/7), fr = ln.5+2·ln(1/7) -> en
    // id3 "c c": en = ln.5+2·ln(1/7), fr = ln.5+2·ln(3/7)       -> fr
    val docs = Seq(
      (0L, "a a b", "en"), (1L, "a b", "en"),
      (2L, "c c d", "fr"), (3L, "c c", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = graft.operators.NaiveBayes
      .classify(docs, col("doc_id") % 2 === 0, "doc_id", "text", "lang")
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(3),
        r.getDouble(4)))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1L, "en", true), (3L, "fr", true)))
    val en1 = math.log(0.5) + math.log(3.0 / 7) + math.log(2.0 / 7)
    val fr3 = math.log(0.5) + 2 * math.log(3.0 / 7)
    assert(math.abs(out(0)._4 - en1) < 1e-6)
    assert(math.abs(out(1)._4 - fr3) < 1e-6)
  }

  test("t20: unseen tokens fall back to the smoothing floor") {
    // id1's token "z" is outside the train vocabulary: both classes
    // score it ln(1/7); the prior and nothing else decides. Equal priors
    // -> equal scores -> tie breaks to the lexicographically smaller
    // class ("de" < "en").
    val docs = Seq(
      (0L, "a a b", "en"), (2L, "c c d", "de"), (1L, "z", "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.operators.NaiveBayes
      .classify(docs, col("doc_id") % 2 === 0, "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(3)))
    assert(out.toSeq == Seq((1L, "de", false)))
  }
}
