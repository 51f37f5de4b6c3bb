package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  /** Four well-separated direction clusters in 8-d: members of a cluster
    * share a dominant axis with small deterministic jitter. */
  private def clustered(nPerCluster: Int) = {
    val rows = for {
      c <- 0 until 4
      i <- 0 until nPerCluster
    } yield {
      val v = Array.fill(8)(0.05f * ((c * 31 + i * 7) % 5))
      v(c * 2) = 10.0f + (i % 3)
      (c.toLong * nPerCluster + i, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("on clustered data, probing 1 of 4 cells recovers the exact top-k") {
    val corpus = clustered(25)
    val queries = corpus.filter(col("vec_id").isin(0L, 30L, 60L, 90L))
    val exact = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val ivf = Ivf.topK(corpus, queries, "vec_id", "embedding",
      k = 3, nCells = 4, iters = 3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(ivf == exact)
  }

  test("centroid training is deterministic across invocations") {
    val corpus = clustered(10)
    val a = Ivf.trainCentroids(corpus, "vec_id", "embedding", k = 4, iters = 3)
    val b = Ivf.trainCentroids(corpus, "vec_id", "embedding", k = 4, iters = 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
