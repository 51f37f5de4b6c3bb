package graft.queries

import graft.SparkSpec

/** Semantic invariants of t24: training is a pure function of the data
  * (bit-identical weights across runs — the integer epoch sums are
  * order-independent, so partitioning cannot change them), and the
  * holdout split/population arithmetic holds. */
class Round25QueriesSpec extends SparkSpec {

  test("perceptron training is deterministic and evaluates the odd half") {
    val a = Round25Queries.t24_perceptron_langid(spark, sf).collect()(0)
    val b = Round25Queries.t24_perceptron_langid(spark, sf).collect()(0)
    assert(a.toSeq == b.toSeq, "retraining must reproduce identical weights")
    val odd = graft.Tables.load(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
      .count()
    assert(a.getLong(1) == odd, "holdout = odd doc_ids")
    assert(a.getLong(0) >= 0 && a.getLong(0) <= a.getLong(1))
    // three epochs over a non-degenerate corpus must move the weights
    assert((2 until a.length).exists(i => a.getLong(i) != 0L),
      "trained weights cannot all stay zero")
  }
}
