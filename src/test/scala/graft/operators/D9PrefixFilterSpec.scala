package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the round-12 cross-corpus prefix filter: the pruned
  * crossNgramJaccard must equal the original unpruned posting join
  * row for row (the filter is lossless for the threshold), on the
  * same batch/corpus split d9 uses. */
class D9PrefixFilterSpec extends SparkSpec {

  test("prefix-filtered cross Jaccard equals the unpruned join at sf0.001") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val pruned = Dedup.crossNgramJaccard(batch, corpus, "doc_id", "text",
        n = 3, threshold = 0.5)
      .collect().map(_.toSeq).toSet
    // original unpruned formulation, inline
    val aSets = Dedup.shingleSets(batch, "doc_id", "text", 3)
    val bSets = Dedup.shingleSets(corpus, "doc_id", "text", 3)
    val a = Dedup.postingList(aSets)
    val b = Dedup.postingList(bSets)
    val inter = a.as("a").join(b.as("b"), col("a.sh") === col("b.sh"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))
    val jac = col("inter").cast("double") /
      (col("na") + col("nb") - col("inter")).cast("double")
    val full = inter.filter(jac >= 0.5)
      .select(col("id_a"), col("id_b"), round(jac, 6).as("jaccard"))
      .collect().map(_.toSeq).toSet
    assert(full.nonEmpty, "fixture must produce cross near-dups")
    assert(pruned === full,
      s"cross prefix filter changed the result: ${pruned.size} vs ${full.size}")
  }
}
