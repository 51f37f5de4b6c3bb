package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SCALE.md's determinism claim, tested directly: operators whose naive
  * formulations would be partitioning-sensitive (floating-point
  * accumulation order, global ranking, LSH bucket signs) must return
  * bit-identical results under adversarial repartitioning — the
  * 1000-executor answer must equal the local[4] answer.
  */
class PartitionInvarianceSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private lazy val copurchase = spark.read.parquet(s"$sf/lineitem.parquet")
    .filter($"l_partkey" % 10 === 0)
    .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    .as("x").join(spark.read.parquet(s"$sf/lineitem.parquet")
      .filter($"l_partkey" % 10 === 0)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      .as("y"), $"x.ok" === $"y.ok" && $"x.pk" < $"y.pk")
    .select($"x.pk".as("u"), $"y.pk".as("v")).distinct()

  test("pagerank is bit-identical across partitionings") {
    val one = canon(Graph.pageRank(copurchase.repartition(1), "u", "v"))
    val many = canon(Graph.pageRank(copurchase.repartition(13), "u", "v"))
    assert(one == many, "per-edge DECIMAL rounding must make the node " +
      "aggregate order-independent")
  }

  test("directed pagerank with dangling mass is bit-identical across partitionings") {
    val one = canon(Graph.pageRankDirected(copurchase.repartition(1), "u", "v"))
    val many = canon(Graph.pageRankDirected(copurchase.repartition(13), "u", "v"))
    assert(one == many, "the DECIMAL dangling-mass aggregate must be " +
      "order-independent like the contribution sums")
  }

  test("embedding LSH buckets and pairs are bit-identical across partitionings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val one = canon(Dedup.embeddingCosinePairs(
      emb.repartition(1), "vec_id", "embedding", 64, 0.3, 4))
    val many = canon(Dedup.embeddingCosinePairs(
      emb.repartition(11), "vec_id", "embedding", 64, 0.3, 4))
    assert(one == many, "integer plane dots must not depend on layout")
  }

  test("prefix sum is bit-identical across partitionings") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", length($"text").cast("long").as("n"))
    val one = canon(Rank.prefixSum(df.repartition(1), "c", $"n", $"doc_id"))
    val many = canon(Rank.prefixSum(df.repartition(7), "c", $"n", $"doc_id"))
    assert(one == many,
      "partial sums + offsets must reproduce the sequential scan")
  }

  test("BPE merge choices are identical across partitionings") {
    // integer pair counts + a total-order argmax (cnt desc, lft, rgt):
    // nothing layout-sensitive may survive into the merge table
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim($"text"), "\\s+")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("freq"))
    val one = canon(Bpe.trainMerges(spark, words.repartition(1), 3))
    val many = canon(Bpe.trainMerges(spark, words.repartition(13), 3))
    assert(one == many, "weighted pair counts and lexicographic " +
      "tie-breaks must make each round's argmax layout-independent")
  }

  test("global rank assigns the same positions across partitionings") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", length($"text").as("n"))
    val one = canon(Rank.globalRank(df.repartition(1), "r",
      $"n".desc, $"doc_id"))
    val many = canon(Rank.globalRank(df.repartition(7), "r",
      $"n".desc, $"doc_id"))
    assert(one == many,
      "range sort + zipWithIndex must reproduce the total order")
  }

  test("image aHash band dedup pairs are bit-identical across partitionings") {
    import graft.functions.ImageExprs
    def pairs(parts: Int) = {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select($"doc_id", $"text").repartition(parts)
      val corpus = docs.unionByName(docs.select(($"doc_id" + 1000000L).as("doc_id"),
          expr("concat(substring(text, 1, 5), 'q', substring(text, 7))").as("text")))
        .withColumn("bands", ImageExprs.aHashBands(
          ImageExprs.encodeImageFromText($"text", "pgm", 8, 8)))
      val ex = corpus.select($"doc_id",
        posexplode($"bands").as(Seq("band_idx", "band_val")))
      canon(ex.as("a").join(ex.as("b"),
          $"a.band_idx" === $"b.band_idx" && $"a.band_val" === $"b.band_val" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id", $"b.doc_id").distinct())
    }
    assert(pairs(1) == pairs(13),
      "integer hash bits and distinct pairs must not depend on layout")
  }
}
