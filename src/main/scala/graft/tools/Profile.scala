package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the heavy operators (dev tool).
  * Usage: runMain graft.tools.Profile <sfDir> */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    val docs = graft.Tables.load(spark, dir, "documents")
    docs.count() // warm
    time("docs full scan")(docs.agg(sum(length(col("text")))).count())
    time("md5 only")(docs.select(md5(col("text")).as("m"))
      .agg(count(col("m"))).count())
    time("normalize+md5")(docs.select(
      graft.functions.Text.md5Fingerprint(col("text")).as("m"))
      .agg(count(col("m"))).count())
    time("d1 exact run1")(graft.queries.ExtensionQueries.d1_dedup_exact(spark, dir).count())
    time("d1 exact run2")(graft.queries.ExtensionQueries.d1_dedup_exact(spark, dir).count())
    val tok = docs.select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("t"))
    time("tokens only")(tok.agg(sum(size(col("t")))).count())

    val sh = docs.select(col("doc_id").as("id"),
      explode(array_distinct(graft.functions.Text.shingles(col("text"), 3))).as("sh"))
    time("shingle explode")(sh.count())
    time("shingle explode again")(sh.count())
    val joined = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
    time("self-join")(joined.count())
    val inter = joined.groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    time("pair group")(inter.count())
    time("d2 full")(graft.queries.ExtensionQueries.d2_ngram_jaccard(spark, dir).count())
    time("d1 exact")(graft.queries.ExtensionQueries.d1_dedup_exact(spark, dir).count())
    time("d3 minhash")(graft.queries.ExtensionQueries.d3_minhash_lsh(spark, dir).count())
    time("d5 embed pairs")(graft.queries.ExtensionQueries.d5_embed_cosine_pairs(spark, dir).count())

    val emb = graft.Tables.load(spark, dir, "embeddings")
    emb.count()
    val withDot = emb.select(
      graft.operators.Vectors.dotProduct(col("embedding"), col("embedding")).as("d"))
    time("500 self-dots")(withDot.agg(sum("d")).count())
    time("s2 ann lsh")(graft.queries.ExtensionQueries.s2_ann_lsh_topk(spark, dir).count())
    spark.stop()
  }
}
