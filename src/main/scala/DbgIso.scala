import org.apache.spark.sql.SparkSession
object DbgIso {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.all.foreach(n => graft.Tables.load(spark, sfDir, n).count())
    val targets = Seq("t17_bpe_train", "t16_mixture_sample", "t15_readability",
      "t21_oov_rate", "m1_multimodal_features", "m3_batched_scores",
      "m5_image_stats_ppm", "m6_image_stats_bmp", "a12_cms_range_serving",
      // round-9 pins: the s2 4.3x drift (r7 0.388 -> r8 1.681 with
      // unchanged code) plus its s1/s3 siblings as controls
      "s2_ann_lsh_topk", "s1_cosine_topk", "s3_ann_ivf_topk")
    targets.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime; fn(spark, sfDir).count(); (System.nanoTime - t0) / 1e9
      }
      println(f"ISO $name%-24s min=${runs.min}%.3f  runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
