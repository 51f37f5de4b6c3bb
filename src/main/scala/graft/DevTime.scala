package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer (`runMain graft.DevTime <names...>`) —
  * mirrors Bench's session config for isolating one query's cost. */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(n => Tables.load(spark, sfDir, n).count())
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).collect().length
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"DEVTIME $name%s rows=$n%d sec=$dt%.3f")
    }
    spark.stop()
  }
}
