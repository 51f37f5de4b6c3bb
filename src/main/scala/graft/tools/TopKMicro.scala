package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-bench for the TopKPerKeyExec codegen decision (dev tool; r7→r9
  * verdict ask): quantifies, at sf0.1 on the lineitem table, what a
  * codegen'd operator could possibly save.
  *
  *   scan-only      — the codegen'd child stage feeding the operator
  *   window+filter  — the built-in plan the operator replaces
  *   topk-custom    — TopKPerKeyExec as shipped (partial+final heap)
  *   topk-nocodegen — same, with whole-stage codegen disabled on the
  *                    CHILD (spark.sql.codegen.wholeStage=false): how
  *                    much of topk-custom's cost is the child stage the
  *                    boundary already preserves
  *
  * Reading: (topk-custom − scan-only) is the operator's own cost, the
  * absolute ceiling on any codegen win; (topk-nocodegen − topk-custom)
  * shows the child's codegen IS exploited through the iterator boundary.
  * Usage: runMain graft.tools.TopKMicro [sfDir]; numbers recorded in
  * SCALE.md and TopKPerKey.scala's decision note.
  */
object TopKMicro {
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
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_extendedprice"), col("l_orderkey"))
    li.count() // warm scan + codegen

    def time(tag: String)(f: => Long): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"TOPK-MICRO $tag%-16s min=${runs.min}%.3f  runs=${runs.map(r => f"$r%.3f").mkString(",")}")
      runs.min
    }

    time("scan-only")(li.agg(count(lit(1))).first().getLong(0))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
    time("window+filter")(li
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .drop("rk").count())
    time("topk-custom")(graft.operators.TopK.perKey(
      li, Seq("l_partkey"), "l_extendedprice", "l_orderkey", 2).count())
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("topk-nocodegen")(graft.operators.TopK.perKey(
      li, Seq("l_partkey"), "l_extendedprice", "l_orderkey", 2).count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.stop()
  }
}
