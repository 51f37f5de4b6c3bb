package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: dumps `explain("formatted")` for every query to
  * one file so scan pushdown (`PushedFilters`/`ReadSchema`), join
  * strategies, and codegen spans can be audited per round.
  * Usage: runMain graft.Explain <sfDir> <outFile> [queryName…] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outFile = args.lift(1).getOrElse("/tmp/plans.txt")
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        sb ++= s"\n========== $name ==========\n"
        try {
          val df = fn(spark, sfDir)
          sb ++= df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Exception => sb ++= s"ERROR: ${e.getMessage}\n" }
      }
    Files.writeString(Paths.get(outFile), sb.result())
    println(s"wrote $outFile")
    spark.stop()
  }
}
