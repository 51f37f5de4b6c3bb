package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * One parquet file per table under `\$sfDir/<name>.parquet`. All queries
  * load through here so the scan options stay uniform. At cluster scale the
  * same code works unchanged: parquet scans are split per row-group, filters
  * and column pruning are pushed into the scan by Catalyst.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` queries (and the
    * engine's transform steps) can reference them by name, mirroring the
    * reference's DuckDB `con.register(name, df)` (templates.py:79-82). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
