package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Smoke coverage at sf0.001 — full value-level oracle equivalence runs via
  * graft.Verify + scripts/oracle_check.py (and the driver's DuckDB gate). */
class CoreQueriesSpec extends SparkSpec {

  test("every query returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry smoke: flagship >0 rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 values: sums match a hand aggregation") {
    import org.apache.spark.sql.functions._
    val got = CoreQueries.q1_agg(spark, sf)
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
      .collect()(0)
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
    val expectQty = raw.agg(sum("l_quantity")).collect()(0).getDouble(0)
    assert(math.abs(got.getAs[Double]("sum_qty") - expectQty) < 1e-6)
    assert(got.getAs[Long]("count_order") == raw.count())
  }

  test("q8/q9 set semantics sanity") {
    val q8 = CoreQueries.q8_setops(spark, sf).collect()
    val tags = q8.map(_.getString(0)).toSet
    assert(tags.subsetOf(Set("both", "cust_only", "supp_only")))
    val q9 = CoreQueries.q9_semi_anti(spark, sf)
    val total = q9.count()
    val customers = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(total == customers) // semi + anti partition the customer set
  }
}
