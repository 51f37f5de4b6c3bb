package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants for the round-96 operators, pinned at sf0.001. */
class Round96Spec extends SparkSpec {

  test("t53: canonical Luhn anchor validates and the census is exact") {
    import spark.implicits._
    // 79927398713 is the textbook Luhn-valid number
    val luhn = Seq("79927398713", "79927398710", "4111111111111111")
      .toDF("probe")
      .selectExpr("probe",
        """aggregate(transform(sequence(1, length(probe)), i ->
          |  CASE WHEN i % 2 = 0
          |    THEN (CASE WHEN 2 * CAST(substring(reverse(probe), i, 1)
          |            AS INT) > 9
          |      THEN 2 * CAST(substring(reverse(probe), i, 1) AS INT) - 9
          |      ELSE 2 * CAST(substring(reverse(probe), i, 1) AS INT) END)
          |    ELSE CAST(substring(reverse(probe), i, 1) AS INT) END),
          |  0L, (acc, x) -> acc + x) % 10 AS r""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(luhn("79927398713") === 0L)
    assert(luhn("79927398710") !== 0L)
    assert(luhn("4111111111111111") === 0L) // classic test PAN
    val row = Round96Queries.t53_luhn_validation(spark, sf).collect().head
    assert(row.getAs[Long]("n_valid") === row.getAs[Long]("n_planted"),
      "checksum must accept exactly the planted numbers")
    assert(row.getAs[Long]("n_valid") > 0)
  }

  test("q138: business-day closed form matches weekday anchors") {
    import spark.implicits._
    // 2024-01-01 is a Monday
    val anchors = Seq(
      ("2024-01-01", "2024-01-01", 0L),  // same day
      ("2024-01-01", "2024-01-05", 4L),  // Mon -> Fri
      ("2024-01-05", "2024-01-08", 1L),  // Fri -> Mon (skip weekend)
      ("2024-01-01", "2024-01-08", 5L),  // full week
      ("2024-01-01", "2024-01-15", 10L), // two full weeks (empty tail)
      ("2024-01-06", "2024-01-07", 0L))  // Sat -> Sun
    val got = anchors.map(a => (a._1, a._2)).toDF("d1s", "d2s")
      .selectExpr("d1s", "d2s", "CAST(d1s AS DATE) AS d1",
        "CAST(d2s AS DATE) AS d2")
      .selectExpr("d1s", "d2s",
        """(CAST(datediff(d2, d1) AS BIGINT) div 7) * 5 +
          |aggregate(transform(
          |  slice(sequence(1L, 7L), 1,
          |    CAST(CAST(datediff(d2, d1) AS BIGINT) % 7 AS INT)),
          |  k -> CASE WHEN dayofweek(date_add(d1, CAST(k AS INT)))
          |    IN (1, 7) THEN 0L ELSE 1L END),
          |  0L, (acc, x) -> acc + x) AS bd""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    anchors.foreach { case (d1, d2, want) =>
      assert(got((d1, d2)) === want, s"$d1 -> $d2")
    }
    val rows = Round96Queries.q138_business_days(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[Long]("bdays") >= 0))
  }

  test("a23: power sums are exact and uniform balances have flat kurtosis") {
    val rows = Round96Queries.a23_higher_moments(spark, sf).collect()
    assert(rows.length === 5)
    val cust = graft.Tables.load(spark, sf, "customer")
    rows.foreach { r =>
      val seg = r.getAs[String]("seg")
      val exact = cust.filter(col("c_mktsegment") === seg)
        .agg(sum(expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)")))
        .collect().head.getLong(0)
      assert(r.getAs[String]("s1") === exact.toString)
      // c_acctbal is uniform-ish: excess kurtosis near -1.2, skew near 0
      assert(math.abs(r.getAs[Double]("skewness")) < 0.6)
      val k = r.getAs[Double]("excess_kurtosis")
      assert(k > -1.6 && k < 0.0, s"segment $seg kurtosis $k")
    }
  }
}
