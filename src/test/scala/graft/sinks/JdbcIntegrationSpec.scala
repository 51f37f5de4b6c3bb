package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{Clock, Quality}
import graft.sources.Sources

/** Real JDBC round-trips against embedded Derby (on the Spark classpath) —
  * the closest available stand-in for the reference's Postgres sink/source
  * (upsert's ON CONFLICT is Postgres-specific and is covered at the SQL-
  * generation level in SinksSpec). Derby folds unquoted identifiers to
  * upper case, so table names here are upper-case. */
class JdbcIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbUrl = {
    val dir = tmpDir("derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  test("JDBC sink append + fetchDb round-trip") {
    val df = Seq((1L, "a", 9.5), (2L, "b", 3.25)).toDF("id", "name", "price")
    val msg = JdbcSink.write(df, dbUrl, "ITEMS", mode = "append")
    assert(msg.contains("ITEMS"))
    val back = Sources.fetchDb(spark, dbUrl,
      """SELECT "id", "name", "price" FROM ITEMS""")
    assert(back.count() == 2)
    assert(back.orderBy("id").collect()(0).getDouble(2) == 9.5)
    // append again doubles the rows
    JdbcSink.write(df, dbUrl, "ITEMS", mode = "append")
    assert(Sources.fetchDb(spark, dbUrl, "SELECT COUNT(*) AS n FROM ITEMS")
      .collect()(0).get(0).asInstanceOf[Number].longValue() == 4)
  }

  test("JDBC sink replace mode overwrites") {
    val df1 = Seq((1L, "x")).toDF("id", "v")
    JdbcSink.write(df1, dbUrl, "REPL", mode = "replace")
    val df2 = Seq((9L, "y"), (10L, "z")).toDF("id", "v")
    JdbcSink.write(df2, dbUrl, "REPL", mode = "replace")
    val back = Sources.fetchDb(spark, dbUrl, """SELECT "id" FROM REPL""")
    assert(back.collect().map(_.getLong(0)).sorted.toSeq == Seq(9L, 10L))
  }

  test("verifyTable pushes COUNT/MAX to the database") {
    val frozen = new Clock { val nowEpochMillis = 1704153600000L } // 2024-01-02
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 23:30:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("id", "updated")
    JdbcSink.write(df, dbUrl, "AUDITED", mode = "replace")
    val ok = Quality.verifyTable(spark, dbUrl, "AUDITED",
      tsCol = Some("updated"), maxLagMinutes = 60, clock = frozen)
    assert(ok.status && ok.rows == 2 && ok.lagMinutes.contains(30.0))
    val stale = Quality.verifyTable(spark, dbUrl, "AUDITED",
      tsCol = Some("updated"), maxLagMinutes = 10, clock = frozen)
    assert(!stale.status)
    val missing = Quality.verifyTable(spark, dbUrl, "NO_SUCH_TABLE")
    assert(!missing.status && missing.error.isDefined)
  }

  test("upsert via MERGE: updates matches, inserts new keys") {
    val initial = Seq((1L, "old", 10.0), (2L, "keep", 20.0))
      .toDF("id", "name", "price")
    JdbcSink.write(initial, dbUrl, "UPS", mode = "replace")
    val delta = Seq((1L, "updated", 11.0), (3L, "new", 30.0))
      .toDF("id", "name", "price")
    val msg = JdbcSink.write(delta, dbUrl, "UPS",
      mode = "upsert", keyCols = Seq("id"))
    assert(msg.contains("upserted"))
    val back = Sources.fetchDb(spark, dbUrl,
      """SELECT "id", "name", "price" FROM UPS""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back == Set(
      (1L, "updated", 11.0), (2L, "keep", 20.0), (3L, "new", 30.0)))
  }

  test("engine end-to-end with JDBC load + verify_table") {
    val dir = tmpDir("jdbcplan")
    java.nio.file.Files.writeString(dir.resolve("in.csv"),
      "sku,price\n1,9.5\n2,3.25\n3,100.0\n")
    val res = new graft.engine.Engine(spark).run(
      s"""source:
         |  kind: csv
         |  csv: {path: ${dir.resolve("in.csv")}}
         |transform:
         |  sql: SELECT CAST(sku AS BIGINT) AS sku, CAST(price AS DOUBLE) AS sale_price
         |       FROM input_df WHERE price < 50
         |checks: {min_rows: 2}
         |load: {to: postgres, conn_str: "$dbUrl", table: CHEAP, mode: replace}
         |""".stripMargin)
    assert(res.status == "ok", res.toJson)
    assert(res.verify.get.rows == 2)
    assert(Sources.fetchDb(spark, dbUrl, "SELECT COUNT(*) AS n FROM CHEAP")
      .collect()(0).get(0).asInstanceOf[Number].longValue() == 2)
  }
}
