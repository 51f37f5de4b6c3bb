package graft.sinks

import java.nio.file.{Files, Paths}
import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("single-file CSV sink: exact path, one file, header control") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v").repartition(3)
    val out = tmpDir("sink").resolve("exact.csv")
    val msg = CsvSink.writeSingleFile(df, out.toString)
    assert(msg.contains("exact.csv"))
    assert(Files.isRegularFile(out)) // a file, not a directory
    val lines = Files.readAllLines(out)
    assert(lines.get(0) == "id,v" && lines.size == 3)

    val noHdr = tmpDir("sink").resolve("nohdr.csv")
    CsvSink.writeSingleFile(df, noHdr.toString, includeHeader = false)
    assert(Files.readAllLines(noHdr).size == 2)
  }

  test("single-file sink overwrites and leaves no stage dirs") {
    val df = Seq((9, "z")).toDF("id", "v")
    val dir = tmpDir("sink2")
    val out = dir.resolve("o.csv")
    CsvSink.writeSingleFile(df, out.toString)
    CsvSink.writeSingleFile(df, out.toString) // overwrite succeeds
    val leftovers = Files.list(dir).filter(p =>
      p.getFileName.toString.startsWith(".csv_stage_")).count()
    assert(leftovers == 0)
  }

  test("directory CSV sink (scale path) writes per-partition files") {
    val df = Seq.tabulate(8)(i => (i, s"v$i")).toDF("id", "v").repartition(4)
    val dir = tmpDir("sinkd").resolve("out")
    CsvSink.writeDirectory(df, dir.toString)
    val parts = Files.list(dir).filter(p =>
      p.getFileName.toString.startsWith("part-")).count()
    assert(parts == 4)
  }

  test("upsert SQL mirrors the staging strategy with safe identifiers") {
    // table names pass verbatim (Spark's JDBC writer created them
    // unquoted, so the DB case-folded them); columns stay quoted (the
    // writer quotes those)
    val sql = JdbcSink.upsertSql("analytics.t", "analytics.t_stg",
      Seq("sku", "name", "price"), Seq("sku"))
    assert(sql ==
      """INSERT INTO analytics.t ("sku", "name", "price") """ +
      """SELECT "sku", "name", "price" FROM analytics.t_stg """ +
      """ON CONFLICT ("sku") DO UPDATE SET "name" = EXCLUDED."name", "price" = EXCLUDED."price"""")
    val allKeys = JdbcSink.upsertSql("t", "t_stg", Seq("k"), Seq("k"))
    assert(allKeys.endsWith("DO NOTHING"))
    // hostile table names still get quoted
    assert(JdbcSink.upsertSql("t; DROP TABLE x", "t_stg", Seq("k"), Seq("k"))
      .startsWith("INSERT INTO \"t; DROP TABLE x\""))
    val merge = JdbcSink.mergeSql("tgt", "tgt_stg", Seq("k", "v"), Seq("k"))
    assert(merge ==
      """MERGE INTO tgt t USING tgt_stg s ON t."k" = s."k"""" +
      """ WHEN MATCHED THEN UPDATE SET t."v" = s."v"""" +
      """ WHEN NOT MATCHED THEN INSERT ("k", "v") VALUES (s."k", s."v")""")
  }
}
