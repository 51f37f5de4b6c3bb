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

  test("upsert/merge SQL: embedded double-quotes are doubled, golden text") {
    // the Derby integration test only ever EXECUTES the MERGE grammar, so
    // the Postgres ON CONFLICT string (and its identifier escaping — the
    // injection surface SURVEY §7.4 calls out) is pinned here verbatim,
    // for a table name carrying the quote character itself
    val sql = JdbcSink.upsertSql("""bad"name""", """bad"name_stg""",
      Seq("id", """evil"col"""), Seq("id"))
    assert(sql ==
      """INSERT INTO "bad""name" ("id", "evil""col") """ +
      """SELECT "id", "evil""col" FROM "bad""name_stg" """ +
      """ON CONFLICT ("id") DO UPDATE SET "evil""col" = EXCLUDED."evil""col"""")
    val merge = JdbcSink.mergeSql("""bad"name""", """bad"name_stg""",
      Seq("id", """evil"col"""), Seq("id"))
    assert(merge ==
      """MERGE INTO "bad""name" t USING "bad""name_stg" s ON t."id" = s."id"""" +
      """ WHEN MATCHED THEN UPDATE SET t."evil""col" = s."evil""col"""" +
      """ WHEN NOT MATCHED THEN INSERT ("id", "evil""col") """ +
      """VALUES (s."id", s."evil""col")""")
  }
}
